package graft.metrics

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Prometheus scrape endpoint over an [[InProcessMetricsProvider]] —
  * the serving half of the reference's Prometheus provider
  * (`/root/reference/prometheus.go:44-127` registers collectors and
  * exposes them via the client library's HTTP handler; here the
  * provider already renders the text exposition format, so the
  * exporter is a dependency-free JDK `HttpServer` returning it at
  * `GET /metrics` with the standard `text/plain; version=0.0.4`
  * content type).
  *
  * Deployment shape: one exporter per driver/executor process bound to
  * `host:port` (port 0 = ephemeral, `boundPort` reports it) — exactly
  * how a Spark-native deployment scrapes per-process metrics next to
  * Spark's own metrics servlet. `stop()` is idempotent.
  */
final class PrometheusExporter(provider: InProcessMetricsProvider,
                               host: String = "127.0.0.1", port: Int = 0) {

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress(host, port), 0)
  @volatile private var started = false

  server.createContext("/metrics", (exchange: HttpExchange) => {
    try {
      if (exchange.getRequestMethod.equalsIgnoreCase("GET")) {
        val body = provider.renderPrometheusText().getBytes(StandardCharsets.UTF_8)
        exchange.getResponseHeaders.add("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        exchange.sendResponseHeaders(200, body.length.toLong)
        exchange.getResponseBody.write(body)
      } else {
        exchange.sendResponseHeaders(405, -1L)
      }
    } finally exchange.close()
  })

  /** Bind and serve; returns this for chaining. */
  def start(): PrometheusExporter = synchronized {
    if (!started) { server.start(); started = true }
    this
  }

  /** The actual bound port (resolves an ephemeral `port = 0`). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = synchronized {
    // Unconditional: HttpServer.create binds the socket in the
    // constructor, so a constructed-but-never-started exporter still
    // holds the port until stop(0) releases it (safe before start()).
    server.stop(0)
    started = false
  }
}
