package graft.streaming

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.scalatest.funsuite.AnyFunSuite

/** Connector suite: the Redis and Elasticsearch stores driven over REAL
  * sockets/HTTP against embedded in-test servers speaking the public
  * wire protocols (RESP2; the ES REST/bulk JSON API) — closing the
  * "untested, no network in CI" gap without a network: the server is a
  * loopback fixture, the client code is the production connector.
  * Contract cases mirror `map_test.go:25-114` like StoreSpec.
  */
class ConnectorSpec extends AnyFunSuite {

  // --- embedded RESP2 server -------------------------------------------

  /** Minimal RESP2 server: GET/SET/DEL/SAVE + MULTI/EXEC queueing,
    * binary-safe, one thread per connection, data in a shared TrieMap
    * (keys latin-1-decoded so arbitrary bytes round-trip).
    */
  private final class RespTestServer extends AutoCloseable {
    private val data = scala.collection.concurrent.TrieMap.empty[String, Array[Byte]]
    private val server = new java.net.ServerSocket(0)
    val port: Int = server.getLocalPort
    @volatile private var running = true
    var saves = 0

    private def readLine(in: java.io.InputStream): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
      in.read() // \n
      sb.toString()
    }

    private def readCommand(in: java.io.InputStream): Option[Seq[Array[Byte]]] = {
      val first = in.read()
      if (first < 0) return None
      assert(first == '*', s"expected array, got '${first.toChar}'")
      val n = readLine(in).toInt
      Some((0 until n).map { _ =>
        assert(in.read() == '$')
        val len = readLine(in).toInt
        val buf = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val r = in.read(buf, off, len - off); assert(r >= 0); off += r
        }
        in.read(); in.read() // \r\n
        buf
      })
    }

    private def run(cmd: Seq[Array[Byte]]): Array[Byte] = {
      val name = new String(cmd.head, UTF_8).toUpperCase
      def key = new String(cmd(1), ISO_8859_1)
      name match {
        case "SET" => data.put(key, cmd(2)); "+OK\r\n".getBytes(UTF_8)
        case "GET" => data.get(key) match {
          case Some(v) =>
            s"$$${v.length}\r\n".getBytes(UTF_8) ++ v ++ "\r\n".getBytes(UTF_8)
          case None => "$-1\r\n".getBytes(UTF_8)
        }
        case "DEL" =>
          val n = if (data.remove(key).isDefined) 1 else 0
          s":$n\r\n".getBytes(UTF_8)
        case "SAVE" => saves += 1; "+OK\r\n".getBytes(UTF_8)
        case other => s"-ERR unknown command '$other'\r\n".getBytes(UTF_8)
      }
    }

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          new Thread(() => {
            val in = new java.io.BufferedInputStream(sock.getInputStream)
            val out = new java.io.BufferedOutputStream(sock.getOutputStream)
            var queued: Option[Vector[Seq[Array[Byte]]]] = None
            var open = true
            while (open) readCommand(in) match {
              case None => open = false
              case Some(cmd) =>
                val name = new String(cmd.head, UTF_8).toUpperCase
                (name, queued) match {
                  case ("MULTI", _) =>
                    queued = Some(Vector.empty)
                    out.write("+OK\r\n".getBytes(UTF_8))
                  case ("EXEC", Some(q)) =>
                    val replies = q.map(run)
                    out.write(s"*${replies.length}\r\n".getBytes(UTF_8))
                    replies.foreach(out.write)
                    queued = None
                  case (_, Some(q)) =>
                    queued = Some(q :+ cmd)
                    out.write("+QUEUED\r\n".getBytes(UTF_8))
                  case (_, None) => out.write(run(cmd))
                }
                out.flush()
            }
            sock.close()
          }).start()
        } catch { case _: Exception => () }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    def contents: Map[String, Array[Byte]] = data.toMap
    override def close(): Unit = { running = false; server.close() }
  }

  private def withRedis(f: RespTestServer => Unit): Unit = {
    val srv = new RespTestServer
    try f(srv) finally srv.close()
  }

  test("RedisStore: reference store contract over a real RESP socket") {
    withRedis { srv =>
      val s = new RedisStore("127.0.0.1", srv.port, "wordcount")
      try {
        assert(s.get("nope").isEmpty)
        s.put("k", "v1".getBytes(UTF_8))
        assert(s.get("k").map(new String(_, UTF_8)).contains("v1"))
        s.put("k", "v2".getBytes(UTF_8))
        assert(s.get("k").map(new String(_, UTF_8)).contains("v2"))
        s.putAll(Map("a" -> "1".getBytes(UTF_8), "b" -> "2".getBytes(UTF_8)))
        s.putAll(Map.empty)
        val all = s.getAll(Seq("a", "x", "b")).map { case (k, v) => k -> new String(v, UTF_8) }
        assert(all == Map("a" -> "1", "b" -> "2"))
        assert(s.getAll(Nil).isEmpty)
        s.delete("a"); s.delete("ghost")
        assert(s.get("a").isEmpty)
        s.flush()
        assert(srv.saves == 1, "flush must issue SAVE")
      } finally s.close()
    }
  }

  test("RedisStore: keys are prefix-namespaced like the reference (redis.go:46-48)") {
    withRedis { srv =>
      val s1 = new RedisStore("127.0.0.1", srv.port, "p1")
      val s2 = new RedisStore("127.0.0.1", srv.port, "p2")
      try {
        s1.put("k", "one".getBytes(UTF_8))
        s2.put("k", "two".getBytes(UTF_8))
        assert(s1.get("k").map(new String(_, UTF_8)).contains("one"))
        assert(s2.get("k").map(new String(_, UTF_8)).contains("two"))
        assert(srv.contents.keySet == Set("p1/k", "p2/k"))
      } finally { s1.close(); s2.close() }
    }
  }

  test("RedisStore: values are binary-safe (all 256 byte values round-trip)") {
    withRedis { srv =>
      val s = new RedisStore("127.0.0.1", srv.port, "bin")
      try {
        val payload = Array.tabulate[Byte](256)(_.toByte)
        s.put("blob", payload)
        assert(s.get("blob").exists(_.sameElements(payload)))
      } finally s.close()
    }
  }

  test("RedisStore: call counters land on the reference metric names") {
    withRedis { srv =>
      val metrics = new graft.metrics.InProcessMetricsProvider("t")
      val s = new RedisStore("127.0.0.1", srv.port, "m", metrics, "proc")
      try {
        s.put("k", "v".getBytes(UTF_8)); s.get("k"); s.getAll(Seq("k"))
        assert(metrics.counterValue("Redis_Put", "proc", "m").contains(1.0))
        assert(metrics.counterValue("Redis_Get", "proc", "m").contains(1.0))
        assert(metrics.summaryStats("Redis_GetAll", "proc", "m").exists(_._1 == 1L))
      } finally s.close()
    }
  }

  // --- embedded Elasticsearch REST server -------------------------------

  /** Minimal ES REST fixture: _doc get/put/delete, _mget, _bulk (ids in
    * `poison` fail per-item with reason "boom"), _flush.
    */
  private final class EsTestServer(poison: Set[String] = Set.empty)
      extends AutoCloseable {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val docs = scala.collection.concurrent.TrieMap.empty[(String, String), Array[Byte]]
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val port: Int = server.getAddress.getPort
    var flushes = 0

    server.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      val body = ex.getRequestBody.readAllBytes()
      def respond(code: Int, payload: Array[Byte]): Unit = {
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(code, payload.length.toLong)
        ex.getResponseBody.write(payload)
        ex.close()
      }
      def json(code: Int, s: String): Unit = respond(code, s.getBytes(UTF_8))
      val segs = path.split("/").filter(_.nonEmpty)
      (method, segs.toList) match {
        case ("PUT", index :: "_doc" :: id :: Nil) =>
          docs.put((index, java.net.URLDecoder.decode(id, UTF_8)), body)
          json(201, s"""{"result":"created"}""")
        case ("GET", index :: "_doc" :: id :: Nil) =>
          docs.get((index, java.net.URLDecoder.decode(id, UTF_8))) match {
            case Some(src) => respond(200,
              s"""{"found":true,"_source":${new String(src, UTF_8)}}""".getBytes(UTF_8))
            case None => json(404, s"""{"found":false}""")
          }
        case ("DELETE", index :: "_doc" :: id :: Nil) =>
          if (docs.remove((index, java.net.URLDecoder.decode(id, UTF_8))).isDefined)
            json(200, s"""{"result":"deleted"}""")
          else json(404, s"""{"result":"not_found"}""")
        case ("POST", index :: "_mget" :: Nil) =>
          val ids = mapper.readTree(body).path("ids")
          val items = (0 until ids.size()).map(ids.get(_).asText()).map { id =>
            docs.get((index, id)) match {
              case Some(src) =>
                s"""{"_id":${mapper.writeValueAsString(mapper.getNodeFactory.textNode(id))},"found":true,"_source":${new String(src, UTF_8)}}"""
              case None => s"""{"_id":"$id","found":false}"""
            }
          }
          json(200, s"""{"docs":[${items.mkString(",")}]}""")
        case ("POST", "_bulk" :: Nil) =>
          val lines = new String(body, UTF_8).split("\n").filter(_.nonEmpty)
          val items = lines.grouped(2).map { case Array(action, src) =>
            val a = mapper.readTree(action).path("index")
            val id = a.path("_id").asText()
            val index = a.path("_index").asText()
            if (poison(id))
              s"""{"index":{"_id":"$id","status":400,"error":{"reason":"boom"}}}"""
            else {
              docs.put((index, id), src.getBytes(UTF_8))
              s"""{"index":{"_id":"$id","status":201}}"""
            }
          }.toSeq
          val anyError = items.exists(_.contains("\"error\""))
          json(200, s"""{"errors":$anyError,"items":[${items.mkString(",")}]}""")
        case ("POST", rest) if rest.lastOption.contains("_flush") ||
            path.startsWith("/_flush") =>
          flushes += 1; json(200, s"""{"_shards":{"failed":0}}""")
        case _ => json(400, s"""{"error":"unhandled $method $path"}""")
      }
    })
    server.start()
    override def close(): Unit = server.stop(0)
  }

  private def withEs(poison: Set[String] = Set.empty)(f: EsTestServer => Unit): Unit = {
    val srv = new EsTestServer(poison)
    try f(srv) finally srv.close()
  }

  test("ElasticsearchStore: reference store contract over real HTTP") {
    withEs() { srv =>
      val s = new ElasticsearchStore(s"http://127.0.0.1:${srv.port}", "heroes")
      assert(s.get("nope").isEmpty) // 404 → None, never an error
      s.put("k", """{"v":1}""".getBytes(UTF_8))
      assert(s.get("k").map(new String(_, UTF_8)).contains("""{"v":1}"""))
      s.put("k", """{"v":2}""".getBytes(UTF_8))
      assert(s.get("k").map(new String(_, UTF_8)).contains("""{"v":2}"""))
      s.putAll(Map("a" -> """{"n":1}""".getBytes(UTF_8),
        "b" -> """{"n":2}""".getBytes(UTF_8)))
      s.putAll(Map.empty)
      val all = s.getAll(Seq("a", "x", "b")).map { case (k, v) => k -> new String(v, UTF_8) }
      assert(all == Map("a" -> """{"n":1}""", "b" -> """{"n":2}"""))
      assert(s.getAll(Nil).isEmpty)
      s.delete("a"); s.delete("ghost") // absent delete is a no-op
      assert(s.get("a").isEmpty)
      s.flush()
      assert(srv.flushes == 1)
    }
  }

  test("ElasticsearchStore: bulk failures summarize with the reference's bounded reasons") {
    val poison = (1 to 7).map(i => s"bad$i").toSet
    withEs(poison) { srv =>
      val s = new ElasticsearchStore(s"http://127.0.0.1:${srv.port}", "heroes")
      val kvs = (1 to 7).map(i => s"bad$i" -> s"""{"i":$i}""".getBytes(UTF_8)).toMap ++
        Map("good" -> """{"ok":true}""".getBytes(UTF_8))
      val err = intercept[java.io.IOException](s.putAll(kvs))
      val msg = err.getMessage
      assert(msg.startsWith("PutAll failed for some requests:"), msg)
      assert(msg.contains("error = boom"), msg)
      assert(msg.linesIterator.count(_.startsWith("id = ")) == SinkOps.maxBulkErrorReasons, msg)
      assert(msg.contains("(omitted 2 more errors)"), msg)
      // non-poison items in the batch still landed (per-item semantics)
      assert(s.get("good").isDefined)
    }
  }
}
