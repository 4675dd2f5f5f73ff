package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import graft.metrics.{MetricsProvider, NoopMetricsProvider}

/** Elasticsearch-backed [[Store]] — the reference's ES connector
  * (`elasticsearch.go:35-215`) re-implemented on the public REST API
  * over the JDK HttpClient (Jackson rides in from Spark's classpath; no
  * new dependency). Documents live at `{index}/_doc/{key}`; values are
  * the UTF-8 JSON `_source` bytes, like the reference's `[]byte`.
  * Semantics preserved exactly:
  *
  *  - `get` → Get API; 404 or `found: false` → None
  *    (`elasticsearch.go:61-83`);
  *  - `getAll` → Multi-Get `_mget`, missing docs skipped
  *    (`elasticsearch.go:87-114`);
  *  - `put` → Index API (`elasticsearch.go:120-133`);
  *  - `putAll` → Bulk API; per-item failures summarize into ONE error
  *    with at most [[SinkOps.maxBulkErrorReasons]] `id = …, error = …`
  *    reasons and an `(omitted N more errors)` tail — the exact
  *    reference contract (`elasticsearch.go:196-215`);
  *  - `delete` → Delete API, 404 is a no-op (`elasticsearch.go:165-181`);
  *  - `flush` → `_flush?wait_if_ongoing=true` (`elasticsearch.go:185-193`);
  *  - per-call counters/summaries on the reference's metric names.
  *
  * `_source` round-trips through Jackson (parse → serialize), so values
  * compare as JSON, not as raw bytes — compact input round-trips
  * byte-identically. Executor-side use: one instance per partition.
  */
final class ElasticsearchStore(baseUrl: String, index: String,
                               metrics: MetricsProvider = NoopMetricsProvider,
                               processorName: String = "graft")
    extends Store[Array[Byte]] {

  private val http = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()
  private val base = baseUrl.stripSuffix("/")

  private val labels = Seq(processorName, index, "_doc")
  private val labelNames = Seq("topicProcessor", "index", "type")
  private val getCounter =
    metrics.newCounter("Elasticsearch_Get", "Number of Get() calls", labelNames: _*)
  private val getAllSummary =
    metrics.newSummary("Elasticsearch_GetAll", "Summary of GetAll() calls", labelNames: _*)
  private val putCounter =
    metrics.newCounter("Elasticsearch_Put", "Number of Put() calls", labelNames: _*)
  private val putAllSummary =
    metrics.newSummary("Elasticsearch_PutAll", "Summary of PutAll() calls", labelNames: _*)
  private val deleteCounter =
    metrics.newCounter("Elasticsearch_Delete", "Number of Delete() calls", labelNames: _*)
  private val flushCounter =
    metrics.newCounter("Elasticsearch_Flush", "Number of Flush() calls", labelNames: _*)

  private def request(method: String, path: String,
                      body: Option[Array[Byte]] = None,
                      contentType: String = "application/json"):
      HttpResponse[Array[Byte]] = {
    val builder = HttpRequest.newBuilder(URI.create(s"$base$path"))
    val withBody = body match {
      case Some(bytes) => builder
        .header("Content-Type", contentType)
        .method(method, HttpRequest.BodyPublishers.ofByteArray(bytes))
      case None => builder.method(method, HttpRequest.BodyPublishers.noBody())
    }
    http.send(withBody.build(), HttpResponse.BodyHandlers.ofByteArray())
  }

  private def fail(what: String, r: HttpResponse[Array[Byte]]): Nothing =
    throw new java.io.IOException(
      s"elasticsearch: $what failed with ${r.statusCode()}: " +
        new String(r.body(), UTF_8).take(500))

  private def enc(key: String): String =
    java.net.URLEncoder.encode(key, UTF_8).replace("+", "%20")

  override def get(key: String): Option[Array[Byte]] = {
    getCounter.inc(labels: _*)
    val r = request("GET", s"/$index/_doc/${enc(key)}")
    if (r.statusCode() == 404) None
    else if (r.statusCode() != 200) fail("Get", r)
    else {
      val node = mapper.readTree(r.body())
      // a found doc with _source disabled/filtered has no payload —
      // treat as absent rather than returning the JSON literal "null"
      val src = node.get("_source")
      if (!node.path("found").asBoolean(false) || src == null || src.isNull) None
      else Some(mapper.writeValueAsBytes(src))
    }
  }

  override def getAll(keys: Seq[String]): Map[String, Array[Byte]] = {
    getAllSummary.observe(keys.size.toDouble, labels: _*)
    if (keys.isEmpty) Map.empty
    else {
      val body = mapper.createObjectNode()
      val ids = body.putArray("ids")
      keys.foreach(ids.add)
      val r = request("POST", s"/$index/_mget",
        Some(mapper.writeValueAsBytes(body)))
      if (r.statusCode() != 200) fail("GetAll", r)
      val docs = mapper.readTree(r.body()).path("docs")
      keys.indices.flatMap { i =>
        val d = docs.path(i)
        val src = d.get("_source")
        if (d.path("found").asBoolean(false) && src != null && !src.isNull)
          Some(keys(i) -> mapper.writeValueAsBytes(src))
        else None
      }.toMap
    }
  }

  override def put(key: String, value: Array[Byte]): Unit = {
    putCounter.inc(labels: _*)
    val r = request("PUT", s"/$index/_doc/${enc(key)}", Some(value))
    if (r.statusCode() / 100 != 2) fail("Put", r)
  }

  override def putAll(kvs: Map[String, Array[Byte]]): Unit = {
    putAllSummary.observe(kvs.size.toDouble, labels: _*)
    if (kvs.isEmpty) return
    val nd = new java.io.ByteArrayOutputStream()
    kvs.foreach { case (k, v) =>
      val action = mapper.createObjectNode()
      action.putObject("index").put("_index", index).put("_id", k)
      nd.write(mapper.writeValueAsBytes(action)); nd.write('\n')
      nd.write(v); nd.write('\n')
    }
    val r = request("POST", "/_bulk", Some(nd.toByteArray),
      contentType = "application/x-ndjson")
    if (r.statusCode() != 200) fail("PutAll", r)
    val resp = mapper.readTree(r.body())
    if (resp.path("errors").asBoolean(false)) {
      // the reference's bounded error summarization
      // (`elasticsearch.go:196-215`)
      val items = resp.path("items")
      val failed = (0 until items.size()).map(items.get)
        .map(_.path("index"))
        .filter(i => !i.path("error").isMissingNode && !i.path("error").isNull)
      val reasons = failed.take(SinkOps.maxBulkErrorReasons).map { i =>
        s"id = ${i.path("_id").asText()}, error = ${i.path("error").path("reason").asText()}\n"
      } ++ (if (failed.size > SinkOps.maxBulkErrorReasons)
        Seq(s"(omitted ${failed.size - SinkOps.maxBulkErrorReasons} more errors)")
      else Nil)
      throw new java.io.IOException(
        s"PutAll failed for some requests:\n${reasons.mkString}")
    }
  }

  override def delete(key: String): Unit = {
    deleteCounter.inc(labels: _*)
    val r = request("DELETE", s"/$index/_doc/${enc(key)}")
    // absent key is a no-op, like the reference's 404 swallow
    if (r.statusCode() != 404 && r.statusCode() / 100 != 2) fail("Delete", r)
  }

  override def flush(): Unit = {
    flushCounter.inc(labels: _*)
    val r = request("POST", "/_flush?wait_if_ongoing=true")
    if (r.statusCode() / 100 != 2) fail("Flush", r)
  }

  private[streaming] def rawRequest(method: String, path: String,
                                    body: Option[Array[Byte]],
                                    contentType: String):
      HttpResponse[Array[Byte]] = request(method, path, body, contentType)
}

/** Multitenant Elasticsearch store — the reference's
  * `multi_elasticsearch.go:48-160`: a tenancy function maps each tenant
  * to its own index (the reference's `ElasticsearchTenancy`; default
  * `graft~{tenant}`, the documented example shape), tenant sub-stores
  * are memoized [[ElasticsearchStore]]s, and [[fetch]]/[[push]] run ONE
  * cross-index `_mget` / `_bulk` each (summaries on the reference
  * metric names MultiElasticsearch_Fetch / MultiElasticsearch_Push;
  * bulk failures keep the bounded error-summarization contract).
  * `allTenants` lists tenants seen by [[tenant]] calls, sorted.
  */
final class MultiElasticsearchStore(baseUrl: String,
                                    indexForTenant: String => String = t => s"graft~$t",
                                    metrics: MetricsProvider = NoopMetricsProvider,
                                    processorName: String = "graft")
    extends MultiStore[Array[Byte]] {

  private val mapper = new ObjectMapper()
  private val stores = scala.collection.concurrent.TrieMap.empty[String, ElasticsearchStore]
  private val labels = Seq(processorName, indexForTenant("tenant"))
  private val labelNames = Seq("topicProcessor", "indexAndType")
  private val fetchSummary = metrics.newSummary(
    "MultiElasticsearch_Fetch", "Summary of Fetch() calls", labelNames: _*)
  private val pushSummary = metrics.newSummary(
    "MultiElasticsearch_Push", "Summary of Push() calls", labelNames: _*)

  override def tenant(t: String): Store[Array[Byte]] =
    stores.getOrElseUpdate(t,
      new ElasticsearchStore(baseUrl, indexForTenant(t), metrics, processorName))

  override def allTenants: Seq[String] = stores.keys.toSeq.sorted

  // Cross-index _mget/_bulk transport: a private store NOT registered in
  // `stores`, so a fetch()/push() before any tenant() call can't pollute
  // allTenants with a phantom tenant (its index name never reaches a
  // request path — rawRequest paths are absolute).
  private lazy val crossStore =
    new ElasticsearchStore(baseUrl, indexForTenant("_cross"),
      NoopMetricsProvider, processorName)

  private def anyStore: ElasticsearchStore = crossStore

  override def fetch(keys: Seq[(String, String)]): Map[(String, String), Array[Byte]] = {
    fetchSummary.observe(keys.size.toDouble, labels: _*)
    if (keys.isEmpty) Map.empty
    else {
      val body = mapper.createObjectNode()
      val docs = body.putArray("docs")
      keys.foreach { case (t, k) =>
        docs.addObject().put("_index", indexForTenant(t)).put("_id", k)
      }
      val r = anyStore.rawRequest("POST", "/_mget",
        Some(mapper.writeValueAsBytes(body)), "application/json")
      if (r.statusCode() != 200)
        throw new java.io.IOException(
          s"elasticsearch: Fetch failed with ${r.statusCode()}")
      val got = mapper.readTree(r.body()).path("docs")
      keys.indices.flatMap { i =>
        val d = got.path(i)
        val src = d.get("_source")
        if (d.path("found").asBoolean(false) && src != null && !src.isNull)
          Some(keys(i) -> mapper.writeValueAsBytes(src))
        else None
      }.toMap
    }
  }

  override def push(entries: Map[(String, String), Array[Byte]]): Unit = {
    pushSummary.observe(entries.size.toDouble, labels: _*)
    if (entries.isEmpty) return
    val nd = new java.io.ByteArrayOutputStream()
    entries.foreach { case ((t, k), v) =>
      val action = mapper.createObjectNode()
      action.putObject("index").put("_index", indexForTenant(t)).put("_id", k)
      nd.write(mapper.writeValueAsBytes(action)); nd.write('\n')
      nd.write(v); nd.write('\n')
    }
    val r = anyStore.rawRequest("POST", "/_bulk", Some(nd.toByteArray),
      "application/x-ndjson")
    if (r.statusCode() != 200)
      throw new java.io.IOException(
        s"elasticsearch: Push failed with ${r.statusCode()}")
    val resp = mapper.readTree(r.body())
    if (resp.path("errors").asBoolean(false)) {
      val items = resp.path("items")
      val failed = (0 until items.size()).map(items.get)
        .map(_.path("index"))
        .filter(i => !i.path("error").isMissingNode && !i.path("error").isNull)
      val reasons = failed.take(SinkOps.maxBulkErrorReasons).map { i =>
        s"id = ${i.path("_id").asText()}, error = ${i.path("error").path("reason").asText()}\n"
      } ++ (if (failed.size > SinkOps.maxBulkErrorReasons)
        Seq(s"(omitted ${failed.size - SinkOps.maxBulkErrorReasons} more errors)")
      else Nil)
      throw new java.io.IOException(
        s"PutAll failed for some requests:\n${reasons.mkString}")
    }
  }
}
