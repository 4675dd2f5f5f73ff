package graft.metrics

import graft.SparkSpec
import org.apache.spark.sql.streaming.ProgressTestShim

/** A8/A16: the lag gauge must understand every offset shape Spark sources
  * report — the round-1 gap was Kafka's JSON offset maps parsing as
  * "not a number" and the flagship lag metric never firing. Kafka itself
  * is absent from the CI image, so the end-to-end path is driven with
  * synthetic progress events of exactly the Kafka shape (offsets as
  * `{"topic":{"partition":offset}}` JSON maps).
  */
class MetricsSpec extends SparkSpec {

  test("parseOffsets: numerals, Kafka JSON maps, file-source logOffset") {
    import GraftMetricsListener.parseOffsets
    assert(parseOffsets("42") == Some(Map("" -> 42L)))
    assert(parseOffsets("""{"events":{"0":123,"1":456}}""") ==
      Some(Map("events-0" -> 123L, "events-1" -> 456L)))
    assert(parseOffsets("""{"orders":{"0":5},"events":{"2":7}}""") ==
      Some(Map("orders-0" -> 5L, "events-2" -> 7L)))
    assert(parseOffsets("""{"logOffset":2}""") == Some(Map("logOffset" -> 2L)))
    assert(parseOffsets("not an offset") == None)
    assert(parseOffsets("""{"a":"b"}""") == None)
  }

  test("Kafka-shaped progress events drive a nonzero lag that drains to zero (A8)") {
    val listener = new GraftMetricsListener
    val desc = "KafkaV2[Subscribe[events]]"

    // behind the high-water mark: consumed to 90/50, broker at 100/50
    listener.onQueryProgress(ProgressTestShim.event(ProgressTestShim.progress(
      ProgressTestShim.source(desc,
        startOffset = """{"events":{"0":80,"1":40}}""",
        endOffset = """{"events":{"0":90,"1":50}}""",
        latestOffset = """{"events":{"0":100,"1":50}}""",
        numInputRows = 20L), outputRows = 20L)))
    assert(listener.lagFor(desc) == Some(10L))
    assert(listener.lagByPartition(desc) ==
      Some(Map("events-0" -> 10L, "events-1" -> 0L)))
    assert(listener.totalIncoming == 20L)

    // caught up: lag drains to zero
    listener.onQueryProgress(ProgressTestShim.event(ProgressTestShim.progress(
      ProgressTestShim.source(desc,
        startOffset = """{"events":{"0":90,"1":50}}""",
        endOffset = """{"events":{"0":100,"1":50}}""",
        latestOffset = """{"events":{"0":100,"1":50}}""",
        numInputRows = 10L), outputRows = 10L)))
    assert(listener.lagFor(desc) == Some(0L))
    assert(listener.lagByPartition(desc) ==
      Some(Map("events-0" -> 0L, "events-1" -> 0L)))
  }

  test("numeric-offset sources (rate-style) still feed the gauge") {
    val listener = new GraftMetricsListener
    val desc = "RateStreamV2[rowsPerSecond=10]"
    listener.onQueryProgress(ProgressTestShim.event(ProgressTestShim.progress(
      ProgressTestShim.source(desc, "0", "5", "8", 5L), outputRows = 5L)))
    assert(listener.lagFor(desc) == Some(3L))
  }

  test("pluggable provider receives the reference's three signature metrics") {
    val prov = new InProcessMetricsProvider("graft-test-0")
    val listener = new GraftMetricsListener(prov)
    val desc = "KafkaV2[Subscribe[events]]"
    listener.onQueryProgress(ProgressTestShim.event(ProgressTestShim.progress(
      ProgressTestShim.source(desc,
        startOffset = """{"events":{"0":80}}""",
        endOffset = """{"events":{"0":90}}""",
        latestOffset = """{"events":{"0":100}}""",
        numInputRows = 10L), outputRows = 7L)))
    assert(prov.counterValue("incoming_message_count", desc) == Some(10.0))
    assert(prov.counterValue("outgoing_message_count", "TestSink") == Some(7.0))
    assert(prov.gaugeValue("messages_behind_high_water_mark_count", desc, "events-0")
      == Some(10.0))
    val text = prov.renderPrometheusText()
    assert(text.contains("# TYPE incoming_message_count counter"))
    assert(text.contains("# TYPE messages_behind_high_water_mark_count gauge"))
    assert(text.contains("""job="graft-test-0""""))
    assert(text.contains("""topic_partition="events-0",job="graft-test-0"} 10.0"""))
  }

  test("provider instruments: counter accumulates, gauge overwrites, summary folds") {
    val prov = new InProcessMetricsProvider("t")
    val c = prov.newCounter("c", "h", "l")
    c.inc("x"); c.add(2.5, "x"); c.inc("y")
    assert(prov.counterValue("c", "x") == Some(3.5))
    assert(prov.counterValue("c", "y") == Some(1.0))
    val g = prov.newGauge("g", "h")
    g.set(5.0); g.set(2.0)
    assert(prov.gaugeValue("g") == Some(2.0))
    val s = prov.newSummary("s", "h")
    s.observe(1.0); s.observe(3.0)
    assert(prov.summaryStats("s") == Some((2L, 4.0, 1.0, 3.0)))
    val text = prov.renderPrometheusText()
    assert(text.contains("s_count{job=\"t\"} 2") && text.contains("s_sum{job=\"t\"} 4.0"))
  }

  test("PrometheusExporter serves the live text exposition over HTTP") {
    val prov = new InProcessMetricsProvider("exp")
    val c = prov.newCounter("msgs_total", "messages", "topic")
    c.add(3.0, "words")
    val exporter = new PrometheusExporter(prov).start()
    try {
      def scrape(): (Int, String, String) = {
        val url = new java.net.URL(s"http://127.0.0.1:${exporter.boundPort}/metrics")
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val body = scala.io.Source.fromInputStream(conn.getInputStream).mkString
        (code, body, conn.getContentType)
      }
      val (code, body, ctype) = scrape()
      assert(code == 200 && ctype.startsWith("text/plain"))
      assert(body.contains("# TYPE msgs_total counter"), body)
      assert(body.contains("msgs_total{topic=\"words\",job=\"exp\"} 3.0"), body)
      // the endpoint is LIVE — a later increment shows on the next scrape
      c.add(2.0, "words")
      assert(scrape()._2.contains("msgs_total{topic=\"words\",job=\"exp\"} 5.0"))
      // non-GET is rejected
      val conn2 = new java.net.URL(s"http://127.0.0.1:${exporter.boundPort}/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn2.setRequestMethod("POST"); conn2.setDoOutput(true)
      conn2.getOutputStream.write(Array[Byte]())
      assert(conn2.getResponseCode == 405)
    } finally exporter.stop()
    exporter.stop() // idempotent
  }

  test("sources without latestOffset (file, memory) leave the gauge unset, not wrong") {
    val listener = new GraftMetricsListener
    val desc = "FileStreamSource[file:/tmp/x]"
    listener.onQueryProgress(ProgressTestShim.event(ProgressTestShim.progress(
      ProgressTestShim.source(desc, """{"logOffset":0}""", """{"logOffset":1}""",
        null, 3L), outputRows = 3L)))
    assert(listener.lagFor(desc) == None)
    assert(listener.totalIncoming == 3L)
  }
}
