package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TopicProcessorSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def msg(topic: String, k: String, v: String, off: Long) =
    Message(topic, 0, off, k.getBytes(UTF_8), v.getBytes(UTF_8),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))

  test("kasper-style topology: hello-world transform through the facade") {
    // the reference's producer example: value -> "Hello " + value
    // (examples/producer_example.go:33-38)
    val tp = new TopicProcessor(
      TopicProcessorConfig(
        name = s"hello-${System.nanoTime()}",
        inputTopics = Seq("hello")),
      in => {
        import in.sparkSession.implicits._
        in.map(m => OutMessage("world", m.key,
          ("Hello " + new String(m.value, UTF_8)).getBytes(UTF_8)))
      })

    assert(tp.config.groupId.startsWith("graft-topic-processor-hello-"))

    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val in = MemoryStream[Message]
    val q = tp.runWith(in.toDS()) { (batch, _) =>
      collected ++= batch.collect().map(r =>
        (new String(r.getAs[Array[Byte]]("key"), UTF_8),
          new String(r.getAs[Array[Byte]]("value"), UTF_8)))
    }
    in.addData(msg("hello", "k1", "alice", 0), msg("hello", "k2", "bob", 1))
    q.processAllAvailable()
    in.addData(msg("hello", "k3", "carol", 2))
    q.processAllAvailable()
    q.stop()

    assert(collected.toSet == Set(
      ("k1", "Hello alice"), ("k2", "Hello bob"), ("k3", "Hello carol")))
  }

  test("multi-topic fan-in with per-topic dispatch (KQ-12 + processor dispatch)") {
    // the reference's multi-topic example + topic dispatch
    // (examples/multiple_input_topics_example.go, topic_processor_test.go:84-92)
    val tp = new TopicProcessor(
      TopicProcessorConfig(
        name = s"fanin-${System.nanoTime()}",
        inputTopics = Seq("t1", "t2")),
      in => {
        import in.sparkSession.implicits._
        in.map { m =>
          val tag = if (m.topic == "t1") "one" else "two"
          OutMessage("out", m.key, s"$tag:${new String(m.value, UTF_8)}".getBytes(UTF_8))
        }
      })
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val in = MemoryStream[Message]
    val q = tp.runWith(in.toDS()) { (batch, _) =>
      seen ++= batch.collect().map(r => new String(r.getAs[Array[Byte]]("value"), UTF_8))
    }
    in.addData(msg("t1", "a", "x", 0), msg("t2", "b", "y", 0))
    q.processAllAvailable()
    q.stop()
    assert(seen.toSet == Set("one:x", "two:y"))
  }

  test("configured metrics provider receives counts from the running topology") {
    val prov = new graft.metrics.InProcessMetricsProvider("tp-metrics-test")
    val tp = new TopicProcessor(
      TopicProcessorConfig(
        name = s"metrics-${System.nanoTime()}",
        inputTopics = Seq("hello"),
        metricsProvider = prov),
      in => {
        import in.sparkSession.implicits._
        in.map(m => OutMessage("world", m.key, m.value))
      })
    val in = MemoryStream[Message]
    val q = tp.runWith(in.toDS()) { (batch, _) => batch.collect(); () }
    in.addData(msg("hello", "k", "v", 0), msg("hello", "k2", "v2", 1))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    spark.streams.removeListener(tp.listener)
    // listener events are async; totals land after the progress event drains
    org.scalatest.concurrent.Eventually.eventually(
      org.scalatest.concurrent.Eventually.timeout(org.scalatest.time.Span(10,
        org.scalatest.time.Seconds))) {
      assert(tp.listener.totalIncoming >= 2)
    }
    val text = prov.renderPrometheusText()
    assert(text.contains("incoming_message_count"))
    assert(text.contains("""job="tp-metrics-test""""))
  }

  test("per-processor listener counts only its own topology's progress (regression)") {
    // in-process counters must work with the DEFAULT (noop) provider, and
    // a sibling query in the session must not inflate them
    val tp = new TopicProcessor(
      TopicProcessorConfig(name = s"scoped-${System.nanoTime()}", inputTopics = Seq("hello")),
      in => { import in.sparkSession.implicits._; in.map(m => OutMessage("o", m.key, m.value)) })
    val in = MemoryStream[Message]
    val q = tp.runWith(in.toDS()) { (batch, _) => batch.collect(); () }
    // sibling query with many more rows
    val sibling = MemoryStream[String]
    val sq = sibling.toDS().writeStream.format("memory")
      .queryName(s"sibling_${System.nanoTime()}").start()
    sibling.addData((1 to 50).map(_.toString): _*)
    in.addData(msg("hello", "k", "v", 0), msg("hello", "k2", "v2", 1))
    q.processAllAvailable(); sq.processAllAvailable()
    q.stop(); sq.stop()
    spark.streams.removeListener(tp.listener)
    org.scalatest.concurrent.Eventually.eventually(
      org.scalatest.concurrent.Eventually.timeout(org.scalatest.time.Span(10,
        org.scalatest.time.Seconds))) {
      assert(tp.listener.totalIncoming >= 2, "default-provider counters must still work")
    }
    assert(tp.listener.totalIncoming < 50, "sibling query's 50 rows must not be absorbed")
  }

  test("checkpoint directory records committed epochs (offset-commit analog)") {
    val name = s"ckpt-${System.nanoTime()}"
    val tp = new TopicProcessor(
      TopicProcessorConfig(name = name, inputTopics = Seq("hello")),
      in => {
        import in.sparkSession.implicits._
        in.map(m => OutMessage("out", m.key, m.value))
      })
    val in = MemoryStream[Message]
    val q = tp.runWith(in.toDS()) { (_, _) => () }
    in.addData(msg("hello", "k", "v", 0))
    q.processAllAvailable()
    q.stop()
    assert(new java.io.File(s"${tp.config.checkpoint}/commits").list().nonEmpty)
  }
}
