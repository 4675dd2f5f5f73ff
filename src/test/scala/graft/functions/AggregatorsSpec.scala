package graft.functions

import graft.SparkSpec

case class Ev(k: String, ts: Long, seq: Long, v: String)

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("typed runningCount aggregator in groupByKey.agg") {
    val ds = Seq("a", "b", "a", "a").toDS()
    val got = ds.groupByKey(identity)
      .agg(Aggregators.runningCount[String].toColumn.name("n"))
      .collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 1L))
  }

  test("typed lastWriteWins aggregator picks max (ts, tiebreak) per key") {
    val ds = Seq(
      Ev("u1", 10, 0, "old"), Ev("u1", 20, 0, "new"), Ev("u1", 20, 1, "newer"),
      Ev("u2", 5, 0, "only")).toDS()
    val lww = new Aggregators.LastWriteWins[Ev](e => (e.ts, e.seq))
    val got = ds.groupByKey(_.k).agg(lww.toColumn.name("latest"))
      .collect().toMap
    assert(got("u1").v == "newer")
    assert(got("u2").v == "only")
  }

  test("runningCountWithTTL behaves like runningCount while keys are live") {
    // NOTE: with ProcessingTimeTimeout registered, the engine keeps
    // planning timeout-check batches, so processAllAvailable() never
    // settles — poll the sink with a deadline instead.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = graft.streaming.StatefulOps.runningCountWithTTL(in.toDS(), "1 hour")
      .writeStream.format("memory").queryName(s"ttl_${System.nanoTime()}")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    in.addData("x", "x", "y")
    in.addData("x")
    val deadline = System.currentTimeMillis() + 30000
    def counts(): Map[String, Long] = spark.table(q.name).as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    var m = counts()
    while (m != Map("x" -> 3L, "y" -> 1L) && System.currentTimeMillis() < deadline) {
      Thread.sleep(250); m = counts()
    }
    q.stop()
    assert(m == Map("x" -> 3L, "y" -> 1L))
  }
}
