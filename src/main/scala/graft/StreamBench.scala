package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming-floor benchmark: the reference's design envelope is
  * >10,000 msg/s per instance at ~1 s latency (`README.md:16-17`).
  * Runs the KQ-6 streaming word-count (stateful running aggregation)
  * from a rate source and reports sustained rows/s + trigger latency.
  *
  * [[measure]] is the harness shared with the spec-owned floor
  * guardrail (StreamingSpec): the suite asserts the 10k design point
  * every run, so a real streaming regression cannot hide in box noise
  * between rounds, while the box-dependent headline (50k+ offered)
  * stays a bench number.
  *
  * Usage: runMain graft.StreamBench [rowsPerSec] [seconds]
  */
object StreamBench {

  /** Sustained throughput + trigger latencies of the stateful streaming
    * word-count at `rate` offered rows/s over `secs` seconds.
    * Returns (avg processedRowsPerSecond, max trigger ms, median
    * trigger ms) over steady-state triggers (first 3 dropped as
    * warmup).
    */
  def measure(spark: SparkSession, rate: Int, secs: Int): (Double, Long, Long) = {
    val words = spark.readStream.format("rate")
      .option("rowsPerSecond", rate.toString)
      .option("numPartitions", "8")
      .load()
      .select(concat(lit("word"), (col("value") % 1000)).as("word"))

    val counts = words.groupBy("word").count()

    val progress = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    val q = counts.writeStream
      .format("noop")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    val deadline = System.currentTimeMillis() + secs * 1000L
    while (System.currentTimeMillis() < deadline) {
      Thread.sleep(500)
      Option(q.lastProgress).foreach { p =>
        progress += ((p.processedRowsPerSecond,
          p.durationMs.getOrDefault("triggerExecution", 0L)))
      }
    }
    q.stop()

    val steady = progress.distinct.drop(3) // skip warmup triggers
    val tput = if (steady.nonEmpty) steady.map(_._1).sum / steady.size else 0.0
    val lat = if (steady.nonEmpty) steady.map(_._2).max else 0L
    val med = if (steady.nonEmpty) {
      val s = steady.map(_._2).sorted
      s(s.size / 2)
    } else 0L
    (tput, lat, med)
  }

  def main(args: Array[String]): Unit = {
    val rate = args.headOption.map(_.toInt).getOrElse(50000)
    val secs = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = graft.core.Graft.localSession("graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")

    val listener = new graft.metrics.GraftMetricsListener
    spark.streams.addListener(listener)

    val (tput, lat, med) = measure(spark, rate, secs)
    println(s"""{"metric":"stream_wordcount","rows_per_sec":${tput.round},"max_trigger_ms":$lat,"median_trigger_ms":$med,"offered_rps":$rate,"floor_rps":10000}""")
    spark.stop()
  }
}
