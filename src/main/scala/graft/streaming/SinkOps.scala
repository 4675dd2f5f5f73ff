package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink helpers reproducing kasper's delivery contract.
  *
  * Reference protocol (`topic_processor.go:240-263`): process batch →
  * synchronous acked produce → only then commit offsets; a crash between
  * produce and commit replays the batch (at-least-once,
  * `README.md:18-19`). Spark's `foreachBatch` + checkpoint gives the
  * identical ordering: the batch function runs to completion before the
  * epoch is committed to the checkpoint, and a restart replays the last
  * uncommitted batch.
  */
object SinkOps {

  /** At-least-once micro-batch sink: `write` plays the role of the
    * buffered producer flush (`sender.go:34-51`); the checkpoint commit
    * after it is kasper's `markOffsets`. `batchWait` mirrors
    * `BatchWaitDuration` (default 5 s, `config.go:43-45`).
    */
  def atLeastOnce[T](ds: Dataset[T], checkpoint: String,
                     batchWait: String = "5 seconds")
                    (write: (Dataset[T], Long) => Unit): DataStreamWriter[T] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(batchWait))
      .foreachBatch { (batch: Dataset[T], epochId: Long) =>
        write(batch, epochId)
      }

  /** Parquet-append flavor — the batch analog of the Kafka producer sink;
    * idempotent per epoch only if the writer partitions by epoch.
    */
  def toParquet(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    atLeastOnce(df, checkpoint) { (batch, _) =>
      batch.write.mode("append").parquet(path)
    }

  /** Replay-safe (effectively-once) parquet sink: each epoch writes into
    * its own partition directory with dynamic partition overwrite, so a
    * replayed epoch (crash between write and checkpoint commit — the
    * duplicate window of the reference's at-least-once protocol,
    * `README.md:18-19`) overwrites itself instead of appending
    * duplicates. Upgrade over kasper, for free from Spark's epoch ids.
    */
  def toParquetIdempotent(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    atLeastOnce(df, checkpoint) { (batch, epochId) =>
      batch.withColumn("__epoch", org.apache.spark.sql.functions.lit(epochId))
        .write.mode("overwrite")
        // writer-scoped dynamic overwrite: only this epoch's partition is
        // replaced, and other writers in the session keep their static
        // overwrite semantics (a session-wide conf.set here would change
        // them permanently)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__epoch").parquet(path)
    }

  /** Drain helper standing in for kasper's `HasConsumedAllMessages`
    * (`topic_processor.go:166-175`) — used by tests to run a stream dry
    * deterministically.
    */
  def runToCompletion(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
  }

  /** Per-record bulk write with the reference's error-summarization
    * contract (`elasticsearch.go:199-215`): every record is attempted,
    * failures are aggregated, and the batch fails with at most
    * [[maxBulkErrorReasons]] `id = …, error = …` reasons plus an
    * `(omitted N more errors)` tail — so one poison batch produces one
    * bounded, actionable error (and the at-least-once replay window)
    * instead of a log flood or a half-written batch passing silently.
    *
    * Failure counts are aggregated distributed (per partition, reduced
    * at the driver); only the capped reason strings travel back.
    */
  def bulkWrite[T](ds: Dataset[T], id: T => String)(write: T => Unit): Unit = {
    import ds.sparkSession.implicits._
    val perPartition = ds.mapPartitions { it =>
      var ok = 0L
      var failed = 0L
      val reasons = scala.collection.mutable.ArrayBuffer.empty[String]
      it.foreach { r =>
        try { write(r); ok += 1 }
        catch {
          case e: Exception =>
            failed += 1
            if (reasons.size < maxBulkErrorReasons)
              reasons += s"id = ${id(r)}, error = ${e.getMessage}"
        }
      }
      Iterator((ok, failed, reasons.toSeq))
    }.collect()
    val failed = perPartition.map(_._2).sum
    if (failed > 0) {
      val reasons = perPartition.flatMap(_._3).take(maxBulkErrorReasons)
      val tail =
        if (failed > reasons.length) s"(omitted ${failed - reasons.length} more errors)\n"
        else ""
      throw new RuntimeException(
        s"bulkWrite failed for $failed requests:\n${reasons.mkString("", "\n", "\n")}$tail")
    }
  }

  /** `maxBulkErrorReasons` (`elasticsearch.go:11`). */
  val maxBulkErrorReasons = 5
}
