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
}
