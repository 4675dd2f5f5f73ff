package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Streaming co-occurrence maintenance over an arriving walk corpus —
  * the graph-embedding rail's ingest loop (the [[PostingsMaintainer]] /
  * [[IvfMaintainer]] pattern applied to skip-gram statistics): each
  * micro-batch of WHOLE walks folds into a maintained
  * (center, context, n) pair-count table, so the PPMI/embedding rebuild
  * ([[graft.ops.GraphOps.ppmiEmbedInt]]) always has fresh trainer input
  * without rescanning the walk history. Counts are additive, so the
  * maintained table equals a batch [[graft.ops.GraphOps.skipGramPairs]]
  * over everything ingested — the convergence claim StreamingSpec owns.
  *
  * State shape: ONE pair table, checkpoint-truncated per batch with the
  * superseded generation released ([[DedupGroupMaintainer]] discipline);
  * the per-batch merge is `unionAll + groupBy sum` — a compaction merge
  * keyed on the pair, the additive-IVM shape (q134/q187), never a
  * rescan of prior batches.
  *
  * Ingest contract: batches carry COMPLETE walks (every row of a
  * (start, walk) sequence in one batch — a split walk would lose its
  * cross-batch pairs), and walk start ids are fresh across the stream
  * EXCEPT a whole-batch foreachBatch replay, which is confirmed by
  * start-id overlap and skipped idempotently (`replay_skipped`
  * telemetry); partial overlap under a fresh batch id fails loudly.
  */
final class CooccurMaintainer(window: Int = 2) {
  require(window >= 1, s"window must be positive, got $window")

  // (batch, action, n_pairs, n_total)
  private val log =
    scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
  private var lastBatch: Long = Long.MinValue
  private var acc: Option[DataFrame] = None // (center, context, n)
  private var accStarts: Option[DataFrame] = None // (start) — replay probe

  log += ((-1L, "built", 0L, 0L))

  /** Fold one micro-batch of (start, walk, step, node) walk rows in.
    * Pass as the `foreachBatch` body.
    */
  def ingest(batchId: Long, walkBatch: DataFrame): Unit = synchronized {
    if (walkBatch.isEmpty) return
    val starts = walkBatch.select(col("start").cast("long").as("start")).distinct()
    val overlaps = accStarts.exists(_.join(starts, "start").limit(1).count() > 0)
    if (overlaps) {
      if (batchId <= lastBatch) {
        // a replay must be the WHOLE batch: a partially-overlapping
        // batch re-delivered under an old id would otherwise silently
        // drop its genuinely fresh walks (one anti-join limit-1 probe)
        val hasFresh = accStarts.exists(a =>
          starts.join(a, Seq("start"), "left_anti").limit(1).count() > 0)
        if (hasFresh) throw new IllegalArgumentException(
          s"batch $batchId re-delivered under an old id carries walk " +
            "starts never ingested - a replay must be byte-identical to " +
            "the original batch")
        val (_, _, p, t) = log.last
        log += ((batchId, "replay_skipped", p, t))
        return
      }
      throw new IllegalArgumentException(
        s"batch $batchId re-delivers already-ingested walk starts under a " +
          "fresh batch id - the ingest contract requires fresh start ids")
    }
    // cache the batch walks OURSELVES so the handle can be unpersisted
    // after the merge: skipGramPairs trackCaches its input (the
    // self-join needs it), and the shared registry must not be drained
    // from inside a maintainer (a caller's registered checkpoints would
    // become unrecoverable) — the entry self-prunes once storage drops
    val wb = walkBatch.cache()
    val batchPairs = graft.ops.GraphOps.skipGramPairs(wb, window)
    // LAZY checkpoint + the telemetry aggregate as its materializer:
    // one job does the compaction merge, the block write AND the
    // (n_pairs, n_total) gauges — the eager form paid a separate full
    // materialization job per ingest. The old generation's blocks are
    // still alive here (released below, after the gauges ran), so the
    // merge's lineage reads them safely.
    val merged = acc.map(_.unionAll(batchPairs)
        .groupBy("center", "context").agg(sum(col("n")).as("n")))
      .getOrElse(batchPairs)
      .localCheckpoint(false)
    // a failed materializing aggregate must release the partially
    // persisted new generation (PostingsMaintainer discipline)
    val s = try merged.agg(count(lit(1)).as("p"),
        coalesce(sum(col("n")), lit(0L)).as("t")).head()
      catch {
        case t: Throwable =>
          Dedup.releaseCheckpoint(merged); wb.unpersist(blocking = false)
          throw t
      }
    // second-checkpoint failure must release the first new generation
    // (PostingsMaintainer discipline — block-leak path only). allStarts
    // stays EAGER: its next consumer is a limit(1) probe, which would
    // materialize a lazy checkpoint only partially.
    val allStarts = try {
      accStarts.map(_.unionAll(starts).distinct())
        .getOrElse(starts).localCheckpoint(true)
    } catch {
      case t: Throwable => Dedup.releaseCheckpoint(merged); throw t
    }
    acc.foreach(Dedup.releaseCheckpoint)
    accStarts.foreach(Dedup.releaseCheckpoint)
    wb.unpersist(blocking = false)
    acc = Some(merged)
    accStarts = Some(allStarts)
    lastBatch = math.max(lastBatch, batchId)
    log += ((batchId, "appended", s.getLong(0), s.getLong(1)))
  }

  /** The maintained (center, context, n) table — equals a batch
    * skipGramPairs over everything ingested. Empty before any ingest.
    */
  def pairs(spark: SparkSession): DataFrame =
    acc.getOrElse(spark.emptyDataFrame
      .select(lit(0L).as("center"), lit(0L).as("context"), lit(0L).as("n"))
      .limit(0))

  /** Telemetry so far: (batch, action, n_pairs, n_total). */
  def telemetry(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    log.toSeq.toDF("batch", "action", "n_pairs", "n_total")
  }

  /** Release all state. */
  def close(): Unit = synchronized {
    acc.foreach(Dedup.releaseCheckpoint)
    accStarts.foreach(Dedup.releaseCheckpoint)
    acc = None; accStarts = None
  }
}
