package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.functions.VectorOps.{IvfIndex, IvfPqIndex}

/** Shared telemetry plumbing for the streaming index-maintenance loops:
  * the bounded driver-held occupancy log (one or two tuples per
  * micro-batch) and its DataFrame view. Subclasses supply the current
  * index's one-row occupancy summary; the per-tick pattern is the
  * reference's metrics tick — process the batch, then record the
  * gauges (`/root/reference/topic_processor.go:217-218`) — applied to
  * index health instead of lag.
  */
sealed abstract class IndexOccupancyLog {
  // (batch, action, cells, total, max_n, cv)
  protected final val log =
    scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long, Option[Double])]

  /** the current index's (cells, total, max_n, cv) row */
  protected def summaryHead(): Row

  protected final def record(batchId: Long, action: String): Option[Double] = {
    val r = summaryHead()
    val cv = if (r.isNullAt(3)) None else Some(r.getDouble(3))
    log += ((batchId, action, r.getLong(0), r.getLong(1), r.getLong(2), cv))
    cv
  }

  /** Telemetry so far: (batch, action, cells, total, max_n, cv), one
    * row per recorded cycle — `built` at construction, `appended` per
    * ingest (`replay_skipped` for a re-delivered batch id), plus the
    * subclass's trigger action. `cv` is null for an empty index (no
    * mean to normalize by).
    */
  final def occupancyLog(spark: SparkSession): DataFrame = synchronized {
    val rows = log.toSeq.map { case (b, a, c, t, m, cv) =>
      Row(b, a, c, t, m, cv.map(java.lang.Double.valueOf).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("batch", LongType, nullable = false),
        StructField("action", StringType, nullable = false),
        StructField("cells", LongType, nullable = false),
        StructField("total", LongType, nullable = false),
        StructField("max_n", LongType, nullable = false),
        StructField("cv", DoubleType, nullable = true))))
  }

  /** Ingest idempotence (the standard `foreachBatch` pattern):
    * `foreachBatch` is at-least-once, so after a failure + checkpoint
    * restart the last uncommitted micro-batch is RE-DELIVERED with its
    * original batch id. A replayed batch was already folded into the
    * index, so re-appending it would trip the fresh-id contract and
    * fail the query. `batchId ≤ lastBatch` (batch ids are monotone per
    * checkpoint) is the cheap replay SIGNAL, but not proof — a resumed
    * loop given a NEW checkpoint dir restarts batch ids at 0 over
    * genuinely fresh data — so a flagged batch is confirmed against
    * ground truth: one any-overlap probe of the batch's ids vs the
    * indexed ids (a true whole-batch replay overlaps; a sequence reset
    * doesn't, and ingests normally). Confirmed replays record
    * `replay_skipped` with the PREVIOUS cycle's gauges (the index was
    * not touched — no summary job for a no-op), and
    * [[IvfMaintainer.save]] persists the watermark next to the index
    * so the fast path survives the session boundary the save/load
    * story is about.
    */
  protected final var lastBatch: Long = Long.MinValue

  /** Copy-forward record for a no-op cycle: the last entry's gauges
    * under the new (batch, action) — the log is never empty (`built`
    * is recorded at construction).
    */
  protected final def recordUnchanged(batchId: Long, action: String): Unit = {
    val (_, _, c, t, m, cv) = log.last
    log += ((batchId, action, c, t, m, cv))
  }

  protected final def saveLastBatch(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq(lastBatch).toDF("last_batch")
      .write.mode("overwrite").parquet(s"$dir/maintainer")
  }
}

private[streaming] object IndexOccupancyLog {
  /** The persisted ingest watermark, or Long.MinValue when the dir was
    * saved by a bare index save() (no maintainer state — every batch id
    * is fresh).
    */
  def loadLastBatch(spark: SparkSession, dir: String): Long =
    try spark.read.parquet(s"$dir/maintainer").head().getLong(0)
    catch { case _: org.apache.spark.sql.AnalysisException => Long.MinValue }
}

/** Streaming IVF maintenance loop — the index-health sibling of the
  * batch lifecycle query (q218): a `foreachBatch` ingest appends each
  * arriving vector micro-batch to a live [[IvfIndex]] (assignment only,
  * no retrain — the ingest contract) and records the occupancy summary
  * per cycle, so distribution drift is VISIBLE in the telemetry stream
  * before probe cost degrades; when the recorded occupancy CV crosses
  * `cvTrigger`, the maintainer runs [[IvfIndex.rebalance]] in-loop and
  * records the restored state under the same batch id (or
  * `rebalance_noop` when the trigger fired but no cell exceeds
  * `maxOverFactor ×` the mean — repeated noops are the signal that the
  * trigger cannot be satisfied at this factor).
  *
  * Driver-held like the other maintainers ([[DedupGroupMaintainer]]):
  * the index state is a pair of cached frames whose blocks the
  * append/rebalance steps release as they are superseded, so block-
  * manager usage stays O(current index) across an unbounded stream.
  *
  * Contract inherited from [[IvfIndex.append]]: batch ids must be fresh
  * (never re-deliver a vector id) — EXCEPT a whole-batch replay of an
  * already-ingested micro-batch (same batch id), which foreachBatch's
  * at-least-once delivery produces after a restart and the maintainer
  * skips idempotently (see [[IndexOccupancyLog.lastBatch]]). A batch
  * with null/mismatched vectors still fails the streaming query loudly
  * rather than corrupting the index.
  */
final class IvfMaintainer(initial: IvfIndex, idCol: String, vecCol: String,
                          cvTrigger: Double = Double.PositiveInfinity,
                          maxOverFactor: Double = 1.5,
                          trainCap: Int = 2048,
                          resumeAfterBatch: Long = Long.MinValue)
    extends IndexOccupancyLog {
  require(cvTrigger > 0, s"cvTrigger must be positive, got $cvTrigger")

  private var idx = initial
  lastBatch = resumeAfterBatch

  protected def summaryHead(): Row = idx.occupancySummary.head()

  record(-1L, "built")

  /** Fold one micro-batch of (idCol, vecCol) rows into the index and
    * record its health; rebalance when the CV trigger fires. Pass as
    * the `foreachBatch` body: `(df, bid) => maintainer.ingest(bid, df)`.
    * A re-delivered batch id (at-least-once replay after restart) is a
    * telemetry-visible no-op — confirmed by id overlap, so a batch-id
    * sequence RESET over fresh data (new checkpoint dir) still ingests
    * (see [[IndexOccupancyLog.lastBatch]]).
    */
  def ingest(batchId: Long, batch: DataFrame): Unit = synchronized {
    if (batchId <= lastBatch &&
        idx.assigned.select("id")
          .join(batch.select(col(idCol).as("id")), "id").limit(1).count() > 0) {
      recordUnchanged(batchId, "replay_skipped"); return
    }
    idx = idx.append(batch, idCol, vecCol)
    lastBatch = math.max(lastBatch, batchId)
    val cv = record(batchId, "appended")
    if (cv.exists(_ > cvTrigger)) {
      val next = idx.rebalance(maxOverFactor, trainCap = trainCap)
      // rebalance returns the receiver unchanged when no cell exceeds
      // maxOverFactor × mean (CV can cross the trigger on many
      // near-empty cells) — the log must say so, not claim an action
      if (next ne idx) {
        idx = next
        record(batchId, "rebalanced")
      } else record(batchId, "rebalance_noop")
    }
  }

  /** Persist the maintainer's restartable state: the index
    * ([[IvfIndex.save]]) plus the ingest watermark, so a loop resumed
    * via [[IvfMaintainer.load]] also skips the micro-batch foreachBatch
    * replays after the restart instead of tripping the fresh-id
    * contract on rows it already ingested.
    */
  def save(dir: String): Unit = synchronized {
    idx.save(dir)
    saveLastBatch(idx.assigned.sparkSession, dir)
  }

  /** The live index (probe it between batches; don't close it — the
    * maintainer owns its lifecycle).
    */
  def index: IvfIndex = synchronized { idx }

  /** Release the index caches. */
  def close(): Unit = synchronized { idx.close() }
}

object IvfMaintainer {
  /** Resume a loop persisted by [[IvfMaintainer#save]]: the index
    * reloads ([[IvfIndex.load]] — integrity-validated) and the ingest
    * watermark restores, so the first post-restart micro-batch — which
    * foreachBatch re-delivers with its pre-crash batch id — is skipped
    * idempotently and the loop continues from fresh data. A dir saved
    * by a bare `index.save` (no maintainer marker) loads with an empty
    * watermark: every batch id is treated as fresh.
    */
  def load(spark: SparkSession, dir: String, idCol: String, vecCol: String,
           cvTrigger: Double = Double.PositiveInfinity,
           maxOverFactor: Double = 1.5, trainCap: Int = 2048): IvfMaintainer =
    new IvfMaintainer(IvfIndex.load(spark, dir), idCol, vecCol, cvTrigger,
      maxOverFactor, trainCap,
      resumeAfterBatch = IndexOccupancyLog.loadLastBatch(spark, dir))
}

/** [[IvfMaintainer]] for the quantized rung: [[IvfPqIndex]] absorbs
  * appends the same way (encode-only, books/centroids never retrain on
  * ingest) but has NO in-place rebalance — its per-cell residual books
  * are trained against the cell boundaries, so a re-split would
  * invalidate them ([[graft.functions.VectorOps.cellStatsOf]]). The
  * monitor therefore RECOMMENDS: when the occupancy CV crosses
  * `cvTrigger` it records `rebuild_recommended`, and the scheduled
  * maintenance job (which owns the raw corpus store) pays the rebuild
  * when it chooses — by calling [[rebuildFrom]] with the raw table, the
  * consumer seam for the recommendation (the reference's metrics tick
  * driving operator action, `topic_processor.go:217-232`, applied to
  * index lifecycle). Repeated recommendations under a flat CV are
  * themselves signal (the drift persists and appends keep piling into
  * hot cells).
  */
final class IvfPqMaintainer(initial: IvfPqIndex, idCol: String, vecCol: String,
                            cvTrigger: Double = Double.PositiveInfinity,
                            resumeAfterBatch: Long = Long.MinValue)
    extends IndexOccupancyLog {
  require(cvTrigger > 0, s"cvTrigger must be positive, got $cvTrigger")

  private var idx = initial
  lastBatch = resumeAfterBatch

  protected def summaryHead(): Row = idx.occupancySummary.head()

  record(-1L, "built")

  /** Fold one micro-batch into the index and record its health; log a
    * rebuild recommendation when the CV trigger fires. A re-delivered
    * batch id (at-least-once replay after restart) is a telemetry-
    * visible no-op, confirmed by id overlap like the plain-IVF loop.
    */
  def ingest(batchId: Long, batch: DataFrame): Unit = synchronized {
    if (batchId <= lastBatch &&
        idx.codes.select("id")
          .join(batch.select(col(idCol).as("id")), "id").limit(1).count() > 0) {
      recordUnchanged(batchId, "replay_skipped"); return
    }
    idx = idx.append(batch, idCol, vecCol)
    lastBatch = math.max(lastBatch, batchId)
    val cv = record(batchId, "appended")
    if (cv.exists(_ > cvTrigger)) record(batchId, "rebuild_recommended")
  }

  /** Execute a recommended rebuild: retrain the whole index — coarse
    * cells AND per-cell residual books — from `raw` (the corpus store
    * the scheduled job owns; it must contain every ingested id at the
    * index's dim, typically the table the appends were tee'd into).
    * The superseded index's caches release; the log records `rebuilt`
    * with the fresh occupancy, closing the drift → recommendation →
    * action loop that plain IVF closes in-loop with rebalance. Cell
    * count defaults to the current index's (pass `c` to re-size);
    * `trainCap` bounds Lloyd/book training to a stratified sample —
    * at 100 TB the rebuild's full-corpus cost is the one encode pass,
    * same as build.
    */
  def rebuildFrom(raw: DataFrame, c: Int = 0, ivfIters: Int = 1,
                  pqIters: Int = 2, trainCap: Int = 0): Unit = synchronized {
    val cells = if (c > 0) c else idx.coarse.count().toInt
    val next = IvfPqIndex.build(raw, idCol, vecCol, c = cells,
      m = idx.m, k = idx.k, ivfIters = ivfIters, pqIters = pqIters,
      trainCap = trainCap)
    idx.close()
    idx = next
    // clamp: a rebuild before any ingest (legal — the job chooses when)
    // logs under the `built` row's -1, not the Long.MinValue watermark
    record(math.max(lastBatch, -1L), "rebuilt")
  }

  /** Persist the maintainer's restartable state — like
    * [[IvfMaintainer#save]]: the index ([[IvfPqIndex.save]], codes
    * cell-partitioned + meta) plus the ingest watermark.
    */
  def save(dir: String): Unit = synchronized {
    idx.save(dir)
    saveLastBatch(idx.codes.sparkSession, dir)
  }

  def index: IvfPqIndex = synchronized { idx }

  def close(): Unit = synchronized { idx.close() }
}

object IvfPqMaintainer {
  /** Resume a loop persisted by [[IvfPqMaintainer#save]] — see
    * [[IvfMaintainer.load]]; `vectors` is the raw re-rank table
    * [[IvfPqIndex.load]] requires.
    */
  def load(spark: SparkSession, dir: String, vectors: DataFrame,
           idCol: String, vecCol: String,
           cvTrigger: Double = Double.PositiveInfinity): IvfPqMaintainer =
    new IvfPqMaintainer(
      IvfPqIndex.load(spark, dir, vectors, idCol, vecCol),
      idCol, vecCol, cvTrigger,
      resumeAfterBatch = IndexOccupancyLog.loadLastBatch(spark, dir))
}
