package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
    * ingest, plus the subclass's trigger action. `cv` is null for an
    * empty index (no mean to normalize by).
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
  * (never re-deliver a vector id), vectors non-null at the index dim.
  * A violating batch fails the streaming query loudly rather than
  * corrupting the index.
  */
final class IvfMaintainer(initial: IvfIndex, idCol: String, vecCol: String,
                          cvTrigger: Double = Double.PositiveInfinity,
                          maxOverFactor: Double = 1.5,
                          trainCap: Int = 2048) extends IndexOccupancyLog {
  require(cvTrigger > 0, s"cvTrigger must be positive, got $cvTrigger")

  private var idx = initial

  protected def summaryHead(): Row = idx.occupancySummary.head()

  record(-1L, "built")

  /** Fold one micro-batch of (idCol, vecCol) rows into the index and
    * record its health; rebalance when the CV trigger fires. Pass as
    * the `foreachBatch` body: `(df, bid) => maintainer.ingest(bid, df)`.
    */
  def ingest(batchId: Long, batch: DataFrame): Unit = synchronized {
    idx = idx.append(batch, idCol, vecCol)
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

  /** The live index (probe it between batches; don't close it — the
    * maintainer owns its lifecycle).
    */
  def index: IvfIndex = synchronized { idx }

  /** Release the index caches. */
  def close(): Unit = synchronized { idx.close() }
}

/** [[IvfMaintainer]] for the quantized rung: [[IvfPqIndex]] absorbs
  * appends the same way (encode-only, books/centroids never retrain on
  * ingest) but has NO in-place rebalance — its per-cell residual books
  * are trained against the cell boundaries, so a re-split would
  * invalidate them ([[graft.functions.VectorOps.cellStatsOf]]). The
  * monitor therefore RECOMMENDS: when the occupancy CV crosses
  * `cvTrigger` it records `rebuild_recommended`, and the scheduled
  * maintenance job (which owns the raw corpus store) decides when to
  * pay the rebuild — the same trigger arithmetic as the plain-IVF
  * loop, with the action routed to where the data lives at 100 TB.
  * Repeated recommendations under a flat CV are themselves signal (the
  * drift persists and appends keep piling into hot cells).
  */
final class IvfPqMaintainer(initial: IvfPqIndex, idCol: String, vecCol: String,
                            cvTrigger: Double = Double.PositiveInfinity)
    extends IndexOccupancyLog {
  require(cvTrigger > 0, s"cvTrigger must be positive, got $cvTrigger")

  private var idx = initial

  protected def summaryHead(): Row = idx.occupancySummary.head()

  record(-1L, "built")

  /** Fold one micro-batch into the index and record its health; log a
    * rebuild recommendation when the CV trigger fires.
    */
  def ingest(batchId: Long, batch: DataFrame): Unit = synchronized {
    idx = idx.append(batch, idCol, vecCol)
    val cv = record(batchId, "appended")
    if (cv.exists(_ > cvTrigger)) record(batchId, "rebuild_recommended")
  }

  def index: IvfPqIndex = synchronized { idx }

  def close(): Unit = synchronized { idx.close() }
}
