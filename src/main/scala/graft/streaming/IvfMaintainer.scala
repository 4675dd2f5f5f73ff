package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.functions.VectorOps.IvfIndex

/** Streaming IVF maintenance loop — the index-health sibling of the
  * batch lifecycle query (q218): a `foreachBatch` ingest appends each
  * arriving vector micro-batch to a live [[IvfIndex]] (assignment only,
  * no retrain — the ingest contract) and records the occupancy summary
  * per cycle, so distribution drift is VISIBLE in the telemetry stream
  * before probe cost degrades; when the recorded occupancy CV crosses
  * `cvTrigger`, the maintainer runs [[IvfIndex.rebalance]] in-loop and
  * records the restored state under the same batch id. This is the
  * reference's per-tick metrics pattern — process the batch, then
  * record the gauges (`/root/reference/topic_processor.go:217-218`) —
  * applied to index health instead of lag.
  *
  * Driver-held like the other maintainers ([[DedupGroupMaintainer]]):
  * the index state is a pair of cached frames whose blocks the
  * append/rebalance steps release as they are superseded, so block-
  * manager usage stays O(current index) across an unbounded stream. The
  * telemetry log is a bounded driver buffer (one or two tuples per
  * micro-batch).
  *
  * Contract inherited from [[IvfIndex.append]]: batch ids must be fresh
  * (never re-deliver a vector id), vectors non-null at the index dim.
  * A violating batch fails the streaming query loudly rather than
  * corrupting the index.
  */
final class IvfMaintainer(initial: IvfIndex, idCol: String, vecCol: String,
                          cvTrigger: Double = Double.PositiveInfinity,
                          maxOverFactor: Double = 1.5,
                          trainCap: Int = 2048) {
  require(cvTrigger > 0, s"cvTrigger must be positive, got $cvTrigger")

  private var idx = initial
  // (batch, action, cells, total, max_n, cv)
  private val log =
    scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long, Option[Double])]

  record(-1L, "built")

  private def record(batchId: Long, action: String): Option[Double] = {
    val r = idx.occupancySummary.head()
    val cv = if (r.isNullAt(3)) None else Some(r.getDouble(3))
    log += ((batchId, action, r.getLong(0), r.getLong(1), r.getLong(2), cv))
    cv
  }

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
      // near-empty cells) — the log must say so, not claim an action:
      // repeated `rebalance_noop` rows are the signal that the trigger
      // cannot be satisfied at this maxOverFactor
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

  /** Telemetry so far: (batch, action, cells, total, max_n, cv), one
    * row per recorded cycle — `built` at construction, `appended` per
    * ingest, `rebalanced` when the trigger fired. `cv` is null for an
    * empty index (no mean to normalize by).
    */
  def occupancyLog(spark: SparkSession): DataFrame = synchronized {
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

  /** Release the index caches. */
  def close(): Unit = synchronized { idx.close() }
}
