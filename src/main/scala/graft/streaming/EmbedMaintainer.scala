package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VectorOps
import graft.ops.{GraphOps, ScaleOps}

/** Embedding-table maintenance — the rung that closes walks → skip-gram
  * pairs → PPMI embeddings → ANN index as ONE maintained chain: a
  * [[CooccurMaintainer]] folds arriving walk micro-batches into
  * skip-gram counts, and this maintainer's [[rebuildFrom]] hook
  * re-derives the integer embedding table
  * ([[graft.ops.GraphOps.ppmiEmbedInt]]) and its IVF index from the
  * maintained pair table. Embeddings are a GLOBAL factorization — a new
  * pair shifts every node's PPMI row, so the rebuild IS the increment
  * (the [[IvfPqMaintainer.rebuildFrom]] posture, not the
  * [[PostingsMaintainer]] additive fold); the maintained pair table is
  * what makes it cheap: the trainer input is always the compacted
  * (center, context, n) aggregate, never a rescan of walk history.
  *
  * `withMips = true` additionally maintains a
  * [[graft.functions.VectorOps.MipsIndex]] generation over the SAME
  * pivoted vectors (one extra bounded max-norm job + one extra build
  * per rebuild) so the dot-serving rail (q252's metric) has the same
  * maintained-rebuild story as the cosine rail — [[searchDot]] serves
  * it, and [[mipsTelemetry]] logs its lifecycle with an exact integer
  * max-squared-norm gauge (µ²-units over the integer table — the exact
  * shadow of the float reduction constant M², which itself stays a
  * serving constant, not a gauge).
  *
  * Telemetry gauges are exact integers (node count, the µ-unit value
  * checksum, indexed-vector count): [[graft.ops.GraphOps.ppmiEmbedInt]]
  * is partition-invariant 64-bit arithmetic, so — like q251/q260 — the
  * whole lifecycle log hash-checks against a cumulative-slice SQL
  * oracle, even though the IVF cell layout under it (float k-means)
  * does not.
  *
  * Restart story: [[save]] persists the embedding table
  * ([[graft.ops.GraphOps.saveEmbeddings]]'s dim-partitioned layout),
  * the IVF index ([[graft.functions.VectorOps.IvfIndex.save]]), the
  * MIPS index when maintained (marker-gated
  * [[graft.functions.VectorOps.MipsIndex.save]] — a reload refuses a
  * dir whose mips_index was swapped for a plain cosine layout), and the
  * rebuild watermark; [[EmbedMaintainer.load]] restores all of them, so
  * a re-delivered rebuild trigger after restart (foreachBatch
  * at-least-once) is skipped idempotently (`replay_skipped`).
  *
  * Each rebuild releases the PPMI trainer's interior tracked frames via
  * [[graft.ops.ScaleOps.scoped]] once the new generation is
  * materialized — a long-lived per-cycle cadence stays O(current
  * generation) resident without the caller interleaving global
  * `ScaleOps.release()` calls between cycles.
  *
  * Reference tie: kasper's metrics-tick-drives-action loop
  * (`/root/reference/topic_processor.go:217-232`) applied to embedding
  * lifecycle, like the IVF/postings monitors.
  */
final class EmbedMaintainer(dims: Int = 8, iters: Int = 2, cells: Int = 8,
                            withMips: Boolean = false,
                            resumeAfterBatch: Long = Long.MinValue) {
  require(dims >= 1 && dims <= 64, s"dims must be in [1, 64], got $dims")
  require(cells >= 1, s"cells must be positive, got $cells")

  // (batch, action, n_nodes, sum_val, n_indexed)
  private val log =
    scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long)]
  // (batch, action, n_nodes, max_sq_norm, n_indexed) — MIPS generation
  private val mipsLog =
    scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long)]
  private var lastBatch: Long = resumeAfterBatch
  private var emb: Option[DataFrame] = None // (id, dim, val) checkpointed
  private var idx: Option[VectorOps.IvfIndex] = None
  private var mipsIdx: Option[VectorOps.MipsIndex] = None

  log += ((-1L, "built", 0L, 0L, 0L))
  if (withMips) mipsLog += ((-1L, "built", 0L, 0L, 0L))

  private[streaming] def restoreState(e: DataFrame,
                                      index: VectorOps.IvfIndex,
                                      mips: Option[VectorOps.MipsIndex]): Unit =
    synchronized {
      // LAZY checkpoint with the gauge aggregate as its materializer —
      // one job instead of an eager-checkpoint job plus a gauge job.
      // Gauge BEFORE assigning state: a failed gauge job must release
      // the (possibly partially persisted) checkpoint (clearCache never
      // frees localCheckpoint blocks — an orphaned ck would leak for
      // the session's remainder) and leave the maintainer untouched
      val ck = e.localCheckpoint(false)
      val s =
        try gauges(ck)
        catch { case t: Throwable => Dedup.releaseCheckpoint(ck); throw t }
      emb = Some(ck)
      idx = Some(index)
      mipsIdx = mips
      log += ((lastBatch, "loaded", s._1, s._2, index.size))
      mips.foreach(m =>
        mipsLog += ((lastBatch, "loaded", s._1, s._3, m.inner.size)))
    }

  /** (n_nodes, sum_val, max_sq_norm) in ONE pass over the embedding
    * table: per-id partials (Σ val, Σ val²) then a bounded 1-row fold —
    * node count = the group count, the µ-unit checksum = Σ of the
    * per-id sums, and max per-id Σ val² is the exact µ²-unit integer
    * shadow of the MIPS reduction constant (val ≤ 10⁶ and dims ≤ 64,
    * so Σ val² ≤ 6.4×10¹³: comfortable i64 headroom).
    */
  /** Test seam: makes the NEXT gauge job throw, so the gauge-failure
    * release discipline in [[rebuildFrom]]/[[restoreState]] is testable
    * (the gauge aggregate cannot be made to fail from outside — it runs
    * over a frame this maintainer derives itself).
    */
  private[streaming] var failNextGauge = false

  private def gauges(e: DataFrame): (Long, Long, Long) = {
    if (failNextGauge) {
      failNextGauge = false
      throw new RuntimeException("injected gauge failure (test seam)")
    }
    val per = e.groupBy("id").agg(sum(col("val")).as("sv"),
      sum(col("val") * col("val")).as("sq"))
    val r = per.agg(count(lit(1)).as("n"),
      coalesce(sum(col("sv")), lit(0L)).as("s"),
      coalesce(max(col("sq")), lit(0L)).as("m")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Re-derive embeddings + index(es) from `src`'s maintained pair
    * table. Call after each [[CooccurMaintainer.ingest]] cycle (or on a
    * slower scheduled cadence — the pair table keeps absorbing batches
    * either way; a rebuild always trains on everything ingested so
    * far). A re-delivered trigger (batchId ≤ the watermark) is a
    * telemetry-visible no-op like the other maintainers' replays.
    */
  def rebuildFrom(src: CooccurMaintainer, batchId: Long,
                  spark: SparkSession): Unit = synchronized {
    if (batchId <= lastBatch) {
      val (_, _, n, sv, ni) = log.last
      log += ((batchId, "replay_skipped", n, sv, ni))
      if (withMips) {
        val (_, _, mn, msq, mni) = mipsLog.last
        mipsLog += ((batchId, "replay_skipped", mn, msq, mni))
      }
      return
    }
    val pairs = src.pairs(spark)
    // scoped: the trainer's interior caches/checkpoint leaves release
    // the moment the checkpointed result is materialized — resident
    // blocks stay O(one generation) across unbounded rebuild cycles.
    // The gauge aggregate doubles as the LAZY checkpoint's materializer
    // (it must run INSIDE the scope — the scope close releases the
    // trainer interiors the unmaterialized lineage would still need),
    // so a rebuild pays one materialization job, not two.
    val (e, s) = ScaleOps.scoped {
      val ck = GraphOps.ppmiEmbedInt(pairs, "center", "context", "n",
        dims = dims, iters = iters).localCheckpoint(false)
      // a failed gauge job must release the (possibly partially
      // persisted) untracked ck before the scope sweep — the scope only
      // drains TRACKED interiors, so without this the new generation's
      // blocks would orphan for the session (restoreState's discipline)
      val g = try gauges(ck)
        catch { case t: Throwable => Dedup.releaseCheckpoint(ck); throw t }
      (ck, g)
    }
    // build the new generation BEFORE releasing the old: a build failure
    // must leave the maintainer serving the previous embeddings/indexes
    val vecs = GraphOps.embedVectors(e)
    val vecsMat = if (withMips) vecs.cache() else vecs // two builds scan it
    val newIdx =
      try VectorOps.IvfIndex.build(vecsMat, "id", "embedding", c = cells)
      catch {
        case t: Throwable =>
          if (withMips) vecsMat.unpersist(blocking = false)
          Dedup.releaseCheckpoint(e); throw t
      }
    val newMips =
      if (!withMips) None
      else try Some(VectorOps.MipsIndex.build(vecsMat, "id", "embedding",
        c = cells))
      catch {
        case t: Throwable =>
          vecsMat.unpersist(blocking = false)
          newIdx.close(); Dedup.releaseCheckpoint(e); throw t
      }
    if (withMips) vecsMat.unpersist(blocking = false)
    emb.foreach(Dedup.releaseCheckpoint)
    idx.foreach(_.close())
    mipsIdx.foreach(_.close())
    emb = Some(e)
    idx = Some(newIdx)
    mipsIdx = newMips
    lastBatch = batchId
    log += ((batchId, "rebuilt", s._1, s._2, newIdx.size))
    newMips.foreach(m =>
      mipsLog += ((batchId, "rebuilt", s._1, s._3, m.inner.size)))
  }

  /** The maintained (id, dim, val) embedding table. */
  def embeddings: DataFrame = emb.getOrElse(
    throw new IllegalStateException("no embeddings - rebuildFrom first"))

  /** Probed ANN search over the maintained index — the serving path the
    * five embedding consumers read instead of re-deriving the chain.
    */
  def search(queries: DataFrame, queryIdCol: String, queryVecCol: String,
             k: Int, nprobe: Int): DataFrame = synchronized {
    idx.getOrElse(throw new IllegalStateException(
      "no index - rebuildFrom first")).search(queries, queryIdCol,
      queryVecCol, k, nprobe)
  }

  /** Probed MIPS search over the maintained dot-serving generation
    * (requires `withMips = true`). Output: (qid, id, dot) — raw inner
    * products, the q252-metric sibling of [[search]].
    */
  def searchDot(queries: DataFrame, queryIdCol: String, queryVecCol: String,
                k: Int, nprobe: Int): DataFrame = synchronized {
    mipsIdx.getOrElse(throw new IllegalStateException(
      "no MIPS index - construct with withMips = true and rebuildFrom first"))
      .searchDot(queries, queryIdCol, queryVecCol, k, nprobe)
  }

  /** Telemetry so far: (batch, action, n_nodes, sum_val, n_indexed). */
  def telemetry(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    log.toSeq.toDF("batch", "action", "n_nodes", "sum_val", "n_indexed")
  }

  /** MIPS-generation telemetry:
    * (batch, action, n_nodes, max_sq_norm, n_indexed). Empty unless
    * constructed with `withMips = true`.
    */
  def mipsTelemetry(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    mipsLog.toSeq.toDF("batch", "action", "n_nodes", "max_sq_norm",
      "n_indexed")
  }

  /** Persist embeddings + index(es) + the rebuild watermark. */
  def save(dir: String): Unit = synchronized {
    val e = emb.getOrElse(
      throw new IllegalStateException("nothing to save - no rebuild yet"))
    GraphOps.saveEmbeddings(e, s"$dir/emb")
    idx.get.save(s"$dir/index")
    mipsIdx.foreach(_.save(s"$dir/mips_index"))
    val spark = e.sparkSession
    import spark.implicits._
    Seq((lastBatch, dims, iters, cells, mipsIdx.isDefined))
      .toDF("last_batch", "dims", "iters", "cells", "with_mips")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Release all state (embedding checkpoint + index caches). */
  def close(): Unit = synchronized {
    emb.foreach(Dedup.releaseCheckpoint)
    idx.foreach(_.close())
    mipsIdx.foreach(_.close())
    emb = None; idx = None; mipsIdx = None
  }
}

object EmbedMaintainer {
  /** Resume a loop persisted by [[EmbedMaintainer#save]]: embeddings
    * reload integrity-checked ([[graft.ops.GraphOps.loadEmbeddings]]),
    * the index reloads WITHOUT retraining
    * ([[graft.functions.VectorOps.IvfIndex.load]]), the MIPS generation
    * (when saved) reloads marker-validated
    * ([[graft.functions.VectorOps.MipsIndex.load]] refuses a plain
    * cosine dir), and the watermark restores so a re-delivered rebuild
    * trigger is skipped. A meta row persisted before the MIPS
    * generation existed loads as a cosine-only maintainer.
    */
  def load(spark: SparkSession, dir: String): EmbedMaintainer = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val withMips = meta.schema.fieldNames.contains("with_mips") &&
      meta.getAs[Boolean]("with_mips")
    val m = new EmbedMaintainer(
      dims = meta.getAs[Int]("dims"), iters = meta.getAs[Int]("iters"),
      cells = meta.getAs[Int]("cells"), withMips = withMips,
      resumeAfterBatch = meta.getAs[Long]("last_batch"))
    val idx = VectorOps.IvfIndex.load(spark, s"$dir/index")
    // a refused/corrupt MIPS reload must not leak the cosine index's
    // freshly-filled caches (the failure-path release discipline)
    val mips =
      if (!withMips) None
      else try Some(VectorOps.MipsIndex.load(spark, s"$dir/mips_index"))
      catch { case t: Throwable => idx.close(); throw t }
    try m.restoreState(GraphOps.loadEmbeddings(spark, s"$dir/emb"), idx, mips)
    catch {
      case t: Throwable =>
        idx.close(); mips.foreach(_.close()); throw t
    }
    m
  }
}
