package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VectorOps
import graft.ops.GraphOps

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
  * Telemetry gauges are exact integers (node count, the µ-unit value
  * checksum, indexed-vector count): [[graft.ops.GraphOps.ppmiEmbedInt]]
  * is partition-invariant 64-bit arithmetic, so — like q251/q260 — the
  * whole lifecycle log hash-checks against a cumulative-slice SQL
  * oracle, even though the IVF cell layout under it (float k-means)
  * does not.
  *
  * Restart story: [[save]] persists the embedding table
  * ([[graft.ops.GraphOps.saveEmbeddings]]'s dim-partitioned layout),
  * the IVF index ([[graft.functions.VectorOps.IvfIndex.save]]), and the
  * rebuild watermark; [[EmbedMaintainer.load]] restores all three, so a
  * re-delivered rebuild trigger after restart (foreachBatch
  * at-least-once) is skipped idempotently (`replay_skipped`).
  *
  * Reference tie: kasper's metrics-tick-drives-action loop
  * (`/root/reference/topic_processor.go:217-232`) applied to embedding
  * lifecycle, like the IVF/postings monitors.
  */
final class EmbedMaintainer(dims: Int = 8, iters: Int = 2, cells: Int = 8,
                            resumeAfterBatch: Long = Long.MinValue) {
  require(dims >= 1 && dims <= 64, s"dims must be in [1, 64], got $dims")
  require(cells >= 1, s"cells must be positive, got $cells")

  // (batch, action, n_nodes, sum_val, n_indexed)
  private val log =
    scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long)]
  private var lastBatch: Long = resumeAfterBatch
  private var emb: Option[DataFrame] = None // (id, dim, val) checkpointed
  private var idx: Option[VectorOps.IvfIndex] = None

  log += ((-1L, "built", 0L, 0L, 0L))

  private[streaming] def restoreState(e: DataFrame,
                                      index: VectorOps.IvfIndex): Unit =
    synchronized {
      val ck = e.localCheckpoint(true)
      emb = Some(ck)
      idx = Some(index)
      val s = gauges(ck)
      log += ((lastBatch, "loaded", s._1, s._2, index.size))
    }

  /** (n_nodes, sum_val) — one bounded agg over the embedding table. */
  private def gauges(e: DataFrame): (Long, Long) = {
    val r = e.agg(countDistinct(col("id")).as("n"),
      coalesce(sum(col("val")), lit(0L)).as("sv")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Re-derive embeddings + index from `src`'s maintained pair table.
    * Call after each [[CooccurMaintainer.ingest]] cycle (or on a slower
    * scheduled cadence — the pair table keeps absorbing batches either
    * way; a rebuild always trains on everything ingested so far). A
    * re-delivered trigger (batchId ≤ the watermark) is a
    * telemetry-visible no-op like the other maintainers' replays.
    */
  def rebuildFrom(src: CooccurMaintainer, batchId: Long,
                  spark: SparkSession): Unit = synchronized {
    if (batchId <= lastBatch) {
      val (_, _, n, sv, ni) = log.last
      log += ((batchId, "replay_skipped", n, sv, ni))
      return
    }
    val pairs = src.pairs(spark)
    val e = GraphOps.ppmiEmbedInt(pairs, "center", "context", "n",
      dims = dims, iters = iters).localCheckpoint(true)
    // build the new index BEFORE releasing the old generation: a build
    // failure must leave the maintainer serving the previous embeddings
    val newIdx =
      try VectorOps.IvfIndex.build(GraphOps.embedVectors(e), "id",
        "embedding", c = cells)
      catch { case t: Throwable => Dedup.releaseCheckpoint(e); throw t }
    emb.foreach(Dedup.releaseCheckpoint)
    idx.foreach(_.close())
    emb = Some(e)
    idx = Some(newIdx)
    lastBatch = batchId
    val s = gauges(e)
    log += ((batchId, "rebuilt", s._1, s._2, newIdx.size))
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

  /** Telemetry so far: (batch, action, n_nodes, sum_val, n_indexed). */
  def telemetry(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    log.toSeq.toDF("batch", "action", "n_nodes", "sum_val", "n_indexed")
  }

  /** Persist embeddings + index + the rebuild watermark. */
  def save(dir: String): Unit = synchronized {
    val e = emb.getOrElse(
      throw new IllegalStateException("nothing to save - no rebuild yet"))
    GraphOps.saveEmbeddings(e, s"$dir/emb")
    idx.get.save(s"$dir/index")
    val spark = e.sparkSession
    import spark.implicits._
    Seq((lastBatch, dims, iters, cells))
      .toDF("last_batch", "dims", "iters", "cells")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Release all state (embedding checkpoint + index caches). */
  def close(): Unit = synchronized {
    emb.foreach(Dedup.releaseCheckpoint)
    idx.foreach(_.close())
    emb = None; idx = None
  }
}

object EmbedMaintainer {
  /** Resume a loop persisted by [[EmbedMaintainer#save]]: embeddings
    * reload integrity-checked ([[graft.ops.GraphOps.loadEmbeddings]]),
    * the index reloads WITHOUT retraining
    * ([[graft.functions.VectorOps.IvfIndex.load]]), and the watermark
    * restores so a re-delivered rebuild trigger is skipped.
    */
  def load(spark: SparkSession, dir: String): EmbedMaintainer = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val m = new EmbedMaintainer(
      dims = meta.getAs[Int]("dims"), iters = meta.getAs[Int]("iters"),
      cells = meta.getAs[Int]("cells"),
      resumeAfterBatch = meta.getAs[Long]("last_batch"))
    m.restoreState(GraphOps.loadEmbeddings(spark, s"$dir/emb"),
      VectorOps.IvfIndex.load(spark, s"$dir/index"))
    m
  }
}
