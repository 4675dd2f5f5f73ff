package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.{TextFunctions, TextSearch}

/** Streaming inverted-index maintenance loop — the BM25 rail's lifecycle
  * parity with the vector rail ([[IvfMaintainer]]): a `foreachBatch`
  * ingest folds each arriving document micro-batch into a maintained
  * postings table + per-doc length table and delta-maintains the corpus
  * stats integer BM25 needs (N, Σdl, per-term df), so the index-backed
  * [[search]] returns EXACTLY what a batch rebuild + `bm25IntTopK`
  * would — the convergence claim StreamingSpec owns. Per-cycle
  * telemetry records the index health gauges, the reference's
  * metrics-tick-drives-action pattern
  * (`/root/reference/topic_processor.go:217-232`) applied to index
  * lifecycle like the IVF monitors.
  *
  * State shape: postings live LONG-FORMAT (token, doc_id, tf) rather
  * than as per-token arrays — an append is then one unionAll +
  * checkpoint truncation (no per-batch array merge join), df/tf are
  * aggregates over it, and [[save]] partitions by token-hash bucket
  * (the [[TextSearch.saveIndex]] layout) so a term lookup prunes to
  * |terms| directories at any vocabulary size. Corpus totals (N, Σdl)
  * are two driver-held longs, delta-maintained per batch — never a
  * rescan. The accumulated frames are checkpoint-truncated with the
  * superseded generation released every batch ([[DedupGroupMaintainer]]
  * discipline), so lineage and block-manager usage stay O(current
  * index) across an unbounded stream.
  *
  * Ingest contract (shared with [[IvfIndex.append]]): doc ids must be
  * fresh — EXCEPT a whole-batch replay of an already-ingested
  * micro-batch (foreachBatch's at-least-once delivery after restart),
  * which is confirmed by id overlap and skipped idempotently
  * (`replay_skipped` telemetry, no state touched); a PARTIAL overlap
  * under a fresh batch id fails loudly rather than double-counting
  * postings. [[save]] persists the ingest watermark next to the index
  * so the fast path survives a session restart ([[PostingsMaintainer.load]]).
  */
final class PostingsMaintainer(idCol: String, textCol: String,
                               resumeAfterBatch: Long = Long.MinValue) {

  // (batch, action, n_terms, n_postings, n_docs, total_dl)
  private val log =
    scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long, Long)]
  private var lastBatch: Long = resumeAfterBatch

  private var accPostings: Option[DataFrame] = None // (token, doc_id, tf)
  private var accDocs: Option[DataFrame] = None     // (doc_id, dl)
  private var nDocs: Long = 0L
  private var totalDl: Long = 0L

  log += ((-1L, "built", 0L, 0L, 0L, 0L))

  private[streaming] def restoreState(postings: DataFrame, docs: DataFrame,
                                      n: Long, tdl: Long): Unit = synchronized {
    // lazy postings checkpoint: the summarize() aggregate right below
    // materializes it in the same job (docs stays eager — its next
    // consumer is a partial limit(1) probe)
    accPostings = Some(postings.localCheckpoint(false))
    accDocs = Some(docs.localCheckpoint(true))
    nDocs = n
    totalDl = tdl
    val (t, p) = summarize()
    log += ((lastBatch, "loaded", t, p, nDocs, totalDl))
  }

  /** (n_terms, n_postings) of the current index — one bounded agg job. */
  private def summarize(): (Long, Long) = accPostings match {
    case None => (0L, 0L)
    case Some(p) =>
      val r = p.agg(countDistinct(col("token")).as("t"),
        count(lit(1)).as("n")).head()
      (r.getLong(0), r.getLong(1))
  }

  /** Fold one micro-batch of (idCol, textCol) rows into the index and
    * record its health. Pass as the `foreachBatch` body:
    * `(df, bid) => maintainer.ingest(bid, df)`. A re-delivered batch id
    * (at-least-once replay after restart) is a telemetry-visible no-op,
    * confirmed by id overlap like the IVF loops — a batch-id sequence
    * RESET over fresh data still ingests.
    */
  def ingest(batchId: Long, batch: DataFrame): Unit = synchronized {
    if (batch.isEmpty) return
    val ids = batch.select(col(idCol).cast("long").as("doc_id"))
    val overlaps = accDocs.exists(_.select("doc_id")
      .join(ids, "doc_id").limit(1).count() > 0)
    if (overlaps) {
      if (batchId <= lastBatch) { // whole-batch replay: idempotent no-op
        val (_, _, t, p, n, l) = log.last
        log += ((batchId, "replay_skipped", t, p, n, l))
        return
      }
      throw new IllegalArgumentException(
        s"batch $batchId re-delivers already-indexed doc ids under a fresh " +
          "batch id - the ingest contract requires fresh ids per batch")
    }
    val toks = batch.select(col(idCol).cast("long").as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t")).cache()
    val batchDocs = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val batchPost = toks
      .select(col("doc_id"), explode(col("t")).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .select("token", "doc_id", "tf")
    // the corpus-stat delta first (one bounded 1-row agg over the
    // cached batch): a failure here must happen BEFORE the new
    // generations materialize, or the freshly checkpointed frames
    // would leak with no handle left to release them
    val d = batchDocs.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("tdl")).head()
    // LAZY postings checkpoint + the (n_terms, n_postings) telemetry
    // aggregate as its materializer — one job instead of an eager
    // checkpoint job plus a separate summarize job. The docs
    // generation stays EAGER: its next consumer is a limit(1) overlap
    // probe, which would materialize a lazy checkpoint only partially.
    val allPost = accPostings.map(_.unionAll(batchPost)).getOrElse(batchPost)
      .localCheckpoint(false)
    // a failed materializing aggregate must release the partially
    // persisted new generation — same block-leak discipline as the
    // second-checkpoint catch below (maintainer state is still on the
    // old generations either way)
    val tp = try allPost.agg(countDistinct(col("token")).as("t"),
        count(lit(1)).as("n")).head()
      catch {
        case t: Throwable =>
          Dedup.releaseCheckpoint(allPost); toks.unpersist(blocking = false)
          throw t
      }
    // if the SECOND checkpoint fails, the first new generation must not
    // leak (maintainer state stays on the old generations either way —
    // this is purely the block-leak path)
    val allDocs = try {
      accDocs.map(_.unionAll(batchDocs)).getOrElse(batchDocs)
        .localCheckpoint(true)
    } catch {
      case t: Throwable => Dedup.releaseCheckpoint(allPost); throw t
    }
    nDocs += d.getLong(0)
    totalDl += d.getLong(1)
    accPostings.foreach(Dedup.releaseCheckpoint)
    accDocs.foreach(Dedup.releaseCheckpoint)
    toks.unpersist(blocking = false)
    accPostings = Some(allPost)
    accDocs = Some(allDocs)
    lastBatch = math.max(lastBatch, batchId)
    log += ((batchId, "appended", tp.getLong(0), tp.getLong(1), nDocs, totalDl))
  }

  /** Integer BM25 top-`k` over the MAINTAINED index — [[TextSearch.bm25IntTopK]]'s
    * arithmetic fed from index state instead of a corpus scan: per-term
    * df comes from one bounded |terms|-row aggregate over the query
    * terms' postings, N/Σdl are the delta-maintained driver scalars,
    * and only documents holding at least one query term are ever
    * scored (the index advantage — the corpus never rescans). Returns
    * exactly the batch `bm25IntTopK` result on the same ingested
    * corpus (StreamingSpec's convergence claim).
    */
  def search(terms0: Seq[String], k: Int,
             k1Bp: Long = 12000L, bBp: Long = 7500L): DataFrame = synchronized {
    val terms = terms0.distinct
    require(terms.nonEmpty && k >= 1)
    require(nDocs > 0, "search needs a non-empty index")
    val post = accPostings.get
    val docs = accDocs.get
    val p = post.filter(col("token").isin(terms: _*))
    val dfMap = p.groupBy("token").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("token") === t, col("tf"))), lit(0L)).as(s"tf$i")
    }
    val tfAgg = p.groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
    val comp = tfAgg.join(docs, Seq("doc_id")).withColumnRenamed("doc_id", "id")
    val spark = post.sparkSession
    val stats = spark.range(1).select(
      lit(nDocs).as("__n") +: lit(totalDl).as("__tdl") +:
        terms.zipWithIndex.map { case (t, i) =>
          lit(dfMap.getOrElse(t, 0L)).as(s"__df$i")
        }: _*)
    TextSearch.withIntBm25ScoreStats(comp, terms.size, k1Bp, bBp, stats)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
      .select("id", "score")
  }

  /** Telemetry so far: (batch, action, n_terms, n_postings, n_docs,
    * total_dl) — `built` at construction, `loaded` on restore,
    * `appended` per ingest, `replay_skipped` for a re-delivered batch.
    */
  def telemetry(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    log.toSeq.toDF("batch", "action", "n_terms", "n_postings",
      "n_docs", "total_dl")
  }

  /** Persist the restartable state: postings bucket-partitioned by
    * token hash (the [[TextSearch.saveIndex]] pruning layout), doc
    * lengths, and the meta row (N, Σdl, ingest watermark).
    */
  def save(dir: String, buckets: Int = 64): Unit = synchronized {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val post = accPostings.getOrElse(
      throw new IllegalStateException("nothing to save - index is empty"))
    val spark = post.sparkSession
    post.withColumn("bucket", pmod(xxhash64(col("token")), lit(buckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    accDocs.get.write.mode("overwrite").parquet(s"$dir/docs")
    import spark.implicits._
    Seq((nDocs, totalDl, lastBatch)).toDF("n_docs", "total_dl", "last_batch")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Release all state (postings, doc lengths). */
  def close(): Unit = synchronized {
    accPostings.foreach(Dedup.releaseCheckpoint)
    accDocs.foreach(Dedup.releaseCheckpoint)
    accPostings = None; accDocs = None
  }
}

object PostingsMaintainer {
  /** Resume a loop persisted by [[PostingsMaintainer#save]]: the
    * postings and doc-length tables reload, the corpus stats and
    * ingest watermark restore from the meta row, so the first
    * post-restart micro-batch — re-delivered by foreachBatch with its
    * pre-crash batch id — is skipped idempotently.
    */
  def load(spark: SparkSession, dir: String,
           idCol: String, textCol: String): PostingsMaintainer = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val m = new PostingsMaintainer(idCol, textCol,
      resumeAfterBatch = meta.getLong(2))
    m.restoreState(
      spark.read.parquet(s"$dir/postings").select("token", "doc_id", "tf"),
      spark.read.parquet(s"$dir/docs").select("doc_id", "dl"),
      meta.getLong(0), meta.getLong(1))
    m
  }
}
