package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over the document corpus — BM25, the bag-of-words
  * ranking the embedding ANN family complements (hybrid search runs both
  * and fuses). Kasper has no search surface; this is beyond-parity
  * training-data/RAG tooling like the rest of `graft.text`.
  *
  * Scoring follows the Lucene/Okapi formulation with the non-negative
  * idf: `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`,
  * `score = Σ_t idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))`.
  */
object TextSearch {

  /** Top-`k` documents for a bag-of-words query.
    *
    * Two corpus scans, no shuffle before the final top-k:
    *  1. ONE global aggregation collects N, avgdl and every query term's
    *     document frequency (a `sum(array_contains)` per term — the
    *     reduce row is `2 + |terms|` numbers, so this is as cheap as any
    *     corpus-wide count at 100 TB);
    *  2. the scoring scan folds those numbers in as literals — idf is
    *     driver-side arithmetic — and per-doc tf is a per-row token-array
    *     count, so scoring shuffles nothing and `topK` plans as
    *     TakeOrderedAndProject.
    *
    * Scores are doubles through `ln` — not cross-engine bit-stable, so
    * the query entry is rows-only; TextSearchSpec owns correctness by
    * exact driver-side recomputation.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKImpl(docs, idCol, textCol, queryTerms, k, k1, b, gate = None)

  /** Phrase-constrained BM25 top-`k`: rank `phrase`'s words by BM25 but
    * keep only documents containing the words ADJACENT and IN ORDER —
    * the position-aware constraint bag-of-words tf cannot express
    * ("san francisco" ≠ "francisco san"). Corpus stats (N, df, avgdl)
    * stay corpus-wide (standard phrase-query semantics); the phrase test
    * is [[phraseTf]], a per-row array expression, so the filter adds no
    * shuffle to bm25TopK's plan. Rows-only like bm25TopK (scores pass
    * through libm ln); the integer phrase components are the
    * hash-checked surface (q72's phraseTf/dl stats).
    */
  def phraseTopK(docs: DataFrame, idCol: String, textCol: String,
                 phrase: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKImpl(docs, idCol, textCol, phrase, k, k1, b,
      gate = Some(t => phraseTf(t, phrase) >= 1L))

  /** Proximity-constrained BM25 top-`k`: rank `terms` by BM25 but keep
    * only documents where ALL terms occur within a `window`-token span
    * (any order) — looser than [[phraseTopK]]'s adjacency, stricter than
    * bag-of-words. The span test is the native [[minSpan]] kernel riding
    * the scoring projection (no pushable filter — the q73 plan lesson);
    * a null span (term absent) null-gates the score like a failed
    * phrase. Rows-only like bm25TopK (libm ln); the integer span surface
    * is the hash-checked q80.
    */
  def proximityTopK(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], window: Int, k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(window >= terms.length,
      s"window $window cannot hold ${terms.length} terms")
    bm25TopKImpl(docs, idCol, textCol, terms, k, k1, b,
      gate = Some(t => minSpan(t, terms) <= window))
  }

  /** Occurrence count of an exact token phrase inside a token array —
    * the native one-pass kernel ([[PhraseTfExpr]]): no per-position
    * index array, no interpreted lambda, stays in whole-stage codegen.
    * Integer-exact, so it oracles (q72) even though BM25 scores do not.
    */
  def phraseTf(tokens: Column, phrase: Seq[String]): Column =
    TextKernels.phraseTfNative(tokens, phrase)

  /** Reference HOF formulation of [[phraseTf]] (positions i where every
    * phrase word matches t[i+offset], via an interpreted per-position
    * filter) — kept interpreted end-to-end as the bit-equality baseline
    * for the native kernel (the dotHof/cosineHof pattern).
    */
  def phraseTfHof(tokens: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val L = phrase.length
    val hits = filter(
      sequence(lit(1), size(tokens) - lit(L - 1)),
      i => phrase.zipWithIndex.map { case (w, o) =>
        element_at(tokens, i + lit(o)) === lit(w)
      }.reduce(_ && _))
    // the guard keeps sequence() from seeing a reversed range on docs
    // shorter than the phrase (CaseWhen evaluates one branch per row)
    when(size(tokens) < L, lit(0L)).otherwise(size(hits).cast("long"))
  }

  /** Smallest token window containing every one of `terms` (any order) —
    * the native two-pointer kernel ([[MinSpanExpr]]); null when a term
    * never occurs. The proximity primitive under [[proximityTopK]].
    */
  def minSpan(tokens: Column, terms: Seq[String]): Column =
    TextKernels.minSpanNative(tokens, terms)

  /** Integer BM25 components per document — the hash-checkable data path
    * under [[bm25TopK]]: per-term tf and dl are exact integers (and df,
    * N, avgdl are exact aggregates of these columns), while the final
    * score passes through libm `ln` and cannot hash-match across
    * engines. Columns: (id, dl, tf0..tf<n-1>) following `queryTerms`
    * order. Same tf formulation as the scorer (size − size(array_remove))
    * so a components oracle covers the scoring scan's inputs end-to-end.
    */
  def bm25Components(docs: DataFrame, idCol: String, textCol: String,
                     queryTerms: Seq[String]): DataFrame = {
    val terms = queryTerms.distinct
    require(terms.nonEmpty, "bm25Components needs at least one query term")
    val toks = graft.core.Graft.spread(docs)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("t"))
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      (size(col("t")) - size(array_remove(col("t"), lit(term))))
        .cast("long").as(s"tf$i")
    }
    toks.select(col("id") +: size(col("t")).cast("long").as("dl") +: tfCols: _*)
  }

  private def bm25TopKImpl(docs: DataFrame, idCol: String, textCol: String,
                           queryTerms: Seq[String], k: Int,
                           k1: Double, b: Double,
                           gate: Option[Column => Column]): DataFrame = {
    val terms = queryTerms.distinct
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, s"k must be positive, got $k")
    val toks = graft.core.Graft.spread(docs)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("t"))
      .withColumn("dl", size(col("t")).cast("double"))
    // scan 1: corpus stats + per-term document frequencies, one reduce
    val aggs = Seq(count(lit(1)).as("__n"), avg(col("dl")).as("__avgdl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("t"), t), 1L).otherwise(0L)).as(s"__df$i")
      }
    val st = toks.agg(aggs.head, aggs.tail: _*).head()
    val n = st.getLong(0)
    require(n > 0, "bm25TopK needs a non-empty corpus")
    val avgdl = st.getDouble(1)
    // scan 2: score projection (df/idf folded in as literals). Term
    // frequency is size(t) − size(array_remove(t, term)) — pure codegen
    // collection expressions, no interpreted lambda — materialized ONCE
    // per term in its own projection: referencing a lambda-filter twice
    // defeats CSE (fresh lambda ids are never structurally equal), and
    // CollapseProject keeps non-cheap producers from being re-inlined
    // into both use sites.
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      (size(col("t")) - size(array_remove(col("t"), lit(term))))
        .cast("double").as(s"__tf$i")
    } ++
      // a phrase/proximity gate rides the same projection as the tf
      // columns (one kernel evaluation per row, post-exchange) and folds
      // into the SCORE below rather than a Filter: a deterministic filter
      // on the token array gets pushed beneath the spread exchange, where
      // it re-derives the tokens from text and runs on the scan's
      // one-task partitioning (the q63 plan lesson, second verse)
      gate.map(g => g(col("t")).as("__pok")).toSeq
    val withTf = toks.select(col("id") +: col("dl") +: tfCols: _*)
    val rawScore = terms.zipWithIndex.map { case (_, i) =>
      val df = st.getLong(2 + i)
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      lit(idf) * col(s"__tf$i") * lit(k1 + 1.0) /
        (col(s"__tf$i") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    }.reduce(_ + _)
    // gate-failing docs score null (a null gate — absent term — null-
    // gates too), and nulls desc-sort LAST: the top-k fills with passing
    // docs first and the final positivity filter drops the nulls, so the
    // result set equals the filter formulation
    val score = if (gate.isDefined) when(col("__pok"), rawScore) else rawScore
    // positivity filter ABOVE the top-k (same result set: positive scores
    // always outrank zero): filtering before it would be pushed under the
    // spread exchange and recompute the full score per row a second time
    graft.ops.RelOps.topK(withTf.select(col("id"), score.as("score")),
        col("score"), col("id"), k)
      .filter(col("score") > 0.0)
  }

  /** Reciprocal-rank fusion of ranked lists (the standard hybrid-search
    * combiner for BM25 + ANN): each list contributes `1/(c + rank)` per
    * id, fused score is the sum, ties break by id. Inputs are expected
    * to be TOP-K LISTS (each a handful of rows — the global rank window
    * here is fine on a driver-sized list and would not be on a corpus;
    * the corpus-sized work already happened inside the upstream
    * searches). `c = 60` per the original RRF paper's robust default.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
              k: Int, c: Int = 60, inputCap: Int = 10000): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0 && c > 0, s"k and c must be positive, got k=$k c=$c")
    require(inputCap >= k, s"inputCap $inputCap must be >= k $k")
    import org.apache.spark.sql.expressions.Window
    val contrib = rankings.map { df =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      // inputCap makes the top-k-list contract STRUCTURAL: the global
      // rank window below is a single-partition sort, safe on a
      // bounded list and a silent serialization hazard on a corpus —
      // the ordered limit bounds what can ever reach it. This is an
      // APPROXIMATION when an input list is longer than inputCap: a doc
      // ranked ≤ cap in one list and > cap in another loses that
      // list's ~1/(c+cap) contribution, which can reorder non-tied
      // neighbors whose fused scores differ by less. Exact fusion
      // requires inputCap ≥ the longest input list (the hash-checked
      // q178 path fuses bounded 20-row lists, well under the cap).
      val bounded = df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(inputCap)
      bounded.select(col(idCol).as("id"),
          (lit(1.0) / (lit(c.toDouble) + row_number().over(w))).as("rrf"))
    }
    graft.ops.RelOps.topK(
      contrib.reduce(_ unionAll _).groupBy("id").agg(sum("rrf").as("score")),
      col("score"), col("id"), k)
  }

  /** Integer-exact reciprocal-rank fusion — [[rrfFuse]]'s q164-discipline
    * sibling: each list contributes `1e12 div (c + rank)` (scaled
    * integer reciprocal rank; floor division on BOTH engines), the fused
    * score is the BIGINT sum, ties break by id. Rank order within each
    * input list is (scoreCol desc, id asc) — deterministic whenever the
    * upstream scores are (integer BM25, exact cosine), so the ENTIRE
    * fused ranking hash-checks against DuckDB (q178), closing the one
    * retrieval rail (RRF) that had no exactness rung. Same top-k-list
    * contract and structural `inputCap` bound as [[rrfFuse]].
    */
  def rrfFuseInt(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
                 k: Int, c: Int = 60, inputCap: Int = 10000): DataFrame = {
    require(rankings.nonEmpty, "rrfFuseInt needs at least one ranking")
    require(k > 0 && c > 0, s"k and c must be positive, got k=$k c=$c")
    require(inputCap >= k, s"inputCap $inputCap must be >= k $k")
    import org.apache.spark.sql.expressions.Window
    val contrib = rankings.map { df =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(inputCap)
        .select(col(idCol).as("id"), row_number().over(w).as("__r"))
        .select(col("id"), expr(s"1000000000000 div (${c.toLong} + __r)").as("rrf"))
    }
    graft.ops.RelOps.topK(
      contrib.reduce(_ unionAll _).groupBy("id")
        .agg(sum("rrf").cast("long").as("score")),
      col("score"), col("id"), k)
  }

  /** Inverted index over the corpus: one row per token with its document
    * frequency and the sorted posting list. The structure behind every
    * keyword-search engine; [[bm25TopK]] deliberately avoids building it
    * (two scans beat an index for one-off queries), but a REUSED query
    * workload amortizes the build. Build = one (doc, token) distinct +
    * one token groupBy — both map-side combinable. Postings collect into
    * an array per token; a token appearing in a large fraction of a
    * 100 TB corpus would make that row huge, which is exactly the
    * stopword class a real index drops — callers cap with
    * `maxDf`, mirroring the hot-gram drop in the jaccard rail.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxDf: Option[Long] = None): DataFrame = {
    val idx = graft.core.Graft.spread(docs)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .distinct()
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
    maxDf.fold(idx)(m => idx.filter(col("df") <= m))
  }

  /** Persist an inverted index partitioned by a token-hash bucket so a
    * term lookup prunes to `|terms|` partitions (the cell-partitioned
    * layout the IVF family uses for vectors, applied to tokens).
    */
  def saveIndex(idx: DataFrame, dir: String, buckets: Int): Unit =
    idx.withColumn("bucket", pmod(xxhash64(col("token")), lit(buckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** BM25 made hash-checkable: the same (tf, df, dl) data path as
    * [[bm25Components]] and the same saturation/length-normalization
    * SHAPE as classical BM25 (Robertson & Spärks Jones BM25 with
    * k1/b), but every step in scaled 64-bit integer arithmetic —
    * k1/b in basis points, idf as the [[tfIdfTopTerms]] ppm ratio
    * `(N·1e6) div df` (monotone in df like log-idf at fixed N), length
    * norm `1−b+b·dl/avgdl` in bp via a ppm avgdl, saturation in
    * millionths:
    * `S = (tf·(1e4+k1)·1e10) div (tf·1e8 + k1·blen_bp)`,
    * `score = Σ_t (idf_ppm·S) div 1e6`. Deterministic on any engine,
    * so — unlike the float form's libm `ln` (q63, rows-only) — the
    * ENTIRE ranked result hash-checks against DuckDB (q164).
    *
    * Scale shape: one stats reduce broadcast into a shuffle-free
    * scoring scan, top-k as TakeOrderedAndProject — q63's plan,
    * unchanged.
    */
  def bm25IntTopK(docs: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], k: Int,
                  k1Bp: Long = 12000L, bBp: Long = 7500L): DataFrame = {
    val terms = queryTerms.distinct
    require(terms.nonEmpty && k >= 1)
    val comp = bm25Components(docs, idCol, textCol, terms)
    withIntBm25Score(comp, terms.size, k1Bp, bBp)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
      .select("id", "score")
  }

  /** Attach the [[bm25IntTopK]] integer score to a components frame
    * carrying `(id, dl, tf0..tf{n−1}, …)` — extra columns flow through,
    * so phrase/proximity variants can boost on top.
    */
  private def withIntBm25Score(comp: DataFrame, nTerms: Int,
                               k1Bp: Long, bBp: Long): DataFrame = {
    val statAggs = (count(lit(1)).as("__n") +: sum(col("dl")).as("__tdl") +:
      (0 until nTerms).map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")))
    withIntBm25ScoreStats(comp, nTerms, k1Bp, bBp,
      comp.agg(statAggs.head, statAggs.tail: _*))
  }

  /** [[withIntBm25Score]] with the corpus stats SUPPLIED as a 1-row
    * frame (`__n`, `__tdl`, `__df0..`) instead of re-aggregated from
    * `comp` — the seam an index-backed scorer needs: a maintained
    * inverted index already knows N, Σdl and every term's df, so
    * scoring must not pay (or subtly diverge from) a second corpus
    * scan. Same arithmetic, byte-identical scores.
    */
  private[graft] def withIntBm25ScoreStats(comp: DataFrame, nTerms: Int,
                                           k1Bp: Long, bBp: Long,
                                           stats: DataFrame): DataFrame = {
    require(k1Bp >= 0 && k1Bp <= 100000 && bBp >= 0 && bBp <= 10000)
    // Keep every product inside exact 64-bit range on BOTH engines: with
    // ANSI off Spark wraps silently on overflow while DuckDB raises, so
    // a pathological tf (≥ ~42k at default k1) would break the
    // hash-check claim exactly where it silently mis-ranks. The clamps
    // are value-preserving everywhere they matter — saturation is flat
    // in tf far below the cap (S has converged to within 1 millionth by
    // tf ≈ 1e4·blen_bp), and idf_ppm only reaches its cap past ~4e12/df
    // docs — so the caps are exactness GUARDS, not scoring changes.
    val tfCap = Long.MaxValue / ((10000L + k1Bp) * 10000000000L)
    val idfCap = Long.MaxValue / ((10000L + k1Bp) * 100L)
    val scored = comp.crossJoin(broadcast(stats))
      .withColumn("__avgdl_ppm", expr("(__tdl * 1000000) div __n"))
      .withColumn("__blen_bp", expr(
        s"((10000 - $bBp) * __avgdl_ppm + $bBp * dl * 1000000) div __avgdl_ppm"))
    val termScores = (0 until nTerms).map { i =>
      when(col(s"tf$i") > 0 && col(s"__df$i") > 0,
        expr(s"least((__n * 1000000) div __df$i, $idfCap) * " +
          s"((least(tf$i, $tfCap) * ${10000L + k1Bp} * 10000000000) div " +
          s"(least(tf$i, $tfCap) * 100000000 + $k1Bp * __blen_bp)) div 1000000"))
        .otherwise(lit(0L))
    }
    scored.withColumn("score", termScores.reduce(_ + _))
  }

  /** Integer-exact phrase search: [[bm25IntTopK]]'s term score plus an
    * exact-phrase boost `ptf · idf_ppm(first phrase word)` (the native
    * [[phraseTf]] adjacency count weighted like the phrase's anchor
    * word) — q73's phrase ranking with the whole ranked result
    * hash-checkable, completing the retrieval family's exactness rungs
    * (q164 keyword, q165 phrase).
    */
  def phraseIntTopK(docs: DataFrame, idCol: String, textCol: String,
                    phrase: Seq[String], k: Int,
                    k1Bp: Long = 12000L, bBp: Long = 7500L): DataFrame = {
    require(phrase.nonEmpty && k >= 1)
    val terms = phrase.distinct
    val toks = graft.core.Graft.spread(docs)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("t"))
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      (size(col("t")) - size(array_remove(col("t"), lit(term))))
        .cast("long").as(s"tf$i")
    }
    val comp = toks.select(
      col("id") +: size(col("t")).cast("long").as("dl") +:
        phraseTf(col("t"), phrase).cast("long").as("ptf") +: tfCols: _*)
    // ptf must also be clamped: ptf·idf with idf at its cap overflows
    // past ptf ≈ 2.2e6; halving the headroom keeps the final score sum
    // (boost + a handful of ≤1e13 term scores) in range too
    val idfCap = Long.MaxValue / ((10000L + k1Bp) * 100L)
    val ptfCap = Long.MaxValue / idfCap / 2L
    withIntBm25Score(comp, terms.size, k1Bp, bBp)
      .withColumn("score",
        col("score") + expr(s"least(ptf, $ptfCap)") *
          expr(s"least((__n * 1000000) div greatest(__df0, 1), $idfCap)"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
      .select("id", "ptf", "score")
  }

  /** Top-`k` TF-IDF keywords per document, in exact integer arithmetic:
    * idf is the parts-per-million ratio `(N · 1000000) div df` (floor
    * division — larger for rarer terms, exactly reproducible on any
    * engine) and the score is `tf · idf_ppm`. Float-log idf
    * (Salton & Buckley 1988) orders terms the same way for fixed N —
    * both are monotone decreasing in df — but its libm `ln` is not
    * bit-stable across engines; the ppm form keeps the whole keyword
    * table hash-checkable (the q104/q124 integer-exactness discipline).
    *
    * Scale shape: tf is one map-side-combinable aggregate over the
    * token stream, df one more over the (doc, token) table, N a 1-row
    * broadcast, and the top-k is a per-doc WindowGroupLimit — no
    * corpus-wide window, no collect. Output:
    * (doc_id, rank, token, tf, df, score).
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3, idfScale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val tf = graft.core.Graft.spread(docs)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfTbl, "token")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * expr(s"(__n * $idfScale) div df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "token", "tf", "df", "score")
  }

  /** Load postings for `terms` from a saved index, reading ONLY the
    * terms' bucket partitions: bucket ids come from one tiny bounded job
    * (literal hashing — the probed-cell-collect pattern), and the bucket
    * IN-filter is a partition filter on the saved layout, so the scan
    * touches |terms| directories no matter the vocabulary size.
    */
  def loadPostings(spark: org.apache.spark.sql.SparkSession, dir: String,
                   terms: Seq[String], buckets: Int): DataFrame = {
    require(terms.nonEmpty, "loadPostings needs at least one term")
    val bks = spark.range(1)
      .select(terms.map(t => pmod(xxhash64(lit(t)), lit(buckets.toLong))): _*)
      .head().toSeq.map(_.asInstanceOf[Long]).distinct
    spark.read.parquet(dir)
      .filter(col("bucket").isin(bks: _*) && col("token").isin(terms: _*))
      .drop("bucket")
  }
}
