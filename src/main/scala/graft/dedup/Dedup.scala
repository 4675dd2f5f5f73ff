package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard.
  *
  * Scale design notes (100 TB):
  *  - every stage is shuffle-by-key (content hash / band bucket / chunk),
  *    never all-pairs: candidate generation is an equi-join on bucket ids,
  *    so cost follows bucket occupancy, not n².
  *  - hot buckets (boilerplate shingles, empty docs) are capped by
  *    `maxBucket`/`maxShingleDF` — the documented skew guard; dropped
  *    volume is observable via the returned stats rather than silently
  *    exploding a reducer.
  *  - signatures are built with array higher-order functions inside
  *    whole-stage codegen; per-doc cost is O(tokens × hashes) with no
  *    shuffle until the bucket explode.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content hash with the
    * surviving (minimum) id and the duplicate count.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count("*").as("n_dups"))

  /** Exact dedup: keep the lowest-id row per identical text. */
  def dedupExact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Similarity threshold as an exact decimal literal, rounded *down* at
    * 10 digits. Every filter derived from it errs on the permissive side
    * (longer prefix, smaller overlap bound), so candidate generation stays
    * exact even when t·|set| lands exactly on an integer — the case where
    * double arithmetic (`floor((1-t)*sz)`) undercounts the prefix by one
    * and `t*max` overshoots the length bound by one ulp.
    */
  private def exactDec(t: Double): Column =
    lit(new java.math.BigDecimal(t).setScale(10, java.math.RoundingMode.FLOOR))

  private val observeSeq = new java.util.concurrent.atomic.AtomicLong()

  /** (id, sorted distinct gram-hash set) per document. Grams are carried
    * as 64-bit hashes, not strings: joins shuffle 8-byte keys and compare
    * longs. (A collision merging two grams has probability ~|grams|²/2⁶⁵
    * — negligible even at 100 TB gram counts.) The whole shingling stage
    * — gram strings, per-gram hash, distinct, sort — is ONE native pass
    * over the token-hash array ([[graft.functions.NgramSetHashes]]); no
    * gram string is ever materialized.
    */
  private[graft] def shingleSets(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    graft.core.Graft.spread(df)
      .select(col(idCol).as("id"),
        graft.functions.HashKernels.arrayXxHash64(
          TextFunctions.tokens(col(textCol))).as("th"))
      .select(col("id"), graft.functions.HashKernels.ngramSetHashes(col("th"), n).as("set"))

  /** Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥
    * `threshold`). Shingles occurring in more than `maxShingleDF` docs
    * are dropped from *candidate generation only* (boilerplate guard —
    * hot shingles can't distinguish documents but quadratically inflate
    * the join); the jaccard itself is always computed over the full
    * shingle sets, so pruning affects recall, never correctness of a
    * reported score.
    *
    * Exactness contract: the result is provably complete as long as no
    * gram's document frequency exceeds `maxShingleDF` (the drop counter
    * is observed and logged whenever the guard fires, so a lossy run is
    * visible). Pass `maxShingleDF = Long.MaxValue` for unconditional
    * exactness; the finite default exists because one boilerplate gram at
    * corpus scale otherwise hotspots a reducer quadratically.
    */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxShingleDF: Long = 100000L,
                   histBuckets: Int = 16): DataFrame = {
    // the per-doc sorted gram set comes straight from the native kernel —
    // sizes and verify sets are row-local projections, and the
    // explode+groupBy roundtrip the string-shingle form needed to
    // re-assemble sets (a full corpus shuffle) is gone entirely
    val perDoc = shingleSets(df, textCol, idCol, n)
      .select(col("id"), size(col("set")).cast("long").as("sz"), col("set"))
    val cands = jaccardCandidates(perDoc, threshold, maxShingleDF)
    // suffix refinement (exact, see histRefine) before the full-set
    // verify join; exact verification then runs over the full gram
    // sets: sorted once per doc, each surviving pair is one codegen'd
    // merge-count (i) with union size derived as |A|+|B|−i
    val sets = perDoc.select("id", "set")
    val refined =
      if (histBuckets <= 0) cands
      else histRefine(cands, sets,
        ceil(lit(new java.math.BigDecimal(threshold / (1.0 + threshold))
          .setScale(10, java.math.RoundingMode.FLOOR)) *
          (col("__hsza") + col("__hszb"))), histBuckets)
    verifyJaccard(refined, sets, threshold)
  }

  /** PPJoin+-style suffix refinement of a candidate pair list: each doc
    * carries a `buckets`-cell occupancy histogram of its gram hashes by
    * top bits ([[graft.functions.HashKernels.hashBucketCounts]]); for
    * any pair, |A∩B| ≤ Σᵢ min(hA[i], hB[i]) — every intersection gram
    * falls in the same cell on both sides — so dropping pairs whose
    * bound falls below the required overlap `alphaExpr` (which may read
    * `__hsza`/`__hszb`, the two set sizes) is exact: the verify set only
    * shrinks, never a true pair. The point at scale: the histogram is
    * `buckets` longs per DOC, shipped on two id equi-joins over the
    * (already accumulated-filtered) candidate list — pairs killed here
    * never pull their full gram sets (KBs per doc) through the verify
    * join's shuffle. This is the relational analogue of PPJoin+'s
    * suffix filter: a divide-the-suffix occupancy bound checked before
    * full verification, with hash-range cells instead of recursive
    * median probes (Xiao et al., "Efficient Similarity Joins for Near
    * Duplicate Detection", §4).
    */
  private[graft] def histRefine(cands: DataFrame, sets: DataFrame,
                                alphaExpr: Column, buckets: Int): DataFrame = {
    val hists = sets.select(col("id"),
      graft.functions.HashKernels.hashBucketCounts(col("set"), buckets).as("__h"),
      size(col("set")).cast("long").as("__hsz"))
    cands
      .join(hists.select(col("id").as("id_a"), col("__h").as("__ha"),
        col("__hsz").as("__hsza")), "id_a")
      .join(hists.select(col("id").as("id_b"), col("__h").as("__hb"),
        col("__hsz").as("__hszb")), "id_b")
      .filter(graft.functions.HashKernels.minSumCounts(col("__ha"), col("__hb")) >=
        alphaExpr)
      .select("id_a", "id_b")
  }

  /** Candidate pairs for [[jaccardPairs]] from a (id, sz, set) frame.
    *
    * Prefix filtering (PPJoin family): order each doc's grams globally by
    * ascending document frequency (rarest first, gram hash as tie-break).
    * Two sets with jaccard ≥ t MUST share a gram within their prefixes of
    * length |set| − ⌈t·|set|⌉ + 1 under any shared total order — so
    * indexing only prefixes is exact, and rare-first ordering keeps
    * boilerplate grams out of the index, collapsing the candidate count.
    * The bound is computed in decimal so t·sz integral (t=0.8, sz=10)
    * can't round the prefix one short.
    *
    * Candidate pruning accumulates overlap per pair (the PPJoin+
    * refinement of the row-at-a-time positional filter): with opp =
    * #shared prefix grams and g_last their global maximum,
    * `|A∩B| ≤ opp + min(|A|−pos_A(g_last), |B|−pos_B(g_last))` — every
    * shared gram NOT counted in opp (outside a prefix, or dropped by the
    * hot-gram guard, which only drops grams hotter than any kept one)
    * ranks after g_last in the shared (df, gram) total order, on both
    * sides. This bound is exact and always ≤ the old per-row bound
    * `1 + min(|A|−pos_A(g₁), |B|−pos_B(g₁))` (positions of shared grams
    * strictly increase together), so the verify set only shrinks; the
    * groupBy replaces the `distinct()` the per-row form needed anyway —
    * same shuffle, tighter output. `accumulate = false` keeps the legacy
    * per-row form so the candidate-count drop stays measurable in specs.
    */
  private[graft] def jaccardCandidates(perDoc: DataFrame, threshold: Double,
                                       maxShingleDF: Long,
                                       accumulate: Boolean = true): DataFrame = {
    val sh = perDoc.select(col("id"), explode(col("set")).as("g"))
    val sizes = perDoc.select("id", "sz")
    val dfg = sh.groupBy("g").agg(count("*").as("dfg"))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("dfg"), col("g"))
    val prefix = sh.join(dfg, "g").join(sizes, "id")
      .withColumn("__rn", row_number().over(wDoc))
      .filter(col("__rn") <= col("sz") - ceil(exactDec(threshold) * col("sz")) + 1)
      .select(col("id"), col("g"), col("dfg"), col("__rn").as("pos"))
    // recall-trading skew guard on the candidate index only: one
    // pathological boilerplate gram that slipped into prefixes would
    // otherwise hotspot a reducer quadratically at scale. Dropped volume
    // is observable (CollectMetrics → logged by Graft's listener), never
    // silent.
    val indexed =
      if (maxShingleDF == Long.MaxValue) prefix
      else prefix
        // unique metric name per call: two jaccardPairs in one plan would
        // otherwise fail analysis with DUPLICATED_METRICS_NAME
        .observe(s"jaccard_prefix_prune_${observeSeq.incrementAndGet()}",
          count(when(col("dfg") > maxShingleDF, true)).as("dropped_hot_gram_entries"))
        .filter(col("dfg") <= maxShingleDF)

    // overlap bound α = ⌈t/(1+t)·(|A|+|B|)⌉: jaccard ≥ t ⟺ |A∩B| ≥ α.
    // The constant is floored at 10 digits — only ever weakens the filter.
    val tf = lit(new java.math.BigDecimal(threshold / (1.0 + threshold))
      .setScale(10, java.math.RoundingMode.FLOOR))
    val withSz = indexed.join(sizes, "id")
    // length filter (exact): jaccard ≥ t is impossible unless
    // min(|A|,|B|) ≥ ⌈t·max(|A|,|B|)⌉
    val lengthOk = least(col("a.sz"), col("b.sz")) >=
      ceil(exactDec(threshold) * greatest(col("a.sz"), col("b.sz")))
    if (accumulate)
      withSz.as("a").join(withSz.as("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id") && lengthOk)
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("__opp"),
          max(col("a.pos")).as("__pa"), max(col("b.pos")).as("__pb"),
          first(col("a.sz")).as("__sza"), first(col("b.sz")).as("__szb"))
        .filter(col("__opp") +
            least(col("__sza") - col("__pa"), col("__szb") - col("__pb")) >=
          ceil(tf * (col("__sza") + col("__szb"))))
        .select("id_a", "id_b")
    else
      withSz.as("a").join(withSz.as("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id") && lengthOk &&
            // positional filter (PPJoin): the globally-first common gram g₁
            // sits in both prefixes, every other common gram ranks after it,
            // so |A∩B| ≤ 1 + min(|A|−pos_A(g₁), |B|−pos_B(g₁)); ANY-row
            // survival is exact via g₁'s row
            lit(1) + least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) >=
              ceil(tf * (col("a.sz") + col("b.sz"))))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
  }

  /** Cross-corpus exact n-gram Jaccard near-dups: pairs (id_a ∈ `newDocs`,
    * id_b ∈ `oldDocs`) with jaccard ≥ `threshold` — deduplication of an
    * incoming batch against the EXISTING training corpus, without the
    * corpus self-join q33 runs (the batch-ingest shape: |new| ≪ |old|,
    * and old-vs-old pairs are already resolved). Same PPJoin+ machinery
    * as [[jaccardPairs]] — the prefix/length/accumulation derivations
    * never use that both pair members come from one frame — with the
    * gram order SHARED across sides (document frequencies over the
    * union) so both prefixes are taken under one total order.
    * Caller contract: the two id spaces must be disjoint.
    * Exactness contract as [[jaccardPairs]]: complete unless a shared
    * prefix gram's (union) document frequency exceeds `maxShingleDF`
    * (observed, never silent).
    */
  def crossJaccardPairs(newDocs: DataFrame, oldDocs: DataFrame,
                        textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxShingleDF: Long = 100000L,
                        histBuckets: Int = 16): DataFrame = {
    val perA = shingleSets(newDocs, textCol, idCol, n)
      .select(col("id"), size(col("set")).cast("long").as("sz"), col("set"))
    val perB = shingleSets(oldDocs, textCol, idCol, n)
      .select(col("id"), size(col("set")).cast("long").as("sz"), col("set"))
    val dfg = perA.select(explode(col("set")).as("g"))
      .unionAll(perB.select(explode(col("set")).as("g")))
      .groupBy("g").agg(count("*").as("dfg"))
    def prefix(perDoc: DataFrame) = {
      val sh = perDoc.select(col("id"), explode(col("set")).as("g"))
      val wDoc = Window.partitionBy(col("id")).orderBy(col("dfg"), col("g"))
      val p = sh.join(dfg, "g").join(perDoc.select("id", "sz"), "id")
        .withColumn("__rn", row_number().over(wDoc))
        .filter(col("__rn") <= col("sz") - ceil(exactDec(threshold) * col("sz")) + 1)
        .select(col("id"), col("g"), col("dfg"), col("__rn").as("pos"), col("sz"))
      if (maxShingleDF == Long.MaxValue) p
      else p
        .observe(s"cross_jaccard_prefix_prune_${observeSeq.incrementAndGet()}",
          count(when(col("dfg") > maxShingleDF, true)).as("dropped_hot_gram_entries"))
        .filter(col("dfg") <= maxShingleDF)
    }
    val tf = lit(new java.math.BigDecimal(threshold / (1.0 + threshold))
      .setScale(10, java.math.RoundingMode.FLOOR))
    val lengthOk = least(col("a.sz"), col("b.sz")) >=
      ceil(exactDec(threshold) * greatest(col("a.sz"), col("b.sz")))
    val cands = prefix(perA).as("a").join(prefix(perB).as("b"),
        col("a.g") === col("b.g") && lengthOk)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("__opp"),
        max(col("a.pos")).as("__pa"), max(col("b.pos")).as("__pb"),
        first(col("a.sz")).as("__sza"), first(col("b.sz")).as("__szb"))
      .filter(col("__opp") +
          least(col("__sza") - col("__pa"), col("__szb") - col("__pb")) >=
        ceil(tf * (col("__sza") + col("__szb"))))
      .select("id_a", "id_b")
    val sets = perA.select("id", "set").unionAll(perB.select("id", "set"))
    val refined =
      if (histBuckets <= 0) cands
      else histRefine(cands, sets,
        ceil(tf * (col("__hsza") + col("__hszb"))), histBuckets)
    verifyJaccard(refined, sets, threshold)
  }

  /** Asymmetric containment near-dups: ordered pairs (id_a, id_b),
    * id_a ≠ id_b, where c(A→B) = |A∩B| / |A| ≥ `threshold` over n-gram
    * sets — document A's content mostly present inside B. This is the
    * quote / boilerplate / subsumption detector that symmetric Jaccard
    * (q33) structurally misses: a 100-gram doc fully embedded in a
    * 10 000-gram doc has jaccard ≈ 0.01 but containment 1.0. (The
    * reference's LWW upsert treats byte-identical payloads as dups,
    * kasper `README.md:31-33`; containment is the text-scale
    * generalization a curation pipeline needs.)
    *
    * Candidate generation is prefix-filtered on the CONTAINED side only:
    * overlap ≥ ⌈t·|A|⌉ forces a shared gram inside A's rare-first prefix
    * of length |A| − ⌈t·|A|⌉ + 1 (else all shared grams would fit in the
    * last ⌈t·|A|⌉ − 1 positions — pigeonhole). The container side indexes
    * its full gram list (α depends on the *partner's* size, so no exact
    * container-side prefix exists); rare-first ordering keeps the probe
    * side tiny (~(1−t)·|A| grams), so join cost follows rare-gram posting
    * lists, never all-pairs. Bounds are decimal-exact ([[exactDec]]);
    * same accumulation bound as [[jaccardCandidates]]: uncounted shared
    * grams rank after the globally-last counted gram on BOTH sides, so
    * `opp + min(|A|−pa, |B|−pb) ≥ ⌈t·|A|⌉` is an exact upper-bound test.
    * Same hot-gram guard + exactness contract as [[jaccardPairs]]:
    * complete unless a shared prefix gram's document frequency exceeds
    * `maxShingleDF` (observed, never silent).
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       n: Int = 3, threshold: Double = 0.8,
                       maxShingleDF: Long = 100000L,
                       histBuckets: Int = 16): DataFrame = {
    val perDoc = shingleSets(df, textCol, idCol, n)
      .select(col("id"), size(col("set")).cast("long").as("sz"), col("set"))
    val cands0 = containmentCandidates(perDoc, threshold, maxShingleDF)
    val sets = perDoc.select("id", "set")
    // same suffix refinement as jaccardPairs; here the required overlap
    // is ⌈t·|A|⌉ (containment normalizes by the contained side only)
    val cands =
      if (histBuckets <= 0) cands0
      else histRefine(cands0, sets,
        ceil(exactDec(threshold) * col("__hsza")), histBuckets)
    cands
      .join(sets.select(col("id").as("id_a"), col("set").as("sa")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("set").as("sb")), "id_b")
      .withColumn("__i",
        graft.functions.HashKernels.sortedIntersectCount(col("sa"), col("sb")))
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") / size(col("sa")).cast("double")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Candidate (id_a, id_b) pairs for [[containmentPairs]] from a
    * (id, sz, set) frame — probe-side prefix × full container index,
    * with the PPJoin+-style overlap-accumulation bound (see
    * [[containmentPairs]] for the exactness argument).
    */
  private[graft] def containmentCandidates(perDoc: DataFrame, threshold: Double,
                                           maxShingleDF: Long): DataFrame = {
    val sh = perDoc.select(col("id"), explode(col("set")).as("g"))
    val sizes = perDoc.select("id", "sz")
    val dfg = sh.groupBy("g").agg(count("*").as("dfg"))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("dfg"), col("g"))
    val ranked = sh.join(dfg, "g").join(sizes, "id")
      .withColumn("pos", row_number().over(wDoc))
    // contained-side probe: rare-first prefix of length sz − ⌈t·sz⌉ + 1
    val probe = ranked
      .filter(col("pos") <= col("sz") - ceil(exactDec(threshold) * col("sz")) + 1)
    // container-side index: full gram list, hot-gram skew guard only
    // (recall-trading, observable — same contract as jaccardCandidates)
    val indexed =
      if (maxShingleDF == Long.MaxValue) ranked
      else ranked
        .observe(s"containment_index_prune_${observeSeq.incrementAndGet()}",
          count(when(col("dfg") > maxShingleDF, true)).as("dropped_hot_gram_entries"))
        .filter(col("dfg") <= maxShingleDF)
    probe.as("a").join(indexed.as("b"),
        col("a.g") === col("b.g") && col("a.id") =!= col("b.id") &&
          // container must hold at least ⌈t·|A|⌉ grams at all
          col("b.sz") >= ceil(exactDec(threshold) * col("a.sz")))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("__opp"),
        max(col("a.pos")).as("__pa"), max(col("b.pos")).as("__pb"),
        first(col("a.sz")).as("__sza"), first(col("b.sz")).as("__szb"))
      .filter(col("__opp") +
          least(col("__sza") - col("__pa"), col("__szb") - col("__pb")) >=
        ceil(exactDec(threshold) * col("__sza")))
      .select("id_a", "id_b")
  }

  /** MinHash signature: `numHashes` independent min-hashes over the
    * shingle set, as one array column.
    *
    * Gram base hashes come from the native shingling kernel (one pass,
    * no gram strings — see [[shingleSets]]); the hash family is derived
    * by multiply-add remixing of that base hash (h·A_i + B_i with odd
    * golden-ratio multipliers — a universal-style family, deterministic,
    * no RNG state), folded in one native pass per document.
    */
  def minHashSignatures(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, numHashes: Int = 64,
                        onePerm: Boolean = false): DataFrame = {
    val hashed = shingleSets(df, textCol, idCol, n)
      .select(col("id"), col("set").as("hh"))
    // one native pass over hh for all seeds (HashKernelsSpec asserts
    // bit-equality with the 64× array_min(transform(...)) HOF form).
    // onePerm switches to the O(|set|) one-permutation family — the
    // scale choice when documents are long enough that the per-seed
    // multiply-min dominates (signature cost drops numHashes-fold).
    val sig =
      if (onePerm) graft.functions.HashKernels.onePermSignature(col("hh"), numHashes)
      else graft.functions.HashKernels.minhashSignature(col("hh"), numHashes)
    hashed.select(col("id"), sig.as("sig"))
  }

  /** LSH banding: signature split into `bands` bands of `rows` hashes;
    * docs sharing any band bucket become candidates. Buckets larger than
    * `maxBucket` are dropped (skew guard; at 0.9 similarity and 16×4
    * banding the detection probability stays ≈ 1).
    */
  def lshCandidates(sigs: DataFrame, bands: Int, rows: Int,
                    maxBucket: Long = 10000): DataFrame =
    candidatesFromBanded(bandBuckets(sigs, bands, rows), maxBucket)

  /** The candidate self-join over any (id, band, bh) bucket frame —
    * [[lshCandidates]]' body, shared with the multi-band union (which
    * feeds [[multiBandBuckets]] through ONE join instead of one per
    * banding): bucket-size guard first, then a streamed self-join on
    * the bucket key — pair generation never materializes a bucket's id
    * list in one row (collect_list of a 10k bucket would hand a single
    * task 10⁸ exploded pairs; the join shuffles by (band, bh) and
    * streams them).
    */
  private[graft] def candidatesFromBanded(banded: DataFrame,
                                          maxBucket: Long): DataFrame = {
    val okBuckets = banded.groupBy("band", "bh").agg(count("*").as("n"))
      .filter(col("n") >= 2 && col("n") <= maxBucket)
      .select("band", "bh")
    val small = banded.join(okBuckets, Seq("band", "bh"))
    small.as("a").join(small.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs, exact-verified: candidates from banding,
    * then true Jaccard over the shingle sets, keeping pairs ≥ `threshold`.
    */
  def minHashNearDups(df: DataFrame, textCol: String, idCol: String,
                      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5, onePerm: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = minHashSignatures(df, textCol, idCol, n, numHashes, onePerm)
    val cands = lshCandidates(sigs, bands, numHashes / bands)
    // same verify kernel as jaccardPairs: sorted 8-byte gram hashes +
    // merge-count (a 64-bit collision merging two distinct grams of one
    // document is ~|grams|²/2⁶⁵ — negligible, same trade the candidate
    // index already makes); kernel output is already sorted distinct
    verifyJaccard(cands, shingleSets(df, textCol, idCol, n), threshold)
  }

  /** 64-bit SimHash over the token multiset: bit j is set when the sum of
    * (+1/−1 votes from bit j of each token hash) is positive. Token
    * hashes are computed once per token, then folded per bit.
    */
  def simHash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // hash each token once (native per-element xxhash64 — bit-identical
    // to the transform HOF), then one native pass for all 64 majority
    // votes (HashKernelsSpec asserts bit-equality with the 64×
    // aggregate(...) HOF form)
    val hashed = graft.core.Graft.spread(df).select(col(idCol).as("id"),
      graft.functions.HashKernels.arrayXxHash64(
        TextFunctions.tokens(col(textCol))).as("th"))
    hashed.select(col("id"), graft.functions.HashKernels.simhash(col("th")).as("fp"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming` —
    * candidate generation is *complete* for any radius (multi-index
    * hashing, Norouzi et al. "Fast Search in Hamming Space with
    * Multi-Index Hashing").
    *
    * The fingerprint splits into `chunks` equal slices; by pigeonhole a
    * pair within distance r has some chunk within distance d = ⌊r/chunks⌋.
    * The probe side enumerates every ≤d-bit-flip variant of each chunk
    * (a constant XOR-mask list, C(w,≤d) masks), so candidates remain an
    * equi-join on (chunk index, chunk value) — bucketed, never all-pairs.
    * Probe volume is docs × chunks × C(w,≤d); at a larger radius raise
    * `chunks` to shrink d (more, narrower buckets) — the standard MIH
    * trade, chunks ≈ 64/log₂(n) at scale.
    */
  def simHashNearDups(fps: DataFrame, maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    require(chunks > 0 && 64 % chunks == 0, "chunks must divide 64")
    val w = 64 / chunks
    val d = maxHamming / chunks // per-chunk sub-distance (pigeonhole)
    val chunkMask = if (w == 64) -1L else (1L << w) - 1L
    // refuse configurations whose variant enumeration explodes (e.g.
    // chunks=1 at radius 10 → C(64,≤10) ≈ 1.8e11 masks) BEFORE building
    // anything: raise `chunks` to shrink the per-chunk sub-distance
    val maskCount = (0 to d).map(k =>
      (0 until k).map(i => (w - i).toDouble / (i + 1)).product).sum
    require(maskCount <= 200000,
      f"simHashNearDups(maxHamming=$maxHamming, chunks=$chunks) would enumerate " +
        f"$maskCount%.0f chunk variants — raise `chunks` (need maskCount = ΣC($w,≤$d) bounded)")
    // all XOR masks flipping ≤ d of the w chunk bits (driver-side constant)
    val masks: Seq[Long] = {
      def choose(start: Int, left: Int): Seq[Long] =
        if (left == 0) Seq(0L)
        else (start until w).flatMap(b => choose(b + 1, left - 1).map(_ | (1L << b)))
      (0 to d).flatMap(k => choose(0, k))
    }
    val chunked = fps.select(col("id"), col("fp"),
        posexplode(array((0 until chunks).map(c =>
          shiftright(col("fp"), c * w).bitwiseAND(lit(chunkMask))): _*)))
      .toDF("id", "fp", "chunk", "cv")
    // index side stays exact; probe side explodes the constant mask list
    // (codegen'd generate + native XOR — no per-row lambda dispatch)
    val probe =
      if (masks.size == 1) chunked
      else chunked
        .select(col("id"), col("fp"), col("chunk"), col("cv"), explode(typedLit(masks)).as("m"))
        .select(col("id"), col("fp"), col("chunk"), col("cv").bitwiseXOR(col("m")).as("cv"))
    chunked.as("a").join(probe.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      // exact filter BEFORE the dedup so the distinct shuffle carries
      // only qualifying pairs, not every bucket collision
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** (id, band, bh) band-bucket rows of a signature frame — the unit the
    * LSH equi-join keys on. Shared by [[lshCandidates]] (batch self-join)
    * and the streaming maintainer (delta-vs-accumulated join), so the two
    * candidate paths cannot drift.
    */
  private[graft] def bandBuckets(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(col("id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(slice(col("sig"), b * rows + 1, rows))): _*)))
      .toDF("id", "band", "bh")

  /** [[bandBuckets]] for SEVERAL bandings of one signature, band indices
    * offset per config (config 0 gets 0..b₀−1, config 1 gets b₀.., …)
    * so bucket occupancy — and therefore the maxBucket guard and any
    * (band, bh)-keyed streaming state — stays per-(config, band) and
    * never mixes slices hashed from different row widths. Shared by the
    * batch multi-band union and the streaming maintainers.
    */
  private[graft] def multiBandBuckets(sigs: DataFrame, numHashes: Int,
                                      bandings: Seq[Int]): DataFrame = {
    require(bandings.nonEmpty, "at least one band configuration")
    require(bandings.forall(b => b > 0 && numHashes % b == 0),
      s"every banding must divide numHashes=$numHashes, got $bandings")
    bandings.zipWithIndex.map { case (b, i) =>
      val off = bandings.take(i).sum
      val buckets = bandBuckets(sigs, b, numHashes / b)
      if (off == 0) buckets
      else buckets.select(col("id"), (col("band") + lit(off)).as("band"), col("bh"))
    }.reduce(_ unionAll _)
  }

  /** Exact-jaccard verification of candidate id pairs against per-doc
    * gram sets (the shared tail of [[jaccardPairs]]/[[minHashNearDups]]
    * and the streaming maintainer): sorted-merge intersection count, keep
    * pairs with true jaccard ≥ `threshold`.
    */
  private[graft] def verifyJaccard(cands: DataFrame, sets: DataFrame,
                                   threshold: Double): DataFrame = cands
    .join(sets.select(col("id").as("id_a"), col("set").as("sh_a")), "id_a")
    .join(sets.select(col("id").as("id_b"), col("set").as("sh_b")), "id_b")
    .withColumn("__i",
      graft.functions.HashKernels.sortedIntersectCount(col("sh_a"), col("sh_b")))
    .select(col("id_a"), col("id_b"),
      (col("__i").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("__i")).cast("double")).as("jaccard"))
    .filter(col("jaccard") >= threshold)

  /** End-to-end near-dup deduplication — the composition a training-data
    * pipeline actually runs: MinHash-LSH candidate pairs (exact-verified
    * at `threshold`) → [[connectedComponents]] → one survivor per group
    * (the minimum id, matching [[dedupExact]]'s survivor rule). Returns
    * one row per document: (id, group, keep) — filter on `keep` to
    * drop near-duplicates, keep `group` to audit what collapsed where.
    * Scale shape: the pair stage is the LSH equi-join (never all-pairs),
    * CC rounds are equi-joins over the pair list (tiny next to the
    * corpus), and the final labeling is one left join on id.
    */
  def nearDupGroups(docs: DataFrame, textCol: String, idCol: String,
                    n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                    threshold: Double = 0.5, maxIters: Int = 20): DataFrame = {
    val pairs = minHashNearDups(docs, textCol, idCol, n, numHashes, bands, threshold)
      .select("id_a", "id_b")
    labelGroups(docs, idCol, pairs, "id_a", "id_b", maxIters)
  }

  /** [[nearDupGroups]] at a LARGER dedup radius via a multi-band union:
    * ONE MinHash signature, candidates generated under SEVERAL band
    * configurations (each `b ∈ bandings` splits the signature into b
    * bands of numHashes/b rows), unioned, exact-verified at the (low)
    * `threshold`, then one CC closure. This is the fuzzy-dup band
    * between PPJoin's high-threshold exactness (prefix filters thin out
    * as (1−t)·|doc| grows) and SemDeDup's embedding rail: at t ≈ 0.3 a
    * single 16-band config's detection probability sags mid-range,
    * while the union 1 − Π_b (1 − s^{r_b})^b keeps it high across the
    * whole radius — narrow bands (32×2) catch the low end, wide bands
    * (16×4) stay selective at the top, and every candidate is still
    * exact-verified so false positives cost only verify work, never
    * correctness.
    *
    * Scale shape: signatures are computed ONCE (cached via the tracked
    * registry — referenced once per banding) and each banding is the
    * same bucket-bounded equi-join [[lshCandidates]] runs; the union is
    * pair-id-sized, deduped before the verify join; CC is the shared
    * O(log n) closure. Output: (idCol, group, keep) like
    * [[nearDupGroups]].
    */
  def nearDupGroupsMultiBand(docs: DataFrame, textCol: String, idCol: String,
                             n: Int = 3, numHashes: Int = 64,
                             bandings: Seq[Int] = Seq(16, 32),
                             threshold: Double = 0.3,
                             maxIters: Int = 20): DataFrame = {
    require(bandings.nonEmpty, "at least one band configuration")
    require(bandings.forall(b => b > 0 && numHashes % b == 0),
      s"every banding must divide numHashes=$numHashes, got $bandings")
    // one signature pass, shared by every banding (DAG-reuse rule:
    // an uncached sigs frame would re-run shingling+minhash per
    // banding); ONE candidate self-join over the unioned bucket rows
    // instead of one join + distinct per banding
    val sigs = graft.ops.ScaleOps.trackCache(
      minHashSignatures(docs, textCol, idCol, n, numHashes))
    val cands = candidatesFromBanded(
      multiBandBuckets(sigs, numHashes, bandings), maxBucket = 10000)
    val pairs = verifyJaccard(cands, shingleSets(docs, textCol, idCol, n), threshold)
      .select("id_a", "id_b")
    labelGroups(docs, idCol, pairs, "id_a", "id_b", maxIters)
  }

  /** The shared tail of the dedup-group family: label every row of `ids`
    * with its dup-component's min id (isolated rows label themselves)
    * plus a survivor flag. Output: (idCol, group, keep). `maxIters`
    * bounds the propagation rounds — raise it for unusually chain-shaped
    * dup graphs (each round covers one more hop of component diameter).
    */
  def labelGroups(ids: DataFrame, idCol: String, pairs: DataFrame,
                  aCol: String, bCol: String, maxIters: Int = 20): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIters)
      .withColumnRenamed("id", idCol)
    ids.select(col(idCol)).join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("grp"), col(idCol)).as("group"))
      .withColumn("keep", col("group") === col(idCol))
  }

  /** [[labelGroups]] with a quality-aware survivor rule: within each dup
    * component the KEPT row is the one maximizing `quality` (a Column
    * over `ids`' rows; ties break to the minimum id), not the minimum
    * id. This is the curation form of dedup — near-dup clusters usually
    * mix a clean original with truncated/boilerplated copies, and
    * min-id keeps whichever was crawled first rather than whichever is
    * best. Output: (idCol, group, quality, keeper, keep).
    *
    * Requirements: `idCol` is numeric (the tie-break negates it inside
    * a struct-max) and `quality` is non-null (null would lose the
    * struct comparison unpredictably — coalesce upstream). Scale shape:
    * the argmax is ONE map-side-combinable struct-max groupBy over
    * (group, quality) pairs — id-sized rows, never document payloads —
    * followed by an id-keyed broadcast-or-shuffle join back.
    *
    * Reference: near-dup clustering keeps one survivor per group
    * (kasper has no quality notion; rule generalizes
    * /root/reference/examples's dedup-by-key pattern).
    */
  def keepBest(ids: DataFrame, idCol: String, pairs: DataFrame,
               aCol: String, bCol: String, quality: Column,
               maxIters: Int = 20): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIters)
      .withColumnRenamed("id", idCol)
    val labeled = ids.select(col(idCol), quality.as("quality"))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("grp"), col(idCol)).as("group"),
        col("quality"))
    // argmax(quality, tie → min id) = max of struct(quality, −id):
    // struct ordering is lexicographic, so the negated id resolves ties
    // toward the smallest id without a second pass
    val best = labeled.groupBy("group")
      .agg(max(struct(col("quality").as("q"),
        (-col(idCol)).as("nid"))).as("b"))
      .select(col("group"), (-col("b.nid")).as("keeper"))
    labeled.join(best, "group")
      .select(col(idCol), col("group"), col("quality"), col("keeper"),
        (col(idCol) === col("keeper")).as("keep"))
  }

  /** Connected components over an undirected pair list (the step that
    * turns near-dup PAIRS into dedup GROUPS), in two phases:
    *
    *  1. MIN-LABEL PROPAGATION, up to 6 rounds — the cheap shape (one
    *     equi-join + one groupBy-min per round, map-side combinable).
    *     Near-dup components are dense and shallow, so almost every
    *     real workload converges here in 2-4 rounds and pays nothing
    *     for phase 2.
    *  2. If not converged: alternating LARGE-STAR / SMALL-STAR edge
    *     contraction (Kiveris et al. 2014, "Connected Components in
    *     MapReduce and Beyond") over the LABEL-QUOTIENT graph —
    *     O(log n) rounds on ANY shape, so chain-shaped components
    *     longer than the round cap (a 100 TB boilerplate chain doc
    *     A≈B≈C≈…), where diameter-bound propagation *failed loudly*
    *     before round 7, converge. Large-star points every
    *     strictly-larger neighbor of u at `min(N(u) ∪ {u})`;
    *     small-star flattens each canonical star onto `min(N(hi))`;
    *     the fixpoint (set equality, count + one anti-join) is the
    *     min-star forest. Quotient node ids are original ids, so the
    *     composed label is still the component-wide minimum.
    *
    * Every round in both phases is plain groupBy-min + equi-join
    * shuffles — never all-pairs — with the superseded round's
    * checkpoint released as soon as it is consumed.
    *
    * Returns (id, group) for every id that appears in `pairs`; callers
    * left-join + coalesce to give isolated rows their own group.
    * Throws if `maxIters` total rounds don't converge (loud, not
    * silently wrong; at O(log n) contraction rounds the default cap
    * covers any realistic graph).
    *
    * Memory contract: the RETURNED frame holds its own checkpoint
    * blocks; call [[releaseCheckpoint]] on it once fully consumed if
    * labeling many corpora in one long-lived session.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 20): DataFrame = {
    val nodes = pairs.select(col(aCol).as("id"))
      .unionAll(pairs.select(col(bCol).as("id")))
      .distinct() // consumed once by the final join — no checkpoint job
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .cache() // scanned every phase-1 round
    // phase 1: min-label propagation — the CHEAP round shape (one join +
    // one groupBy-min per round); near-dup components are dense and
    // shallow, so almost every real workload converges here in 2-4
    // rounds and never pays for contraction
    val propRounds = math.min(6, maxIters)
    var lab = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("grp"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < propRounds) {
      val viaNbr = edges.join(lab.select(col("id").as("dst"), col("grp")), "dst")
        .select(col("src").as("id"), col("grp"))
      // LAZY checkpoint + the convergence count as its materializer:
      // one job per round does the join, the min fold, the block write
      // AND the changed-count (the eager form paid a second full
      // materialization job per round)
      val next = viaNbr.unionAll(lab)
        .groupBy("id").agg(min("grp").as("grp"))
        .localCheckpoint(false)
      val changed = next.select(col("id"), col("grp").as("__g2"))
        .join(lab, "id").filter(col("__g2") =!= col("grp")).count()
      releaseCheckpoint(lab) // `changed` was the last consumer of this round
      lab = next
      converged = changed == 0
      round += 1
    }
    if (!converged) {
      // phase 2: alternating large-star/small-star contraction (Kiveris
      // et al. 2014) over the LABEL-QUOTIENT graph — O(log n) rounds on
      // any shape, so chain-shaped components (doc A≈B≈C≈… boilerplate
      // runs at 100 TB) converge where diameter-bound propagation
      // cannot. Quotient labels are original node ids, so the final
      // label is still the component-wide minimum id.
      val qEdges = edges
        .join(lab.select(col("id").as("src"), col("grp").as("ga")), "src")
        .join(lab.select(col("id").as("dst"), col("grp").as("gb")), "dst")
        .select(greatest(col("ga"), col("gb")).as("hi"),
          least(col("ga"), col("gb")).as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
        .localCheckpoint(false) // materialized by the count right below
      var cur = qEdges
      var curCnt = cur.count()
      var starConverged = curCnt == 0L
      while (!starConverged && round < maxIters) {
        // large-star: strictly-larger neighbors re-point to
        // min(N(u) ∪ {u}). ls is NOT distinct-ed — duplicates (≤ 2 per
        // edge) change neither mins2's min nor ss's final distinct
        val dir = cur.select(col("hi").as("u"), col("lo").as("v"))
          .unionAll(cur.select(col("lo").as("u"), col("hi").as("v")))
        val mins = dir.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m"))
        val ls = dir.filter(col("v") > col("u"))
          .join(mins, "u")
          .select(col("v").as("hi"), col("m").as("lo"))
          .filter(col("hi") =!= col("lo"))
          .cache() // read twice (mins2 + the ss join) — DAG-reuse rule
        // small-star: hi's smaller neighbors and hi itself re-point to
        // min(N(hi)); output stays canonical (hi > lo)
        val mins2 = ls.groupBy("hi").agg(min(col("lo")).as("m"))
        val ss = ls.join(mins2, "hi")
          .select(col("lo").as("hi"), col("m").as("lo"))
          .unionAll(mins2.select(col("hi"), col("m").as("lo")))
          .filter(col("hi") =!= col("lo"))
          .distinct()
          .localCheckpoint(false) // materialized by the count right below
        // both sides are distinct sets: equal counts + one empty
        // one-sided anti-join ⇔ set equality. The count doubles as the
        // lazy checkpoint's materializer, so release ls only after it.
        val ssCnt = ss.count()
        ls.unpersist(false)
        val changed = ssCnt != curCnt ||
          ss.join(cur, Seq("hi", "lo"), "left_anti").count() > 0
        releaseCheckpoint(cur) // the anti-join was this round's last consumer
        cur = ss
        curCnt = ssCnt
        starConverged = !changed
        round += 1
      }
      if (!starConverged) {
        // release BEFORE throwing: the loud-failure path's own advice is
        // "retry with a raised cap", and a long-lived session must not
        // accumulate pinned blocks per failed attempt
        edges.unpersist(blocking = false)
        releaseCheckpoint(lab); releaseCheckpoint(qEdges); releaseCheckpoint(cur)
        throw new IllegalArgumentException(
          s"connectedComponents did not converge in $maxIters rounds — raise maxIters")
      }
      // compose: node → phase-1 label → its quotient component minimum
      val next = lab
        .join(cur.select(col("hi").as("grp"), col("lo").as("__g2")), Seq("grp"), "left")
        .select(col("id"), coalesce(col("__g2"), col("grp")).as("grp"))
        .localCheckpoint(true)
      releaseCheckpoint(lab); releaseCheckpoint(qEdges); releaseCheckpoint(cur)
      lab = next
      converged = true
    }
    val out = nodes
      .join(lab, Seq("id"), "left")
      .select(col("id"), coalesce(col("grp"), col("id")).as("grp"))
      .localCheckpoint(true)
    edges.unpersist(blocking = false)
    releaseCheckpoint(lab)
    out
  }

  /** Release the persisted blocks behind a localCheckpoint-ed frame (a
    * checkpointed Dataset is a LogicalRDD over persisted partitions; no
    * API drops those blocks implicitly). No-op on non-checkpointed frames.
    */
  def releaseCheckpoint(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    case _ => ()
  }

  // non-token separator so joined grams cannot collide across boundaries
  // ("ab"+"c" vs "a"+"bc"); mirrored as chr(1) in the DuckDB oracle
  private val GramSep = "\u0001"

  /** (id, p, g) positional n-token grams of every document — 1-based
    * start position, gram key either the joined token string (the
    * oracle-exact form) or its xxhash64 (8-byte keys — what actually
    * shuffles at corpus scale; DedupSpec asserts the two agree on the
    * fixture). Documents shorter than `n` tokens emit nothing; the
    * empty-case guard matters because Spark's `sequence(1, 0)` counts
    * DOWN rather than returning empty.
    */
  private def positionalGrams(df: DataFrame, textCol: String, idCol: String,
                              n: Int): DataFrame = {
    val toks = graft.core.Graft.spread(df)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("t"))
    val grams = when(size(col("t")) >= n,
        transform(sequence(lit(1), size(col("t")) - lit(n - 1)),
          i => concat_ws(GramSep, slice(col("t"), i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    toks.select(col("id"), size(col("t")).as("len"), grams.as("gs"))
  }

  /** Duplicated-substring statistics — the exact-substring rung of the
    * dedup family (the MinHash/SimHash rungs catch near-identical whole
    * documents; this catches verbatim PASSAGES pasted across otherwise
    * unrelated documents, the contamination mode whole-doc similarity
    * misses). A position is a duplicated span start when its n-token
    * gram occurs more than once in the corpus (any document, including
    * repeats within the same one). Per document:
    * (id, n_spans, dup_spans, dup_tokens) — span-start count, duplicated
    * span-start count, and tokens covered by the UNION of duplicated
    * spans (interval merge: ordered by start, each span adds
    * min(n, gap-from-previous) fresh tokens — one per-doc window pass,
    * no interval list ever materializes).
    *
    * Scale shape: tokenize+gram is one projection, the duplicate test is
    * one groupBy on the gram key (map-side combinable, 8-byte keys when
    * `hashed`), coverage is a window over only the duplicated positions.
    * Nothing is all-pairs; boilerplate grams cost their occurrence
    * count, not its square.
    */
  def dupSpanStats(df: DataFrame, textCol: String, idCol: String, n: Int,
                   hashed: Boolean = true): DataFrame = {
    require(n >= 1, s"span length must be >= 1, got $n")
    val perDoc = positionalGrams(df, textCol, idCol, n)
    val pos = perDoc.select(col("id"), posexplode(col("gs")))
      .select(col("id"), (col("pos") + 1).as("p"),
        (if (hashed) xxhash64(col("col")) else col("col")).as("g"))
    val hot = pos.groupBy("g").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select("g")
    val w = Window.partitionBy("id").orderBy("p")
    // n_spans comes straight off the token count — this branch never
    // builds the gram array, so the transform+explode subtree is
    // evaluated twice (occurrence count + join side), not three times
    val cov = pos.join(hot, "g")
      .withColumn("__d",
        least(lit(n), coalesce(col("p") - lag("p", 1).over(w), lit(n))))
      .groupBy("id").agg(count(lit(1)).as("dup_spans"),
        sum("__d").cast("long").as("dup_tokens"))
    perDoc.select(col("id"),
        greatest(col("len") - lit(n - 1), lit(0)).cast("long").as("n_spans"))
      .join(cov, Seq("id"), "left")
      .select(col("id"), col("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** Remove duplicated spans: every token covered by some duplicated
    * n-gram span (per [[dupSpanStats]]'s corpus-wide rule) is dropped
    * and the survivors re-joined with single spaces — the Lee et al.
    * "deduplicating training data" repair, as a per-document rewrite.
    * Output: (id, text). Duplicated-start positions collect into one
    * bounded per-doc array (≤ token count); the per-token covered test
    * is an interpreted HOF over that array — fine for a rewrite pass
    * that runs once per corpus build, and only over docs that HAVE
    * duplicated spans (the left-join keeps clean docs untouched on the
    * no-op branch).
    */
  def stripDupSpans(df: DataFrame, textCol: String, idCol: String, n: Int,
                    hashed: Boolean = true): DataFrame = {
    require(n >= 1, s"span length must be >= 1, got $n")
    val perDoc = positionalGrams(df, textCol, idCol, n)
    val pos = perDoc.select(col("id"), posexplode(col("gs")))
      .select(col("id"), (col("pos") + 1).as("p"),
        (if (hashed) xxhash64(col("col")) else col("col")).as("g"))
    val hot = pos.groupBy("g").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select("g")
    val starts = pos.join(hot, "g")
      .groupBy("id").agg(sort_array(collect_list(col("p"))).as("ps"))
    val toks = graft.core.Graft.spread(df)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("t"))
    toks.join(starts, Seq("id"), "left")
      .select(col("id"),
        when(col("ps").isNull, concat_ws(" ", col("t"))).otherwise(
          concat_ws(" ", filter(col("t"), (_, i) =>
            !exists(col("ps"), s => i + 1 >= s && i + 1 < s + n))))
          .as("text"))
  }

  /** Prefix-blocked edit-distance near-dup pairs: all (a, b) with
    * `a.id < b.id`, equal `blockCols`, equal first two tokens, and
    * Levenshtein distance ≤ `maxDist` over the raw text. Character-level
    * edit distance is the classic near-dup test that token-set measures
    * (Jaccard/MinHash) miss: it sees reorderings and small in-word edits
    * as cheap, and is the right tool for short, high-value strings
    * (titles, URLs, code lines).
    *
    * Scale design: Levenshtein is O(|a|·|b|) per pair, so candidate
    * generation must be an equi-join, never all-pairs. Blocking key =
    * (blockCols…, first two tokens): near-identical docs agree on their
    * opening tokens with overwhelming probability (an edit in the first
    * two tokens is the declared, documented miss — the standard
    * prefix-blocking trade). The verify uses Spark's thresholded
    * `levenshtein(l, r, maxDist)` (banded Ukkonen under the hood: cost
    * O(|a|·maxDist), returns -1 past the bound) so the per-pair cost is
    * linear in the threshold, not quadratic in the text.
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        maxDist: Int, blockCols: Seq[String] = Nil): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    def side(s: String): DataFrame = {
      val t = TextFunctions.tokens(col(textCol))
      df.select(col(idCol).as("id" + s) +: col(textCol).as("t" + s) +:
        element_at(t, 1).as("w1" + s) +: element_at(t, 2).as("w2" + s) +:
        blockCols.map(c => col(c).as(c + s)): _*)
    }
    val a = side("_a"); val b = side("_b")
    val block = Seq(
      a("w1_a") === b("w1_b"), a("w2_a") === b("w2_b"),
      a("id_a") < b("id_b")) ++
      blockCols.map(c => a(c + "_a") === b(c + "_b"))
    a.join(b, block.reduce(_ && _), "inner")
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
