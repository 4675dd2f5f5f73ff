package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Corpus-preparation operators for large-scale training-data pipelines —
  * the curation layer above the dedup family (`graft.dedup`): repetition
  * quality gates, benchmark decontamination, deterministic sampling /
  * domain mixing, sequence packing, and embedding quantization.
  *
  * All operators are declarative DataFrame compositions (groupBy / window
  * / equi-join — Catalyst plans partial aggregation and AQE handles skew)
  * and every one is deterministic: sampling uses an arithmetic hash of
  * the id, never an RNG, so a re-run over 100 TB selects byte-identical
  * rows — the property that makes pipeline stages retryable.
  */
object CorpusOps {

  /** Gopher-style repetition metrics per document: total word-`n`-gram
    * count, fraction of n-gram occurrences that are duplicates, and the
    * top n-gram's share (MassiveText's "repetition" quality signals —
    * boilerplate and spam score high on both). Documents with fewer than
    * `n` tokens are dropped (no n-grams to measure).
    *
    * Output: (id, total_ngrams, dup_frac, top_frac). One shuffle on
    * (id, gram) for the per-gram counts, then a map-side-combinable
    * re-aggregation by id.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame =
    repetitionStatsOf(graft.core.Graft.spread(docs), idCol,
      TextFunctions.tokens(col(textCol)), n)

  /** [[repetitionStats]] from an already-materialized token array —
    * the fused-pipeline form (no re-spread: the caller owns layout).
    */
  def repetitionStatsOf(docs: DataFrame, idCol: String, tokensCol: Column,
                        n: Int = 2): DataFrame = {
    val t = docs
      .select(col(idCol).as("id"), tokensCol.as("t"))
      .filter(size(col("t")) >= n)
    // A document's n-grams all live in its own row, so the reduction is
    // per-row, NOT a groupBy — zero shuffles at any corpus size (the
    // groupBy-(id, gram) formulation shuffles the entire gram stream
    // twice). The whole reduction is TWO native passes: per-token
    // xxhash64, then the fused gram-hash→sort→run-count kernel (the
    // previous form ran three interpreted HOF passes materializing gram
    // strings and a hash array per document — the same shape
    // NgramSetHashes killed on the dedup side). Gram equality via 64-bit
    // hash: collision odds within one document are ~(grams choose 2)/2^64
    // — vanishing, and the DuckDB oracle (string-exact) would catch any
    // at gate scale.
    t.select(col("id"),
        graft.functions.HashKernels.ngramRunStats(
          graft.functions.HashKernels.arrayXxHash64(col("t")), n).as("st"))
      .select(col("id"), col("st.total").as("total_ngrams"),
        (col("st.dup").cast("double") / col("st.total").cast("double")).as("dup_frac"),
        (col("st.top").cast("double") / col("st.total").cast("double")).as("top_frac"))
  }

  /** Benchmark decontamination: count, per corpus document, the distinct
    * word-`n`-gram shingles it shares with ANY held-out (benchmark)
    * document — the n-gram-overlap contamination check run before
    * training on web-scale corpora. Only contaminated documents are
    * returned (id, n_shared).
    *
    * The held-out gram set is distinct-reduced and BROADCAST: benchmark
    * suites are tiny next to a 100 TB corpus, so the corpus-side scan
    * never shuffles — the right asymmetry at scale. Shingling uses
    * [[TextFunctions.shingles]] (distinct per doc, whole-text fallback
    * below `n` tokens).
    */
  def decontaminate(corpus: DataFrame, heldOut: DataFrame,
                    idCol: String, textCol: String, n: Int = 4): DataFrame = {
    def sh(df: DataFrame) = graft.core.Graft.spread(df)
      .select(col(idCol).as("id"), explode(TextFunctions.shingles(col(textCol), n)).as("g"))
    val held = sh(heldOut).select("g").distinct()
    sh(corpus).join(broadcast(held), "g")
      .groupBy("id").agg(count("*").as("n_shared"))
  }

  /** Bloom-gated decontamination — [[decontaminate]]'s scale variant for
    * when the held-out side itself is big. The held-out gram-hash set
    * folds into a Bloom filter (distributed sketch aggregation, fpp
    * 1e-6 ≈ 3.6 bytes/gram vs 16+ for the exact hashed relation); the
    * corpus side then runs ONE shuffle-free codegen'd scan counting
    * per-doc gram hits ([[graft.functions.BloomCountHits]]). No false
    * negatives by construction — every exactly-contaminated doc is
    * flagged; false positives over-flag at ≤ n_grams·fpp per doc, so use
    * this as the cheap first pass (or alone when that rate is tolerable)
    * and [[decontaminate]] as the exact re-check on the survivors.
    * Two tiny jobs run on the held-out side only (count to size the
    * filter, then the sketch build); the corpus never shuffles.
    */
  def decontamBloom(corpus: DataFrame, heldOut: DataFrame,
                    idCol: String, textCol: String,
                    n: Int = 4, fpp: Double = 1e-6): DataFrame = {
    import graft.functions.{BloomKernel, HashKernels}
    def grams(df: DataFrame) = graft.core.Graft.spread(df)
      .select(col(idCol).as("id"),
        HashKernels.ngramSetHashes(
          HashKernels.arrayXxHash64(TextFunctions.tokens(col(textCol))), n).as("set"))
    val held = grams(heldOut).select(explode(col("set")).as("g")).distinct()
    val nGrams = math.max(held.count(), 1L)
    val bloom = held.stat.bloomFilter("g", nGrams, fpp)
    val bytes = BloomKernel.serialize(bloom)
    grams(corpus).select(col("id"),
        size(col("set")).cast("long").as("n_grams"),
        BloomKernel.countHits(col("set"), bytes).as("n_flagged"))
      .withColumn("contaminated", col("n_flagged") > 0)
  }

  /** Bloom-gated decontamination with the EXACT residual verify —
    * [[decontamBloom]]'s prefilter speed with [[decontaminate]]'s
    * answer: the held-out STRING gram set builds the Bloom filter
    * (hashed via xxhash64 — deterministic, so every held gram's hash is
    * in the filter and a shared gram can never miss: NO false
    * negatives), the corpus gram stream is gated by the codegen'd
    * scalar probe INSIDE the scan, and only surviving grams reach the
    * exact gram join that removes the false positives. The result
    * therefore EQUALS [[decontaminate]] at ANY fpp (q179's oracle IS
    * q47's SQL — the salting/IVM result-invariance discipline, q170's
    * pattern applied to the decontam rail).
    *
    * Scale shape: where [[decontaminate]] requires the held gram set to
    * broadcast, here the residual join only sees the ≤ n_shared +
    * n_grams·fpp fraction the bloom lets through — the shuffle-volume
    * reduction that matters when the held-out side is itself too big to
    * broadcast (the q170 regime).
    */
  def decontamBloomExact(corpus: DataFrame, heldOut: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 4, fpp: Double = 1e-4): DataFrame = {
    import graft.functions.BloomKernel
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    def sh(df: DataFrame) = graft.core.Graft.spread(df)
      .select(col(idCol).as("id"), explode(TextFunctions.shingles(col(textCol), n)).as("g"))
    // held grams feed the bloom build AND the residual join (DAG-reuse
    // rule: cache a frame referenced twice; Verify/Bench clearCache)
    val held = sh(heldOut).select("g").distinct().cache()
    val nGrams = math.max(held.count(), 1L)
    val bloom = held.select(xxhash64(col("g")).as("h")).stat.bloomFilter("h", nGrams, fpp)
    val bytes = BloomKernel.serialize(bloom)
    sh(corpus)
      .filter(BloomKernel.mightContain(xxhash64(col("g")), bytes))
      .join(held, "g")
      .groupBy("id").agg(count("*").as("n_shared"))
  }

  /** Corpus-level chunk deduplication with document reassembly — the
    * C4/RefinedWeb curation step "drop any span that occurs verbatim
    * elsewhere in the corpus, keep the first occurrence" lifted to
    * fixed-size token chunks: split every document into non-overlapping
    * `chunkSize`-token chunks ([[chunkTokens]], overlap 0 — one
    * shuffle-free projection pass), elect one WINNER per distinct chunk
    * text (the minimum (doc, chunk_idx) — deterministic), and rebuild
    * each document from only its winning chunks, in original order.
    * Documents whose every chunk lost elsewhere come back empty (kept
    * as rows — the caller decides whether to drop empties).
    *
    * Scale shape: one hash-partitioned groupBy on the chunk text (the
    * dedup shuffle — map-side combinable min), one equi-join back, one
    * per-doc reassembly agg; no all-pairs anything. The reassembly
    * sorts WITHIN each doc's collected chunk array (`sort_array` on
    * (idx, text) structs — per-row, not a shuffle order dependency), so
    * the output text is deterministic under any execution order.
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkSize: Int): DataFrame = {
    val ch = chunkTokens(df, idCol, textCol, chunkSize, overlap = 0)
      .select(col("id"), col("chunk_idx"), col("chunk_text"))
    val winners = ch
      .groupBy("chunk_text")
      .agg(min(struct(col("id"), col("chunk_idx"))).as("__w"))
      .select(col("chunk_text"), col("__w.id").as("__wid"),
        col("__w.chunk_idx").as("__widx"))
    val kept = ch.join(winners, "chunk_text")
      .filter(col("id") === col("__wid") && col("chunk_idx") === col("__widx"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          s => s.getField("chunk_text"))).as("clean_text"))
    df.select(col(idCol).as("id")).distinct()
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Greedy coverage-maximizing document selection (submodular
    * facility-location/max-cover greedy): pick `k` documents one round
    * at a time, each round taking the document whose DISTINCT `n`-gram
    * set adds the most not-yet-covered grams (marginal gain; ties to
    * the lower doc id). The data-selection step behind "small subset,
    * maximal diversity" curation — the greedy is the classic (1−1/e)
    * approximation to the NP-hard optimum, and its output is fully
    * deterministic, so small-k runs are exact-oracle-able by unrolling
    * rounds in SQL.
    *
    * Scale shape: the corpus gram stream is computed ONCE and cached;
    * each round is one anti-join against the covered-gram set — held as
    * a DRIVER-side set (the union of ≤ k winner gram sets, bounded and
    * broadcast-sized by contract) so round r costs two bounded jobs
    * over the cached gram stream (argmax + the winner's gram fetch),
    * never re-executing prior rounds' unions (the uncached
    * unionAll+distinct chain was O(k²) recompute with a per-round
    * growing lineage). k rounds = 2k jobs — linear in k, never
    * quadratic in corpus size (job count spec-asserted). Returns
    * (round, id, gain) for the k winners (fewer rows when the corpus
    * runs out of uncovered grams first — every remaining gain would be
    * 0 and selection stops).
    */
  def coverageSelect(df: DataFrame, idCol: String, textCol: String,
                     n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")
    val spark = df.sparkSession
    import spark.implicits._
    val grams = graft.core.Graft.spread(df)
      .select(col(idCol).cast("long").as("id"), // int ids welcome too
        explode(TextFunctions.shingles(col(textCol), n)).as("g"))
      .distinct()
      .cache()
    var covered = Set.empty[String]
    val winners = Seq.newBuilder[(Long, Long, Long)]
    var round = 1L
    var exhausted = false
    while (round <= k && !exhausted) {
      val coveredDf = spark.createDataset(covered.toSeq).toDF("g")
      val top = grams.join(broadcast(coveredDf), Seq("g"), "left_anti")
        .groupBy("id").agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val id = top(0).getLong(0)
        winners += ((round, id, top(0).getLong(1)))
        covered ++= grams.filter(col("id") === id).select("g")
          .collect().map(_.getString(0))
        round += 1
      }
    }
    grams.unpersist(blocking = false)
    winners.result().toDF("round", "id", "gain")
  }

  /** Deterministic arithmetic sampling rank: Knuth multiplicative hash of
    * the id modulo a prime. Both factors fit comfortably in BIGINT for
    * any realistic id (no overflow below ids of ~3.4e9; the engine runs
    * ANSI-off so larger ids wrap identically everywhere Spark runs, but
    * cross-engine oracles should stay below that).
    */
  def sampleRank(id: Column): Column =
    pmod(id.cast("long") * lit(2654435761L), lit(1000000007L))

  /** Deterministic stratified "reservoir": the `k` lowest-ranked rows per
    * stratum under [[sampleRank]] — a fixed-size uniform sample per group
    * that any re-run reproduces exactly. One shuffle on the stratum key;
    * rank ties break by id so the result is total-ordered.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(sampleRank(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic WEIGHTED sampling (integer weights, virtual-ticket
    * scheme): row `id` with weight `w` holds tickets `h(id, 0..w-1)`
    * and the k rows with the lowest minimum ticket win. The ticket hash
    * SQUARES the linear mix mod p: a plain linear-in-`i` hash keeps a
    * row's w tickets inside a ~w·stride window of the modulus (the min of
    * 5000 such tickets is no better than one draw), while the quadratic
    * polynomial `(c + i·s)² mod p` equidistributes (Weyl), so
    * min-of-w ≈ p/w — heavy rows actually win. P(selected) grows with
    * `w` (for k ≪ n it approaches proportionality), re-runs are
    * byte-identical (no RNG),
    * and — unlike the float Efraimidis–Spirakis exponential-key scheme —
    * every comparison is integer arithmetic, so the selection is
    * engine-exact and oracle-checkable. The per-row ticket fold is
    * O(w): `maxWeight` guards against a degenerate weight column turning
    * one row into a million-iteration loop (raise it consciously).
    * Weights ≤ 0 (and NULL weights) never win a ticket and are dropped
    * outright — documents explicitly weighted out stay out even when
    * k exceeds the positive-weight row count.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int, maxWeight: Int = 10000): DataFrame = {
    // NULL weight = weight 0 (least() would otherwise SKIP the null and
    // hand the row the maxWeight cap — the heaviest possible ticket set)
    val w = least(coalesce(weightCol.cast("long"), lit(0L)), lit(maxWeight.toLong))
    // native one-pass ticket fold (zero allocation, whole-stage codegen);
    // w <= 0 yields the Long.MaxValue never-wins sentinel inside the kernel
    val rank = graft.functions.HashKernels.weightedMinTicket(col(idCol).cast("long"), w)
    df.withColumn("__wrank", rank)
      // sentinel rows must not back-fill the tail when k > |w > 0|
      .filter(col("__wrank") =!= Long.MaxValue)
      .orderBy(col("__wrank"), col(idCol))
      .limit(k)
      .drop("__wrank")
  }

  /** Temperature-scaled domain mixing (the multilingual-training sampling
    * scheme, α = 0.5): stratum `s` keeps `min(|s|, ceil(scale · √|s|))`
    * rows, chosen by [[sampleRank]] — large domains are down-weighted,
    * small ones kept nearly whole, deterministically. Two shuffles on the
    * stratum key (count, then rank); the per-stratum quota join is a
    * broadcast (strata counts are tiny).
    */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
                     scale: Double): DataFrame = {
    val quota = df.groupBy(col(strataCol)).agg(count("*").as("__n"))
      .select(col(strataCol),
        least(col("__n"), ceil(sqrt(col("__n").cast("double")) * lit(scale))).as("__k"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(sampleRank(col(idCol)), col(idCol))
    df.join(broadcast(quota), strataCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__k")).drop("__rn", "__k")
  }

  /** Epoch-weighted mixture materialization — the data-recipe mixing op:
    * each row is repeated per its domain's repeat factor, with
    * NON-INTEGER factors handled deterministically. `factorBp` is the
    * factor in BASIS POINTS (22500 = 2.25 epochs): a row gets
    * ⌊f⌋ copies plus one more when its hash indicator lands below the
    * fractional part — so factor 0.25 is a deterministic 25%
    * downsample, 2.25 is two epochs plus a deterministic quarter, and
    * expected copies equal the factor exactly. Everything is integer
    * arithmetic on basis points (no float comparison anywhere), so the
    * materialized mixture is engine-exact and re-runs are byte-identical
    * — a retried 100 TB export job reproduces the same mixture, and an
    * oracle can re-derive it. The indicator hash is offset from
    * [[sampleRank]] so composing with the sampling rails doesn't reuse
    * the same coin. Output: input row × `epoch` (1-based copy index);
    * factors ≤ 0 contribute nothing.
    */
  def repeatMix(df: DataFrame, idCol: String, factorBp: Column): DataFrame = {
    val f = factorBp.cast("long")
    val indicator = (pmod(col(idCol).cast("long") * lit(2654435761L) + lit(40503L),
      lit(1000000007L)) % 10000L < f % 10000L).cast("long")
    // Column `/` is double division — divide the exact multiple of 10⁴
    // instead (always a whole quotient, exact below 2⁵³)
    val whole = ((f - f % lit(10000L)) / lit(10000L)).cast("long")
    val copies = when(f <= 0, lit(0L)).otherwise(whole + indicator)
    df.withColumn("epoch",
        explode(when(copies >= 1, sequence(lit(1L), copies))
          .otherwise(array().cast("array<long>"))))
  }

  /** Token-budget fill: per stratum, take rows in priority order until
    * the cumulative token count would exceed `budget` — "fill the 1T
    * budget per domain by quality rank", the final gate of a
    * training-data recipe. One keyed shuffle (the per-stratum window);
    * the running sum is integer-exact, the order total (priority desc,
    * id asc), so the cut is reproducible and oracle-checkable. Rows are
    * kept while their INCLUSIVE prefix sum fits. Rows that individually
    * exceed the budget are dropped BEFORE the window — otherwise one
    * oversized document at the head of a domain blocks the whole domain
    * (truncating it is [[tokenChunks]]' job upstream); after that
    * pre-filter the cut is a pure prefix: once the running sum passes
    * the budget, every later (lower-priority) row is out.
    */
  def budgetFill(df: DataFrame, strataCol: String, idCol: String,
                 tokensCol: Column, priority: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(priority.desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // negative token counts would make the running sum non-monotone and
    // re-admit rows after the budget was passed — reject them with the
    // oversized rows (the streaming budgetGate guards the same way)
    df.filter(tokensCol.cast("long") >= 0 && tokensCol.cast("long") <= budget)
      .withColumn("cum_tokens", sum(tokensCol.cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Sequence packing: assign documents (in id order, independently per
    * shard) to fixed-token-budget bins by exclusive prefix sum — bin
    * `⌊prefix/budget⌋`, i.e. greedy concat-and-cut packing where a bin
    * may overrun by at most one document (the streaming packer used to
    * build fixed-length training sequences; an exact first-fit would be
    * inherently sequential). Parallelism is per shard: the window sort
    * shuffles once on `shardCol`, so at 100 TB sharding keys (source,
    * date, …) bound each task's sort.
    *
    * Output: one row per document — (shard, bin, id, tokens, prefix).
    */
  def packSequences(df: DataFrame, shardCol: String, idCol: String,
                    tokensCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    graft.core.Graft.spread(df)
      .select(col(shardCol).as("shard"), col(idCol).as("id"), tokensCol.as("tokens"))
      .withColumn("prefix", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("prefix").cast("double") / lit(budget.toDouble)).cast("long"))
      .select("shard", "bin", "id", "tokens", "prefix")
  }

  /** Globally contiguous sequence packing: documents in (shard, id)
    * order, bins cut every `budget` tokens ACROSS shard boundaries.
    * Semantically this is one exclusive prefix sum over the whole
    * corpus — but a global window is a single-partition scale-killer,
    * so it's computed in two phases: the per-shard prefix from
    * [[packSequences]], plus a broadcast join against the per-shard
    * exclusive token offsets (one tiny row per shard; the only global
    * window runs over that shard list, not the corpus). Equality with
    * the naive global-window form is the oracle's check — the oracle
    * SQL uses the naive form, this plan never does.
    */
  def packSequencesGlobal(df: DataFrame, shardCol: String, idCol: String,
                          tokensCol: Column, budget: Long): DataFrame = {
    val local = packSequences(df, shardCol, idCol, tokensCol, budget)
    val wOff = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("shard").agg(sum("tokens").as("__tot"))
      .withColumn("off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select("shard", "off")
    local.join(broadcast(offsets), "shard")
      .withColumn("gprefix", col("prefix") + col("off"))
      .withColumn("bin",
        floor(col("gprefix").cast("double") / lit(budget.toDouble)).cast("long"))
      .select("shard", "bin", "id", "tokens", "gprefix")
  }

  /** PII redaction patterns, pinned to the RE2 ∩ Java regex common
    * subset (ASCII classes, no lookaround/backreferences) so the same
    * patterns behave identically on any engine a pipeline stage might
    * run on — the q44 lesson, applied to redaction.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  /** Redact emails, IPv4 addresses and phone-shaped digit runs from
    * `textCol` (in that order — emails first so their digits can't be
    * phone-matched), with per-category counts from the ORIGINAL text.
    * Pure codegen'd regex expressions: single pass per pattern, no
    * shuffle, linear in the scan — a quality/compliance gate that runs
    * at the same cost as any column projection.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ipv4", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "[EMAIL]"),
            Ipv4Re, "[IP]"),
          PhoneRe, "[PHONE]"))
  }

  /** Fixed-size token chunking with overlap — the context-window splitter
    * that turns documents into training/RAG passages. Chunk starts step by
    * `size − overlap` from token 0; every start below the token count
    * emits a chunk (the tail chunk may be short). Output: one row per
    * chunk — (id, chunk_idx, start_tok, n_tokens, chunk_text).
    *
    * Pure per-row array arithmetic (`sequence` → `posexplode` → `slice`):
    * no shuffle, no state — chunking 100 TB costs one projection pass and
    * parallelizes per input split. Deterministic: chunk boundaries depend
    * only on the token array, so re-runs reproduce byte-identical chunks.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunk size must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap for size $chunkSize")
    val step = (chunkSize - overlap).toLong
    graft.core.Graft.spread(df)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("starts",
        when(col("n") > 0, sequence(lit(0L), col("n") - 1, lit(step)))
          .otherwise(lit(Array.empty[Long])))
      .select(col("id"), col("t"),
        posexplode(col("starts")).as(Seq("chunk_idx", "start_tok")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok"),
        size(slice(col("t"), col("start_tok") + 1, lit(chunkSize)))
          .cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("t"), col("start_tok") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Per-vector min-max int8 quantization: code `⌊(x−mn)·255/(mx−mn)⌋−128`
    * (∈ [−128,127]; constant vectors code to 0). Returns the exploded
    * (id, pos, code) stream — the storage-side transform for ANN at scale
    * (4× smaller than float32; IVF cells quantize per cell the same way).
    * Pure codegen arithmetic; deterministic IEEE ops only, so codes are
    * engine-exact.
    */
  def quantizeInt8(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = graft.core.Graft.spread(vectors).select(col(idCol).as("id"),
      graft.functions.VectorOps.toDoubleArr(col(vecCol)).as("v"))
    v.select(col("id"), array_min(col("v")).as("mn"), array_max(col("v")).as("mx"),
        posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(floor((col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn")))
            .cast("long") - 128L)
          .as("code"))
  }

  /** Per-vector int8 quantization STATS in one shuffle-free scan: the
    * same codes as [[quantizeInt8]] (bit-equal arithmetic, spec-asserted)
    * folded row-locally with array expressions — min/max/sum plus the
    * distinct-code count. This is the scale answer to the q49 plan note
    * (PLANS.md): the exploded groupBy pays a shuffle and `countDistinct`
    * adds an Expand pass over it, while here even n_codes is
    * `size(array_distinct(codes))` inside the row. Array HOFs are
    * interpreted, but the fold is per-row over ≤dim elements with no
    * nested expensive expressions — the documented acceptable HOF shape.
    */
  def quantizeInt8Stats(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = graft.core.Graft.spread(vectors).select(col(idCol).as("id"),
      graft.functions.VectorOps.toDoubleArr(col(vecCol)).as("v"))
    v.select(col("id"), col("v"),
        array_min(col("v")).as("mn"), array_max(col("v")).as("mx"))
      .select(col("id"),
        when(col("mx") === col("mn"), transform(col("v"), _ => lit(0L)))
          .otherwise(transform(col("v"), x =>
            floor((x - col("mn")) * lit(255.0) / (col("mx") - col("mn")))
              .cast("long") - 128L))
          .as("c"))
      .select(col("id"),
        array_min(col("c")).as("code_min"),
        array_max(col("c")).as("code_max"),
        aggregate(col("c"), lit(0L), (s, x) => s + x).as("code_sum"),
        size(array_distinct(col("c"))).cast("long").as("n_codes"))
  }

  /** Corpus vocabulary statistics: the top-`k` tokens by document
    * frequency with total term frequency — the input a tokenizer/vocab
    * build (BPE seeding, stopword induction) reads off a corpus.
    * Output: (token, df, tf), df desc, token asc.
    *
    * Two map-side-combinable shuffles and NO countDistinct Expand: the
    * per-(doc, token) pre-aggregation collapses occurrences first, so the
    * token-level pass counts rows for df and sums for tf; the final top-k
    * plans as TakeOrderedAndProject (vocabulary-sized input, k rows out).
    */
  def vocabTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val perDoc = graft.core.Graft.spread(docs)
      .select(col(idCol).as("id"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("n"))
    val stats = perDoc.groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("n")).as("tf"))
    stats.orderBy(col("df").desc, col("token").asc).limit(k)
      .select("token", "df", "tf")
  }

  /** Per-group vocabulary coverage: with the corpus's [[vocabTopK]]
    * top-`k` vocabulary (df-desc, token-asc deterministic cut), what
    * fraction of each group's token OCCURRENCES is covered, and so what
    * is the out-of-vocabulary rate — the number that decides whether a
    * tokenizer vocabulary is big enough per language/domain before a
    * training run commits to it. Integer occurrence counts + one double
    * division → exact oracle.
    *
    * Scale shape: the vocab is k rows (broadcast); coverage is one
    * token-explode scan with a broadcast left-join and a group
    * aggregate — no corpus-sized shuffle beyond the group reduce.
    * Output: (group, n_tokens, n_covered, oov_rate).
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    groupCol: String, k: Int): DataFrame = {
    val vocab = vocabTopK(docs, idCol, textCol, k)
      .select(col("token"), lit(1L).as("__inv"))
    graft.core.Graft.spread(docs)
      .select(col(groupCol).as("g"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy("g")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__inv").isNotNull, 1L).otherwise(0L)).as("n_covered"))
      .select(col("g").as(groupCol), col("n_tokens"), col("n_covered"),
        ((col("n_tokens") - col("n_covered")).cast("double") /
          col("n_tokens").cast("double")).as("oov_rate"))
  }

  /** Heaps-law vocabulary growth audit: the corpus in doc-id order is
    * cut into `buckets` equal id-range slices, and per slice the audit
    * reports new distinct tokens (types first seen there), token
    * occurrences, and their cumulative curves — the
    * vocabulary-vs-corpus-size trajectory (Heaps' law: V ≈ K·nᵝ) that
    * says whether more data is still buying vocabulary or the corpus
    * has gone repetitive, and at which ingest slice the growth bent.
    * All counts are exact integers (the slice of a doc is pure integer
    * arithmetic `(id·buckets) div (maxId+1)`, engine-identical); the
    * cumulative type/token ratio is one IEEE division per output row.
    * Output: (bucket, n_docs, new_types, types_cum, n_tokens,
    * tokens_cum, ttr), one row per slice including empty ones.
    *
    * Scale shape: the two token-level aggregates (per-type min-bucket,
    * per-bucket occurrence count — each a map-side-combinable groupBy)
    * each run their own token-explode scan of the pruned 2-column
    * projection; deliberately NOT cached between them (on this box
    * caching fact-sized projections costs more than the rescan — the
    * round-9 measurement), plus one id-only scan for the doc counts.
    * The curve assembly then runs on `buckets` rows (the running-sum
    * window is unpartitioned but bounded by design, q222's tiny-frame
    * rationale).
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  buckets: Int = 10): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    val bounds = docs.agg((max(col(idCol)).cast("long") + 1L).as("__m"))
    // true integral division (Spark SQL DIV == DuckDB // on BIGINT) —
    // a double divide-then-truncate could round across an integer
    // boundary and disagree between engines
    def bucketOf = expr(s"(id * ${buckets}L) DIV __m") + 1L
    val toks = graft.core.Graft.spread(docs)
      .select(col(idCol).cast("long").as("id"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("token"))
      .crossJoin(broadcast(bounds))
      .select(col("token"), bucketOf.as("b"))
    val newTypes = toks.groupBy("token").agg(min(col("b")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    val tokCnt = toks.groupBy(col("b").as("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val docCnt = docs.select(col(idCol).cast("long").as("id"))
      .crossJoin(broadcast(bounds))
      .groupBy(bucketOf.as("bucket")).agg(count(lit(1)).as("n_docs"))
    val grid = spark.range(1, buckets + 1)
      .select(col("id").cast("long").as("bucket"))
    val wc = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(newTypes, Seq("bucket"), "left")
      .join(tokCnt, Seq("bucket"), "left")
      .join(docCnt, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("new_types"), lit(0L)).as("new_types"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .withColumn("types_cum", sum(col("new_types")).over(wc))
      .withColumn("tokens_cum", sum(col("n_tokens")).over(wc))
      .withColumn("ttr", when(col("tokens_cum") > 0,
        col("types_cum").cast("double") / col("tokens_cum").cast("double")))
      .select("bucket", "n_docs", "new_types", "types_cum",
        "n_tokens", "tokens_cum", "ttr")
  }

  /** Pairwise vocabulary overlap between corpus segments (sources,
    * snapshots, shards): per segment pair, the distinct-token set
    * sizes, intersection, union, and Jaccard — the corpus-comparison
    * number behind "is this new source redundant with what we have"
    * and "did the crawl shift", the set-level sibling of the
    * token-frequency drift rail (q159). Counts are exact integers;
    * `jaccard` is one IEEE division per output row (the q194
    * discipline).
    *
    * Scale shape: one distinct over (segment, token) — a single key
    * shuffle — cached (it feeds both the size aggregate and BOTH sides
    * of the pair join, the DAG-reuse rule); candidate pairs come from
    * the equi-join on the token (never all-pairs over segments ×
    * vocabulary). Per-token fan-out is (#segments containing it)², so
    * the op is sized for few-to-hundreds of segments — corpus sources,
    * not per-document keys; the intersection aggregate is map-side
    * combinable.
    *
    * Output: (seg_a, seg_b, nv_a, nv_b, n_inter, n_union, jaccard),
    * seg_a < seg_b, pairs with empty intersections omitted (an inner
    * join on both engines — identical row sets).
    */
  def vocabOverlap(docs: DataFrame, segCol: String, textCol: String): DataFrame = {
    val toks = ScaleOps.trackCache(graft.core.Graft.spread(docs)
      .select(col(segCol).as("s"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("tok"))
      .distinct())
    val sizes = toks.groupBy("s").agg(count(lit(1)).as("nv"))
    val inter = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("seg_a"), col("b.s").as("seg_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("s").as("seg_a"), col("nv").as("nv_a"))),
        Seq("seg_a"))
      .join(broadcast(sizes.select(col("s").as("seg_b"), col("nv").as("nv_b"))),
        Seq("seg_b"))
      .select(col("seg_a"), col("seg_b"), col("nv_a"), col("nv_b"),
        col("n_inter"),
        (col("nv_a") + col("nv_b") - col("n_inter")).as("n_union"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
  }

  /** Deterministic negative sampling for contrastive training: for each
    * probe id, the `k` candidates ranking lowest under the modular pair
    * hash `(pid·A + cid·B + C) mod P` — uniform pseudo-random but fully
    * reproducible (the retry-safe arithmetic-hash discipline of
    * [[stratifiedSample]]; constants from [[graft.ops.SketchOps]]'s
    * family), with `exclude` pairs (known positives/near-dups) and
    * self-pairs anti-joined out BEFORE ranking, so a negative can never
    * be a disguised positive. Output: (pid, neg_id, h).
    *
    * Scale shape: probes broadcast against the candidate set (one scan,
    * |P|·|C| ranked rows) and the per-probe top-k is a WindowGroupLimit
    * — at corpus scale the candidate side is first cut by any cheap
    * blocking predicate (the caller passes the pre-sampled pool), the
    * standard two-stage negative-mining layout.
    */
  def negativeSample(candidates: DataFrame, idCol: String,
                     probes: DataFrame, pidCol: String,
                     exclude: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val P = 1000000007L
    val ranked = candidates.select(col(idCol).as("cid"))
      .crossJoin(broadcast(probes.select(col(pidCol).as("pid"))))
      .filter(col("cid") =!= col("pid"))
      .join(exclude.select(col("pid"), col("cid")), Seq("pid", "cid"), "left_anti")
      .withColumn("h",
        (col("pid") * 2654435761L + col("cid") * 40503L + 97L) % P)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(col("h"), col("cid"))
    ranked.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("pid"), col("cid").as("neg_id"), col("h"))
  }

  /** Deterministic shard assignment for dataset export: shard =
    * [[sampleRank]](id) mod `nShards` — uniform in expectation,
    * reproducible on any re-run (retry-safe like every sampling op
    * here), and independent of input partition layout, so a failed
    * export job re-runs to the identical layout. Adds a `shard` column.
    */
  def assignShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"need at least one shard, got $nShards")
    df.withColumn("shard", pmod(sampleRank(col(idCol)), lit(nShards.toLong)))
  }

  /** Terminal export stage of a training-data build: write the corpus
    * as shard-partitioned parquet, one directory per shard with
    * deterministic membership ([[assignShards]]). `repartition` on the
    * shard key first so each shard lands in ~one task → ~one file
    * (hash collisions between shard keys can co-locate two shards in a
    * task; partitionBy still splits them into the right directories).
    * Callers pick `nShards` to hit their target file size — at 100 TB
    * that is tens of thousands of shards, each written independently.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, dir: String): Unit =
    assignShards(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  /** Round-robin domain interleaving for export ordering: a `seq` key
    * that cycles through domains — all domains' first rows, then all
    * their second rows, … — so the materialized token stream never has
    * long single-domain runs (which turn into correlated batches at
    * training time). The global position is computed ARITHMETICALLY,
    * `seq = (pos − 1) · D + domIdx`, from a per-domain row_number `pos`
    * (one partitioned window — the only shuffle) and a dense domain
    * index broadcast from the domain list; there is no corpus-wide
    * window anywhere, so the plan survives 100 TB (sorting by `seq` at
    * write time is a plain range-partitioned sort). When domain sizes
    * differ, exhausted domains leave gaps in `seq` — it is an ordering
    * key, not a dense rank. Output: (id, domain, pos, seq).
    *
    * Reference: kasper exports are per-topic ordered streams
    * (/root/reference/topic_processor.go:190-263); interleaving is the
    * batch-export generalization a mixture recipe needs.
    */
  /** Fractional n-gram contamination score — [[decontaminate]]'s
    * thresholdable form. Per corpus document: how many of its distinct
    * n-grams exist (`n_grams`), how many appear anywhere in the held-out
    * set (`n_hit`), and the fraction `frac = n_hit / n_grams`. Real
    * decontam pipelines gate on the FRACTION, not any-hit — a document
    * quoting one benchmark line is not a test-set copy; a document whose
    * gram set is 80 % held-out grams is. Counts are integers (hash-
    * checkable); `frac` is one IEEE double division of two integers —
    * bit-identical on any engine. Scale shape: the held side reduces to
    * a distinct gram set and broadcasts ([[bloomDecontaminate]] is the
    * big-held-side variant); the corpus makes one pass, one groupBy on
    * the doc id — map-side combinable, no corpus self-join.
    *
    * Reference: kasper has no decontamination notion; this extends the
    * anti-join example topology (/root/reference/examples) the way
    * n-gram-overlap decontamination is described in public LLM dataset
    * reports.
    */
  def contaminationStats(corpus: DataFrame, heldOut: DataFrame,
                         idCol: String, textCol: String, n: Int = 4): DataFrame = {
    def sh(df: DataFrame) = graft.core.Graft.spread(df)
      .select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), n)).as("g"))
    val held = sh(heldOut).select("g").distinct().withColumn("__hit", lit(1L))
    sh(corpus).join(broadcast(held), Seq("g"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("frac",
        col("n_hit").cast("double") / col("n_grams").cast("double"))
  }

  /** Leakage-safe train/val/test split: the split is a pure hash of the
    * near-dup GROUP label (connected components over `pairs`), so every
    * member of a dup component lands in the SAME split — the property
    * that stops a near-duplicate of a held-out document from leaking
    * into train. `cuts` are cumulative basis-point upper bounds summing
    * to 10,000 (e.g. train 9000 / val 9500 / test 10000); the bucket is
    * [[sampleRank]] of the group mod 10,000, so re-runs (and re-splits
    * after appending new docs that don't join existing groups) are
    * stable. Singletons coalesce to their own id. Output:
    * (idCol, group, bucket, split).
    *
    * Scale shape: CC over the pair list (never all-pairs — feed it LSH
    * or PPJoin pairs), then one id-keyed left join; the bucket/split
    * columns are per-row arithmetic.
    */
  def groupSplit(ids: DataFrame, idCol: String, pairs: DataFrame,
                 aCol: String, bCol: String,
                 cuts: Seq[(String, Int)] =
                   Seq(("train", 9000), ("val", 9500), ("test", 10000))): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 10000,
      s"cuts must end at 10000 basis points, got $cuts")
    require(cuts.map(_._2) == cuts.map(_._2).sorted && cuts.map(_._2).distinct == cuts.map(_._2),
      s"cuts must be strictly increasing, got $cuts")
    val comp = graft.dedup.Dedup.connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
    val bucket = pmod(sampleRank(col("group")), lit(10000L))
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, ub), rest) => when(col("bucket") < ub, name).otherwise(rest)
    }
    ids.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("grp"), col(idCol)).as("group"))
      .withColumn("bucket", bucket)
      .withColumn("split", split)
  }

  def interleaveDomains(df: DataFrame, domainCol: String, idCol: String): DataFrame = {
    // dense 0-based domain index + domain count: the window runs over
    // the distinct-domain list (bounded, driver-sized), never the corpus
    val domIdx = df.select(col(domainCol).as("domain")).distinct()
      .withColumn("__di",
        row_number().over(Window.orderBy(col("domain"))).cast("long") - 1L)
    val d = domIdx.count()
    val perDomain = Window.partitionBy(col("domain")).orderBy(col("id"))
    df.select(col(idCol).as("id"), col(domainCol).as("domain"))
      .withColumn("pos", row_number().over(perDomain).cast("long"))
      .join(broadcast(domIdx), "domain")
      .withColumn("seq", (col("pos") - 1L) * lit(d) + col("__di"))
      .select("id", "domain", "pos", "seq")
  }

  /** Word representation shared by [[bpeTrain]] and [[bpeEncodeStats]]:
    * U+001F-sentinelled, DOUBLE-separator-joined symbol strings —
    * `␟a␟␟b␟␟c␟` for symbols [a, b, c] (shown with the visible
    * ␟ stand-in). A merge of (a, b) is then the literal left-to-right
    * replace `␟a␟␟b␟ -> ␟ab␟`, which is exactly BPE's greedy
    * non-overlapping semantics ("a a a" merges to ["aa","a"], never
    * ["a","aa"]) AND is boundary-exact: each pattern occurrence is
    * flanked by full symbol delimiters, so the tail of a multi-char
    * symbol can never false-match (`␟xa␟␟b␟` does NOT contain
    * `␟a␟␟b␟`; the previous single-separator form had exactly that
    * bug — "xa␟b" contains "a␟b" and merged across the symbol
    * boundary), and adjacent occurrences share no characters, so
    * greedy replace never skips one (single-separator `␟a␟b␟a␟b␟`
    * would consume the shared ␟ and miss the second merge).
    * Plain-string replace on both engines — mirrored verbatim in the
    * DuckDB oracle.
    */
  private val BpeSep = "\u001F"
  private[graft] def bpeWordRepr(word: Column): Column =
    concat(lit(BpeSep),
      concat_ws(BpeSep + BpeSep, filter(split(word, ""), c => c =!= "")),
      lit(BpeSep))
  private[graft] def bpeMergePattern(a: String, b: String): (String, String) =
    (BpeSep + a + BpeSep + BpeSep + b + BpeSep, BpeSep + a + b + BpeSep)

  /** Distributed BPE merge training: the `iters` highest-count adjacent
    * symbol-pair merges over the corpus, with EXACTLY the sequential
    * greedy semantics of sentencepiece/HF trainers — one conceptual
    * pair per step, ties broken deterministically (count desc, then
    * pair lexicographic). Output: one row per learned merge
    * (merge_rank, lhs, rhs, merged, pair_count) — the tokenizer
    * artifact a training pipeline ships.
    *
    * Scale design — built for real merge counts, not demo loops:
    *
    *  - The ONLY corpus-scale pass is the word-frequency reduce (one
    *    map-side-combinable groupBy). Everything after runs over the
    *    vocabulary table.
    *  - Pair counts are DELTA-MAINTAINED: each round recounts bigrams
    *    only over words CONTAINING a merged pattern (the affected
    *    slice), unions `-old +new` into the persisted pair table, and
    *    drops emptied pairs — never a full vocabulary recount.
    *  - Merges commit in BATCHES per driver round-trip. A collected
    *    top-(B+1) prefix is accepted while (i) the pairs are pairwise
    *    symbol-disjoint — including each pair's merged result, and
    *    excluding results colliding with a previously created symbol —
    *    (ii) a self-pair (a,a) closes its batch, and (iii) every
    *    accepted count strictly exceeds the first non-accepted entry's
    *    count. Under (i)-(iii) the batch equals sequential greedy:
    *    accepted pairs' counts cannot change during the batch (no
    *    symbol sharing), and every pair CREATED by an accepted merge
    *    maps occurrence-for-occurrence into a pre-existing
    *    non-accepted pair, so its count stays strictly below every
    *    accepted count. When validation accepts nothing (boundary
    *    ties, symbol collisions), the round commits the exact top-1 —
    *    plain greedy, always correct, always progress. The batch size
    *    doubles after a fully-committed round (up to `batchCap`), so
    *    cooperative corpora converge in O(log merges) driver
    *    round-trips — 3 Spark jobs per round-trip, sublinear in
    *    merges (CorpusOpsSpec counts the jobs at 256 merges).
    *
    * Reference behavior target: greedy BPE merge learning (Sennrich et
    * al. 2016, "Neural Machine Translation of Rare Words with Subword
    * Units"); kasper has no tokenizer — beyond-parity surface.
    */
  def bpeTrain(docs: DataFrame, textCol: String, iters: Int,
               batchCap: Int = 256): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    require(batchCap >= 1, s"batchCap must be positive, got $batchCap")
    val SEP = BpeSep
    val spark = docs.sparkSession
    import graft.dedup.Dedup.releaseCheckpoint

    def pairCountsOf(w: DataFrame): DataFrame =
      w.select(explode(graft.text.TextFunctions.bigramsOf(
          filter(split(col("s"), SEP), x => x =!= ""))).as("p"), col("cnt"))
        .groupBy(col("p.w1").as("a"), col("p.w2").as("b"))
        .agg(sum(col("cnt")).as("c"))

    var words = graft.core.Graft.spread(docs)
      .select(explode(graft.text.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(bpeWordRepr(col("w")).as("s"), col("cnt"))
      .localCheckpoint(true)
    var pairs = pairCountsOf(words).localCheckpoint(true)

    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    val mergedSyms = scala.collection.mutable.Set.empty[String]
    var done = 0
    var batch = math.min(16, iters)
    var exhausted = false
    while (done < iters && !exhausted) {
      val want = math.min(batch, iters - done)
      val top = pairs.orderBy(col("c").desc, col("a"), col("b"))
        .limit(want + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .filter(_._3 > 0)
      if (top.isEmpty) exhausted = true // every word is a single symbol
      else {
        // greedy-exact batch prefix: symbol-disjoint (incl. merged
        // results and previously created symbols); self-pairs close
        // their batch (their created (m,a) pairs can outrank later
        // entries, e.g. "a a a"xN creates (aa,a) at count N)
        val used = scala.collection.mutable.Set.empty[String]
        var k = 0
        var stop = false
        while (!stop && k < math.min(want, top.length)) {
          val (a, b, _) = top(k)
          val m = a + b
          if (used(a) || used(b) || used(m) || mergedSyms(m)) stop = true
          else {
            used ++= Seq(a, b, m); k += 1
            if (a == b) stop = true
          }
        }
        // trim to a strict count descent at the acceptance boundary so
        // nothing outside the batch (incl. created pairs) can tie in
        def beyondAt(kk: Int): Long = if (kk < top.length) top(kk)._3 else 0L
        while (k > 1 && top(k - 1)._3 <= beyondAt(k)) k -= 1
        if (k == 0) k = 1 // exact top-1 is always the true argmax

        val prefix = top.take(k)
        val pats = prefix.map { case (a, b, _) => bpeMergePattern(a, b) }
        val applied = pats.foldLeft(col("s")) { case (s, (pat, rep)) =>
          replace(s, lit(pat), lit(rep)) }
        val affected = words.filter(
          pats.map(p => col("s").contains(p._1)).reduce(_ || _))
        val newWords = words.select(applied.as("s"), col("cnt"))
          .localCheckpoint(true)
        val delta = pairCountsOf(affected)
          .select(col("a"), col("b"), (-col("c")).as("c"))
          .unionAll(pairCountsOf(affected.select(applied.as("s"), col("cnt"))))
        val newPairs = pairs.unionAll(delta)
          .groupBy("a", "b").agg(sum(col("c")).as("c"))
          .filter(col("c") > 0)
          .localCheckpoint(true)
        releaseCheckpoint(words); releaseCheckpoint(pairs)
        words = newWords; pairs = newPairs
        prefix.zipWithIndex.foreach { case ((a, b, c), i) =>
          merges += ((done + i + 1L, a, b, a + b, c))
          mergedSyms += (a + b)
        }
        done += k
        batch =
          if (k >= want) math.min(math.max(batch * 2, 16), batchCap)
          else math.max(batch / 2, 16)
      }
    }
    val out = spark.createDataFrame(merges.result())
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
    releaseCheckpoint(words); releaseCheckpoint(pairs)
    out
  }

  /** Apply a learned BPE merge list ([[bpeTrain]]'s artifact, in rank
    * order) to the corpus and report per-document tokenization stats:
    * character count, post-merge BPE token count, and the compression
    * ratio — the "how many tokens is this corpus" question every
    * training-budget calculation starts from. The merge list is a
    * driver-side literal (rank-bounded, exactly like a shipped
    * tokenizer's merges.txt), so encoding is a chain of codegen'd
    * literal `replace`s inside ONE shuffle-free scan; the only shuffle
    * is the per-doc aggregation. Ratio = one IEEE division of exact
    * longs → hash-stable across engines.
    */
  def bpeEncodeStats(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val SEP = BpeSep
    val perWord = graft.core.Graft.spread(docs)
      .select(col(idCol).as("id"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("w"))
    val encoded = merges.foldLeft(bpeWordRepr(col("w"))) {
      case (s, (a, b)) =>
        val (pat, rep) = bpeMergePattern(a, b)
        replace(s, lit(pat), lit(rep))
    }
    perWord
      .select(col("id"), length(col("w")).cast("long").as("chars"),
        size(filter(split(encoded, SEP), x => x =!= "")).cast("long").as("toks"))
      .groupBy("id")
      .agg(sum(col("chars")).as("n_chars"), sum(col("toks")).as("n_bpe_tokens"))
      .withColumn("compression",
        col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
  }

  /** Corpus snapshot diff: classify every key across two snapshot frames
    * as added / removed / changed / same by comparing a caller-supplied
    * fingerprint column (md5 of the payload, a content hash column the
    * lake already stores, …). The audit step between pipeline runs — at
    * 100 TB only fingerprints shuffle (one full-outer equi-join on the
    * key), never payloads. Keys must be unique per snapshot.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCol: String, fpCol: String): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("__k"), col(fpCol).as("__old"))
    val n = newSnap.select(col(keyCol).as("__k"), col(fpCol).as("__new"))
    o.join(n, Seq("__k"), "full_outer")
      .select(col("__k").as(keyCol),
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(col("__old") =!= col("__new"), lit("changed"))
          .otherwise(lit("same")).as("status"))
  }

  /** Incremental aggregate maintenance: fold row deltas into a
    * previously materialized (keys, n, s) aggregate instead of
    * recomputing it from the full snapshot — the 100 TB move where the
    * daily delta is GBs against a PBs-scale history. `added`/`removed`
    * are row-level frames carrying `valueCol`; a changed row is one
    * removed (old version) + one added (new version), exactly the
    * classification [[snapshotDiff]] emits. Count-sum measures form an
    * abelian group, so the maintenance is one union + one keyed
    * aggregate; groups whose count reaches zero disappear (matching a
    * recompute). Correctness is an invariance oracle: the maintained
    * aggregate must hash-equal the full recompute on the new snapshot
    * (q134).
    */
  def incrementalAgg(prev: DataFrame, added: DataFrame, removed: DataFrame,
                     keys: Seq[String], valueCol: String): DataFrame = {
    def delta(df: DataFrame, sign: Long): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg((count(lit(1)) * sign).as("dn"),
          (sum(col(valueCol).cast("long")) * sign).as("ds"))
    prev.select(keys.map(col) :+ col("n").as("dn") :+ col("s").as("ds"): _*)
      .unionAll(delta(added, 1L)).unionAll(delta(removed, -1L))
      .groupBy(keys.map(col): _*)
      .agg(sum("dn").as("n"), sum("ds").as("s"))
      .filter(col("n") > 0)
  }

  /** σ-clip outlier gate, cross-engine exact: flags rows where
    * |x − mean| > k·σ (population σ), evaluated WITHOUT any float
    * division or sqrt by comparing the squared inequality in integer
    * form — `(n·x − Σx)² > k²·(n·Σx² − (Σx)²)`, both sides being the
    * n²-scaled images of (x−mean)² and k²σ² — with DECIMAL(38,0)
    * intermediates (the products overflow BIGINT at corpus scale; the
    * q104 widening lesson). One tiny stats reduce broadcast into a
    * second scan; the length/quality clipping pass every curation
    * pipeline runs before training.
    */
  /** Per-group winsorized statistics: clamp `xCol` into the group's
    * discrete [p·n-th, (1−p)·n-th] rank values (the q91 integer-ceiling
    * rank discipline — the value AT rank ⌈p·n⌉ under the total order,
    * no interpolation, no float rank), then report the clamped sum and
    * mean. Winsorization is the robust-stats companion to
    * [[sigmaClip]]: instead of flagging outliers it pulls them to the
    * percentile fence, the standard treatment for length/quality
    * features before a model fit sees them (Tukey; Dixon 1960).
    *
    * Exactness: fences and clamped sums are integers; the mean is one
    * double division of exact integers (IEEE-identical on any engine).
    * Scale shape: one per-group sort window for the fence ranks + one
    * group aggregate — same as q91's percentile audit.
    *
    * `pTailBp` is the tail mass in basis points (500 = clip 5% each
    * side). Output: (group, n_docs, lo, hi, sum_winsorized, mean_winsorized).
    */
  def winsorizedStats(df: DataFrame, groupCol: String, xCol: String,
                      pTailBp: Int = 500): DataFrame = {
    require(pTailBp > 0 && pTailBp < 5000,
      s"tail basis points must be in (0, 5000), got $pTailBp")
    import org.apache.spark.sql.expressions.Window
    val t = df.select(col(groupCol).as("g"), col(xCol).cast("long").as("x"))
    val w = Window.partitionBy("g").orderBy("x")
    val ranked = t.withColumn("rn", row_number().over(w))
    val counts = t.groupBy("g").agg(count(lit(1)).as("n"))
    def atRank(rank: Column): Column = max(when(col("rn") === rank, col("x")))
    // ⌈p·n⌉ and ⌈(1−p)·n⌉ via exact integer arithmetic: ⌈a·n/10000⌉ =
    // floor((a·n + 9999) / 10000)
    val fences = ranked.join(counts, "g").groupBy("g")
      .agg(max(col("n")).as("n_docs"),
        atRank(floor((col("n") * pTailBp + 9999) / 10000.0)).as("lo"),
        atRank(floor((col("n") * (10000 - pTailBp) + 9999) / 10000.0)).as("hi"))
    t.join(fences, "g")
      .select(col("g"), col("n_docs"), col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("x"))).as("xw"))
      .groupBy("g")
      .agg(max(col("n_docs")).as("n_docs"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"), sum(col("xw")).as("sum_winsorized"))
      .withColumn("mean_winsorized",
        col("sum_winsorized").cast("double") / col("n_docs").cast("double"))
      .withColumnRenamed("g", groupCol)
  }

  def sigmaClip(df: DataFrame, idCol: String, xCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val x = col(xCol).cast("long")
    val stats = df.agg(count(lit(1)).as("__n"),
      sum(x).as("__s1"), sum(x * x).as("__s2"))
    val dev = (col("__n") * col("x") - col("__s1")).cast(d38)
    df.select(col(idCol), x.as("x"))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("x"),
        (dev * dev >
          lit(k.toLong * k) *
            (col("__n").cast(d38) * col("__s2").cast(d38) -
              col("__s1").cast(d38) * col("__s1").cast(d38))).as("is_outlier"))
  }
}
