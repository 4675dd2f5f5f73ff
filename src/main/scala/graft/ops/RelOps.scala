package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2B).
  *
  * Kasper users hand-write these inside `Process()` callbacks against
  * key-value stores (reference: `topic_processor_test.go:76-155`,
  * `examples/word_count_example.go:30-67`); here each is a declarative
  * combinator over `DataFrame` so Catalyst owns pushdown, join selection
  * and codegen. All combinators are lazy plan builders — no actions.
  */
object RelOps {

  /** KQ-4/KQ-6 word splitting (reference splits on a single space,
    * `examples/word_count_example.go:32`). Empty tokens are dropped so
    * repeated separators don't manufacture rows.
    */
  def explodeWords(df: DataFrame, textCol: String, as: String = "word"): DataFrame =
    df.select(explode(split(col(textCol), " ")).as(as)).filter(col(as) =!= "")

  /** KQ-6 grouped running count (word-count), batch form. */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    explodeWords(df, textCol).groupBy("word").agg(count("*").as("cnt"))

  /** KQ-11 last-write-wins upsert by key: keep the newest row per key,
    * mirroring store `Put` overwrite semantics (`map.go:37-40`). Ties on
    * the ordering column are broken by `tieBreak` so the result is
    * deterministic under parallel execution.
    */
  def latestByKey(df: DataFrame, keys: Seq[Column], orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** KQ-16 deterministic top-k: total order (score desc, then tieBreak
    * asc) before limit so equal scores can't make the cut nondeterministic.
    * Spark implements orderBy+limit as TakeOrderedAndProject — no full
    * sort, no single-node shuffle of the whole input.
    */
  def topK(df: DataFrame, score: Column, tieBreak: Column, k: Int): DataFrame =
    df.orderBy(score.desc, tieBreak.asc).limit(k)

  /** KQ-9 semi/anti joins (the reference's "emit only when present/absent"
    * guards, `topic_processor_test.go:142-147`).
    */
  def existsIn(df: DataFrame, other: DataFrame, keys: Seq[String]): DataFrame =
    df.join(other, keys, "left_semi")
  def notExistsIn(df: DataFrame, other: DataFrame, keys: Seq[String]): DataFrame =
    df.join(other, keys, "left_anti")

  /** KQ-10 lookup enrichment: broadcast the small side (the store-`Get`
    * pattern, `store.go:20-22`) so the probe side never shuffles.
    */
  def enrich(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "inner")

  /** KQ-8 re-assembly: group rows back into a sorted array per key
    * (the characters-per-fiction pattern, `topic_processor_test.go:135-155`).
    * `sort_array` keeps array contents deterministic (SURVEY §7.4).
    */
  def reassemble(df: DataFrame, key: Column, item: Column, as: String = "items"): DataFrame =
    df.groupBy(key).agg(sort_array(collect_list(item)).as(as))

  /** As-of join: for every left row, the single latest right row with
    * `rightTs ≤ leftTs` on the same key (ties broken by `rightTie` desc).
    * An operator Spark lacks natively, composed from built-ins per the
    * preference order: range equi-join + per-left-row window top-1 —
    * shuffles once on the key, no custom physical operator needed.
    * `leftId` must uniquely identify left rows. Left rows with no match
    * get nulls (left_outer).
    *
    * `lookback` bounds the match window to `[leftTs − lookback, leftTs]`
    * (an interval for timestamp columns, a numeric for numeric ones).
    * The unbounded form expands every left row × ALL earlier right rows
    * of its key before the top-1 prunes — a pathologically hot key
    * inflates that join output ahead of the WindowGroupLimit. With a
    * lookback the range predicate rides IN the join condition, so at
    * 100 TB the per-key expansion is bounded by the horizon, not by key
    * history; left rows whose only matches are older than the horizon
    * null-extend (widen the horizon and re-join those if completeness
    * matters more than the bound).
    */
  /** Floor division of a long column by a positive long literal, exact at
    * any magnitude: the numerator is reduced to an exact multiple first
    * (`pmod` is nonnegative, so this floors for negative values too), and
    * a double division whose operands divide exactly is itself exact for
    * quotients below 2⁵³ — no `expr`-string needed, no near-boundary ulp
    * risk.
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Interval-overlap join: all (left, right) pairs with
    * `lStart ≤ rEnd && rStart ≤ lEnd` (closed intervals), optionally
    * gated by `keys` equality — the range-join shape (event correlation,
    * session × incident windows) that naively plans as a nested-loop
    * over every key group.
    *
    * Scale path: each interval explodes onto the `bucketWidth`-wide time
    * buckets it touches, the join is an EQUI-join on (keys…, bucket) —
    * shuffle-partitionable, AQE-splittable — and the overlap predicate
    * merely verifies within a bucket. A pair overlapping across several
    * buckets is emitted exactly once: only in the bucket containing the
    * later of the two starts (that bucket is inside both spans whenever
    * the pair truly overlaps), so no distinct pass is needed. Cost is
    * occupancy-driven: rows duplicate by ⌈span/bucketWidth⌉, so pick
    * `bucketWidth` near the typical interval length (the knob trades
    * duplication against per-bucket pair volume). Both frames must carry
    * distinct column names (alias before a self-join).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   lStart: String, lEnd: String, rStart: String, rEnd: String,
                   bucketWidth: Long,
                   keys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val l = left.withColumn("__bucket",
      explode(sequence(floorDiv(col(lStart), bucketWidth), floorDiv(col(lEnd), bucketWidth))))
    val r = right.withColumn("__bucket",
      explode(sequence(floorDiv(col(rStart), bucketWidth), floorDiv(col(rEnd), bucketWidth))))
    val cond = (Seq(
      l("__bucket") === r("__bucket"),
      l(lStart) <= r(rEnd), r(rStart) <= l(lEnd),
      l("__bucket") === floorDiv(greatest(l(lStart), r(rStart)), bucketWidth)) ++
      keys.map { case (a, b) => l(a) === r(b) }).reduce(_ && _)
    l.join(r, cond, "inner").drop("__bucket")
  }

  /** SCD-type-2 dimension build from an event stream: per key, collapse
    * consecutive equal `attrCol` values and emit validity intervals
    * [valid_from, valid_to) — valid_to null on the current (open) row.
    * The dimension side [[asOfJoin]] and [[intervalJoin]] consume, built
    * from the same events they correlate against. Deterministic: ties on
    * `tsCol` break by `tieCol` (a unique event id). `attrCol` is assumed
    * non-null (null-vs-value transitions would need null-safe equality).
    * One shuffle on the key; both windows share its partitioning.
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(tieCol), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** Point-in-time SCD2 lookup — the dimension-snapshot ("AS OF") join:
    * for each probe row, the [[scd2]] attribute whose validity interval
    * `[valid_from, valid_to)` covers the probe's point (null where no
    * interval does, e.g. before the key's first change). Implemented as
    * the union-window as-of: dimension starts and probes merge into ONE
    * per-key ordered stream — dimension rows sort before probes at
    * equal timestamps (a probe exactly at a validity start sees that
    * interval), ties inside each side break on `tieCol`/the probe id —
    * the latest dimension struct propagates via
    * `last(…, ignoreNulls)` (the struct wraps attr AND valid_to
    * together: a bare ignoreNulls `last(valid_to)` would skip the open
    * interval's null terminator and resurrect the previous interval's
    * bound), and an open/closed check nulls out probes past a closed
    * interval. ONE shuffle on the key — no inequality join, no
    * interval × probe explosion; zero-length intervals (two changes at
    * one timestamp) match nothing, exactly like the SQL
    * `valid_from ≤ p < valid_to` contract. Output:
    * (keyCol, probe_id, state).
    */
  def scd2Lookup(dim: DataFrame, keyCol: String, tieCol: String,
                 attrCol: String, probes: DataFrame, probeKey: Column,
                 probeId: Column, pointCol: Column): DataFrame = {
    val d = dim.select(col(keyCol).as("__k"), col("valid_from").as("__t"),
      lit(0).as("__isp"), col(tieCol).cast("long").as("__tie"),
      struct(col(attrCol).as("a"), col("valid_to").as("vto")).as("__s"),
      lit(null).cast("long").as("__pid"))
    val p = probes.select(probeKey.as("__k"), pointCol.as("__t"),
      lit(1).as("__isp"), probeId.cast("long").as("__tie"),
      lit(null).cast(d.schema("__s").dataType).as("__s"),
      probeId.cast("long").as("__pid"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__isp"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.unionByName(p)
      .withColumn("__last", last(col("__s"), ignoreNulls = true).over(w))
      .filter(col("__isp") === 1)
      .select(col("__k").as(keyCol), col("__pid").as("probe_id"),
        when(col("__last").isNotNull &&
          (col("__last").getField("vto").isNull ||
            col("__last").getField("vto") > col("__t")),
          col("__last").getField("a")).as("state"))
  }

  /** Cohort retention matrix: users cohorted by the DAY of their first
    * event; cell (cohort, k) counts distinct users active k days after
    * their cohort day. Calendar-day arithmetic is integer (datediff),
    * so the whole matrix is exact across engines. Two shuffles: the
    * per-user first-event reduce and the (user, day) distinct; the
    * cohort join ships only user-level rows.
    */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val firsts = df.groupBy(col(keyCol).as("k"))
      .agg(min(col(tsCol)).as("__ft"))
      .select(col("k"), to_date(col("__ft")).as("cohort"))
    val active = df
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("d"))
      .distinct()
    active.join(firsts, "k")
      .select(col("cohort"),
        datediff(col("d"), col("cohort")).cast("long").as("days_since"))
      .groupBy("cohort", "days_since")
      .agg(count(lit(1)).as("users"))
  }

  /** Per-key daily gap filling: one row per (key, day) for every
    * calendar day between the key's first and last event, with the
    * day's event count (0 on gap days) — the resampling step before any
    * time-series aggregate or model. The day range explodes from the
    * per-key (min, max) pair, so generated volume is Σ spans, not
    * keys × global range; one per-(key, day) count shuffle + one
    * per-key extent reduce; the join back ships only day-level rows.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val counts = df
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("d"))
      .groupBy("k", "d").agg(count(lit(1)).as("__c"))
    val spans = counts.groupBy("k")
      .agg(min(col("d")).as("__lo"), max(col("d")).as("__hi"))
    spans
      .select(col("k"), explode(sequence(col("__lo"), col("__hi"))).as("d"))
      .join(counts, Seq("k", "d"), "left")
      .select(col("k"), col("d"), coalesce(col("__c"), lit(0L)).as("n"))
  }

  /** Trailing `windowDays`-day rolling event count per key, computed on
    * the gap-filled daily series ([[gapFillDaily]]) with a RANGE frame —
    * the time-series feature step (7-day activity, 28-day trend) after
    * resampling. The frame is integer-day RANGE over `unix_date`, so a
    * key with sparse history still gets calendar-true windows; one
    * shuffle on the key, shared by the gap fill and the window. Output:
    * (k, d, n, n_roll).
    */
  def rollingDaily(df: DataFrame, keyCol: String, tsCol: String,
                   windowDays: Int): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val w = Window.partitionBy(col("k")).orderBy(unix_date(col("d")))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    gapFillDaily(df, keyCol, tsCol)
      .select(col("k"), col("d"), col("n"), sum(col("n")).over(w).as("n_roll"))
  }

  /** Ordered funnel: users reaching step i did step i-1 first and step i
    * within `within` of their step-(i-1) time; each stage anchors on the
    * EARLIEST qualifying event (deterministic, no pattern backtracking).
    * Output: (step, event_type, users) — the drop-off table. Each stage
    * is one filtered scan + a per-key min; the per-key frames are
    * key-cardinality-sized, so the stage joins shuffle only user-level
    * rows at scale.
    */
  /** Zone-map (data-skipping) effectiveness audit: simulate the
    * file-level min/max statistics a lakehouse keeps per parquet file,
    * for a given physical LAYOUT (an ordering expression), and count
    * how many files a range predicate could prune. The number that
    * justifies sort-on-write: the same predicate on the same data
    * prunes ~0 files under insertion order and almost all of them when
    * the layout clusters the predicate column ([[graft.queries]] q118's
    * Z-order audit is the multi-column sibling). Integer min/max +
    * counts → exact oracle.
    *
    * The file assignment `(rank over layout − 1) div rowsPerFile` is a
    * layout TOTAL order — exactly [[graft.ops.ScaleOps.globalRank]]'s
    * contract, so the rank is range-partitioned (never the
    * single-partition Window a bare `row_number() OVER (ORDER BY …)`
    * compiles to: the audited frame is data-sized even when audits run
    * rarely). Output: one row (n_files, files_pruned) for the
    * predicate `loInclusive ≤ xCol ≤ hiInclusive`.
    */
  def zoneMapAudit(df: DataFrame, xCol: String, layout: Seq[Column],
                   rowsPerFile: Int, loInclusive: Long,
                   hiInclusive: Long): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    val base = df.select((col(xCol).cast("long").as("x") +:
      layout.zipWithIndex.map { case (c, i) => c.as(s"__l$i") }): _*)
    graft.ops.ScaleOps.globalRank(base, "__rnk",
        layout.indices.map(i => col(s"__l$i")))
      .select(col("x"), expr(s"(__rnk - 1) div $rowsPerFile").as("fid"))
      .groupBy("fid").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("mx") < loInclusive || col("mn") > hiInclusive, 1L)
          .otherwise(0L)).as("files_pruned"))
  }

  /** [[zoneMapAudit]] specialized to the SORTED-BY-`xCol` layout, where
    * the file stats are derivable in closed form from three boundary
    * counts — no rank pass at all (round-9 review flagged q147's second
    * `globalRank`; this replaces it with ONE map-side-combinable
    * aggregate). Under the (x, tie) total order, file `f` covers ranks
    * `[f·rpf+1, min((f+1)·rpf, n)]`, so with `c_lo = |{x < lo}|` and
    * `c_hi = |{x ≤ hi}|`:
    *  - `mx_f < lo` ⟺ the file's last rank ≤ c_lo (fully below), and
    *  - `mn_f > hi` ⟺ the file's first rank > c_hi (fully above);
    * counting each set is pure integer arithmetic. Exactly equal to the
    * rank-based audit (q147's oracle computes real per-file min/max and
    * stays green) — including the conservative straddle case: a file
    * spanning the range without in-range rows is NOT pruned by either
    * form. Output: one row (n_files, files_pruned).
    */
  def zoneMapAuditSorted(df: DataFrame, xCol: String, rowsPerFile: Int,
                         loInclusive: Long, hiInclusive: Long): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    // an inverted range would let a file count as BOTH fully-below and
    // fully-above (files_pruned > n_files) where the rank-based audit
    // this form claims to equal would not
    require(loInclusive <= hiInclusive,
      s"empty/inverted range: loInclusive ($loInclusive) must be ≤ " +
        s"hiInclusive ($hiInclusive)")
    val rpf = rowsPerFile.toLong
    df.select(col(xCol).cast("long").as("x"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("x") < loInclusive, 1L).otherwise(0L)),
          lit(0L)).as("c_lo"),
        coalesce(sum(when(col("x") <= hiInclusive, 1L).otherwise(0L)),
          lit(0L)).as("c_hi"))
      .select(
        expr(s"(n + $rpf - 1) div $rpf").as("n_files"),
        (least(expr(s"c_lo div $rpf"),
            greatest(expr(s"(n + $rpf - 1) div $rpf") - 1L, lit(0L))) +
          when(col("c_lo") === col("n") && col("n") > 0L, 1L).otherwise(0L) +
          greatest(lit(0L), expr(s"(n + $rpf - 1) div $rpf") -
            expr(s"(c_hi + $rpf - 1) div $rpf"))).as("files_pruned"))
  }

  /** Incremental equi-join maintenance — the join-side sibling of
    * [[graft.ops.CorpusOps.incrementalAgg]]'s aggregate IVM: given old
    * snapshots A₀/B₀ and insert deltas ΔA/ΔB, the NEW join rows are
    * exactly `ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB` (the classic delta-join
    * decomposition every materialized-view maintainer and stream-stream
    * join runs on) — at 100 TB the deltas are GB-sized against PB-sized
    * snapshots, so two of the three joins have a tiny (broadcastable)
    * side and the third is delta×delta. Returns only the delta join
    * rows; the caller unions them onto the previously materialized
    * J₀ = A₀⋈B₀. Correctness is an invariance oracle: J₀ ∪ delta must
    * equal the full recompute A₁⋈B₁ (q160).
    */
  def deltaJoin(a0: DataFrame, da: DataFrame, b0: DataFrame, db: DataFrame,
                keys: Seq[String]): DataFrame =
    broadcast(da).join(b0, keys)
      .unionByName(a0.join(broadcast(db), keys))
      .unionByName(broadcast(da).join(broadcast(db), keys))

  /** Per-key next-state transition counts over an ordered event stream —
    * the Markov-chain surface of behavioral analytics (what follows a
    * `view`?): adjacent event-type bigrams under the (ts, tie) total
    * order per key, with the per-source transition probability. Integer
    * counts + one division → exact. One key shuffle for the lag window,
    * then a tiny aggregate.
    * Output: (from_type, to_type, n, p).
    */
  def transitionCounts(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .select(col(keyCol), col(tsCol), col(tieCol), col(typeCol).as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum(col("n")).as("__t"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("__t").cast("double")).as("p"))
  }

  /** Trailing exponential smoothing over the gap-filled daily series
    * ([[gapFillDaily]]) with DYADIC decay — weights 1/2, 1/4, …, 1/2⁷,
    * 1/2⁷ over the trailing 8 calendar days (the final weight repeats so
    * the kernel sums to exactly 1). Classic float EWMA (`α·x + (1−α)·ŷ`)
    * is not cross-engine reproducible (libm, accumulation order); with
    * dyadic weights the ×128-scaled smoothed value is pure 64-bit
    * integer arithmetic — a lag-chain of shifted adds — so the whole
    * series hash-checks, and `ewma = ewma_x128 / 128.0` is an exact
    * double. Days before a key's first observation count as 0 (partial
    * kernel at series start — deterministic, documented).
    *
    * Scale shape: one shuffle on the key shared by the gap fill and the
    * lag window; the 8-term lag chain is one window pass, codegen'd.
    * Output: (k, d, n, ewma_x128, ewma).
    */
  def ewmaDyadicDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
    // weights ×128: today 64, then 32 16 8 4 2 1, and 1 again for t−7
    val wts = Seq(64L, 32L, 16L, 8L, 4L, 2L, 1L, 1L)
    val x128 = wts.zipWithIndex.map { case (wt, i) =>
      coalesce(lag(col("n"), i).over(w), lit(0L)) * wt
    }.reduce(_ + _)
    gapFillDaily(df, keyCol, tsCol)
      .select(col("k"), col("d"), col("n"), x128.as("ewma_x128"))
      .withColumn("ewma", col("ewma_x128").cast("double") / 128.0)
  }

  /** Per-group ordinary-least-squares trend over the gap-filled daily
    * series: slope/intercept of `n ~ day` per key from the closed-form
    * normal equations — grouped model fitting as ONE map-side-combinable
    * aggregate of five integer sums (n, Σx, Σy, Σxy, Σx²), the
    * [[graft.ops.QualityModel]] Gram-matrix idea at p = 1 applied
    * per group. `slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)` and the
    * intercept are each ONE IEEE division/expression over exact
    * integers, so the whole trend table is oracle-exact; x is epoch-day
    * (integer), y the day's count. Degenerate groups (a single day:
    * zero variance) report null slope.
    * Output: (k, n_days, slope, intercept).
    */
  def olsTrendDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val s = gapFillDaily(df, keyCol, tsCol)
      .select(col("k"), unix_date(col("d")).cast("long").as("x"), col("n").as("y"))
      .groupBy("k")
      .agg(count(lit(1)).as("nd"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val det = col("nd") * col("sxx") - col("sx") * col("sx")
    val slope = (col("nd") * col("sxy") - col("sx") * col("sy")).cast("double") /
      det.cast("double")
    s.select(col("k"), col("nd").as("n_days"),
      when(det =!= 0L, slope).as("slope"),
      when(det =!= 0L,
        (col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("nd").cast("double")).as("intercept"))
  }

  /** Peak concurrency via the sweep-line: sessionize per key (the q25
    * 30-minute gap), turn each session into (+1 at start, −1 at end)
    * deltas, and run the global running sum in (ts, delta) order — the
    * −1 sorts first at ties, so back-to-back sessions never
    * double-count. A single-event (zero-duration) session is defined to
    * be active for one instant: its −1 lands at e + 1 µs, so it raises
    * the running count instead of cancelling itself at the same
    * timestamp (and the running sum never transiently dips negative).
    * Reports the maximum number of simultaneously active
    * sessions and the earliest instant it is reached — the peak-load
    * number capacity planning reads off an event log. The running sum
    * over the 2·|sessions| delta rows is corpus-sized, so it runs on
    * [[graft.ops.ScaleOps.globalRunningSum]] (range-partitioned, exact
    * — never a single-partition Window). Integer counts and
    * microsecond timestamps → exact.
    * Output: one row (max_concurrent, at_ts).
    */
  def concurrencyPeak(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, gapMinutes: Int = 30): DataFrame = {
    val marked = df.select(col(keyCol).as("k"), col(tsCol).as("ts"), col(tieCol).as("tie"))
      .withColumn("__prev",
        lag(col("ts"), 1).over(Window.partitionBy("k").orderBy("ts", "tie")))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("ts") >= col("__prev") + expr(s"INTERVAL $gapMinutes MINUTES"),
          1L).otherwise(0L))
      .withColumn("sid", sum(col("__new"))
        .over(Window.partitionBy("k").orderBy(col("ts"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val sessions = marked.groupBy("k", "sid")
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
    val deltas = sessions.select(col("s").as("ts"), lit(1L).as("d"))
      .unionAll(sessions.select(
        when(col("e") === col("s"),
          col("e") + expr("INTERVAL 1 MICROSECOND")).otherwise(col("e")).as("ts"),
        lit(-1L).as("d")))
    // the sweep's running sum is CORPUS-sized (2 rows per session) — a
    // bare Window.orderBy would serialize it into one task at scale, so
    // it rides ScaleOps.globalRunningSum (range-partitioned deltas +
    // broadcast per-partition running-sum offsets; exact under the
    // (ts, d) total order — the −1-sorts-first tie rule is preserved
    // because d is part of the range key AND the local order).
    // run is read twice (max + the peak filter): cache it, or the whole
    // sessionize+sweep pipeline re-executes per reference (the DAG-reuse
    // rule)
    val run = graft.ops.ScaleOps.globalRunningSum(
        deltas, col("d"), Seq(col("ts"), col("d")), "c")
      .select(col("ts"), col("c")).cache()
    val mx = run.agg(max(col("c")).as("m"))
    run.crossJoin(broadcast(mx)).filter(col("c") === col("m"))
      .agg(max(col("m")).as("max_concurrent"), min(col("ts")).as("at_ts"))
  }

  /** Session-level first-touch attribution: sessionize per key on a
    * 30-minute inactivity gap (the q25/KQ-25 semantics), tag each
    * session with its FIRST event's type under the (ts, tie) total
    * order, and report per first-touch channel how many sessions
    * started there, how many converted (contain ≥1 `convType` event),
    * and the converted value — the marketing-attribution rail on top of
    * sessionization. Counts are integers and the value sum uses the
    * DECIMAL(18,6) discipline, so the whole table is oracle-exact.
    *
    * Scale shape: one shuffle on the key for the session window + one
    * aggregation per (key, session), then a small reduce by channel —
    * no corpus-wide window.
    */
  /** (k, ts, tie, et, v, sid) rows — the q25 30-minute-gap
    * sessionization both attribution rails run on (ONE key shuffle;
    * `ts` may be TIMESTAMP or TIMESTAMP_NTZ — interval arithmetic
    * covers both at full microsecond precision).
    */
  private def sessionized(df: DataFrame, keyCol: String, tsCol: String,
                          tieCol: String, typeCol: String, valueCol: String,
                          gapMinutes: Int): DataFrame =
    df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("et"), col(valueCol).as("v"))
      .withColumn("__prev",
        lag(col("ts"), 1).over(Window.partitionBy("k").orderBy("ts", "tie")))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("ts") >= col("__prev") + expr(s"INTERVAL $gapMinutes MINUTES"),
          1L).otherwise(0L))
      .withColumn("sid", sum(col("__new"))
        .over(Window.partitionBy("k").orderBy(col("ts"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new")

  def firstTouchAttribution(df: DataFrame, keyCol: String, tsCol: String,
                            tieCol: String, typeCol: String, valueCol: String,
                            convType: String,
                            gapMinutes: Int = 30): DataFrame = {
    val marked = sessionized(df, keyCol, tsCol, tieCol, typeCol, valueCol,
      gapMinutes)
    val sessions = marked.groupBy("k", "sid")
      .agg(min_by(col("et"), struct(col("ts"), col("tie"))).as("first_touch"),
        sum(when(col("et") === convType, 1L).otherwise(0L)).as("__nc"),
        sum(when(col("et") === convType,
          col("v").cast("decimal(18,6)")).otherwise(lit(null))).as("__cv"))
    sessions.groupBy("first_touch")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__nc") > 0, 1L).otherwise(0L)).as("n_converted"),
        coalesce(sum(col("__cv")), lit(java.math.BigDecimal.ZERO))
          .cast("double").as("conv_value"))
  }

  /** Session-level LINEAR multi-touch attribution — the q142 rail's
    * equal-split sibling: within each converting session (≥1 `convType`
    * event with positive value), the session's conversion value is
    * split across its non-conversion touch events in proportion to
    * each channel's touch count. All credit arithmetic is EXACT
    * integer micro-units: the per-(session, channel) share is
    * `(cvμ · n_ch) div n_touch` (BIGINT floor division — the identical
    * rule in both engines; flooring drops the same sub-micro remainder
    * on both), summed per channel as BIGINT. `credit_value` is ONE
    * IEEE division per output row (the q194 ratio discipline). Output:
    * (channel, n_touches, n_session_credits, credit_micro,
    * credit_value) — touches/credits counted over CREDITED sessions
    * only.
    *
    * Scale shape: sessionization is the one key shuffle; the
    * per-session and per-(session, channel) aggregates reuse its
    * (k, sid) partitioning; the credit join is (k, sid)-keyed,
    * session-count-sized on both sides; the final rollup is a
    * map-side-combinable groupBy over channel.
    */
  /** Converting sessions of a [[sessionized]] frame: (k, sid, cvu,
    * ntouch) where cvu is the session's `convType` value in exact
    * integer micro-units (DECIMAL(18,6)·10⁶ is integral at scale 6, so
    * the long cast is exact regardless of either engine's decimal→int
    * rounding mode) and ntouch its non-conversion touch count — only
    * sessions with BOTH positive survive (something to credit,
    * something to credit it to). The eligibility rule the attribution
    * rails share; edit it here, not per rail.
    */
  private def convertingSessions(s: DataFrame, convType: String): DataFrame =
    s.groupBy("k", "sid").agg(
      sum(when(col("et") === convType,
        (col("v").cast("decimal(18,6)") * lit(1000000L)).cast("long"))
        .otherwise(0L)).as("cvu"),
      sum(when(col("et") =!= convType, 1L).otherwise(0L)).as("ntouch"))
      .filter(col("cvu") > 0 && col("ntouch") > 0)

  def linearAttribution(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, typeCol: String, valueCol: String,
                        convType: String,
                        gapMinutes: Int = 30): DataFrame = {
    val s = sessionized(df, keyCol, tsCol, tieCol, typeCol, valueCol,
      gapMinutes)
    val perSess = convertingSessions(s, convType)
    val perChannel = s.filter(col("et") =!= convType)
      .groupBy("k", "sid", "et").agg(count(lit(1)).as("nt"))
    perChannel.join(perSess, Seq("k", "sid"))
      .select(col("et"), col("nt"), expr("(cvu * nt) DIV ntouch").as("cu"))
      .groupBy("et").agg(
        sum(col("nt")).as("n_touches"),
        count(lit(1)).as("n_session_credits"),
        sum(col("cu")).as("credit_micro"))
      .select(col("et").as("channel"), col("n_touches"),
        col("n_session_credits"), col("credit_micro"),
        (col("credit_micro").cast("double") / lit(1000000.0)).as("credit_value"))
  }

  /** Session-level POSITION-BASED (U-shaped) attribution — the third
    * rail of the family (q142 first-touch, q228 linear): within each
    * converting session, 40% of the conversion value goes to the first
    * touch, 40% to the last, and the remaining 20% splits equally
    * across the middle touches (the standard U-shape; 100%/50-50 for
    * 1-/2-touch sessions). Credit arithmetic is EXACT integers: a
    * touch's basis points come from a deterministic when-chain, the
    * middle share is `2000 div (n−2)` bp, and the credit is
    * `(cvμ · bp) div 10000` micro-units — identical floor rules in
    * both engines, so the table hash-checks; `credit_value` is one
    * IEEE division per output row. Output: (channel, n_touches,
    * credit_micro, credit_value) — [[linearAttribution]] minus its
    * n_session_credits column (every touch earns here, so the
    * per-channel credited-session count adds nothing).
    *
    * Scale shape: sessionization's one key shuffle; touch positions
    * ride a (k, sid)-partitioned row_number; everything after is
    * (k, sid)-keyed joins and a channel rollup.
    */
  def positionAttribution(df: DataFrame, keyCol: String, tsCol: String,
                          tieCol: String, typeCol: String, valueCol: String,
                          convType: String,
                          gapMinutes: Int = 30): DataFrame = {
    val s = sessionized(df, keyCol, tsCol, tieCol, typeCol, valueCol,
      gapMinutes)
    val perSess = convertingSessions(s, convType)
    val touches = s.filter(col("et") =!= convType)
      .withColumn("__p", row_number()
        .over(Window.partitionBy("k", "sid").orderBy(col("ts"), col("tie"))))
    val bp = when(col("ntouch") === 1, 10000L)
      .when(col("ntouch") === 2, 5000L)
      .when(col("__p") === 1 || col("__p") === col("ntouch"), 4000L)
      .otherwise(expr("2000L DIV (ntouch - 2)"))
    touches.join(perSess, Seq("k", "sid"))
      .select(col("et"), bp.as("__bp"), col("cvu"))
      .select(col("et"), expr("(cvu * __bp) DIV 10000").as("cu"))
      .groupBy("et").agg(
        count(lit(1)).as("n_touches"),
        sum(col("cu")).as("credit_micro"))
      .select(col("et").as("channel"), col("n_touches"), col("credit_micro"),
        (col("credit_micro").cast("double") / lit(1000000.0)).as("credit_value"))
  }

  /** Session-level TIME-DECAY attribution — the fourth rail of the
    * family (q142 first-touch, q228 linear, q230 U-shaped): within each
    * converting session, touches closer to the conversion earn more,
    * with weight halving every `halflifeMinutes` before the session's
    * LAST conversion event (the anchor). All credit arithmetic is EXACT
    * integers so the table hash-checks: a touch's age in whole
    * half-lives is `d = micros(anchor − ts) div halflifeUs`
    * (`timestampdiff` — NTZ-safe), its weight is
    * `w = 1,000,000 div (1 << least(d, 20))` (dyadic decay, the q141
    * discipline; the shift is capped at 20 on BOTH engines — beyond it
    * the weight is 0 anyway, and an uncapped shift is engine-specific
    * UB), and its credit is `(cvμ · w) div Σw` micro-units (floor
    * division, identical rule both sides). Touches after the anchor
    * earn nothing (a negative age has no cross-engine floor-division
    * story — they're filtered, not clamped). Output: (channel,
    * n_touches, credit_micro, credit_value) over credited touches;
    * `credit_value` is one IEEE division per output row (the q194
    * ratio discipline).
    *
    * Scale shape: sessionization's one key shuffle; the anchor and
    * weight-sum aggregates reuse its (k, sid) grouping; credit joins
    * are (k, sid)-keyed and session-count-sized; the final rollup is a
    * map-side-combinable channel groupBy. Overflow headroom:
    * `cvμ · w ≤ cvμ · 10⁶`, so conversion values to ~9.2 · 10⁶ in
    * currency units fit i64.
    */
  def decayAttribution(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, typeCol: String, valueCol: String,
                       convType: String, halflifeMinutes: Int = 10,
                       gapMinutes: Int = 30): DataFrame = {
    require(halflifeMinutes >= 1,
      s"halflifeMinutes must be positive, got $halflifeMinutes")
    val halflifeUs = halflifeMinutes * 60000000L
    val s = sessionized(df, keyCol, tsCol, tieCol, typeCol, valueCol,
      gapMinutes)
    val perSess = convertingSessions(s, convType)
    val anchors = s.filter(col("et") === convType)
      .groupBy("k", "sid").agg(max(col("ts")).as("__anchor"))
    // referenced twice (sums + credit join) over a windowed lineage —
    // the DAG-reuse rule: cache, released by the caller's clearCache
    val weighted = ScaleOps.trackCache(s.filter(col("et") =!= convType)
      .join(anchors, Seq("k", "sid"))
      .filter(col("ts") <= col("__anchor"))
      .withColumn("__d",
        expr(s"timestampdiff(MICROSECOND, ts, __anchor) div ${halflifeUs}L"))
      .withColumn("__w",
        expr("1000000L div shiftleft(1L, cast(least(__d, 20L) as int))")))
    val sums = weighted.groupBy("k", "sid").agg(sum(col("__w")).as("__sw"))
      .filter(col("__sw") > 0L)
    weighted.join(sums, Seq("k", "sid"))
      .join(perSess, Seq("k", "sid"))
      .select(col("et"), expr("(cvu * __w) div __sw").as("cu"))
      .groupBy("et").agg(
        count(lit(1)).as("n_touches"),
        sum(col("cu")).as("credit_micro"))
      .select(col("et").as("channel"), col("n_touches"), col("credit_micro"),
        (col("credit_micro").cast("double") / lit(1000000.0)).as("credit_value"))
  }

  /** Side-by-side comparison of all four attribution rails — the table
    * a marketing-analytics consumer actually reads: per channel, the
    * credit each model assigns (first-touch 100%-to-first, linear
    * equal-split, U-shaped 40/20/40, time-decay dyadic half-life), from
    * ONE sessionization pass over ONE scan. Every rail reuses its
    * shipped arithmetic verbatim (micro-unit floor credits — q142's
    * first-touch restricted to the shared eligible-session set so all
    * four columns credit the same conversion mass and are comparable:
    * each column sums to ≈ Σcvμ minus its floor loss), so the whole
    * table hash-checks against an oracle built from the four rails'
    * own CTEs.
    *
    * Scale shape: the sessionized frame and eligible-session table are
    * cached (each rail references them once — without the cache the
    * session window re-executes four times); each rail is then
    * (k, sid)-keyed joins + a channel rollup, and the final alignment
    * is four channel-keyed outer joins over channel-cardinality frames.
    *
    * Output: (channel, first_micro, linear_micro, position_micro,
    * decay_micro) — 0 where a rail credits the channel nothing.
    */
  def attributionCompare(df: DataFrame, keyCol: String, tsCol: String,
                         tieCol: String, typeCol: String, valueCol: String,
                         convType: String, halflifeMinutes: Int = 10,
                         gapMinutes: Int = 30): DataFrame = {
    require(halflifeMinutes >= 1,
      s"halflifeMinutes must be positive, got $halflifeMinutes")
    val halflifeUs = halflifeMinutes * 60000000L
    val s = ScaleOps.trackCache(
      sessionized(df, keyCol, tsCol, tieCol, typeCol, valueCol, gapMinutes))
    val perSess = ScaleOps.trackCache(convertingSessions(s, convType))
    val touches = s.filter(col("et") =!= convType)
    // first-touch: the eligible session's full cvμ lands on its first
    // non-conversion touch channel
    val first = touches.groupBy("k", "sid")
      .agg(min_by(col("et"), struct(col("ts"), col("tie"))).as("et"))
      .join(perSess, Seq("k", "sid"))
      .groupBy("et").agg(sum(col("cvu")).as("first_micro"))
    val linear = touches.groupBy("k", "sid", "et").agg(count(lit(1)).as("nt"))
      .join(perSess, Seq("k", "sid"))
      .select(col("et"), expr("(cvu * nt) DIV ntouch").as("cu"))
      .groupBy("et").agg(sum(col("cu")).as("linear_micro"))
    val posTouch = touches.withColumn("__p", row_number()
      .over(Window.partitionBy("k", "sid").orderBy(col("ts"), col("tie"))))
    val posBp = when(col("ntouch") === 1, 10000L)
      .when(col("ntouch") === 2, 5000L)
      .when(col("__p") === 1 || col("__p") === col("ntouch"), 4000L)
      .otherwise(expr("2000L DIV (ntouch - 2)"))
    val position = posTouch.join(perSess, Seq("k", "sid"))
      .select(col("et"), posBp.as("__bp"), col("cvu"))
      .select(col("et"), expr("(cvu * __bp) DIV 10000").as("cu"))
      .groupBy("et").agg(sum(col("cu")).as("position_micro"))
    val anchors = s.filter(col("et") === convType)
      .groupBy("k", "sid").agg(max(col("ts")).as("__anchor"))
    val weighted = ScaleOps.trackCache(touches
      .join(anchors, Seq("k", "sid"))
      .filter(col("ts") <= col("__anchor"))
      .withColumn("__d",
        expr(s"timestampdiff(MICROSECOND, ts, __anchor) div ${halflifeUs}L"))
      .withColumn("__w",
        expr("1000000L div shiftleft(1L, cast(least(__d, 20L) as int))")))
    val sums = weighted.groupBy("k", "sid").agg(sum(col("__w")).as("__sw"))
      .filter(col("__sw") > 0L)
    val decay = weighted.join(sums, Seq("k", "sid"))
      .join(perSess, Seq("k", "sid"))
      .select(col("et"), expr("(cvu * __w) div __sw").as("cu"))
      .groupBy("et").agg(sum(col("cu")).as("decay_micro"))
    Seq(first, linear, position, decay)
      .map(_.withColumnRenamed("et", "channel"))
      .reduce(_.join(_, Seq("channel"), "full_outer"))
      .select(col("channel"),
        coalesce(col("first_micro"), lit(0L)).as("first_micro"),
        coalesce(col("linear_micro"), lit(0L)).as("linear_micro"),
        coalesce(col("position_micro"), lit(0L)).as("position_micro"),
        coalesce(col("decay_micro"), lit(0L)).as("decay_micro"))
  }

  /** Session path mining: sessionize per key (the q25 30-minute gap),
    * take each session's first `depth` event types in (ts, tie) order,
    * and count the resulting paths corpus-wide — the
    * behavior-discovery complement of [[funnel]] (a funnel checks ONE
    * hypothesized sequence; this surfaces which opening sequences
    * actually happen and how often). Output:
    * (path, n_sessions) — '>'-joined type prefix, sessions following
    * it — ordered (n desc, path).
    *
    * Scale shape: sessionization is the one key shuffle; each
    * session's prefix is assembled with collect_list of (rn, type)
    * structs + array_sort — order-DETERMINISTIC regardless of
    * partition iteration order, never an order-sensitive collect —
    * and rows past `depth` are filtered before the aggregation, so
    * the collected lists are bounded at `depth` entries. The path
    * count is a map-side-combinable string groupBy.
    */
  def sessionPaths(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, typeCol: String,
                   depth: Int = 3, gapMinutes: Int = 30): DataFrame = {
    require(depth >= 1, s"depth must be positive, got $depth")
    val marked = df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("et"))
      .withColumn("__prev",
        lag(col("ts"), 1).over(Window.partitionBy("k").orderBy("ts", "tie")))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("ts") >= col("__prev") + expr(s"INTERVAL $gapMinutes MINUTES"),
          1L).otherwise(0L))
      .withColumn("sid", sum(col("__new"))
        .over(Window.partitionBy("k").orderBy(col("ts"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rn", row_number()
        .over(Window.partitionBy("k", "sid").orderBy(col("ts"), col("tie"))))
      .filter(col("rn") <= depth)
    val paths = marked.groupBy("k", "sid")
      .agg(array_sort(collect_list(struct(col("rn"), col("et")))).as("steps"))
      .select(concat_ws(">", transform(col("steps"), s => s("et"))).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
  }

  def funnel(df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
             steps: Seq[String], within: Column): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = df.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("__t"))
    def stage(i: Int, s: String, frame: DataFrame): DataFrame =
      frame.agg(count(lit(1)).as("users"))
        .select(lit(i.toLong).as("step"), lit(s).as("event_type"), col("users"))
    var rows = stage(1, steps.head, cur)
    for ((s, i) <- steps.tail.zipWithIndex) {
      cur = df.filter(col(typeCol) === s).join(cur, keyCol)
        .filter(col(tsCol) >= col("__t") && col(tsCol) <= col("__t") + within)
        .groupBy(col(keyCol)).agg(min(col(tsCol)).as("__t"))
      rows = rows.unionAll(stage(i + 2, s, cur))
    }
    rows
  }

  /** Basket co-occurrence: for every unordered item pair sharing a
    * basket, the pair count plus each item's basket frequency — the
    * support/confidence/lift surface of association mining (confidence
    * and lift are one division away; kept integer so the surface is
    * engine-exact). The per-basket pair explosion is quadratic in BASKET
    * size (small and bounded — an order's lines, a session's pages), not
    * corpus size; the self-join is an equi-join on the basket key and the
    * frequency joins ship item-cardinality frames (AQE broadcasts them).
    */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val ps = df.select(col(basketCol).as("o"), col(itemCol).as("p")).distinct().cache()
    val pairs = ps.select(col("o"), col("p").as("pa"))
      .join(ps.select(col("o"), col("p").as("pb")), "o")
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
    val freq = ps.groupBy(col("p")).agg(count(lit(1)).as("n"))
    pairs
      .join(freq.select(col("p").as("pa"), col("n").as("n_a")), "pa")
      .join(freq.select(col("p").as("pb"), col("n").as("n_b")), "pb")
      .select("pa", "pb", "n_ab", "n_a", "n_b")
  }

  /** Data-quality audit in one pass: violation counts for named boolean
    * predicates (each a per-row expression folded by ONE aggregate scan)
    * plus a duplicate-key check (the one constraint that needs a
    * shuffle). The pre-flight every 100 TB ingest runs; output is
    * (check_name, violations), one row per check. Predicate names must
    * be valid SQL identifiers.
    */
  def auditChecks(df: DataFrame, checks: Seq[(String, Column)],
                  dupKeys: Seq[String]): DataFrame = {
    require(checks.nonEmpty, "auditChecks needs at least one predicate")
    val aggs = checks.map { case (n, c) =>
      sum(when(c, lit(1L)).otherwise(lit(0L))).as(n)
    }
    val stacked = df.agg(aggs.head, aggs.tail: _*).select(expr(
      s"stack(${checks.size}, " +
        checks.map { case (n, _) => s"'$n', $n" }.mkString(", ") +
        ") AS (check_name, violations)"))
    val dups = df.groupBy(dupKeys.map(col): _*).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"))
      .select(lit("duplicate_key").as("check_name"), col("violations"))
    stacked.unionAll(dups)
  }

  /** Referential-integrity orphan count: child rows whose `childKey`
    * value has no match in `parent.parentKey` (NULL child keys are not
    * orphans — SQL FK semantics). One anti-join per relationship; the
    * parent side reduces to its distinct key column first, so the probe
    * is key-sized (broadcastable for dimension parents).
    */
  def fkOrphans(child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))

  /** Functional-dependency violation count for `lhs → rhs`: the number
    * of lhs values mapping to MORE than one distinct rhs — 0 iff the FD
    * holds exactly. One hash aggregation; countDistinct per group stays
    * map-side-combinable at any lhs cardinality.
    */
  def fdViolations(df: DataFrame, lhs: String, rhs: String): DataFrame =
    df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("__n"))
      .agg(coalesce(sum(when(col("__n") > 1, lit(1L)).otherwise(lit(0L))),
        lit(0L)).as("violations"))

  /** CDC (change-data-capture) apply — the MERGE-INTO compaction every
    * lakehouse sync job runs: fold an op log of I/U/D rows into a
    * snapshot under LAST-WRITER-WINS by `seqCols` per key. Semantics:
    * the newest op per key decides — `D` removes the key, anything else
    * upserts the op row's payload; snapshot rows whose key has NO op
    * pass through. The op-log side must carry the snapshot's columns
    * plus `opCol`; both inputs shuffle once on the key (the op log's
    * per-key newest is a [[latestByKey]] window, the pass-through an
    * anti-join) — the standard distributed CDC shape, no driver loop.
    * Related rails: [[scd2]] keeps history where this keeps the latest
    * image; [[graft.ops.CorpusOps.incrementalAgg]]/[[deltaJoin]]
    * maintain aggregates/joins where this maintains the base table.
    */
  def cdcApply(snapshot: DataFrame, ops: DataFrame, keys: Seq[String],
               opCol: String, seqCols: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "cdcApply needs key columns")
    val latest = latestByKey(ops, keys.map(col), seqCols)
    val upserts = latest.filter(upper(col(opCol)) =!= "D")
      .select(snapshot.columns.map(col): _*)
    val untouched = snapshot
      .join(ops.select(keys.map(col): _*).distinct(), keys, "left_anti")
    untouched.unionByName(upserts)
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns —
    * the privacy screen a dataset release runs beside the PII redaction
    * rail (q58): rows are grouped into QI equivalence classes; a row is
    * re-identifiable when its class holds fewer than `k` rows
    * (k-anonymity, Sweeney) and a class leaks its sensitive attribute
    * when it carries fewer than `l` DISTINCT sensitive values
    * (l-diversity, Machanavajjhala et al.). One hash aggregation over
    * the QI key (map-side-combinable countDistinct via the two-level
    * aggregate Spark plans for a single distinct), then a tiny summary:
    * (n_classes, rows_at_risk, classes_low_diversity) — all exact
    * integers.
    */
  def privacyAudit(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                   k: Long, l: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 1 && l >= 1,
      s"need QI columns and k,l >= 1, got k=$k l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(col(sensitiveCol)).as("__d"))
      .agg(count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("__n") < k, col("__n")).otherwise(lit(0L))),
          lit(0L)).as("rows_at_risk"),
        coalesce(sum(when(col("__d") < l, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("classes_low_diversity"))
  }

  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKeys: Seq[String], rightKeys: Seq[String],
               leftId: String, leftTs: String, rightTs: String,
               rightTie: String, lookback: Option[Column] = None): DataFrame = {
    // the as-of bound must be part of the join condition: an outer join
    // filtered afterwards would drop (not null-extend) left rows whose
    // only matches are later than leftTs
    val base = leftKeys.zip(rightKeys)
      .map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _) && right(rightTs) <= left(leftTs)
    val cond = lookback.fold(base)(lb => base && right(rightTs) >= left(leftTs) - lb)
    val joined = left.join(right, cond, "left_outer")
    val w = Window.partitionBy(left(leftId))
      .orderBy(right(rightTs).desc_nulls_last, right(rightTie).desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Seasonal-naive outlier days: daily counts per key, residual vs the
    * SAME WEEKDAY `lagDays` back (an explicit (key, day−lag) self-join,
    * so calendar gaps yield no residual rather than a wrong lag-row),
    * then a per-key integer σ-gate on the residual population — the
    * squared inequality `(m·x − Σx)² > k²·(m·Σx² − (Σx)²)` evaluated in
    * DECIMAL(38,0), the [[graft.ops.CorpusOps.sigmaClip]] discipline
    * made per-group. The volume-anomaly monitor a pipeline reads over
    * its ingest log; everything integer → the whole flag table
    * hash-checks.
    *
    * Scale shape: one map-side-combinable daily reduce, a day-keyed
    * self-join over the (tiny) daily table, a per-key stats aggregate
    * broadcast back. Output:
    * (key, day, n, resid, is_outlier), ordered (key, day).
    */
  def seasonalOutliers(df: DataFrame, keyCol: String, tsCol: String,
                       lagDays: Int = 7, k: Int = 2): DataFrame = {
    require(lagDays >= 1 && k >= 1)
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val daily = df.select(col(keyCol).as("k"), to_date(col(tsCol)).as("d"))
      .groupBy("k", "d").agg(count(lit(1)).as("n"))
      .cache() // self-joined below (DAG-reuse rule; clearCache releases)
    val prev = daily.select(col("k"), date_add(col("d"), lagDays).as("d"),
      col("n").as("pn"))
    val resid = daily.join(prev, Seq("k", "d"))
      .select(col("k"), col("d"), col("n"), (col("n") - col("pn")).as("resid"))
    val stats = resid.groupBy("k").agg(count(lit(1)).as("m"),
      sum(col("resid")).as("s1"), sum(col("resid") * col("resid")).as("s2"))
    // m·resid − s1 must widen BEFORE the multiply: the DuckDB oracle
    // computes this term in HUGEINT, so a BIGINT wrap here (ANSI off)
    // would silently diverge at astronomically large daily counts.
    val dev = col("m").cast(d38) * col("resid").cast(d38) - col("s1").cast(d38)
    resid.join(broadcast(stats), "k")
      .select(col("k"), col("d"), col("n"), col("resid"),
        (dev * dev >
          lit(k.toLong * k) * (col("m").cast(d38) * col("s2").cast(d38) -
            col("s1").cast(d38) * col("s1").cast(d38))).as("is_outlier"))
      .orderBy("k", "d")
  }

  /** Bidirectional nearest-match join: for each left row, the right row
    * whose timestamp is CLOSEST in absolute distance within ±`within` —
    * the temporal-alignment primitive ([[asOfJoin]] only looks
    * backward; sensor/event alignment and media↔transcript pairing
    * want nearest-either-side). Ties break toward the EARLIER right
    * timestamp, then the tie column — a total order, so the result
    * hash-checks. Left rows with no right row in the window
    * null-extend.
    *
    * Scale shape: the ±window bound lives INSIDE the join condition
    * (the q59 lesson — per-key expansion is bounded by the horizon,
    * not the partner's full history), and the per-left argmin is a
    * rank-1 window. The distance is interval arithmetic
    * (`greatest(l−r, r−l)`), never epoch extraction — TIMESTAMP_NTZ
    * safe (the q142 lesson).
    */
  def nearestJoin(left: DataFrame, right: DataFrame,
                  leftKeys: Seq[String], rightKeys: Seq[String],
                  leftId: String, leftTs: String, rightTs: String,
                  rightTie: String, within: Column): DataFrame = {
    val cond = leftKeys.zip(rightKeys)
      .map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _) &&
      right(rightTs) >= left(leftTs) - within &&
      right(rightTs) <= left(leftTs) + within
    val joined = left.join(right, cond, "left_outer")
    val dist = greatest(left(leftTs) - right(rightTs),
      right(rightTs) - left(leftTs))
    val w = Window.partitionBy(left(leftId))
      .orderBy(dist.asc_nulls_last, right(rightTs).asc_nulls_last,
        right(rightTie).asc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact weighted median per group: the smallest value v (under the
    * total order `valueCol`, then `tieCols`) whose cumulative weight
    * reaches half the group's total — `2·cumw ≥ totw` in INTEGER
    * arithmetic, no float division. The robust-location primitive the
    * mean-based rails (σ-clip, winsorize) build on; weight = row
    * multiplicity generalizes to frequency-table medians without
    * expansion. Shape: one partitioned running-sum window + one
    * group-total window over the SAME partitioning (one shuffle, two
    * window passes Spark fuses over the sorted partition), then a
    * struct-min argmin per group — fully partitioned, no global sort.
    */
  def weightedMedian(df: DataFrame, keys: Seq[String], valueCol: Column,
                     weightCol: Column, tieCols: Seq[Column]): DataFrame =
    weightedQuantile(df, keys, valueCol, weightCol, tieCols, bp = 5000)
      .withColumnRenamed("wquantile", "wmedian")

  /** Exact weighted `bp`-basis-point quantile per group — the smallest
    * value whose cumulative weight reaches the bp fraction of the
    * group total, `10000·cumw ≥ bp·totw` in exact arithmetic (the
    * basis-point discipline of q99: no float division anywhere; both
    * products are widened to DECIMAL(38,0) so no weight sum can wrap a
    * BIGINT under ANSI-off). bp = 5000 is [[weightedMedian]];
    * 2500/7500 give the exact IQR fences.
    * One-quantile convenience over [[weightedQuantiles]].
    */
  def weightedQuantile(df: DataFrame, keys: Seq[String], valueCol: Column,
                       weightCol: Column, tieCols: Seq[Column],
                       bp: Int): DataFrame =
    weightedQuantiles(df, keys, valueCol, weightCol, tieCols,
      Seq(bp -> "wquantile"))

  // ---- bracketed-quantile machinery (shared by weightedQuantiles and
  // weightedMedianMad) ----------------------------------------------------

  private[ops] def bigDec(a: Any): java.math.BigDecimal = {
    val raw = a match {
      case b: java.math.BigDecimal => b
      case b: scala.math.BigDecimal => b.bigDecimal
      case n: java.lang.Number => new java.math.BigDecimal(n.toString)
      case null => throw new IllegalArgumentException(
        "bracketed quantiles need NON-NULL values: a group whose values " +
          "are all null has no quantile — filter null-value rows (or " +
          "such groups) out first")
      case other => throw new IllegalArgumentException(
        "bracketed quantiles need a NUMERIC value column, got " +
          other.getClass.getName + " — cast/encode the order value first")
    }
    // exact embed at scale 12 — NEVER round silently (a rounded bound
    // could misbucket a row and break the exactness contract); a >12-dp
    // value (e.g. a raw double like 0.30000000000000004) fails loudly
    // with the fix spelled out
    try raw.setScale(12)
    catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        s"bracketed quantiles carry values exactly at scale 12; got $raw " +
          "(more than 12 decimal places) — cast the value column to " +
          "DECIMAL or an integral type first")
    }
  }

  /** Shared prep for the bracketed quantile ops: normalized projection,
    * deterministic sampled value bounds (hash-ranked TakeOrdered,
    * ≤ 200·np rows), the monotone bucket chain (bucket b covers
    * `[bounds(b−1), bounds(b))`; 0 and last unbounded), and — for the
    * ops that bracket on the driver ([[weightedMedianMad]]'s MAD
    * two-pointer) — the driver-held per-(bucket, group) weight table
    * `byGroup`, ≤ np·|groups| rows (a low-group-cardinality contract:
    * q189's handful of flags is fine, a million-group key is not that
    * op — [[weightedQuantiles]] keeps its coarse CDF DISTRIBUTED and
    * has no such bound). All driver compares run on exact BigDecimal
    * at scale 12, which embeds integral and ≤ 6-dp decimal values
    * losslessly. Group keys must be non-null (bracket constants join
    * back on them); weights must be non-negative and INTEGRAL
    * (fractional weights would silently truncate under the long cast —
    * scale them to integer units first, the basis-point discipline).
    */
  private final class QuantileBuckets(df: DataFrame, keys: Seq[String],
      valueCol: Column, weightCol: Column, tieCols: Seq[Column],
      partitions: Int) {
    val spark: org.apache.spark.sql.SparkSession = df.sparkSession
    val np: Int = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val kcols: Seq[Column] = keys.map(col)
    val nK: Int = keys.size
    locally {
      import org.apache.spark.sql.types._
      val wType = df.select(weightCol.as("__w")).schema.head.dataType
      val integral = wType match {
        // scale-0 decimals are integral by type — lossless under the
        // long cast (up to 18 digits, which the cast checks at runtime)
        case d: DecimalType => d.scale == 0 && d.precision <= 18
        case t => Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(t)
      }
      require(integral,
        s"weighted quantile rail needs an INTEGRAL weight column " +
          s"(byte/short/int/long or DECIMAL(≤18,0)), got $wType — " +
          "fractional weights would truncate silently; scale them to " +
          "integer units (e.g. basis points) and cast first")
    }
    val base: DataFrame = df.select((kcols :+ valueCol.as("__v") :+
      weightCol.cast("long").as("__w")) ++
      tieCols.zipWithIndex.map { case (c, i) => c.as(s"__t$i") }: _*)
    val vType: org.apache.spark.sql.types.DataType = base.schema("__v").dataType
    val ties: Seq[Column] = tieCols.indices.map(i => col(s"__t$i"))
    val vd: Column = col("__v").cast("decimal(38,12)")
    private val keyFields = base.schema.fields.take(nK)
    val bounds: IndexedSeq[java.math.BigDecimal] = {
      val sampled = base.select(col("__v").as("__sv"),
          xxhash64((kcols ++ (col("__v") +: ties)): _*).as("__sh"))
        .orderBy(col("__sh"), col("__sv")).limit(np * 200)
        .select("__sv").orderBy(col("__sv")).collect().map(r => bigDec(r.get(0)))
      val step = math.max(1, sampled.length / np)
      sampled.indices.collect {
        case i if i > 0 && i % step == 0 => sampled(i) }.distinct.toIndexedSeq
    }
    val bucketCol: Column = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(vd >= lit(b), 1).otherwise(0) }
    // the coarse CDF, COLLECTED: per group, ascending (bucket, weight).
    // Lazy — only the driver-bracketing ops (weightedMedianMad) pay the
    // ≤ np·|groups| driver transfer; weightedQuantiles never touches it
    lazy val byGroup: Map[List[Any], Array[(Int, Long)]] = base
      .groupBy((bucketCol.as("__gb") +: kcols): _*)
      .agg(sum(col("__w")).as("__pw")).collect()
      .groupBy(r => (1 to nK).map(r.get).toList)
      .map { case (k, rs) =>
        k -> rs.map(r => r.getInt(0) -> r.getLong(nK + 1)).sortBy(_._1) }
    def bLo(b: Int): java.math.BigDecimal = if (b == 0) null else bounds(b - 1)
    def bHi(b: Int): java.math.BigDecimal =
      if (b >= bounds.length) null else bounds(b)
    /** exact `10000·cum ≥ bp·tot` (BigInt — no wrap at any weight sum) */
    def crosses(cum: Long, bp: Int, tot: Long): Boolean =
      BigInt(cum) * 10000 >= BigInt(bp) * BigInt(tot)
    /** [[crosses]] as a Column over (__cum, __tot) — DECIMAL(38,0), no
      * wrap at any weight sum */
    def crossesCol(bp: Int): Column =
      col("__cum").cast("decimal(38,0)") * lit(10000L) >=
        col("__tot").cast("decimal(38,0)") * lit(bp.toLong)
    /** the distributed coarse CDF: per-(bucket, group) weights with
      * running/total sums windowed PER GROUP over the tiny aggregate
      * (≤ np·|groups| rows) — never collected, so group cardinality is
      * unbounded. Lazy: the driver-bracketing op reads [[byGroup]]
      * instead.
      */
    lazy val cdf: DataFrame = {
      val wCum = Window.partitionBy(kcols: _*).orderBy(col("__gb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(kcols: _*)
      base.groupBy((bucketCol.as("__gb") +: kcols): _*)
        .agg(sum(col("__w")).as("__pw"))
        .withColumn("__cum", sum(col("__pw")).over(wCum))
        .withColumn("__tot", sum(col("__pw")).over(wTot))
        .withColumn("__off", col("__cum") - col("__pw"))
    }
    /** the crossing-bucket argmin for one fence over [[cdf]] rows: the
      * FIRST bucket whose cumulative crosses (cum is monotone and __gb
      * unique per group, so struct-min is exact). The last bucket
      * always crosses (cum = tot), so the struct is never null.
      */
    def bracketAt(bp: Int): Column =
      min(when(crossesCol(bp),
        struct(col("__gb"), col("__off"), col("__tot"))))
    /** the fine cumulative pass over bracket rows: base rows join their
      * group's bracket rows on (bucket, group) — disjoint row sets per
      * bracket — and the running weight adds the bracket's exact
      * offset; windows partition by (bucket, group), never group alone.
      */
    def finePass(brackets: DataFrame): DataFrame = {
      val wF = Window.partitionBy((col("__gb") +: kcols): _*)
        .orderBy((col("__v") +: ties).map(_.asc): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.withColumn("__gb", bucketCol).join(brackets, "__gb" +: keys)
        .withColumn("__cum", sum(col("__w")).over(wF) + col("__off"))
    }
    def constDf(rows: Seq[(List[Any], Seq[Any])],
                fields: Seq[org.apache.spark.sql.types.StructField]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, cs) =>
          org.apache.spark.sql.Row.fromSeq(k ++ cs) }, 1),
        org.apache.spark.sql.types.StructType(keyFields ++ fields))
  }

  /** Several exact weighted quantiles per group in one structure — each
    * `(bp, outCol)` emits the smallest value whose cumulative weight
    * reaches `bp` basis points of the group total (`10000·cumw ≥
    * bp·totw`, exact arithmetic, no float division) — computed with NO
    * corpus-sized shuffle or sort: bucket-bracket refinement
    * ([[QuantileBuckets]]' coarse CDF brackets each bp's crossing
    * bucket on the driver, with its exact cumulative offset), then ONE
    * fine pass scans only the bracket buckets' rows (~n/np per fence —
    * a value-range predicate parquet min/max stats prune) and runs the
    * windowed cumulative over those row sets alone, partitioned by
    * (bucket, group). All bp fences share the fine pass: every fence's
    * true argmin row is inside its own bracket with an exact offset
    * cum, and extra bracket rows can only qualify at larger values, so
    * one conditional argmin per fence over the union is exact.
    * Replaces the round-9 groupedRunningSum form, whose range
    * repartition shuffled the whole input to rank ALL rows when only
    * the fence rows matter.
    *
    * The bracket choice itself is DISTRIBUTED (round-11): the coarse
    * CDF stays a DataFrame (≤ np·|groups| rows, windowed per group —
    * a tiny aggregate whatever the corpus size), the crossing bucket
    * per fence is a struct-min argmin over it, and the bracket rows
    * join back to the fine pass — so group cardinality is UNBOUNDED
    * (per-domain stats at 10⁵–10⁶ groups are fine; the ~10k-group
    * driver-partial bound now applies only to [[weightedMedianMad]]'s
    * MAD two-pointer). With few groups AQE broadcasts the tiny bracket
    * side at runtime; with many it's a plain shuffled equi-join on
    * (bucket, group) — never a hot single reducer either way.
    * `(valueCol, tieCols)` must total-order rows within a group; group
    * keys non-null; weights non-negative and integral BY TYPE —
    * byte/short/int/long or a scale-0 DECIMAL(≤18,0); any fractional
    * type is rejected at analysis time (it would truncate silently —
    * scale to integer units first). The contract applies to the whole
    * rail ([[weightedMedian]]/[[weightedQuantile]]/[[weightedMedianMad]]
    * /[[weightedMedianMadDistributed]] share this machinery).
    */
  def weightedQuantiles(df: DataFrame, keys: Seq[String], valueCol: Column,
                        weightCol: Column, tieCols: Seq[Column],
                        bps: Seq[(Int, String)]): DataFrame = {
    require(bps.nonEmpty, "weightedQuantiles needs at least one (bp, name)")
    bps.foreach { case (bp, _) =>
      require(bp >= 1 && bp <= 10000, s"bp must be in [1, 10000], got $bp")
    }
    val q = new QuantileBuckets(df, keys, valueCol, weightCol, tieCols, 0)
    // one crossing-bucket argmin per fence over the distributed coarse
    // CDF, the distinct bracket rows joined back to ONE shared fine pass
    val fenceAggs = bps.zipWithIndex.map { case ((bp, _), i) =>
      q.bracketAt(bp).as(s"__f$i")
    }
    val brDf = q.cdf.groupBy(q.kcols: _*)
      .agg(fenceAggs.head, fenceAggs.tail: _*)
      .select((q.kcols :+ explode(array_distinct(
        array(bps.indices.map(i => col(s"__f$i")): _*))).as("__s")): _*)
      .select((q.kcols :+ col("__s.__gb").as("__gb") :+
        col("__s.__off").as("__off") :+ col("__s.__tot").as("__tot")): _*)
    val aggs = bps.map { case (bp, name) =>
      min(when(q.crossesCol(bp), col("__v"))).as(name)
    }
    q.finePass(brDf).groupBy(q.kcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact weighted median AND weighted MAD per group with NO
    * corpus-sized shuffle or sort — bucket-bracket refinement (the
    * classic exact-distributed-quantile shape: coarse CDF → bracket →
    * fine pass), which replaced q189's original two-pass
    * `weightedMedian` machine (round-9 review item). A first fused
    * attempt (fold pass-1's per-distinct-value cum structure around the
    * median) measured SLOWER than two-pass at sf0.1 — l_extendedprice
    * is 99% distinct, so the contraction contracts nothing and the
    * deviation-order window still sorts the whole corpus. This form
    * never materializes a corpus-wide cumulative structure at all:
    *
    *  1. ONE deterministic sampled-bounds pass over the value column
    *     (hash-ranked TakeOrdered, ≤ 200·np rows — the
    *     groupedRunningSum discipline) → a monotone bucket chain;
    *  2. ONE map-side-combinable pass → per-(bucket, group) weights,
    *     collected (≤ np·|groups| rows — the low-group-cardinality
    *     contract of the de-skew rail);
    *  3. driver arithmetic (exact BigDecimal) brackets the median
    *     crossing per group — the bucket where the cumulative weight
    *     crosses half — and a FINE pass scans only that bucket's rows
    *     (~n/np per group, a value-range predicate that parquet
    *     min/max stats prune) with the exact integer halving rule
    *     `2·(offset + local cum) ≥ tot`;
    *  4. the MAD bracket folds the SAME bucket weights around the now-
    *     known median m: for candidate radii D (bucket-edge distances
    *     to m), `W(|x−m| ≤ D)` is bounded below by the fully-contained
    *     buckets of `[m−D, m+D]` and above by the intersecting ones —
    *     the two-pointer over pass-2's structure, run on the driver
    *     over ≤ np·|groups| numbers; the crossing radius is bracketed
    *     in `(Dlo, Dhi]` (≈ the edge buckets' weight), and a fine pass
    *     scans only `dev ∈ (Dlo, Dhi]` rows (+ one conditional-sum
    *     scan for the exact base weight `W(dev ≤ Dlo)`).
    *
    * Five pruned scans of a 3-column projection, zero full-data
    * exchanges; the only windows run over bracket-sized row sets. All
    * bracket math is conservative (exact BigDecimal compares at scale
    * 12, which embeds both integral and ≤ 6-dp decimal values
    * losslessly), so the fine passes always contain the crossing row
    * and the result is EXACTLY the per-row halving rule — q189's
    * per-row-cum SQL oracle stays green, and the spec checks dense-tie
    * and constant-group edges at several partition counts. Output:
    * keys, `wmedian` (original value type), `mad` (same).
    */
  def weightedMedianMad(df: DataFrame, keys: Seq[String], valueCol: Column,
                        weightCol: Column, tieCols: Seq[Column],
                        partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, LongType, StructField}
    val q = new QuantileBuckets(df, keys, valueCol, weightCol, tieCols, partitions)
    import q.{base, bLo, bHi, bounds, byGroup, kcols, nK, ties, vd, vType}
    val dec12 = DecimalType(38, 12)
    val dec0 = "decimal(38,0)"

    // median bracket per group → fine pass A (the weightedQuantiles
    // shape at bp 5000, kept inline so the same prep serves the MAD)
    val medBr = byGroup.toSeq.map { case (k, bw) =>
      val tot = bw.map(_._2).sum
      var cum = 0L
      val (bStar, off) = bw.iterator.map { case (b, w) =>
        val prev = cum; cum += w; (b, prev, cum)
      }.collectFirst { case (b, prev, c) if q.crosses(c, 5000, tot) =>
        (b, prev) }.get
      (k, Seq[Any](bLo(bStar), bHi(bStar), off, tot))
    }
    val medBdf = broadcast(q.constDf(medBr, Seq(
      StructField("__blo", dec12, nullable = true),
      StructField("__bhi", dec12, nullable = true),
      StructField("__off", LongType, nullable = false),
      StructField("__tot", LongType, nullable = false))))
    val wA = Window.partitionBy(kcols: _*)
      .orderBy((col("__v") +: ties).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val medCollected = base.join(medBdf, keys)
      .filter((col("__blo").isNull || vd >= col("__blo")) &&
        (col("__bhi").isNull || vd < col("__bhi")))
      .withColumn("__cum", sum(col("__w")).over(wA) + col("__off"))
      .groupBy(kcols: _*)
      .agg(min(when(col("__cum").cast(dec0) * lit(2L) >= col("__tot").cast(dec0),
          col("__v"))).as("wmedian"),
        max(col("__tot")).as("__tot"))
      .collect()

    // MAD bracket per group: fold the bucket weights around m — the
    // two-pointer over the coarse CDF, run on the driver with exact
    // BigDecimal arithmetic. W(|x−m| ≤ D) is bounded below by buckets
    // fully inside [m−D, m+D] and above by buckets intersecting it, so
    // the crossing radius is bracketed in (dLo, dHi] (≈ the edge
    // buckets' weight).
    val madBr = medCollected.toSeq.map { r =>
      val k = (0 until nK).map(r.get).toList
      val m = bigDec(r.get(nK))
      val tot = r.getLong(nK + 1)
      val (dLo, dHi) = madBracketOf(bounds, m, tot, byGroup(k))
      (k, Seq[Any](m, dLo, dHi, tot))
    }
    val madBdf = broadcast(q.constDf(madBr, Seq(
      StructField("__m", dec12, nullable = false),
      StructField("__dlo", dec12, nullable = true),
      StructField("__dhi", dec12, nullable = true),
      StructField("__tot", LongType, nullable = false))))

    // fine pass B: exact base weight below the bracket + the bracket
    // rows' local cumulative — both scans prune on the value predicate
    val devved = base.join(madBdf, keys)
      .withColumn("__dev", abs(vd - col("__m")))
    val baseW = broadcast(devved.groupBy(kcols: _*)
      .agg(coalesce(sum(when(col("__dlo").isNotNull &&
          col("__dev") <= col("__dlo"), col("__w"))), lit(0L)).as("__bw")))
    val wB = Window.partitionBy(kcols: _*)
      .orderBy((col("__dev") +: ties).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = devved
      .filter((col("__dlo").isNull || col("__dev") > col("__dlo")) &&
        (col("__dhi").isNull || col("__dev") <= col("__dhi")))
      .join(baseW, keys)
      .withColumn("__cum", sum(col("__w")).over(wB) + col("__bw"))
      .groupBy(kcols: _*)
      .agg(min(when(col("__cum").cast(dec0) * lit(2L) >= col("__tot").cast(dec0),
        col("__dev"))).cast(vType).as("mad"))

    // median output from the already-collected exact values (tiny frame)
    val medOut = q.constDf(
      medCollected.toSeq.map(r =>
        ((0 until nK).map(r.get).toList, Seq[Any](r.get(nK)))),
      Seq(StructField("wmedian", vType, nullable = true)))
    medOut.join(mad, keys)
  }

  /** The exact MAD two-pointer fold shared by [[weightedMedianMad]]
    * (driver, per group) and [[weightedMedianMadDistributed]] (executor,
    * per group inside a UDF): given the group's per-bucket weights and
    * its median m, bracket the MAD crossing radius in `(dLo, dHi]` from
    * the contained/intersecting bucket folds. `null` ends mean
    * unbounded, exactly like the bucket chain's outer buckets.
    */
  private def madBracketOf(bounds: IndexedSeq[java.math.BigDecimal],
      m: java.math.BigDecimal, tot: Long, bw: Iterable[(Int, Long)])
      : (java.math.BigDecimal, java.math.BigDecimal) = {
    def bLo(b: Int): java.math.BigDecimal = if (b == 0) null else bounds(b - 1)
    def bHi(b: Int): java.math.BigDecimal =
      if (b >= bounds.length) null else bounds(b)
    val cands = bounds.map(e => e.subtract(m).abs()).distinct.sorted
    def contained(d: java.math.BigDecimal): Long = bw.iterator.map { case (b, w) =>
      val lo = bLo(b); val hi = bHi(b)
      if (lo != null && hi != null &&
        lo.compareTo(m.subtract(d)) >= 0 && hi.compareTo(m.add(d)) <= 0) w
      else 0L
    }.sum
    def intersects(d: java.math.BigDecimal): Long = bw.iterator.map { case (b, w) =>
      val lo = bLo(b); val hi = bHi(b)
      if ((lo == null || lo.compareTo(m.add(d)) <= 0) &&
        (hi == null || hi.compareTo(m.subtract(d)) >= 0)) w
      else 0L
    }.sum
    // BigInt like `crosses` — 2·(a weight sum) must not wrap either
    val dHi = cands.find(d => BigInt(contained(d)) * 2 >= BigInt(tot)).orNull
    val dLo = cands.reverseIterator
      .find(d => BigInt(intersects(d)) * 2 < BigInt(tot)).orNull
    (dLo, dHi)
  }

  /** [[weightedMedianMad]] with the bracket choice DISTRIBUTED — the
    * high-group-cardinality form of the robust location/scale rail
    * (per-domain corpus stats at 10⁵–10⁶ groups; the driver form's
    * ≤ np·|groups| collected partials are documented to ~10k groups).
    * Identical output and exactness contract; the three bracket steps
    * move off the driver:
    *
    *  1. the coarse CDF stays a cached DataFrame (≤ np·|groups| rows,
    *     windowed per group — the round-11 [[weightedQuantiles]]
    *     shape);
    *  2. the median's crossing bucket is a conditional struct-min
    *     argmin over it, and the median fine pass windows per
    *     (bucket, group) over bracket rows only;
    *  3. the MAD radius interval comes from the SAME contained/
    *     intersecting fold as the driver form ([[madBracketOf]]),
    *     evaluated per group in executors over that group's ≤ nb
    *     bucket weights (one `collect_list` bounded by the bucket
    *     count, never by rows) — an interpreted UDF is fine here: it
    *     runs on ONE row per group, not the corpus.
    *
    * Fine passes are unchanged (bracket-pruned rows, exact integer
    * halving rule), so the result is EXACTLY the per-row rule — the
    * spec asserts equality with [[weightedMedianMad]] and the
    * brute-force rule, and q224 oracles it at fixture scale. Bracket
    * frames join back by key (AQE broadcasts them when small); the
    * only collect anywhere is the 200·np bounds sample.
    */
  def weightedMedianMadDistributed(df: DataFrame, keys: Seq[String],
      valueCol: Column, weightCol: Column, tieCols: Seq[Column],
      partitions: Int = 0): DataFrame = {
    require(keys.nonEmpty,
      "the distributed form needs group keys (a single global group " +
        "has nothing to distribute — use weightedMedianMad)")
    import org.apache.spark.sql.types.DecimalType
    val q = new QuantileBuckets(df, keys, valueCol, weightCol, tieCols, partitions)
    import q.{base, bounds, kcols, ties, vd, vType}
    val dec0 = "decimal(38,0)"
    val dec12 = DecimalType(38, 12)

    // 1. distributed coarse CDF — cached: the median bracket and the
    // MAD bracket both read it (tiny: ≤ np·|groups| rows)
    val cdf = ScaleOps.trackCache(q.cdf)

    // 2. median: crossing-bucket argmin → fine pass over bracket rows
    val medBr = cdf.groupBy(kcols: _*)
      .agg(q.bracketAt(5000).as("__s"))
      .select((kcols :+ col("__s.__gb").as("__gb") :+
        col("__s.__off").as("__off") :+ col("__s.__tot").as("__tot")): _*)
    // cached: the MAD bracket joins it, and it IS the median output
    val med = ScaleOps.trackCache(
      q.finePass(medBr)
        .groupBy(kcols: _*)
        .agg(min(when(q.crossesCol(5000), col("__v"))).as("wmedian"),
          max(col("__tot")).as("__gtot")))

    // 3. MAD bracket per group, in executors: the group's bucket
    // weights fold around its median (madBracketOf) — input bounded by
    // the bucket count. Median and bracket ends travel as strings so
    // one UDF serves every numeric value type losslessly.
    val bnds = bounds
    val madBracketUdf = udf((mStr: String, tot: Long,
        gbs: Seq[Int], pws: Seq[Long]) => {
      val m = bigDec(new java.math.BigDecimal(mStr))
      val (dLo, dHi) = madBracketOf(bnds, m, tot, gbs.zip(pws))
      (if (dLo == null) null else dLo.toPlainString,
        if (dHi == null) null else dHi.toPlainString)
    })
    val madBr = cdf.join(med, keys)
      .groupBy(kcols: _*)
      // no sort: madBracketOf's contained/intersecting folds are
      // order-independent sums over the bucket weights
      .agg(collect_list(struct(col("__gb"), col("__pw"))).as("__bwArr"),
        first(col("wmedian")).as("wmedian"),
        first(col("__gtot")).as("__tot"))
      .withColumn("__br", madBracketUdf(col("wmedian").cast("string"),
        col("__tot"), col("__bwArr.__gb"), col("__bwArr.__pw")))
      .select((kcols :+ col("__tot") :+
        col("wmedian").cast(dec12).as("__m") :+
        col("__br._1").cast(dec12).as("__dlo") :+
        col("__br._2").cast(dec12).as("__dhi")): _*)

    // fine pass B — identical to the driver form, bracket frame joined
    // by key instead of broadcast constants
    val devved = base.join(madBr, keys)
      .withColumn("__dev", abs(vd - col("__m")))
    val baseW = devved.groupBy(kcols: _*)
      .agg(coalesce(sum(when(col("__dlo").isNotNull &&
        col("__dev") <= col("__dlo"), col("__w"))), lit(0L)).as("__bw"))
    val wB = Window.partitionBy(kcols: _*)
      .orderBy((col("__dev") +: ties).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = devved
      .filter((col("__dlo").isNull || col("__dev") > col("__dlo")) &&
        (col("__dhi").isNull || col("__dev") <= col("__dhi")))
      .join(baseW, keys)
      .withColumn("__cum", sum(col("__w")).over(wB) + col("__bw"))
      .groupBy(kcols: _*)
      .agg(min(when(col("__cum").cast(dec0) * lit(2L) >= col("__tot").cast(dec0),
        col("__dev"))).cast(vType).as("mad"))

    med.select((kcols :+ col("wmedian").cast(vType).as("wmedian")): _*)
      .join(mad, keys)
  }

  /** Exact 2-D Pareto frontier (skyline): the rows not STRICTLY
    * dominated on two maximize-objectives — B dominates A iff
    * `x_B ≥ x_A ∧ y_B ≥ y_A` with at least one strict; exact ties on
    * both objectives all survive. The multi-objective data-selection
    * primitive (pick documents no other document beats on BOTH quality
    * axes) and a preference-query operator family of its own (Börzsönyi
    * et al., "The Skyline Operator", ICDE'01).
    *
    * Fully distributed and exact with NO single-partition pass:
    * range-repartition on x (equal x co-locate, so every row in a
    * higher partition has STRICTLY greater x than every row in a lower
    * one), then a row is dominated iff
    *  - a same-partition row beats it: max(y) over locally-strictly-
    *    greater x (RANGE frame, x integral) ≥ y, or same-x max(y) > y —
    *    both windows PARTITIONED by the range partition, or
    *  - any higher partition reaches y: the broadcast suffix-max of
    *    per-partition max(y) (one collect, bounded by the partition
    *    count) ≥ y — those rows all have strictly greater x.
    * Lower partitions can never dominate (strictly smaller x). The
    * three checks together are the exact dominance test, so the output
    * IS the skyline — same discipline as [[graft.ops.ScaleOps
    * .globalRank]]: a bounded per-partition stat collect instead of a
    * global sort. `xCol` must be integral (the strict-greater RANGE
    * frame steps by 1).
    */
  /** Per-GROUP exact 2-D Pareto frontier — [[paretoFrontier2]] with a
    * grouping key (the per-segment skyline: "the suppliers no peer IN
    * THEIR NATION beats on both axes"). Same dominance rule per group;
    * the global form's bounded suffix-max COLLECT is replaced by a
    * fully distributed one: per-(range-bucket, group) y-maxima are a
    * tiny aggregate, their per-group strict-suffix maxima come from a
    * window over that tiny frame (≤ buckets rows per group), and the
    * result joins back on (bucket, group) — the groupedRunningSum
    * offset pattern applied to the skyline. Buckets come from the same
    * deterministic sampled-bounds chain (pure function of x — every
    * reference executions bucket identically), so the heavy windows
    * partition by (bucket, group), never group alone. `xCol` must be
    * integral (the strict-greater RANGE frame steps by 1).
    */
  def paretoFrontierGrouped(df: DataFrame, keys: Seq[String],
                            xCol: String, yCol: String,
                            partitions: Int = 0): DataFrame = {
    require(keys.nonEmpty, "paretoFrontierGrouped needs group keys")
    val spark = df.sparkSession
    val np = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val kcols = keys.map(col)
    val base = df.withColumn("__x", col(xCol).cast("long"))
      .withColumn("__y", col(yCol).cast("long"))
    // deterministic bounds over x (collect bounded by 200·np)
    val values = base
      .select(col("__x").as("__sv"),
        xxhash64((kcols :+ col("__x") :+ col("__y")): _*).as("__sh"))
      .orderBy(col("__sh"), col("__sv")).limit(np * 200)
      .select("__sv").orderBy(col("__sv")).collect().map(_.getLong(0))
    val step = math.max(1, values.length / np)
    val bounds = values.indices.collect {
      case i if i > 0 && i % step == 0 => values(i)
    }.distinct
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__x") >= lit(b), 1).otherwise(0)
    }
    val bucketed = base.withColumn("__gb", bucket)
    // per-(bucket, group) y-maxima (tiny), strict-suffix max per group
    val maxes = bucketed.groupBy((col("__gb") +: kcols): _*)
      .agg(max(col("__y")).as("__my"))
    val wAbove = Window.partitionBy(kcols: _*).orderBy(col("__gb"))
      .rowsBetween(1, Window.unboundedFollowing)
    val above = maxes
      .withColumn("__above", coalesce(max(col("__my")).over(wAbove),
        lit(Long.MinValue)))
      .drop("__my")
    val wGreater = Window.partitionBy((col("__gb") +: kcols): _*)
      .orderBy(col("__x")).rangeBetween(1L, Window.unboundedFollowing)
    val wSameX = Window.partitionBy((col("__gb") +: kcols) :+ col("__x"): _*)
    bucketed.join(broadcast(above), "__gb" +: keys)
      .withColumn("__mg", max(col("__y")).over(wGreater))
      .withColumn("__ms", max(col("__y")).over(wSameX))
      .filter((col("__mg").isNull || col("__mg") < col("__y")) &&
        col("__ms") <= col("__y") && col("__above") < col("__y"))
      .drop("__gb", "__above", "__mg", "__ms", "__x", "__y")
  }

  def paretoFrontier2(df: DataFrame, xCol: String, yCol: String,
                      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val np = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // read twice: partition maxes + the filtered output; tracked for
    // ScaleOps.release()
    val ranged = ScaleOps.trackCache(df
      .withColumn("__x", col(xCol).cast("long"))
      .withColumn("__y", col(yCol).cast("long"))
      .repartitionByRange(np, col("__x"))
      .withColumn("__pid", spark_partition_id()))
    val maxes = ranged.groupBy("__pid").agg(max(col("__y")).as("__my"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // suffixAbove(p) = max y over all partitions STRICTLY above p
    val suffixAbove = (np - 1 to 0 by -1).scanLeft(Long.MinValue) { (acc, p) =>
      math.max(acc, maxes.getOrElse(p, Long.MinValue))
    }.reverse.tail // index p = max over partitions > p
    val aboveDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until np).map(p => org.apache.spark.sql.Row(p, suffixAbove(p))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__above",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val wGreater = Window.partitionBy(col("__pid")).orderBy(col("__x"))
      .rangeBetween(1L, Window.unboundedFollowing)
    val wSameX = Window.partitionBy(col("__pid"), col("__x"))
    ranged.join(broadcast(aboveDf), "__pid")
      .withColumn("__mg", max(col("__y")).over(wGreater))
      .withColumn("__ms", max(col("__y")).over(wSameX))
      .filter((col("__mg").isNull || col("__mg") < col("__y")) &&
        col("__ms") <= col("__y") && col("__above") < col("__y"))
      .drop("__pid", "__above", "__mg", "__ms", "__x", "__y")
  }
}
