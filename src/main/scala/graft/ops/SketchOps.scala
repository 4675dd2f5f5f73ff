package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed mergeable sketches (Cormode & Muthukrishnan 2005,
  * "An improved data stream summary: the count-min sketch and its
  * applications").
  *
  * The reference's streaming counters live in per-partition key-value
  * stores (kasper `examples/word_count_example.go:30-67` keeps exact
  * per-key counts in a store); at 100 TB of events the exact per-key
  * table is itself huge, and the CM sketch is the standard sublinear
  * stand-in: a depth×width grid of counters that answers point
  * frequency queries with one-sided error (never under-estimates,
  * over-estimates by ≤ e·N/width w.h.p.).
  *
  * Spark shape: the build is ONE map-side-combinable hash aggregate
  * into depth·width cells — the smallest shuffle an aggregation can
  * have — and sketches MERGE by cell-wise addition, so per-executor
  * partial sketches combine exactly like partial sums (the property
  * that makes the sketch work as a streaming aggregation state or a
  * per-day sketch rollup). Estimation broadcasts the (tiny, bounded by
  * literals) sketch to the probe side.
  *
  * Hashing is the engine's shared modular family
  * `((k mod P)·(A + r·B) + r·C) mod P mod width` — all intermediates
  * < 2⁶³, so the arithmetic is exact (and oracle-reproducible) on any
  * engine, no wraparound involved.
  */
object SketchOps {

  val P = 1000000007L
  private val A = 2654435761L
  private val B = 40503L
  private val C = 97L

  /** Bucket of `key` in sketch row `row` (both columns; `width` a literal). */
  def cmsBucket(key: Column, row: Column, width: Int): Column =
    ((key % P) * (lit(A) + row * B) + row * C) % P % width

  /** Build a count-min sketch over `keyCol`: one row per non-empty cell,
    * `(r, b, cnt)`. Cells never touched by a key are absent (semantically
    * zero — [[cmsEstimate]] coalesces).
    */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth/$width")
    df.select(col(keyCol).cast("long").as("__k"))
      .select(col("__k"), explode(sequence(lit(0L), lit(depth - 1L))).as("r"))
      .select(col("r"), cmsBucket(col("__k"), col("r"), width).as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches built with the same (depth, width, hash family):
    * cell-wise addition. sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)) —
    * spec-asserted.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("r", "b").agg(sum("cnt").as("cnt"))

  /** Per-group fixed-width histogram sketch over a non-negative integer
    * column: one row per non-empty bucket `(g, b, cnt)` with
    * `b = x div width`. The quantile-sketch rail beside [[cmsBuild]]'s
    * frequency rail: at 100 TB the exact per-group percentile
    * (q91-style sort window) is a full shuffle of the data, while this
    * sketch is one map-side-combinable aggregate into
    * `range/width` cells, MERGES by cell-wise addition like the CM
    * sketch, and answers any quantile from the cumulative scan with
    * error < `width` — deterministic integer arithmetic end to end, so
    * unlike t-digest/KLL the whole sketch AND its answers are
    * oracle-reproducible.
    */
  def histSketch(df: DataFrame, groupCol: String, xCol: String,
                 width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    df.select(col(groupCol).as("g"),
        expr(s"CAST($xCol AS BIGINT) div $width").as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("cnt"))
  }

  /** Quantile answers from a [[histSketch]]: for each group and each
    * requested basis-point rank p, the LOWER BOUND `b·width` of the
    * first bucket whose cumulative count reaches the discrete rank
    * ⌈p·n⌉ (the q91 integer-ceiling discipline). The true percentile is
    * sandwiched in `[answer, answer + width)` — spec-owned. One window
    * over the bucket-sized sketch (range/width rows per group), nothing
    * data-sized.
    *
    * Output: (g, n, q_<bp> per requested rank).
    */
  def histQuantiles(sketch: DataFrame, width: Long, bps: Seq[Int]): DataFrame = {
    require(bps.nonEmpty && bps.forall(p => p > 0 && p <= 10000),
      s"ranks must be basis points in (0, 10000], got $bps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = sketch.withColumn("cum", sum(col("cnt")).over(w))
    val n = sketch.groupBy("g").agg(sum(col("cnt")).as("n"))
    val qs = bps.map { p =>
      // first bucket with cum ≥ ⌈p·n/10000⌉; ⌈a/10000⌉ = (a+9999) div 10000
      min(when(col("cum") >= expr(s"(n * $p + 9999) div 10000"), col("b") * width))
        .as(s"q_$p")
    }
    val aggs = max(col("n")).as("n") +: qs
    cum.join(n, "g").groupBy("g").agg(aggs.head, aggs.tail: _*)
  }

  /** Equi-join size estimation from two count-min sketches (the
    * AMS/CM inner-product estimator, Cormode & Muthukrishnan 2005 §4.2):
    * |A ⋈ B on k| = Σ_k fA(k)·fB(k), and for each sketch row r,
    * Σ_b cntA[r,b]·cntB[r,b] counts every true (k-match) product plus
    * non-negative collision products — so the per-row sums never
    * under-estimate, and the reported estimate is their minimum.
    *
    * This is the shuffle-cost predictor: before committing a 100 TB
    * equi-join (or a self-join on a possibly-skewed key) the planner
    * reads two tiny sketches instead of sampling either side. Both
    * sketches are depth·width rows, so the product join is trivially
    * broadcast; the whole computation after the two builds is
    * driver-scale. Exact integer arithmetic throughout → the estimate
    * itself is oracle-reproducible, and `estimate ≥ exact` is
    * spec-owned in SketchOpsSpec.
    *
    * Returns one row: `(est_join_size)`.
    */
  def cmsJoinSize(a: DataFrame, keyColA: String, b: DataFrame, keyColB: String,
                  depth: Int, width: Int): DataFrame = {
    val sa = cmsBuild(a, keyColA, depth, width)
    val sb = cmsBuild(b, keyColB, depth, width)
    // inner join drops cells empty on either side — their product is 0
    // anyway; the 0..depth-1 spine restores rows whose cells never
    // overlap (per-row sum 0, so the min — and the estimate — is 0)
    val rows = sa.select(col("r"), col("b"), col("cnt").as("ca"))
      .join(sb.select(col("r"), col("b"), col("cnt").as("cb")), Seq("r", "b"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("__s"))
    val spine = a.sparkSession.range(0, depth).select(col("id").as("r"))
    spine.join(rows, Seq("r"), "left")
      .agg(min(coalesce(col("__s"), lit(0L))).as("est_join_size"))
  }

  /** Point-frequency estimates for every row of `keys`: min over the
    * key's `depth` cells, 0 for never-seen keys. The sketch (≤
    * depth·width rows) broadcasts; `keys` keeps all its columns and
    * gains `n_est`.
    */
  /** Per-bucket mergeable HLL sketches of a key column — the
    * COUNT-DISTINCT sibling of the CM sketch's frequency rail, on
    * Spark's built-in Apache DataSketches HLL aggregates. One
    * map-side-combinable aggregate per `bucketCol` group; each row's
    * `sk` is a binary sketch that MERGES by register-max, so daily
    * sketches maintained incrementally re-derive ANY window's distinct
    * estimate without rescanning raw events — incremental-view
    * maintenance for COUNT DISTINCT, which plain counts cannot do
    * (distinct does not sum across days). Register merge is
    * deterministic and order-independent: unioning the daily sketches
    * yields the IDENTICAL estimate to one monolithic sketch over the
    * raw rows (spec-proven equality, plus a 5%-of-exact accuracy
    * check).
    */
  def hllBucketSketches(df: DataFrame, bucketCol: Column, keyCol: String,
                        lgK: Int = 12): DataFrame =
    df.groupBy(bucketCol.as("bucket"))
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("sk"))

  /** Union pre-bucketed HLL sketches up to `groupCol` granularity and
    * estimate distincts — the query side of [[hllBucketSketches]].
    */
  def hllRollup(sketches: DataFrame, groupCol: Column): DataFrame =
    sketches.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("n_buckets"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct"))

  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val probes = keys.select(col(keyCol))
      .withColumn("r", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("b", cmsBucket(col(keyCol).cast("long"), col("r"), width))
    val est = probes.join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
    keys.join(est, keyCol)
  }
}
