package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained linear quality model over the engineered text-feature library —
  * the fastText-lite shape of q54 with weights FIT from data instead of
  * hand-picked. Training is closed-form ridge regression whose only
  * distributed work is one aggregation pass, so "fitting on 100 TB" costs
  * the same as any corpus-wide aggregate; scoring stays a pure column
  * projection (the q54 plan, different literals).
  *
  * Reference scope note: kasper has no model surface at all — this is part
  * of the beyond-parity training-data layer (SURVEY §2's LLM-pipeline
  * operators), not a port of any reference component.
  */
object QualityModel {

  /** One-pass distributed ridge fit via the normal equations: aggregate
    * the Gram matrix XᵀX and moment vector Xᵀy in a SINGLE `agg` over the
    * corpus — p(p+3)/2 partial sums, map-side combined, one reduce row —
    * then solve the p×p system on the driver. Feature counts are tiny
    * (a quality model is a handful of engineered signals), so the driver
    * solve is microseconds and the corpus is scanned exactly once: the
    * only training shape that is as cheap as a query at 100 TB.
    *
    * Returns `Array(w0, w1, …)` with `w0` the intercept. Floating-point
    * sums depend on partition reduce order, so a refit can wobble in the
    * last ulps — weights destined for a cross-engine oracle are frozen as
    * source literals (see [[Fitted]]), never recomputed at query time.
    */
  def fitLinear(df: DataFrame, features: Seq[Column], label: Column,
                ridge: Double = 1e-9): Array[Double] = {
    require(features.nonEmpty, "at least one feature column is required")
    val p = features.size + 1
    val x: Seq[Column] = lit(1.0) +: features
    // rows with ANY null feature/label must drop from EVERY sum: sum()
    // skips nulls per-expression, so ungated Gram entries would aggregate
    // over different row subsets (e.g. one 0/0→null ratio) and the normal
    // equations would be mutually inconsistent — a silent mis-fit. Gating
    // inside the aggregation (null out every term on incomplete rows)
    // keeps the one-scan shape and dodges filter pushdown recompute.
    val ok = (features :+ label).map(_.isNotNull).reduce(_ && _)
    val xg = x.map(c => when(ok, c))
    val yg = when(ok, label)
    val gram = for { i <- 0 until p; j <- i until p }
      yield sum(xg(i) * xg(j)).as(s"g_${i}_$j")
    val mom = (0 until p).map(i => sum(xg(i) * yg).as(s"b_$i"))
    val aggs = gram ++ mom
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    require(!row.anyNull, "fit aggregates are null — no complete input rows")
    val a = Array.ofDim[Double](p, p)
    var idx = 0
    for (i <- 0 until p; j <- i until p) {
      a(i)(j) = row.getDouble(idx); a(j)(i) = a(i)(j); idx += 1
    }
    for (i <- 0 until p) a(i)(i) += ridge
    val b = Array.tabulate(p)(i => row.getDouble(idx + i))
    solve(a, b)
  }

  /** Gaussian elimination with partial pivoting — p is a handful, so no
    * factorization library is warranted (and none is available offline).
    */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val p = b.length
    for (c <- 0 until p) {
      var piv = c
      for (r <- c + 1 until p) if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      val tmpR = a(c); a(c) = a(piv); a(piv) = tmpR
      val tmpB = b(c); b(c) = b(piv); b(piv) = tmpB
      require(a(c)(c) != 0.0, "singular normal equations — raise the ridge")
      for (r <- c + 1 until p) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c until p) a(r)(k) -= f * a(c)(k)
        b(r) -= f * b(c)
      }
    }
    val w = new Array[Double](p)
    for (c <- p - 1 to 0 by -1) {
      var s = b(c)
      for (k <- c + 1 until p) s -= a(c)(k) * w(k)
      w(c) = s / a(c)(c)
    }
    w
  }

  /** The q54 feature library in fit order: unique-token ratio, stopword
    * ratio, mean token length, English indicator. Shared by the fit tool
    * and the scoring query so feature definitions cannot drift.
    */
  def features(text: Column): Seq[Column] = {
    import graft.text.TextFunctions._
    Seq(
      uniqueTokenRatio(text),
      stopwordRatio(text, Seq("the", "a")),
      meanTokenLength(text),
      when(langId(text) === "en", lit(1.0)).otherwise(lit(0.0)))
  }

  /** Weights fit by `graft.tools.FitQuality` on the sf0.01 documents
    * fixture (label = the Gopher repetition gate `dup_frac ≤ 0.08` from
    * [[CorpusOps.repetitionStats]]; ridge 1e-9) — a linear probe that
    * approximates the two-pass n-gram gate from single-pass surface
    * features. FROZEN as literals so the q60 oracle can interpolate the
    * exact same values into DuckDB SQL: order = (intercept, uniq_ratio,
    * stop_ratio, mean_token_len, is_en).
    */
  val Fitted: Array[Double] = Array(
    -0.044663546814235566, // intercept
    1.0317686501911918,    // uniq_ratio — diverse vocab predicts passing the gate
    1.0701363928153511,    // stop_ratio — natural prose (stopwords present) repeats less
    0.031112468680321043,  // mean_token_len
    0.023817692295286946)  // is_en
}
