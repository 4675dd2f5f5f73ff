package graft.tools

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** PPJoin+ candidate-funnel telemetry (q33/q65/q173 all run this exact
  * config: n = 3, t = 0.5, hot-gram guard 100k, 16 histogram cells):
  * counts the candidate pairs surviving each pruning stage —
  * legacy per-row positional filter, accumulated-overlap filter
  * (PPJoin+), suffix histogram refinement (`histRefine`), and the true
  * pairs after exact verification — so BASELINE.md can record whether
  * each filter still earns its pass (a stage whose drop ratio decays
  * toward 1.0 is pure overhead and should be retired).
  *
  * Usage: runMain graft.tools.DedupFunnel [sfDir]
  */
object DedupFunnel {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Graft.localSession("graft-dedup-funnel")
    spark.sparkContext.setLogLevel("WARN")
    val threshold = 0.5
    val d = graft.core.Tables(spark, sfDir).documents
    val perDoc = Dedup.shingleSets(d, "text", "doc_id", 3)
      .select(col("id"), size(col("set")).cast("long").as("sz"), col("set"))
      .cache()
    val nDocs = perDoc.count()

    val legacy = Dedup.jaccardCandidates(perDoc, threshold, 100000L,
      accumulate = false).count()
    val acc = Dedup.jaccardCandidates(perDoc, threshold, 100000L).cache()
    val nAcc = acc.count()
    val sets = perDoc.select("id", "set")
    val alpha = ceil(lit(new java.math.BigDecimal(threshold / (1.0 + threshold))
      .setScale(10, java.math.RoundingMode.FLOOR)) *
      (col("__hsza") + col("__hszb")))
    val refined = Dedup.histRefine(acc, sets, alpha, 16).cache()
    val nRef = refined.count()
    val nTrue = Dedup.verifyJaccard(refined, sets, threshold).count()

    def r(a: Long, b: Long): String = if (b == 0) "1.0" else f"${a.toDouble / b}%.4f"
    println(s"""{"metric":"dedup_candidate_funnel","sf_dir":"$sfDir","docs":$nDocs,""" +
      s""""cands_positional":$legacy,"cands_accumulated":$nAcc,""" +
      s""""cands_suffix_refined":$nRef,"true_pairs":$nTrue,""" +
      s""""accum_vs_positional":${r(nAcc, legacy)},""" +
      s""""suffix_keep_ratio":${r(nRef, nAcc)},""" +
      s""""verify_precision":${r(nTrue, nRef)}}""")
    spark.stop()
  }
}
