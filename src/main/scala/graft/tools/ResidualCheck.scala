package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{QuantKernels, VectorOps}

/** Measures what the residual (recentered) SQ8 rung actually buys over
  * per-vector-range SQ8 (dev tool, recorded in BASELINE.md):
  *
  *  1. approx-score fidelity — mean / max |approx − exact| cosine over
  *     every (corpus vector, query) pair in a 20-query batch, i.e. the
  *     shortlist-ranking signal BEFORE the exact re-rank can absorb
  *     errors;
  *  2. recall@10 at rescore = 1 — the no-headroom operating point where
  *     shortlist order IS the answer order.
  *
  * Usage: runMain graft.tools.ResidualCheck [sfDir]
  */
object ResidualCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-residual-check"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = graft.core.Tables(spark, sfDir).embeddings
    val queries = e.filter(col("vec_id") < 20)
    val exact = VectorOps.annBruteForce(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet

    println(f"${"variant"}%8s ${"cells"}%6s ${"mean|Δcos|"}%11s ${"max|Δcos|"}%10s ${"recall@10(rescore=1)"}%21s")
    for (resid <- Seq(false, true); cells <- Seq(16, 64)) {
      val idx = VectorOps.IvfSq8Index.build(e, "vec_id", "embedding", c = cells,
        byResidual = resid)
      // score EVERY (vector, query) pair through the index's approx path:
      // join codes to all queries (not just probed cells) so the error
      // statistic is over the full corpus, not cell-conditioned
      val q = queries
        .select(col("vec_id").as("qid"), VectorOps.toDoubleArr(col("embedding")).as("qv"))
        .withColumn("qsum", aggregate(col("qv"), lit(0.0), (s, x) => s + x))
        .withColumn("qnrm2", VectorOps.dot(col("qv"), col("qv")))
        .join(broadcast(idx.centroids))
        .withColumn("qdotc", VectorOps.dot(col("qv"), col("cv")))
        .select("qid", "qv", "qsum", "qnrm2", "qdotc", "cid")
      val approxCol =
        if (resid)
          (col("qdotc") + col("sq").getField("mn") * col("qsum") +
            col("sq").getField("step") *
              (QuantKernels.sq8Dot(col("sq").getField("code"), col("qv")) +
                lit(128.0) * col("qsum"))) /
            sqrt(col("qnrm2") * col("nrm2h"))
        else
          QuantKernels.approxCosine(col("sq"), col("qv"), col("qnrm2"), col("qsum"))
      val raw = graft.core.Graft.spread(e)
        .select(col("vec_id").as("id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
      val err = idx.codes.join(broadcast(q), "cid")
        .select(col("qid"), col("id"), col("qv"), approxCol.as("acos"))
        .join(raw, "id")
        .select(abs(col("acos") - VectorOps.cosine(col("v"), col("qv"))).as("e"))
        .agg(avg("e"), max("e")).head()
      val r1 = idx.search(queries, "vec_id", "embedding", k = 10, nprobe = 4, rescore = 1)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      val recall = exact.intersect(r1).size.toDouble / exact.size
      val name = if (resid) "sq8r" else "sq8"
      println(f"$name%8s $cells%6d ${err.getDouble(0)}%11.5f ${err.getDouble(1)}%10.5f $recall%21.3f")
      idx.close()
    }
    spark.stop()
  }
}
