package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{CorpusOps, QualityModel}

/** Offline weight fit for the trained quality model (dev tool): linear
  * probe of the Gopher repetition gate (`dup_frac ≤ 0.08`, the q46
  * criterion) on the single-pass q54 feature library. Documents below the
  * n-gram floor (fewer than 2 tokens) carry no repetition signal and are
  * excluded by the inner join, exactly like the gate itself.
  *
  * Prints one weight per line in shortest-roundtrip form; the printed
  * values are pasted into [[QualityModel.Fitted]] verbatim so Spark and
  * the DuckDB oracle parse the identical decimal strings.
  *
  * Usage: runMain graft.tools.FitQuality [sfDir]
  */
object FitQuality {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-fit-quality"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.core.Tables(spark, sfDir).documents
    val gate = CorpusOps.repetitionStats(docs, "doc_id", "text", n = 2)
      .select(col("id").as("doc_id"), col("dup_frac"))
    val joined = docs.select(col("doc_id"), col("text")).join(gate, "doc_id")
    val label = when(col("dup_frac") <= 0.08, lit(1.0)).otherwise(lit(0.0))
    val w = QualityModel.fitLinear(joined, QualityModel.features(col("text")), label)
    println("fitted weights (intercept, uniq_ratio, stop_ratio, mean_token_len, is_en):")
    w.foreach(v => println(java.lang.Double.toString(v)))
    spark.stop()
  }
}
