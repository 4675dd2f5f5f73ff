package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** One-off q33 stage profiler (dev tool). */
object J33 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("j33"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables(spark, sfDir).documents
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val sh = graft.core.Graft.spread(docs).select(col("doc_id").as("id"),
      explode(TextFunctions.shingles(col("text"), 3)).as("gs"))
      .select(col("id"), xxhash64(col("gs")).as("g")).cache()
    time("shingle index (cached)") { println("  rows=" + sh.count()) }
    val sizes = sh.groupBy("id").agg(count("*").as("sz")).cache()
    time("sizes") { sizes.count() }
    val dfg = sh.groupBy("g").agg(count("*").as("dfg")).cache()
    time("dfg") { println("  grams=" + dfg.count()) }
    val wDoc = Window.partitionBy(col("id")).orderBy(col("dfg"), col("g"))
    val t = 0.5
    val tDec = lit(new java.math.BigDecimal(t).setScale(10, java.math.RoundingMode.FLOOR))
    val prefix = sh.join(dfg, "g").join(sizes, "id")
      .withColumn("__rn", row_number().over(wDoc))
      .filter(col("__rn") <= col("sz") - ceil(tDec * col("sz")) + 1)
      .select(col("id"), col("g"), col("dfg"), col("__rn").as("pos")).cache()
    time("prefix index") { println("  rows=" + prefix.count()) }
    val tf = lit(new java.math.BigDecimal(t / (1.0 + t)).setScale(10, java.math.RoundingMode.FLOOR))
    val withSz = prefix.join(sizes, "id")
    val cands = withSz.as("a").join(withSz.as("b"),
      col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
        least(col("a.sz"), col("b.sz")) >= ceil(tDec * greatest(col("a.sz"), col("b.sz"))) &&
        lit(1) + least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) >=
          ceil(tf * (col("a.sz") + col("b.sz"))))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct().cache()
    time("candidate join") { println("  cands=" + cands.count()) }
    val sets = sh.groupBy("id").agg(collect_list(col("g")).as("set"))
    time("verify") {
      val n = cands
        .join(sets.select(col("id").as("id_a"), col("set").as("sa")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("set").as("sb")), "id_b")
        .select((size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("j"))
        .filter(col("j") >= t).count()
      println("  pairs=" + n)
    }
    spark.stop()
  }
}
