package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic (r16): side-by-side physical plans + timings of the
  * OLD (nc/nx two-agg) and NEW (role-tagged-union marg) pp-build
  * shapes inside [[graft.ops.GraphOps.ppmiEmbedInt]], over the real
  * q248 pair corpus. Usage: `runMain graft.tools.PpProbe [sfDir]`.
  */
object PpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-ppprobe"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val t = graft.core.Tables(spark, sfDir)
    val ps = t.lineitem
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
    val grouped = ps.groupBy("p").agg(sort_array(collect_list(col("s"))).as("ss"))
    val pairs0 = grouped.select(explode(expr(
        "flatten(transform(ss, (x, i) -> transform(slice(ss, i + 2, size(ss) - i - 1), y -> struct(x AS sa, y AS sb))))")).as("e"))
      .select(col("e.sa").as("sa"), col("e.sb").as("sb"))
    val co = pairs0.groupBy("sa", "sb").agg(count(lit(1)).as("shared"))
    val de = co.select(col("sa").as("src"), col("sb").as("dst"), col("shared"))
      .unionAll(co.select(col("sb").as("src"), col("sa").as("dst"), col("shared")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src")).orderBy(col("shared").desc, col("dst"))
    val g = de.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 3).select("src", "dst").cache()
    g.count()
    val sg = graft.ops.GraphOps.skipGramPairs(
      graft.ops.GraphOps.biasedHashWalks(g, "src", "dst", steps = 2, walksPerNode = 2), window = 2)

    for (pass <- 1 to 2) {
      println(s"=== pass $pass ===")
      val pairs = sg.select(col("center").cast("long").as("c"),
        col("context").cast("long").as("x"), col("n").cast("long").as("n")).cache()
      val r0 = pairs.agg(coalesce(sum(col("n")), lit(0L)).as("nn"),
        coalesce(max(col("n")), lit(0L)).as("mx")).head()
      val nn = r0.getLong(0)
      val cap = graft.ops.GraphOps.DefaultLiftCapMilli

      // OLD shape
      val nc = pairs.groupBy("c").agg(sum(col("n")).as("nc"))
      val nx = pairs.groupBy("x").agg(sum(col("n")).as("nx"))
      val ppOld = pairs.join(nc, "c").join(nx, "x")
        .select(col("c"), col("x"),
          least(lit(cap), greatest(lit(0L),
            expr(s"(n * ${nn}L * 1000L) div (nc * nx) - 1000L"))).as("pp"))
        .filter(col("pp") > 0L).cache()
      if (pass == 1) { println("---- ppOld plan:"); ppOld.explain("formatted") }
      timed("ppOld fill+count")(ppOld.count())

      // NEW shape
      val marg = pairs.select(col("c").as("k"), col("n"), lit(true).as("__ctr"))
        .unionAll(pairs.select(col("x").as("k"), col("n"), lit(false).as("__ctr")))
        .groupBy("k").agg(
          coalesce(sum(when(col("__ctr"), col("n"))), lit(0L)).as("__nc"),
          coalesce(sum(when(!col("__ctr"), col("n"))), lit(0L)).as("__nx")).cache()
      timed("marg fill+count")(marg.count())
      val ppNew = pairs
        .join(marg.select(col("k").as("c"), col("__nc").as("nc")), "c")
        .join(marg.select(col("k").as("x"), col("__nx").as("nx")), "x")
        .select(col("c"), col("x"),
          least(lit(cap), greatest(lit(0L),
            expr(s"(n * ${nn}L * 1000L) div (nc * nx) - 1000L"))).as("pp"))
        .filter(col("pp") > 0L).cache()
      if (pass == 1) { println("---- ppNew plan:"); ppNew.explain("formatted") }
      timed("ppNew fill+count")(ppNew.count())

      // one training round over each
      val nodesOld = pairs.select(col("c").as("id")).union(pairs.select(col("x").as("id")))
        .distinct().localCheckpoint(false)
      val nodesNew = marg.select(col("k").as("id")).localCheckpoint(false)
      val dimIds = spark.range(8).select(col("id").cast("long").as("j"))
      def round(pp: DataFrame, nodes: DataFrame, tag: String): Unit = {
        val cur = nodes.crossJoin(dimIds).select(col("id"), col("j"),
          when(pmod(pmod(col("id") * lit(graft.ops.GraphOps.HashMulA), lit(graft.ops.GraphOps.HashP)) +
              pmod((col("j") + 1L) * lit(graft.ops.GraphOps.HashMulB), lit(graft.ops.GraphOps.HashP)),
            lit(graft.ops.GraphOps.HashP)) % 2L === 0L,
            lit(1000000L)).otherwise(lit(500000L)).as("val"))
        val rawCk = pp.join(cur, pp("x") === cur("id"))
          .groupBy(col("c"), col("j"))
          .agg(sum(col("pp") * col("val")).as("r"))
        if (pass == 1) { println(s"---- round1 plan ($tag):"); rawCk.explain("formatted") }
        val ck = timed(s"round1 ckpt+maxima ($tag)")({
          val c2 = rawCk.localCheckpoint(false)
          c2.groupBy("j").agg(max(col("r")).as("m")).collect()
          c2
        })
        graft.dedup.Dedup.releaseCheckpoint(ck)
      }
      round(ppOld, nodesOld, "old")
      round(ppNew, nodesNew, "new")
      ppOld.unpersist(false); ppNew.unpersist(false)
      marg.unpersist(false); pairs.unpersist(false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
