package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage timings for the graph-embedding chain (co-supply graph →
  * biased walks → skip-grams → integer PPMI → vectors → IVF), plus an
  * inlined MIRROR of [[graft.ops.GraphOps.ppmiEmbedInt]]'s internals so
  * the per-stage cost inside the op is visible (the mirror is
  * diagnostic-only — the op remains the source of truth). Two passes so
  * JIT/codegen warmup is separable from steady state.
  *
  * Usage: `sbt -batch "runMain graft.tools.EmbedProfile [sfDir]"`.
  * Round-14 finding: the chain's time is spread across many small
  * eager jobs (caches, checkpoints, per-round folds) whose fixed
  * scheduling cost dominates at fixture scale — amortized away at real
  * scale; the one structural fix it surfaced (the pp emptiness guard
  * only partially filling the cache) is in the op.
  */
object EmbedProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("profile-embed"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // mirror Queries.coSupplyTop3 via the public query (cheap enough)
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
    val g = de.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 3).select("src", "dst")

    for (i <- 1 to 2) {
      println(s"--- pass $i ---")
      val gMat = timed("coSupplyTop3")(
        { val x = g.cache(); x.count(); x })
      val walks = timed("biasedHashWalks")(
        { val x = graft.ops.GraphOps.biasedHashWalks(gMat, "src", "dst", steps = 2, walksPerNode = 2).cache(); x.count(); x })
      val sg = timed("skipGramPairs")(
        { val x = graft.ops.GraphOps.skipGramPairs(walks, window = 2).cache(); x.count(); x })
      val emb = timed("ppmiEmbedInt")(
        { val x = graft.ops.GraphOps.ppmiEmbedInt(sg, "center", "context", "n", dims = 8, iters = 2).cache(); x.count(); x })
      // internal breakdown (mirrors ppmiEmbedInt's stages)
      locally {
        // constants come FROM the op (GraphOps), never re-literalized —
        // a drifted mirror would profile a different computation
        val P = graft.ops.GraphOps.HashP
        val pairs = timed("  ppmi/pairs-cache")(
          { val x = sg.select(col("center").cast("long").as("c"),
              col("context").cast("long").as("x"), col("n").cast("long").as("n")).cache()
            x.count(); x })
        val r0 = timed("  ppmi/tot-agg")(
          pairs.agg(coalesce(sum(col("n")), lit(0L)).as("nn"),
            coalesce(max(col("n")), lit(0L)).as("mx")).head())
        val nn = r0.getLong(0)
        val nc = pairs.groupBy("c").agg(sum(col("n")).as("nc"))
        val nx = pairs.groupBy("x").agg(sum(col("n")).as("nx"))
        val pp = timed("  ppmi/pp-cache")(
          { val x = pairs.join(nc, "c").join(nx, "x")
              .select(col("c"), col("x"),
                least(lit(graft.ops.GraphOps.DefaultLiftCapMilli), greatest(lit(0L),
                  expr(s"(n * ${nn}L * 1000L) div (nc * nx) - 1000L"))).as("pp"))
              .filter(col("pp") > 0L).cache()
            x.count(); x })
        val nodes = timed("  ppmi/nodes-ckpt(lazy)")(
          pairs.select(col("c").as("id")).union(pairs.select(col("x").as("id")))
            .distinct().localCheckpoint(false))
        val dimIds = spark.range(8).select(col("id").cast("long").as("j"))
        val grid = nodes.crossJoin(dimIds)
        var cur = grid.select(col("id"), col("j"),
          when(pmod(pmod(col("id") * lit(graft.ops.GraphOps.HashMulA), lit(P)) +
              pmod((col("j") + 1L) * lit(graft.ops.GraphOps.HashMulB), lit(P)),
            lit(P)) % 2L === 0L,
            lit(1000000L)).otherwise(lit(500000L)).as("val"))
        for (round <- 1 to 2) {
          // fused round (mirrors the op): lazy checkpoint, the maxima
          // collect is the single materializing job per round
          val rawCk = timed(s"  ppmi/round$round-rawCk(lazy)")(
            pp.join(cur, pp("x") === cur("id"))
              .groupBy(col("c"), col("j"))
              .agg(sum(col("pp") * col("val")).as("r"))
              .localCheckpoint(false))
          val maxima = timed(s"  ppmi/round$round-maxima+mat")(
            rawCk.groupBy("j").agg(max(col("r")).as("m"))
              .collect().map(r => r.getLong(0) -> math.max(r.getLong(1), 1L)).toMap)
          val mExpr = map((0 until 8).toSeq.flatMap(j =>
            Seq(lit(j.toLong), lit(maxima.getOrElse(j.toLong, 1L)))): _*)
          // sparse inter-round state (mirrors the op): no per-round grid
          // left-join — zero rows contribute nothing to the next fold
          cur = rawCk
            .withColumn("__m", element_at(mExpr, col("j")))
            .select(col("c").as("id"), col("j"),
              expr("(r * 1000000L) div __m").as("val"))
        }
        timed("  ppmi/final-count")(cur.count())
        pairs.unpersist(false)
        pp.unpersist(false)
        ()
      }
      // --- the q258 mining-stage split (r16 VERDICT item #3): the work
      // ABOVE the already-profiled chain — all-pairs integer dots, the
      // non-edge anti-join, the per-src top-2 window. Diagnostic mirror
      // of Queries.embedDotsOf / q258_hard_negatives; stages cached so
      // each timing isolates one stage (the query itself does not).
      locally {
        val dots = timed("q258/embedDots-cache")(
          { val vecs = emb.groupBy(col("id"))
              .agg(transform(
                array_sort(collect_list(struct(col("dim"), col("val")))),
                s => s.getField("val").cast("double")).as("v"))
            val x = vecs.as("a").join(broadcast(vecs.as("b")), col("a.id") =!= col("b.id"))
              .select(col("a.id").as("src"), col("b.id").as("dst"),
                graft.functions.VectorOps.dot(col("a.v"), col("b.v"))
                  .cast("long").as("dot")).cache()
            x.count(); x })
        val nonEdge = timed("q258/anti-join-cache")(
          { val x = dots.join(gMat.select(col("src"), col("dst")),
              Seq("src", "dst"), "left_anti").cache()
            x.count(); x })
        val w2 = org.apache.spark.sql.expressions.Window
          .partitionBy("src").orderBy(col("dot").desc, col("dst"))
        timed("q258/top2-window")(
          nonEdge.withColumn("rnk", row_number().over(w2).cast("long"))
            .filter(col("rnk") <= 2)
            .write.format("noop").mode("overwrite").save())
        dots.unpersist(blocking = false)
        nonEdge.unpersist(blocking = false)
      }
      val vecs = timed("embedVectors")(
        { val x = graft.ops.GraphOps.embedVectors(emb).cache(); x.count(); x })
      val idx = timed("IvfIndex.build(c=8)")(
        graft.functions.VectorOps.IvfIndex.build(vecs, "id", "embedding", c = 8))
      timed("search(np=4)")(
        idx.search(vecs, "id", "embedding", k = 3, nprobe = 4).count())
      idx.close()

      // --- the q269 amortized split: train-once (save) vs serve-only
      // (load → pivot → build → filtered search, NO chain rebuild) ---
      val tmp = java.nio.file.Files.createTempDirectory("graft_profile_serve")
      timed("saveEmbeddings")(
        graft.ops.GraphOps.saveEmbeddings(emb, tmp.toString))
      timed("SERVE-ONLY total")(locally {
        val loaded = timed("  serve/loadEmbeddings")(
          graft.ops.GraphOps.loadEmbeddings(spark, tmp.toString))
        val nonZero = loaded.groupBy(col("id"))
          .agg(sum(col("val")).as("sv"))
          .filter(col("sv") > 0L).select("id")
        val sv = timed("  serve/pivot+cache")(
          { val x = graft.ops.GraphOps.embedVectors(loaded)
              .join(nonZero, Seq("id"), "left_semi").cache()
            x.count(); x })
        val sidx = timed("  serve/IvfIndex.build(c=4)")(
          graft.functions.VectorOps.IvfIndex.build(sv, "id", "embedding", c = 4))
        val allowed = t.supplier.filter(col("s_nationkey") < 5)
          .select(col("s_suppkey"))
        timed("  serve/searchFiltered")(
          sidx.searchFiltered(sv, "id", "embedding", k = 2, nprobe = 4,
            allowed, "s_suppkey").count())
        sidx.close()
        sv.unpersist(blocking = false)
      })
      graft.core.Graft.removeRecursively(tmp)
      graft.ops.ScaleOps.releaseAll(spark)
    }
    spark.stop()
  }
}
