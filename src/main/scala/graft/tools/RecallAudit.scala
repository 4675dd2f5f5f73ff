package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall telemetry for the rows-only dedup operating points (q66 LSH
  * groups, q75 clustered SemDeDup, q177 scale ensemble): measures the
  * same-group PAIR recall of each scale form against its exact sibling
  * at the queries' shipped settings, at any SF (the specs assert ≥ 0.9
  * at fixture scale only — this records the actual numbers per round in
  * BASELINE.md so recall drift is visible round-over-round; VERDICT r9
  * item 6). Precision is 1 by construction (every scale pair is
  * exact-verified before CC), asserted here too.
  *
  * Usage: `sbt -batch "runMain graft.tools.RecallAudit [sfDir]"`.
  */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-recall"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables
    import graft.dedup.Dedup
    import graft.functions.VectorOps

    def samePairs(labels: DataFrame, id: String, grp: String): Set[(Long, Long)] =
      labels.select(col(id).cast("long"), col(grp).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._2).values.flatMap { g =>
          val ids = g.map(_._1).toSeq.sorted
          for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
        }.toSet

    def report(name: String, exact: Set[(Long, Long)], scale: Set[(Long, Long)]): Unit = {
      val recall = if (exact.isEmpty) 1.0
        else exact.intersect(scale).size.toDouble / exact.size
      val precise = scale.subsetOf(exact)
      println(f"$name%-22s exact_pairs=${exact.size}%7d scale_pairs=${scale.size}%7d " +
        f"recall=$recall%6.4f precision_1=$precise")
    }

    val d = Tables(spark, sfDir).documents
    val e = Tables(spark, sfDir).embeddings

    // q66: LSH near-dup groups vs exact-jaccard groups (n=3, t=0.5)
    val exactJac = Dedup.labelGroups(d, "doc_id",
      Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.5)
        .select("id_a", "id_b"), "id_a", "id_b")
    val lsh = Dedup.nearDupGroups(d, "text", "doc_id",
      n = 3, numHashes = 64, bands = 16, threshold = 0.5)
    val exactJacPairs = samePairs(exactJac, "doc_id", "group")
    report("q66_neardup_lsh", exactJacPairs, samePairs(lsh, "doc_id", "group"))
    spark.catalog.clearCache()

    // q226 vs q225: multi-band large-radius groups vs exact-jaccard at
    // t=0.3, over the shared prefix-augmented radius corpus
    val rc = graft.queries.Queries.radiusCorpus(d)
    val exactRadius = Dedup.labelGroups(rc, "doc_id",
      Dedup.jaccardPairs(rc, "text", "doc_id", n = 3, threshold = 0.3)
        .select("id_a", "id_b"), "id_a", "id_b")
    val mb = Dedup.nearDupGroupsMultiBand(rc, "text", "doc_id",
      n = 3, numHashes = 64, bandings = Seq(16, 32), threshold = 0.3)
    val exactRadiusPairs = samePairs(exactRadius, "doc_id", "group")
    val mbPairs = samePairs(mb, "doc_id", "group")
    report("q226_multiband_r03", exactRadiusPairs, mbPairs)
    graft.ops.ScaleOps.release()
    spark.catalog.clearCache()

    // streaming multi-band maintainer at the same operating point,
    // driven over 5 staggered batches (ids interleaved mod 5 so dup
    // pairs cross batch boundaries): recall vs the exact radius groups,
    // plus agreement with the batch q226 composition. Incremental
    // bucket-size guards apply per batch, so streamed recall can only
    // MATCH OR EXCEED the batch run's (pairs found while buckets were
    // small are kept) — precision_1 vs exact still holds (every pair is
    // exact-verified before CC).
    {
      import spark.implicits._
      val rows = rc.select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)].collect().sortBy(r => (r._1 % 5, r._1))
      val m = new graft.streaming.DedupGroupMaintainer("text", "doc_id",
        numHashes = 64, bandings = Seq(16, 32), threshold = 0.3)
      rows.grouped((rows.length + 4) / 5)
        .foreach(slice => m.ingest(slice.toSeq.toDF("doc_id", "text")))
      val streamed = samePairs(m.labels(spark), "doc_id", "group")
      m.close()
      report("stream_mb_vs_exact", exactRadiusPairs, streamed)
      report("stream_mb_vs_batch", mbPairs, streamed)
      spark.catalog.clearCache()
    }

    // q75: the DECLARED clustered-SemDeDup query at its shipped
    // operating point (whatever Queries.q75_semdedup currently ships —
    // this tool measures the query, not a config copy) vs exact cosine
    // groups
    val exactCos = Dedup.labelGroups(
      e.select(col("vec_id").as("doc_id")), "doc_id",
      VectorOps.cosineAllPairs(e, "vec_id", "embedding", threshold = 0.45)
        .select("id_a", "id_b"), "id_a", "id_b")
    val sem = graft.queries.Queries.q75_semdedup(spark, sfDir)
    val exactCosPairs = samePairs(exactCos, "doc_id", "group")
    report("q75_semdedup", exactCosPairs, samePairs(sem, "vec_id", "group_id"))
    spark.catalog.clearCache()

    // optional sweep: semanticDedupGroups operating points at this SF
    if (args.contains("sweep")) {
      for ((c, p) <- Seq((16, 3), (16, 4), (24, 4), (32, 4), (32, 6), (48, 6))) {
        val g = VectorOps.semanticDedupGroups(e, "vec_id", "embedding",
          threshold = 0.45, c = c, probes = p)
        report(f"q75_sweep_c${c}_p$p", exactCosPairs, samePairs(g, "vec_id", "group"))
        spark.catalog.clearCache()
      }
    }

    // q177 vs q173: scale ensemble vs exact ensemble (declared queries)
    val exactEns = graft.queries.Queries.q173_ensemble_dedup(spark, sfDir)
    val scaleEns = graft.queries.Queries.q177_ensemble_dedup_scale(spark, sfDir)
    report("q177_ensemble_scale",
      samePairs(exactEns, "doc_id", "group_id"),
      samePairs(scaleEns, "doc_id", "group_id"))
    graft.ops.ScaleOps.releaseAll(spark)

    // q261: IVF-probed embedding kNN — recall vs the exact cosine top-3
    // over the same PPMI vectors (the q265 rung: what the IVF layout
    // approximates; the index-quality number) and vs the q252
    // integer-dot rung (dot and cosine rank NEAR-DISJOINTLY on these
    // norm-diverse max-per-dim vectors — measured 0.003 at sf0.1 — so
    // this second number documents metric drift between the rungs, not
    // index quality; q265 exists because of it). Directed
    // (query, neighbor) pairs, plain recall (ANN top-k has no
    // subset-of-exact precision guarantee by design).
    {
      import graft.ops.GraphOps
      def knnPairs(df: DataFrame, q: String, n: String): Set[(Long, Long)] =
        df.select(col(q).cast("long"), col(n).cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def reportKnn(name: String, exact: Set[(Long, Long)],
                    scale: Set[(Long, Long)]): Unit = {
        val recall = if (exact.isEmpty) 1.0
          else exact.intersect(scale).size.toDouble / exact.size
        println(f"$name%-22s exact_pairs=${exact.size}%7d " +
          f"scale_pairs=${scale.size}%7d recall=$recall%6.4f")
      }
      val vecs = GraphOps.embedVectors(GraphOps.ppmiEmbedInt(
        GraphOps.skipGramPairs(GraphOps.biasedHashWalks(
          graft.queries.Queries.coSupplyTop3(spark, sfDir),
          "src", "dst", steps = 2, walksPerNode = 2), window = 2),
        "center", "context", "n", dims = 8, iters = 2)).cache()
      val exactCosKnn = knnPairs(VectorOps.annBruteForce(
        vecs, "id", "embedding", vecs, "id", "embedding", k = 3), "qid", "id")
      val dotKnn = knnPairs(
        graft.queries.Queries.q252_embed_knn(spark, sfDir), "s_suppkey", "nbr")
      val ivfDeclared = knnPairs(
        graft.queries.Queries.q261_embed_knn_ivf(spark, sfDir),
        "s_suppkey", "nbr")
      reportKnn("q261_ivf_vs_cos", exactCosKnn, ivfDeclared)
      reportKnn("q261_ivf_vs_dot", dotKnn, ivfDeclared)
      // nprobe sweep at the declared c=8 (one build, probes are the knob)
      val idx = VectorOps.IvfIndex.build(vecs, "id", "embedding", c = 8)
      for (np <- Seq(2, 4, 8)) {
        val got = knnPairs(
          idx.search(vecs, "id", "embedding", k = 3, nprobe = np), "qid", "id")
        reportKnn(f"q261_sweep_c8_np$np", exactCosKnn, got)
      }
      idx.close()
      // q266: the MIPS serving rung vs its SAME-metric exactness rung
      // (q252 integer dot) — the declared config plus the nprobe sweep.
      // (The naive dot-probed plain index measured 0.0 recall at half
      // probe — the constant-norm reduction is what makes these rows.)
      val mips = VectorOps.MipsIndex.build(vecs, "id", "embedding", c = 8)
      for (np <- Seq(2, 4, 8)) {
        val got = knnPairs(
          mips.searchDot(vecs, "id", "embedding", k = 3, nprobe = np),
          "qid", "id")
        reportKnn(f"q266_mips_c8_np$np", dotKnn, got)
      }
      // q267: FILTERED MIPS at partial probe vs the exact filtered dot
      // top-2 (full probe — q267's declared rung). The allowed set
      // prunes probed cells unevenly, so filtered recall is its own
      // curve, not the q266 row's.
      val allowed = Tables(spark, sfDir).supplier
        .filter(col("s_nationkey") < 5).select(col("s_suppkey"))
      val exactFilt = knnPairs(mips.searchDotFiltered(vecs, "id",
        "embedding", k = 2, nprobe = 8, allowed, "s_suppkey"), "qid", "id")
      for (np <- Seq(2, 4)) {
        val got = knnPairs(mips.searchDotFiltered(vecs, "id", "embedding",
          k = 2, nprobe = np, allowed, "s_suppkey"), "qid", "id")
        reportKnn(f"q267_filt_c8_np$np", exactFilt, got)
      }
      mips.close()
      vecs.unpersist(blocking = false)
      graft.ops.ScaleOps.releaseAll(spark)
    }
    spark.stop()
  }
}
