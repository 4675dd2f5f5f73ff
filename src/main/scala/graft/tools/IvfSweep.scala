package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** IVF recall/latency sweep (dev tool): for each (cells, nprobe) config,
  * measure recall@10 against the brute-force ground truth and wall time
  * for a 20-query batch. Results are recorded in BASELINE.md so the
  * nprobe/cells trade is a measured choice, not a guess.
  *
  * Usage: runMain graft.tools.IvfSweep [sfDir]
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-ivf-sweep"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = graft.core.Tables(spark, sfDir).embeddings
    val queries = e.filter(col("vec_id") < 20)
    val exact = VectorOps.annBruteForce(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    println(f"${"cells"}%6s ${"nprobe"}%7s ${"recall@10"}%10s ${"search_s"}%9s ${"build_s"}%8s")
    for (cells <- Seq(16, 64)) {
      val t0 = System.nanoTime()
      val idx = VectorOps.IvfIndex.build(e, "vec_id", "embedding", c = cells)
      idx.assigned.count() // force build
      val buildS = (System.nanoTime() - t0) / 1e9
      for (nprobe <- Seq(1, 2, 4, 8)) {
        val t1 = System.nanoTime()
        val approx = idx.search(queries, "vec_id", "embedding", k = 10, nprobe = nprobe)
          .select("qid", "id").as[(Long, Long)].collect().toSet
        val searchS = (System.nanoTime() - t1) / 1e9
        val recall = exact.intersect(approx).size.toDouble / exact.size
        println(f"$cells%6d $nprobe%7d $recall%10.3f $searchS%9.2f $buildS%8.2f")
      }
      idx.close() // don't let one config's cached index skew the next
    }
    // SQ8 variant: same probe geometry, byte-code cells + exact re-rank
    println(f"${"sq8"}%6s ${"nprobe"}%7s ${"recall@10"}%10s ${"search_s"}%9s ${"build_s"}%8s")
    for (cells <- Seq(16, 64)) {
      val t0 = System.nanoTime()
      val idx = VectorOps.IvfSq8Index.build(e, "vec_id", "embedding", c = cells)
      val buildS = (System.nanoTime() - t0) / 1e9
      for (nprobe <- Seq(1, 2, 4, 8)) {
        val t1 = System.nanoTime()
        val approx = idx.search(queries, "vec_id", "embedding", k = 10, nprobe = nprobe)
          .select("qid", "id").as[(Long, Long)].collect().toSet
        val searchS = (System.nanoTime() - t1) / 1e9
        val recall = exact.intersect(approx).size.toDouble / exact.size
        println(f"$cells%6d $nprobe%7d $recall%10.3f $searchS%9.2f $buildS%8.2f")
      }
      idx.close()
    }
    // residual (recentered) SQ8: same geometry, codes quantize v − cv —
    // the per-cell dynamic-range win the q82 rung exists to measure
    println(f"${"sq8r"}%6s ${"nprobe"}%7s ${"recall@10"}%10s ${"search_s"}%9s ${"build_s"}%8s")
    for (cells <- Seq(16, 64)) {
      val t0 = System.nanoTime()
      val idx = VectorOps.IvfSq8Index.build(e, "vec_id", "embedding", c = cells,
        byResidual = true)
      val buildS = (System.nanoTime() - t0) / 1e9
      for (nprobe <- Seq(1, 2, 4, 8)) {
        val t1 = System.nanoTime()
        val approx = idx.search(queries, "vec_id", "embedding", k = 10, nprobe = nprobe)
          .select("qid", "id").as[(Long, Long)].collect().toSet
        val searchS = (System.nanoTime() - t1) / 1e9
        val recall = exact.intersect(approx).size.toDouble / exact.size
        println(f"$cells%6d $nprobe%7d $recall%10.3f $searchS%9.2f $buildS%8.2f")
      }
      idx.close()
    }
    // PQ rungs: flat (full-code ADC scan) vs IVF+PQ (ADC only inside
    // nprobe cells) at the same m/k/rescore — the table BASELINE.md
    // cites for the composed index's recall/latency trade
    println(f"${"flatpq"}%6s ${"-"}%7s ${"recall@10"}%10s ${"search_s"}%9s ${"build_s"}%8s")
    locally {
      val t0 = System.nanoTime()
      val idx = VectorOps.PqIndex.build(e, "vec_id", "embedding", m = 8, k = 16)
      val buildS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val approx = idx.search(queries, "vec_id", "embedding", kTop = 10, rescore = 8)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      val searchS = (System.nanoTime() - t1) / 1e9
      val recall = exact.intersect(approx).size.toDouble / exact.size
      println(f"${"-"}%6s ${"-"}%7s $recall%10.3f $searchS%9.2f $buildS%8.2f")
      idx.close()
    }
    // does the second residual-Lloyd round buy recall? (it is ~2 s of
    // q57's build; rescore=1 removes the re-rank headroom that can mask
    // weak books, rescore=8 is the operating point)
    println(f"${"iters"}%6s ${"rescore"}%7s ${"recall@10"}%10s ${"search_s"}%9s ${"build_s"}%8s")
    for (pqIters <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val idx = VectorOps.IvfPqIndex.build(e, "vec_id", "embedding",
        c = 64, m = 8, k = 16, pqIters = pqIters)
      val buildS = (System.nanoTime() - t0) / 1e9
      for (rescore <- Seq(1, 8)) {
        val t1 = System.nanoTime()
        val approx = idx.search(queries, "vec_id", "embedding",
            kTop = 10, nprobe = 8, rescore = rescore)
          .select("qid", "id").as[(Long, Long)].collect().toSet
        val searchS = (System.nanoTime() - t1) / 1e9
        val recall = exact.intersect(approx).size.toDouble / exact.size
        println(f"$pqIters%6d $rescore%7d $recall%10.3f $searchS%9.2f $buildS%8.2f")
      }
      idx.close()
    }
    println(f"${"ivfpq"}%6s ${"nprobe"}%7s ${"recall@10"}%10s ${"search_s"}%9s ${"build_s"}%8s")
    for (cells <- Seq(16, 64)) {
      val t0 = System.nanoTime()
      val idx = VectorOps.IvfPqIndex.build(e, "vec_id", "embedding", c = cells, m = 8, k = 16)
      val buildS = (System.nanoTime() - t0) / 1e9
      for (nprobe <- Seq(1, 2, 4, 8)) {
        val t1 = System.nanoTime()
        val approx = idx.search(queries, "vec_id", "embedding",
            kTop = 10, nprobe = nprobe, rescore = 8)
          .select("qid", "id").as[(Long, Long)].collect().toSet
        val searchS = (System.nanoTime() - t1) / 1e9
        val recall = exact.intersect(approx).size.toDouble / exact.size
        println(f"$cells%6d $nprobe%7d $recall%10.3f $searchS%9.2f $buildS%8.2f")
      }
      idx.close()
    }
    spark.stop()
  }
}
