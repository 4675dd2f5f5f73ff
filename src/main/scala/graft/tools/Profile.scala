package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.core.Graft.defaultCpus
    val spark = graft.core.Graft.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-profile"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables(spark, sfDir).documents

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("shingles (string HOF form)") {
      docs.select(graft.text.TextFunctions.shingles(col("text"), 3).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles (native kernel)") {
      graft.core.Graft.spread(docs)
        .select(transform(graft.text.TextFunctions.tokens(col("text")),
          t => xxhash64(t)).as("th"))
        .select(graft.functions.HashKernels.ngramSetHashes(col("th"), 3).as("set"))
        .write.format("noop").mode("overwrite").save()
    }
    val sigs = graft.dedup.Dedup.minHashSignatures(docs, "text", "doc_id")
    time("minhash signatures") {
      sigs.write.format("noop").mode("overwrite").save()
    }
    time("one-perm signatures") {
      graft.dedup.Dedup.minHashSignatures(docs, "text", "doc_id", onePerm = true)
        .write.format("noop").mode("overwrite").save()
    }
    val sigsCached = sigs.cache()
    sigsCached.count()
    val cands = graft.dedup.Dedup.lshCandidates(sigsCached, 16, 4)
    time("lsh candidates") {
      println("  n_candidates=" + cands.count())
    }
    time("full minHashNearDups") {
      graft.dedup.Dedup.minHashNearDups(docs, "text", "doc_id", threshold = 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    val emb = graft.core.Graft.spread(graft.core.Tables(spark, sfDir).embeddings)
      .select(col("vec_id").as("id"),
        graft.functions.VectorOps.toDoubleArr(col("embedding")).as("v")).cache()
    emb.count()
    val qs = emb.limit(500).select(col("v").as("qv"))
    time("1M cosine (native kernel)") {
      emb.crossJoin(broadcast(qs))
        .select(graft.functions.VectorOps.cosine(col("v"), col("qv")).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    time("1M cosine (HOF fold)") {
      emb.crossJoin(broadcast(qs))
        .select(graft.functions.VectorOps.cosineHof(col("v"), col("qv")).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    // the composed ANN rung, build vs search split (q57's cost anatomy)
    val eRaw = graft.core.Tables(spark, sfDir).embeddings
    time("ivf build c=64 (coarse only)") {
      graft.functions.VectorOps.IvfIndex.build(eRaw, "vec_id", "embedding", c = 64).close()
    }
    var ivfpq: graft.functions.VectorOps.IvfPqIndex = null
    time("ivfpq build c=64 m=8 k=16") {
      ivfpq = graft.functions.VectorOps.IvfPqIndex.build(
        eRaw, "vec_id", "embedding", c = 64, m = 8, k = 16)
    }
    time("ivfpq search np=8 rs=8") {
      ivfpq.search(eRaw.filter(col("vec_id") === 0), "vec_id", "embedding",
          kTop = 10, nprobe = 8, rescore = 8)
        .write.format("noop").mode("overwrite").save()
    }
    ivfpq.close()
    time("langid") {
      graft.queries.Queries.q36_langid(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("fingerprint") {
      graft.queries.Queries.q39_fingerprint(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
