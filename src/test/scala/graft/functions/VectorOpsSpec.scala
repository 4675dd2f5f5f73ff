package graft.functions

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._
  import VectorOps._

  test("native cosine kernel is bit-identical to the HOF formulation") {
    val e = Tables(spark, sfDir).embeddings.limit(200)
    val q = Tables(spark, sfDir).embeddings.filter($"vec_id" === 0)
      .select(toDoubleArr($"embedding").as("qv"))
    val both = e.crossJoin(q).select(
      cosine(toDoubleArr($"embedding"), $"qv").as("native"),
      cosineHof(toDoubleArr($"embedding"), $"qv").as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native cosine kernel: null on length mismatch") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(df.select(VectorKernel.cosineNative($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("native cosine kernel: null element yields null, matching the HOF fold") {
    val df = Seq(
      (Seq(Option(1.0), None, Option(2.0)), Seq(Option(1.0), Option(1.0), Option(1.0))),
      (Seq(Option(1.0), Option(2.0), Option(2.0)), Seq(Option(1.0), Option(1.0), Option(1.0))))
      .toDF("a", "b")
    val rows = df.select(
      VectorKernel.cosineNative($"a", $"b").as("native"),
      cosineHof($"a", $"b").as("hof")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1), "null element → null both paths")
    assert(java.lang.Double.doubleToLongBits(rows(1).getDouble(0)) ==
      java.lang.Double.doubleToLongBits(rows(1).getDouble(1)))
  }

  test("dot/cosine basics") {
    val df = Seq((Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)), (Seq(1f, 1f, 0f), Seq(1f, 1f, 0f)))
      .toDF("a", "b")
    val got = df.select(cosine(toDoubleArr($"a"), toDoubleArr($"b"))).as[Double].collect()
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("annBruteForce returns the true top-k") {
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(0.7f, 0.7f)))
      .toDF("id", "v")
    val top = annBruteForce(vecs, "id", "v", vecs.filter($"id" === 0), "id", "v", k = 2)
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 3L))
  }

  test("IVF search recall vs brute force on the fixture embeddings") {
    val e = Tables(spark, sfDir).embeddings
    val queries = e.filter($"vec_id" < 5)
    val exact = annBruteForce(e, "vec_id", "embedding", queries, "vec_id", "embedding", k = 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val idx = IvfIndex.build(e, "vec_id", "embedding", c = 16)
    val approx = idx.search(queries, "vec_id", "embedding", k = 10, nprobe = 4)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall@10 too low: $recall")
    idx.close()
  }

  test("IVF multi-iteration Lloyd build is valid and at least as tight") {
    val e = Tables(spark, sfDir).embeddings
    val queries = e.filter($"vec_id" < 5)
    val exact = annBruteForce(e, "vec_id", "embedding", queries, "vec_id", "embedding", k = 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val idx = IvfIndex.build(e, "vec_id", "embedding", c = 16, iters = 3)
    // every vector assigned exactly once regardless of iteration count
    assert(idx.assigned.count() == e.count())
    assert(idx.assigned.select("id").distinct().count() == e.count())
    val approx = idx.search(queries, "vec_id", "embedding", k = 10, nprobe = 4)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"3-iter IVF recall@10 too low: $recall")
    idx.close()
  }

  test("cosineNearDupPairs is a subset of the exact pairs with high recall") {
    val e = Tables(spark, sfDir).embeddings
    // 0.45 is the operating threshold the fixture exercises (nothing in
    // the table exceeds cos ~0.52); the exact baseline is ground truth
    val exact = cosineAllPairs(e, "vec_id", "embedding", threshold = 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should yield exact pairs at 0.45")
    val lsh = cosineNearDupPairs(e, "vec_id", "embedding", threshold = 0.45,
      bits = 4, tables = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH verifies candidates exactly, so pairs must be a subset")
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low (exact=${exact.size}, lsh=${lsh.size})")
  }

  test("cosineAllPairs returned scores match a driver-side recomputation") {
    val e = Tables(spark, sfDir).embeddings
    val vecs = e.select($"vec_id", toDoubleArr($"embedding").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val got = cosineAllPairs(e, "vec_id", "embedding", threshold = 0.45).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (vecs(r.getLong(0)), vecs(r.getLong(1)))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      val cos = dot / math.sqrt(na * nb)
      assert(java.lang.Double.doubleToLongBits(cos) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)))
    }
  }
}
