package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 32

  test("cms estimates never under-count and bound the over-count") {
    val ev = graft.core.Tables(spark, sfDir).events
    val sketch = SketchOps.cmsBuild(ev, "user_id", D, W)
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("n_exact"))
    val est = SketchOps.cmsEstimate(sketch, exact, "user_id", D, W)
      .select($"user_id", $"n_exact", $"n_est").collect()
    val n = ev.count()
    est.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"under-estimate for key ${r.getLong(0)}: ${r.getLong(2)} < ${r.getLong(1)}")
      // generous factual bound: the CMS guarantee is est ≤ exact + e·N/W
      // w.h.p.; assert 4× that so the test owns the property, not the seed
      assert(r.getLong(2) - r.getLong(1) <= 4 * math.E * n / W)
    }
  }

  test("cms merge of split halves equals the sketch of the union") {
    val ev = graft.core.Tables(spark, sfDir).events
    val a = ev.filter($"event_id" % 2 === 0)
    val b = ev.filter($"event_id" % 2 =!= 0)
    val merged = SketchOps.cmsMerge(
        SketchOps.cmsBuild(a, "user_id", D, W),
        SketchOps.cmsBuild(b, "user_id", D, W))
      .as[(Long, Long, Long)].collect()
      .map { case (r, bkt, c) => ((r, bkt), c) }.toMap
    val full = SketchOps.cmsBuild(ev, "user_id", D, W)
      .as[(Long, Long, Long)].collect()
      .map { case (r, bkt, c) => ((r, bkt), c) }.toMap
    assert(merged == full)
  }

  test("cms as a streaming aggregation: the running sketch equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Long]
    val q = SketchOps.cmsBuild(in.toDF().withColumnRenamed("value", "k"), "k", D, W)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      in.addData(1L, 2L, 3L, 1L); q.processAllAvailable()
      in.addData(1L, 5L, 9L, 2L); q.processAllAvailable()
      val got = spark.table("cms_stream")
        .as[(Long, Long, Long)].collect()
        .map { case (r, b, c) => ((r, b), c) }.toMap
      val want = SketchOps.cmsBuild(
          Seq(1L, 2L, 3L, 1L, 1L, 5L, 9L, 2L).toDF("k"), "k", D, W)
        .as[(Long, Long, Long)].collect()
        .map { case (r, b, c) => ((r, b), c) }.toMap
      assert(got == want,
        "streaming sketch state must equal the batch-built sketch")
    } finally q.stop()
  }

  test("cmsJoinSize never under-estimates the exact equi-join size") {
    val ev = graft.core.Tables(spark, sfDir).events
    val li = graft.core.Tables(spark, sfDir).lineitem
      .select($"l_orderkey".as("k"))
    val ord = graft.core.Tables(spark, sfDir).orders
      .select($"o_orderkey".as("k"))
    // self-join (skew-shaped) and a fk join both covered
    val selfExact = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .agg(sum($"n" * $"n")).as[Long].head()
    val selfEst = SketchOps.cmsJoinSize(ev, "user_id", ev, "user_id", D, W)
      .as[Long].head()
    assert(selfEst >= selfExact, s"self-join under-estimate: $selfEst < $selfExact")
    val fkExact = li.join(ord, "k").count()
    val fkEst = SketchOps.cmsJoinSize(li, "k", ord, "k", D, W).as[Long].head()
    assert(fkEst >= fkExact, s"fk-join under-estimate: $fkEst < $fkExact")
    // width large enough to keep the estimate informative, not a blow-up:
    // the CM inner-product error bound is e·|A|·|B|/W w.h.p.; own 4× that
    assert(fkEst - fkExact <= 4 * math.E * li.count() * ord.count() / W)
  }

  test("cmsJoinSize of disjoint key sets is 0 when no cells collide") {
    val a = Seq(1L, 2L, 3L).toDF("k")
    val b = Seq(1000000L).toDF("k")
    // 4 keys in 32 buckets: a collision on every one of the 4 rows is
    // essentially impossible, so at least one row-sum must be exactly 0
    val est = SketchOps.cmsJoinSize(a, "k", b, "k", D, W).as[Long].head()
    assert(est == 0L)
  }

  test("histSketch quantiles sandwich the exact percentile within one bucket width") {
    val docs = graft.core.Tables(spark, sfDir).documents
    val t = docs.select($"lang",
      graft.text.TextFunctions.tokenCount($"text").as("nt"))
    val width = 16L
    val sk = SketchOps.histSketch(t, "lang", "nt", width)
    val got = SketchOps.histQuantiles(sk, width, Seq(5000, 9500))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // exact discrete percentiles per lang (the q91 rank discipline)
    val vals = t.as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    for ((lang, xs) <- vals) {
      val n = xs.size
      def exact(p: Int) = xs((p * n + 9999) / 10000 - 1)
      val (_, gn, q50, q95) = got(lang)
      assert(gn == n)
      assert(q50 <= exact(5000) && exact(5000) < q50 + width,
        s"$lang p50: sketch $q50 vs exact ${exact(5000)}")
      assert(q95 <= exact(9500) && exact(9500) < q95 + width,
        s"$lang p95: sketch $q95 vs exact ${exact(9500)}")
    }
  }

  test("histSketch merges by cell-wise addition (split halves = union)") {
    val docs = graft.core.Tables(spark, sfDir).documents
    val t = docs.select($"lang",
      graft.text.TextFunctions.tokenCount($"text").as("nt"), $"doc_id")
    def sk(df: org.apache.spark.sql.DataFrame) =
      SketchOps.histSketch(df, "lang", "nt", 16L)
    val merged = sk(t.filter($"doc_id" % 2 === 0))
      .unionAll(sk(t.filter($"doc_id" % 2 =!= 0)))
      .groupBy("g", "b").agg(sum("cnt").as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    val full = sk(t).as[(String, Long, Long)].collect().toSet
    assert(merged == full)
  }

  test("histSketch as a streaming aggregation: the running sketch equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = SketchOps.histSketch(in.toDF().toDF("g", "x"), "g", "x", width = 8L)
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete").start()
    try {
      in.addData(("a", 3L), ("a", 9L), ("b", 20L)); q.processAllAvailable()
      in.addData(("a", 10L), ("b", 100L)); q.processAllAvailable()
      val got = spark.table("hist_stream")
        .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val want = SketchOps.histSketch(
          Seq(("a", 3L), ("a", 9L), ("b", 20L), ("a", 10L), ("b", 100L))
            .toDF("g", "x"), "g", "x", 8L)
        .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(got == want,
        "streaming histogram state must equal the batch-built sketch")
    } finally q.stop()
  }

  test("hll sketch estimates track exact distincts within 5% at real cardinality") {
    val n = 100000L
    val df = spark.range(n).select((col("id") % 2).as("g"), col("id").cast("string").as("v"))
    val got = df.groupBy("g")
      .agg(countDistinct($"v").as("n_exact"),
        hll_sketch_estimate(hll_sketch_agg($"v")).as("n_est"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (g, exact, est) =>
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"group $g: est $est vs exact $exact")
    }
    // union-merge consistency: merging per-half sketches estimates the
    // union like the single-pass sketch does
    val half1 = df.filter($"id" < n / 2).agg(hll_sketch_agg($"v").as("sk"))
    val half2 = df.filter($"id" >= n / 2).agg(hll_sketch_agg($"v").as("sk"))
    val merged = half1.unionAll(half2)
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[Long].head()
    val single = df.agg(hll_sketch_estimate(hll_sketch_agg($"v")).as("est"))
      .as[Long].head()
    assert(math.abs(merged - single).toDouble / single < 0.01,
      s"merged $merged vs single-pass $single")
  }

  test("cms estimate for a never-seen key is the bucket floor (0 on empty cells)") {
    val df = Seq(1L, 1L, 2L).toDF("k")
    val sketch = SketchOps.cmsBuild(df, "k", D, W)
    val unseen = Seq(999999L).toDF("k")
    val est = SketchOps.cmsEstimate(sketch, unseen, "k", D, W)
      .select($"n_est").as[Long].head()
    // with 3 keys in 32 buckets a collision on ALL 4 rows is essentially
    // impossible; the estimate must fall back to an absent-cell zero
    assert(est == 0L)
  }

  test("hll: daily-union estimate equals the monolithic sketch; within 5% of exact distinct") {
    val e = graft.core.Tables(spark, sfDir).events
    val inc = SketchOps.hllRollup(
        SketchOps.hllBucketSketches(e, to_date($"ts"), "user_id"),
        date_trunc("week", $"bucket"))
      .select($"grp".cast("date").as("m"), $"est_distinct")
      .as[(java.sql.Date, Long)].collect().toMap
    val direct = SketchOps.hllRollup(
        SketchOps.hllBucketSketches(e, date_trunc("week", $"ts"), "user_id"),
        $"bucket")
      .select($"grp".cast("date").as("m"), $"est_distinct")
      .as[(java.sql.Date, Long)].collect().toMap
    val exact = e.groupBy(date_trunc("week", $"ts").cast("date").as("m"))
      .agg(countDistinct($"user_id").as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    assert(inc.nonEmpty && inc.keySet == exact.keySet)
    // register-max union is deterministic: incremental == monolithic
    assert(inc == direct, s"union of daily sketches diverged from direct: $inc vs $direct")
    for ((m, est) <- inc) {
      val n = exact(m).toDouble
      assert(math.abs(est - n) <= 0.05 * n + 1,
        s"week $m estimate $est too far from exact ${exact(m)}")
    }
  }
}
