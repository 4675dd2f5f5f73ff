package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum/saltedCount match plain aggregation on skewed data") {
    // 90% of rows share one key — the within-group skew case
    val rows = (1 to 2000).map(i => (if (i <= 1800) "hot" else s"k${i % 7}", i.toDouble))
    val df = rows.toDF("k", "v")
    val plainSum = df.groupBy("k").agg(sum("v")).as[(String, Double)].collect().toMap
    val salted = ScaleOps.saltedSum(df, Seq("k"), "v").as[(String, Double)].collect().toMap
    assert(salted == plainSum)
    val plainCnt = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val saltedC = ScaleOps.saltedCount(df, Seq("k")).as[(String, Long)].collect().toMap
    assert(saltedC == plainCnt)
  }

  test("bucketed tables join without a shuffle exchange") {
    // clear any stale managed-table locations from previous JVM runs
    Seq("orders_b", "customer_b").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val t = Tables(spark, sfDir)
    ScaleOps.writeBucketed(t.orders, "orders_b", "o_custkey", 8)
    ScaleOps.writeBucketed(
      t.customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("vector_cosine is callable from SQL after registration") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    val got = spark.sql(
      "SELECT vector_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("signature kernels are callable from SQL after registration") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    val sig = spark.sql(
      "SELECT minhash_signature(array(1L, 2L, 3L), 8) AS s").as[Seq[Long]].head()
    assert(sig.length == 8)
    val fp = spark.sql("SELECT simhash(array(5L)) AS f").as[Long].head()
    assert(fp == 5L)
    val i = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS i").as[Long].head()
    assert(i == 2L)
    // non-constant numHashes must fail analysis cleanly, not NPE
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), id) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("foldable") || err.getMessage.contains("constant"))
  }

  test("zOrderValue interleaves bits; sorting by it clusters both dimensions") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
    val got = df.select(ScaleOps.zOrderValue($"x", $"y", 16)).as[Long].collect().toSeq
    // z(3,5): x bits 0,1 -> pos 0,2; y bits 0,2 -> pos 1,5 = 100111b = 39
    assert(got == Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
    // locality: z-sorted buckets of a 16x16 grid span at most a few rows
    // of each dimension, unlike an x-sorted layout which spans ALL of y
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)).toDF("x", "y")
    val spans = grid.select(ScaleOps.zOrderValue($"x", $"y", 4).as("z"), $"x", $"y")
      .groupBy(($"z" / 16).cast("long").as("b")) // 16 buckets of 16 cells
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .as[(Long, Long, Long)].collect()
    assert(spans.forall { case (_, sx, sy) => sx <= 3 && sy <= 3 },
      s"z-buckets must be 4x4 tiles, got ${spans.toSeq}")
  }

  test("saltedJoin result multiset equals the plain join at any salt") {
    val fact = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (3L, 7.0), (1L, 30.0))
      .toDF("fk", "v")
    val dim = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("dk", "name")
    val plain = fact.join(dim, $"fk" === $"dk").select("fk", "v", "name")
    for (s <- Seq(1, 3, 16)) {
      val salted = ScaleOps.saltedJoin(fact, dim, "fk", "dk", salt = s)
        .select("fk", "v", "name")
      assert(salted.exceptAll(plain).count() == 0
        && plain.exceptAll(salted).count() == 0, s"salt=$s changed the result")
    }
    // the join key actually widens: the salt equality is in the join plan
    val p = ScaleOps.saltedJoin(fact, dim, "fk", "dk", salt = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt fell out of the join:\n$p")
  }
}
