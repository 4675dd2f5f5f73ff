package graft.functions

import graft.SparkSpec
import graft.core.Tables
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Bit-exactness of the native signature kernels against the HOF
  * formulations they replaced (the same guarantee VectorOpsSpec gives for
  * the cosine kernel): any divergence would silently change LSH buckets.
  */
class HashKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def tokenHashes = Tables(spark, sfDir).documents
    .select(col("doc_id").as("id"),
      transform(TextFunctions.tokens(col("text")), t => xxhash64(t)).as("th"),
      transform(TextFunctions.shingles(col("text"), 3), s => xxhash64(s)).as("hh"))

  test("MinHashSignature matches the 64x array_min(transform) HOF form bit-for-bit") {
    val numHashes = 64
    val seeds = (0 until numHashes).map { i =>
      val a = HashKernels.GoldenA * (2L * i + 1L)
      val b = HashKernels.GoldenB * i
      array_min(transform(col("hh"), h => h * a + b))
    }
    val diff = tokenHashes
      .select(col("id"),
        HashKernels.minhashSignature(col("hh"), numHashes).as("native"),
        array(seeds: _*).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0L)
  }

  test("SimHashFingerprint matches the 64x aggregate HOF form bit-for-bit") {
    val hof = (0 until 64).map { j =>
      when(
        aggregate(col("th"), lit(0L),
          (s, h) => s + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val diff = tokenHashes
      .select(col("id"), HashKernels.simhash(col("th")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0L)
  }

  test("OnePermSignature: deterministic, full, identical-input-identical-output") {
    val rows = Seq(
      (1L, Seq(0x1111L, 0x2222L, 0x3333L)),
      (2L, Seq(0x1111L, 0x2222L, 0x3333L)), // identical multiset
      (3L, Seq(42L)),                       // short doc → densified bins
      (4L, Seq.empty[Long])
    ).toDF("id", "th")
    val out = rows.select(col("id"),
        HashKernels.onePermSignature(col("th"), 16).as("sig"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(out.forall(_._2.length == 16))
    assert(out(0)._2 == out(1)._2, "identical sets → identical signatures")
    assert(out(2)._2.distinct.length > 1, "densified bins must be decorrelated, not copies")
    assert(out(3)._2.forall(_ == Long.MaxValue), "empty input stays sentinel")
    // repeatable
    val again = rows.select(HashKernels.onePermSignature(col("th"), 16))
      .as[Seq[Long]].collect()
    assert(out.map(_._2).toSeq == again.toSeq)
  }

  test("one-permutation LSH keeps high recall vs exact jaccard on the corpus") {
    import graft.dedup.Dedup
    val d = graft.core.Tables(spark, sfDir).documents
    val exact = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val oph = Dedup.minHashNearDups(d, "text", "doc_id", threshold = 0.8, onePerm = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(oph.subsetOf(exact), "exact-verified pairs must be a subset")
    val recall = exact.intersect(oph).size.toDouble / exact.size
    assert(recall >= 0.8, s"OPH recall $recall too low (exact=${exact.size}, oph=${oph.size})")
  }

  test("SortedIntersectCount matches size(array_intersect) on sorted distinct sets") {
    val pairs = tokenHashes.select(col("id"), array_sort(array_distinct(col("hh"))).as("s"))
      .limit(40)
    val diff = pairs.as("a").crossJoin(pairs.as("b"))
      .select(
        HashKernels.sortedIntersectCount(col("a.s"), col("b.s")).as("native"),
        size(array_intersect(col("a.s"), col("b.s"))).cast("long").as("builtin"))
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(diff == 0L)
  }

  test("SortedIntersectCount edge cases") {
    val rows = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue))
    ).toDF("a", "b")
    val got = rows.select(HashKernels.sortedIntersectCount(col("a"), col("b")))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 2L, 2L))
  }

  test("WeightedMinTicket is bit-identical to the sequence+aggregate HOF fold") {
    val P = 1000000007L
    val rows = Seq(
      (0L, 1L), (1L, 1L), (42L, 7L), (999999L, 10000L),
      (-5L, 3L),                      // negative id: pmod branch
      (3500000000L, 5L),              // id*K wraps Long — wrap must match
      (7L, 0L), (7L, -2L)             // w <= 0: never-wins sentinel
    ).toDF("id", "w")
    val hof = when($"w" <= 0, lit(Long.MaxValue)).otherwise(
      aggregate(sequence(lit(0L), $"w" - 1), lit(Long.MaxValue),
        (acc, i) => {
          val t = pmod($"id" * lit(2654435761L) + i * lit(40503L), lit(P))
          least(acc, pmod(t * t, lit(P)))
        }))
    val got = rows.select(
      HashKernels.weightedMinTicket($"id", $"w").as("native"), hof.as("ref"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, r) => assert(n == r, s"native $n != hof $r") }
    assert(got.takeRight(2).forall(_._1 == Long.MaxValue))
  }

  test("HashBucketCounts matches the per-bucket HOF form; MinSumCounts is a valid ∩ bound") {
    val B = 16
    val sets = tokenHashes
      .select(col("id"), array_sort(array_distinct(col("hh"))).as("s")).limit(30)
    // reference: B interpreted filter passes (the form the kernel fuses)
    val hof = transform(sequence(lit(0), lit(B - 1)),
      b => size(filter(col("s"), g => shiftrightunsigned(g, 60) === b.cast("long")))
        .cast("long"))
    val diff = sets
      .select(HashKernels.hashBucketCounts(col("s"), B).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diff == 0L)
    // MinSumCounts ≡ aggregate(zip_with(least)) and upper-bounds the true
    // intersection on every pair (the exactness the suffix refine rests on)
    val pairs = sets.as("a").crossJoin(sets.as("b"))
      .select(col("a.s").as("sa"), col("b.s").as("sb"),
        HashKernels.hashBucketCounts(col("a.s"), B).as("ha"),
        HashKernels.hashBucketCounts(col("b.s"), B).as("hb"))
    val checked = pairs.select(
        HashKernels.minSumCounts(col("ha"), col("hb")).as("native"),
        aggregate(zip_with(col("ha"), col("hb"), (x, y) => least(x, y)),
          lit(0L), (acc, v) => acc + v).as("ref"),
        HashKernels.sortedIntersectCount(col("sa"), col("sb")).as("isect"))
    assert(checked.filter(col("native") =!= col("ref")).count() == 0L)
    assert(checked.filter(col("native") < col("isect")).count() == 0L,
      "Σ min bucket counts must upper-bound |A∩B|")
  }

  test("ArrayXxHash64 is bit-identical to transform(xxhash64) incl. nulls") {
    val corpus = Tables(spark, sfDir).documents
      .select(TextFunctions.tokens(col("text")).as("t"))
    val crafted = Seq(Tuple1(Seq[String]("a", null, "", "über"))).toDF("t")
    val both = corpus.union(crafted).select(
      HashKernels.arrayXxHash64(col("t")).as("native"),
      transform(col("t"), x => xxhash64(x)).as("hof"))
    // HOF null elements yield 42 (the seed) just like the kernel
    assert(both.filter(col("native") =!=
      transform(col("hof"), h => coalesce(h, lit(42L)))).count() == 0)
  }

  test("NgramSetHashes preserves the string-shingle equality structure") {
    // hash VALUES differ from xxhash64(gram string) by design; what must
    // match is the structure: per-doc distinct gram count, sortedness,
    // and cross-doc intersection sizes (all any consumer observes)
    val both = Tables(spark, sfDir).documents
      .select(col("doc_id").as("id"),
        HashKernels.ngramSetHashes(
          transform(TextFunctions.tokens(col("text")), t => xxhash64(t)), 3).as("ks"),
        array_sort(transform(TextFunctions.shingles(col("text"), 3),
          s => xxhash64(s))).as("ss"))
    assert(both.filter(size(col("ks")) =!= size(col("ss"))).count() == 0)
    assert(both.filter(col("ks") =!= array_sort(col("ks"))).count() == 0)
    val pairs = both.as("a").crossJoin(both.as("b"))
      .filter(col("a.id") < col("b.id") && col("a.id") < 15 && col("b.id") < 15)
      .select(
        HashKernels.sortedIntersectCount(col("a.ks"), col("b.ks")).as("ik"),
        HashKernels.sortedIntersectCount(col("a.ss"), col("b.ss")).as("is"))
    assert(pairs.filter(col("ik") =!= col("is")).count() == 0)
    // short-doc fallback: < n tokens → exactly one whole-sequence gram
    val short = Seq("x y").toDF("text")
      .select(HashKernels.ngramSetHashes(
        transform(TextFunctions.tokens(col("text")), t => xxhash64(t)), 3).as("ks"))
    assert(short.select(size(col("ks"))).head().getInt(0) == 1)
  }

  test("SortedRunStats counts runs over sorted arrays (incl. edges)") {
    val rows = Seq(
      (1L, Seq(1L, 1L, 1L, 2L, 3L, 3L)),  // runs 3,1,2 → dup 5, top 3
      (2L, Seq(5L, 6L, 7L)),              // no dups
      (3L, Seq(9L)),                      // single
      (4L, Seq.empty[Long])               // empty
    ).toDF("id", "hs")
    val got = rows.select(col("id"), HashKernels.sortedRunStats(col("hs")).as("st"))
      .orderBy("id")
      .select(col("st.total"), col("st.dup"), col("st.top"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((6L, 5L, 3L), (3L, 0L, 1L), (1L, 0L, 1L), (0L, 0L, 0L)))
  }

  test("SortedRunStats agrees with the groupBy-count formulation on the corpus") {
    val grams = Tables(spark, sfDir).documents
      .select(col("doc_id").as("id"),
        transform(TextFunctions.tokens(col("text")), t => xxhash64(t)).as("gh"))
    val native = grams
      .select(col("id"), HashKernels.sortedRunStats(array_sort(col("gh"))).as("st"))
      .select(col("id"), col("st.total").as("total"), col("st.dup").as("dup"),
        col("st.top").as("top"))
    val grouped = grams
      .select(col("id"), explode(col("gh")).as("g"))
      .groupBy("id", "g").agg(count("*").as("c"))
      .groupBy("id").agg(sum("c").as("total"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"),
        max("c").as("top"))
    assert(native.exceptAll(grouped).count() == 0 &&
      grouped.exceptAll(native).count() == 0)
  }

  test("round-3 kernels are registered for SQL") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    val row = spark.sql(
      """SELECT
        |  array_xxhash64(array('a', 'b')) AS ah,
        |  ngram_set_hashes(array(1L, 2L, 3L), 2) AS ng,
        |  sorted_run_stats(array(1L, 1L, 2L)).dup AS dup,
        |  sq8_dot(sq8_encode(array(0.0d, 1.0d)).code, array(1.0d, 1.0d)) AS qd
        |""".stripMargin).head()
    assert(row.getSeq[Long](0).length == 2)
    assert(row.getSeq[Long](1).length == 2)   // 2 distinct bigrams of [1,2,3]
    assert(row.getLong(2) == 2L)
    assert(row.getDouble(3) == -128.0 + 127.0) // codes [-128, 127] · [1, 1]
  }

  test("wrong-arity SQL fails analysis with a readable message") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT sq8_dot(CAST('a' AS BINARY))").head()
    }
    assert(e.getMessage.contains("takes 2 argument"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT vector_cosine(array(1.0d))").head()
    }
    assert(e2.getMessage.contains("takes 2 argument"), e2.getMessage)
  }

  test("kernels survive empty and single-token inputs") {
    val rows = Seq(
      (1L, Seq.empty[Long]),
      (2L, Seq(42L)),
      (3L, Seq(Long.MinValue, Long.MaxValue, 0L))
    ).toDF("id", "th")
    val out = rows.select(col("id"),
      HashKernels.minhashSignature(col("th"), 8).as("sig"),
      HashKernels.simhash(col("th")).as("fp"))
      .orderBy("id").as[(Long, Seq[Long], Long)].collect()
    assert(out(0)._2.forall(_ == Long.MaxValue)) // empty → sentinel minima
    assert(out(0)._3 == 0L)                      // empty → all votes negative
    assert(out(1)._2.length == 8)
    assert(out(1)._3 == 42L)                     // single token → its own bits
  }
}
