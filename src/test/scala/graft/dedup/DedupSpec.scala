package graft.dedup

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
    (4L, "completely different words nothing shared here at all today friends"),
    (5L, "another unrelated text with its own tokens and nothing else")
  ).toDF("doc_id", "text")

  test("dedupExact keeps the lowest id per identical text") {
    val kept = Dedup.dedupExact(docs, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("exactGroups counts duplicates") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
      .filter($"n_dups" > 1).select("keep_id", "n_dups").as[(Long, Long)].collect()
    assert(g.toSeq == Seq((1L, 2L)))
  }

  test("jaccardPairs finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minHashNearDups agrees with exact jaccard on the fixture corpus") {
    val mh = Dedup.minHashNearDups(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // identical pair always caught; near-dup pair caught w.h.p. at 16×4 bands
    assert(mh == exact)
  }

  test("minHash recall on the sf0.001 documents table vs exact jaccard") {
    val d = Tables(spark, sfDir).documents
    val exact = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minHashNearDups(d, "text", "doc_id", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recall = exact.intersect(mh).size.toDouble / exact.size
    assert(recall >= 0.9, s"minhash recall $recall too low (exact=${exact.size}, mh=${mh.size})")
    assert(mh.subsetOf(exact), "verified pairs must be a subset of exact pairs")
  }

  test("simHash: identical texts hash identically, near-dups are close, unrelated far") {
    val fps = Dedup.simHash(docs, "text", "doc_id").orderBy("id")
      .select("fp").as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0), fps(1)) == 0)
    assert(ham(fps(0), fps(2)) <= 16)
    assert(ham(fps(0), fps(3)) > 16)
  }

  test("simHashNearDups candidate generation finds low-hamming pairs") {
    val fps = Dedup.simHash(docs, "text", "doc_id")
    val pairs = Dedup.simHashNearDups(fps, maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("jaccardPairs at threshold 1.0 finds exactly the identical-set pairs") {
    // t=1.0 is the sharpest integral-t·sz boundary: prefix length must
    // stay >= 1 (sz - ceil(sz) + 1), or every pair is lost
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simHashNearDups refuses mask-explosion configs; jaccardPairs composes in one plan") {
    val fps = Seq((1L, 1L)).toDF("id", "fp")
    val err = intercept[IllegalArgumentException] {
      Dedup.simHashNearDups(fps, maxHamming = 10, chunks = 1)
    }
    assert(err.getMessage.contains("chunk variants"))
    // two guarded jaccardPairs in one plan: unique observe names (was
    // DUPLICATED_METRICS_NAME)
    val u = Dedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.5, maxShingleDF = 10)
      .unionByName(Dedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.9, maxShingleDF = 10))
    assert(u.count() >= 2)
  }

  test("simHashNearDups with 8 chunks stays complete (parameterized pigeonhole)") {
    val base = 0x0123456789ABCDEFL
    val mask = (1L << 0) | (1L << 8) | (1L << 16) | (1L << 24) |
      (1L << 32) | (1L << 40) | (1L << 48) | (1L << 56) // 1 bit per 8-bit chunk
    val fps = Seq((1L, base), (2L, base ^ mask), (3L, ~base)).toDF("id", "fp")
    val pairs = Dedup.simHashNearDups(fps, maxHamming = 8, chunks = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("maxShingleDF skew guard trades recall, never score correctness") {
    // every doc shares the hot boilerplate trigram; pairs 1-2 also share
    // rare grams, pair 3-4's only overlap is below threshold
    val boiler = "click here now"
    val d = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon"),
      (2L, s"$boiler alpha beta gamma delta zeta"),
      (3L, s"$boiler totally different words one two"),
      (4L, s"$boiler unrelated content three four five")
    ).toDF("doc_id", "text")
    val unguarded = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // cap of 2 drops grams appearing in >2 docs (the boilerplate) from
    // the candidate index only
    val guarded = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.3,
        maxShingleDF = 2)
      .select(col("id_a"), col("id_b"), col("jaccard")).collect()
    val guardedPairs = guarded.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guardedPairs.subsetOf(unguarded), "guard may only drop pairs, never invent them")
    assert(guardedPairs.contains((1L, 2L)), "pairs sharing rare grams survive the cap")
    // reported scores stay exact (computed over FULL sets incl. boilerplate)
    val full = bruteForceJaccard3(d, 0.3)
    guarded.foreach { r =>
      assert(full((r.getLong(0), r.getLong(1))) == r.getDouble(2),
        "guard must not change a reported score")
    }
  }

  private def bruteForceJaccard3(d: org.apache.spark.sql.DataFrame, t: Double): Map[(Long, Long), Double] = {
    val sets = d.select(col("doc_id").as("id"),
      graft.text.TextFunctions.shingles(col("text"), 3).as("sh"))
    sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("j"))
      .filter(col("j") >= t)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
  }

  /** All-pairs jaccard ground truth over full shingle sets — no candidate
    * generation, so any prefix/length/positional-filter bug shows up as a
    * set mismatch.
    */
  private def bruteForceJaccard(d: org.apache.spark.sql.DataFrame, t: Double): Set[(Long, Long)] = {
    val sets = d.select(col("doc_id").as("id"),
      graft.text.TextFunctions.shingles(col("text"), 3).as("sh"))
    sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("j"))
      .filter(col("j") >= t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  /** All-pairs containment ground truth (ordered pairs, both directions). */
  private def bruteForceContainment(d: org.apache.spark.sql.DataFrame, t: Double): Set[(Long, Long)] = {
    val sets = d.select(col("doc_id").as("id"),
      graft.text.TextFunctions.shingles(col("text"), 3).as("sh"))
    sets.as("a").join(sets.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(col("a.sh")).cast("double")).as("c"))
      .filter(col("c") >= t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("containmentPairs finds the quoted doc asymmetrically; jaccard misses it") {
    val quoted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "intro words first alpha beta gamma delta epsilon zeta then lots of " +
        "other unrelated trailing content tokens one two three four five six seven"),
      (3L, "totally different content nothing shared anywhere at all today")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(quoted, "text", "doc_id", n = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "doc 1 is fully quoted inside doc 2")
    assert(!pairs.contains((2L, 1L)), "containment is asymmetric")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    val j = Dedup.jaccardPairs(quoted, "text", "doc_id", n = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!j.contains((1L, 2L)), "symmetric jaccard structurally misses the quote")
  }

  test("containmentPairs matches brute force on the sf0.001 corpus (incl. integral-t·sz boundary)") {
    val d = Tables(spark, sfDir).documents
    for (t <- Seq(0.6, 0.8)) {
      val got = Dedup.containmentPairs(d, "text", "doc_id", n = 3, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val bf = bruteForceContainment(d, t)
      assert(bf.nonEmpty, "fixture near-dups imply containment pairs")
      assert(got == bf, s"threshold $t: filtered=${got.size} bruteforce=${bf.size}, " +
        s"missed=${(bf -- got).take(5)}, extra=${(got -- bf).take(5)}")
    }
  }

  test("crossJaccardPairs equals the self-join pairs restricted to cross-side") {
    val d = Tables(spark, sfDir).documents
    val cut = d.agg(max($"doc_id")).head.getLong(0) / 2 + 1
    val newD = d.filter($"doc_id" >= cut); val oldD = d.filter($"doc_id" < cut)
    for (t <- Seq(0.5, 0.8)) {
      val cross = Dedup.crossJaccardPairs(newD, oldD, "text", "doc_id", n = 3, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // brute force emits id_a < id_b; old ids sort below the cut, so a
      // cross pair (old, new) maps to (id_a=new, id_b=old)
      val expected = bruteForceJaccard(d, t)
        .collect { case (a, b) if a < cut && b >= cut => (b, a) }
      assert(cross == expected, s"threshold $t: got=${cross.size} expected=${expected.size}, " +
        s"missed=${(expected -- cross).take(5)}, extra=${(cross -- expected).take(5)}")
    }
  }

  test("jaccardPairs is exact at integral-t·sz boundary thresholds (0.8, 0.9)") {
    val d = Tables(spark, sfDir).documents
    for (t <- Seq(0.8, 0.9)) {
      val exact = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val bf = bruteForceJaccard(d, t)
      assert(exact == bf, s"threshold $t: filtered=${exact.size} bruteforce=${bf.size}, " +
        s"missed=${(bf -- exact).take(5)}, extra=${(exact -- bf).take(5)}")
    }
  }

  test("simHashNearDups is complete at radius 10: planted distance-8 pair spread over all chunks") {
    // 8 differing bits spread 2+2+2+2 across the four 16-bit chunks — the
    // exact shape the old single-chunk-equality pigeonhole missed
    val base = 0x0123456789ABCDEFL
    val mask = (3L << 0) | (3L << 16) | (3L << 32) | (3L << 48)
    val fps = Seq((1L, base), (2L, base ^ mask), (3L, ~base)).toDF("id", "fp")
    val pairs = Dedup.simHashNearDups(fps, maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("nearDupGroups: one survivor per dup cluster, singletons keep themselves") {
    val got = Dedup.nearDupGroups(docs, "text", "doc_id", threshold = 0.5)
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    // {1,2,3} collapse (2 exact, 3 near dup of 1) → 1 survives; 4, 5 isolated
    assert(got == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true)))
    // no-dup corpus: everything keeps itself (empty pair list path)
    val solo = Seq((10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six")).toDF("doc_id", "text")
    val all = Dedup.nearDupGroups(solo, "text", "doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(all == Seq((10L, 10L, true), (11L, 11L, true)))
  }

  test("connectedComponents labels every node with its component's min id") {
    // two components ({1,2,3} via a chain, {5,6}) + node 7 self-paired
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L), (7L, 7L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connectedComponents converges on a long chain (diameter > 2)") {
    // a 9-node path — and the convergence guard still fails loudly
    // when starved of rounds
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 9L).map(_ -> 1L).toMap)
    assert(intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxIters = 1)
    }.getMessage.contains("converge"))
  }

  test("connectedComponents labels a 64-node path within the default round cap") {
    // diameter 63 >> maxIters 20: min-label propagation (rounds ∝
    // diameter) threw here; star contraction needs O(log n) rounds —
    // the 100 TB boilerplate-chain component (doc A≈B≈C≈…) is exactly
    // this graph
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 64L).map(_ -> 1L).toMap)
    // shuffled ids (min somewhere in the middle of the walk) converge
    // just as fast — the algorithm must not depend on the path being
    // monotonically labeled
    def p(i: Int): Long = (i * 37) % 64 + 1L // 37 coprime to 64 → a permutation
    val perm = (0 until 63).map(i => (p(i), p(i + 1)))
    val got2 = Dedup.connectedComponents(
      perm.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got2 == (1L to 64L).map(_ -> 1L).toMap, s"one component labeled 1: $got2")
  }

  test("accumulated PPJoin bound prunes a candidate the per-row filter keeps, exactly") {
    // Crafted gram-hash sets (jaccardCandidates takes the (id, sz, set)
    // frame directly): docs 1 and 2 share exactly grams 100 (df 2 → global
    // rank 1 in both prefixes) and 200 (df 4 → prefix position 7 in both).
    // At t=0.5, α = ⌈(24)/3⌉ = 8: the per-row filter keeps the pair via
    // gram 100's row (1 + min(11,11) = 12 ≥ 8) but the accumulated bound
    // 2 + min(12−7, 12−7) = 7 < 8 proves overlap < α — and indeed true
    // jaccard is 2/22. Aux docs 3-6 exist only to shape the gram dfs.
    val f3a = (311L to 315L); val f3b = (411L to 415L)
    val f5a = (321L to 325L); val f5b = (421L to 425L)
    val sets = Seq(
      1L -> (Seq(100L, 200L) ++ f3a ++ f5a),
      2L -> (Seq(100L, 200L) ++ f3b ++ f5b),
      3L -> (Seq(200L) ++ f3a ++ f3b ++ f5a ++ f5b),
      4L -> (Seq(200L) ++ f3a ++ f3b ++ f5a ++ f5b),
      5L -> (f5a ++ f5b).toSeq,
      6L -> (f5a ++ f5b).toSeq)
    val perDoc = sets.toDF("id", "set")
      .select(col("id"), size(col("set")).cast("long").as("sz"), col("set"))
    def cands(acc: Boolean) =
      Dedup.jaccardCandidates(perDoc, 0.5, Long.MaxValue, accumulate = acc)
        .as[(Long, Long)].collect().toSet
    val legacy = cands(false)
    val tight = cands(true)
    assert(legacy.contains((1L, 2L)), "per-row ANY keeps the pair via gram 100")
    assert(!tight.contains((1L, 2L)), "accumulated bound proves overlap < α")
    assert(tight.subsetOf(legacy), "refinement may only drop candidates")
  }

  test("accumulated candidates never exceed the per-row form on the corpus, same pairs out") {
    val d = Tables(spark, sfDir).documents
    // same (id, sz, set) shape jaccardPairs feeds in (sorted distinct
    // gram hashes from the native shingling kernel)
    val perDoc = d.select(col("doc_id").as("id"),
        graft.functions.HashKernels.ngramSetHashes(
          graft.functions.HashKernels.arrayXxHash64(
            graft.text.TextFunctions.tokens(col("text"))), 3).as("set"))
      .select(col("id"), size(col("set")).cast("long").as("sz"), col("set"))
    val tight = Dedup.jaccardCandidates(perDoc, 0.5, 100000L)
      .as[(Long, Long)].collect().toSet
    val legacy = Dedup.jaccardCandidates(perDoc, 0.5, 100000L, accumulate = false)
      .as[(Long, Long)].collect().toSet
    assert(tight.subsetOf(legacy),
      s"accumulated bound invented candidates: ${(tight -- legacy).take(5)}")
    // the final verified pair set is unchanged (exactness): asserted
    // against brute force by the 0.8/0.9 boundary test above; here the
    // candidate superset relation is the measured drop
    info(s"candidates: per-row=${legacy.size} accumulated=${tight.size}")
  }

  test("histogram suffix refinement prunes a candidate the accumulation bound keeps, exactly") {
    // Docs 1 and 2: 24 grams each at t=0.5 → α = ⌈48/3⌉ = 16, prefix
    // length 24 − 12 + 1 = 13. They share exactly 13 grams; aux docs push
    // the non-shared grams' dfs above the shared grams' (df 2), so the
    // shared grams fill BOTH rare-first prefixes: opp = 13, pa = pb = 13,
    // accumulation bound 13 + min(11, 11) = 24 ≥ 16 → kept. But the
    // suffixes live in disjoint hash ranges (doc 1's extras in buckets
    // 1-11, doc 2's in bucket 15, shared grams in bucket 0), so the
    // histogram bound Σ min = 13 < 16 proves overlap < α before any full
    // set ships — the PPJoin+ suffix-filter effect, relationally.
    val shared = (1L to 13L)                                  // bucket 0
    val ex1 = (1L to 11L).map(b => (b << 60) | 7L)            // buckets 1-11
    val ex2 = (1L to 11L).map(k => (15L << 60) | k)           // bucket 15
    val aux = (3L to 5L).map(i => i -> (ex1 ++ ex2))          // df(extras) = 4+
    val sets = Seq(1L -> (shared ++ ex1), 2L -> (shared ++ ex2)) ++ aux
    val perDoc = sets.toDF("id", "set")
      .select(col("id"), size(col("set")).cast("long").as("sz"), col("set"))
    val cands = Dedup.jaccardCandidates(perDoc, 0.5, Long.MaxValue)
    val alpha = ceil(lit(new java.math.BigDecimal(0.5 / 1.5)
      .setScale(10, java.math.RoundingMode.FLOOR)) * (col("__hsza") + col("__hszb")))
    val refined = Dedup.histRefine(cands, perDoc.select("id", "set"), alpha, 16)
    val before = cands.as[(Long, Long)].collect().toSet
    val after = refined.as[(Long, Long)].collect().toSet
    assert(before.contains((1L, 2L)), "accumulation bound keeps the pair")
    assert(!after.contains((1L, 2L)), "histogram bound proves overlap < α")
    assert(after.subsetOf(before), "refinement may only drop candidates")
  }

  test("jaccardPairs with and without suffix refinement agree on the corpus") {
    val d = Tables(spark, sfDir).documents
    val on = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val off = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.5,
        histBuckets = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(on == off, "suffix refinement must not change verified pairs")
    // measured verify-set drop (the spec the refinement is graded on)
    val perDoc = d.select(col("doc_id").as("id"),
        graft.functions.HashKernels.ngramSetHashes(
          graft.functions.HashKernels.arrayXxHash64(
            graft.text.TextFunctions.tokens(col("text"))), 3).as("set"))
      .select(col("id"), size(col("set")).cast("long").as("sz"), col("set"))
    val cands = Dedup.jaccardCandidates(perDoc, 0.5, 100000L)
    val alpha = ceil(lit(new java.math.BigDecimal(0.5 / 1.5)
      .setScale(10, java.math.RoundingMode.FLOOR)) * (col("__hsza") + col("__hszb")))
    val nCands = cands.count()
    val nRefined = Dedup.histRefine(cands, perDoc.select("id", "set"), alpha, 16).count()
    assert(nRefined <= nCands)
    info(s"verify set: accumulated=$nCands hist-refined=$nRefined")
  }

  test("connectedComponents releases superseded per-round checkpoints") {
    val sc = spark.sparkContext
    // a 9-node chain forces many rounds → many superseded checkpoints
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = sc.getPersistentRDDs.keySet
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
    assert(got.count() == 9)
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size <= 1,
      s"only the returned frame's blocks may remain, found ${added.size} persisted RDDs")
    Dedup.releaseCheckpoint(got)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "releaseCheckpoint must drop the returned frame's blocks")
  }

  test("LSH nearDupGroups refine the exact-jaccard groups with recall >= 0.9 (q66 contract)") {
    val d = Tables(spark, sfDir).documents
    def samePairs(labels: Map[Long, Long]): Set[(Long, Long)] =
      labels.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
      }.toSet
    val exactPairs = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.5)
      .select("id_a", "id_b")
    val exact = Dedup.labelGroups(d, "doc_id", exactPairs, "id_a", "id_b")
      .select(col("doc_id"), col("group")).as[(Long, Long)].collect().toMap
    val lsh = Dedup.nearDupGroups(d, "text", "doc_id", threshold = 0.5)
      .select(col("doc_id"), col("group")).as[(Long, Long)].collect().toMap
    val exactSame = samePairs(exact)
    val lshSame = samePairs(lsh)
    assert(exactSame.nonEmpty, "fixture should contain dup groups at t=0.5")
    // LSH pairs are exact-verified ⊆ exact pairs, and CC over a subgraph
    // only refines components — so the same-group relation is a subset
    assert(lshSame.subsetOf(exactSame),
      s"LSH grouped non-dups together: ${(lshSame -- exactSame).take(5)}")
    val recall = exactSame.intersect(lshSame).size.toDouble / exactSame.size
    assert(recall >= 0.9, s"group recall $recall too low " +
      s"(exact=${exactSame.size}, lsh=${lshSame.size})")
  }

  test("multi-band nearDupGroups refine the exact large-radius groups with recall >= 0.9 (q226 contract)") {
    // the q66 contract at the WIDER radius (t=0.3) over the
    // prefix-augmented radius corpus (q225/q226's shared fixture shape
    // — the raw fixture's jaccard landscape is bimodal with nothing in
    // the mid-band): candidates come from the union of 16×4 and 32×2
    // bandings of one signature, every pair is exact-verified, so the
    // same-group relation can only be a subset of the exact closure —
    // and the union keeps recall high where a single wide banding sags
    // at low similarity
    val d = graft.queries.Queries.radiusCorpus(Tables(spark, sfDir).documents)
    def samePairs(labels: Map[Long, Long]): Set[(Long, Long)] =
      labels.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
      }.toSet
    val exactPairs = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.3)
      .select("id_a", "id_b")
    val exact = Dedup.labelGroups(d, "doc_id", exactPairs, "id_a", "id_b")
      .select(col("doc_id"), col("group")).as[(Long, Long)].collect().toMap
    val mb = Dedup.nearDupGroupsMultiBand(d, "text", "doc_id",
        numHashes = 64, bandings = Seq(16, 32), threshold = 0.3)
      .select(col("doc_id"), col("group")).as[(Long, Long)].collect().toMap
    val exactSame = samePairs(exact)
    val mbSame = samePairs(mb)
    assert(exactSame.nonEmpty, "fixture should contain dup groups at t=0.3")
    assert(exactSame.size > samePairs(
        Dedup.labelGroups(d, "doc_id",
          Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.5)
            .select("id_a", "id_b"), "id_a", "id_b")
          .select(col("doc_id"), col("group")).as[(Long, Long)].collect().toMap).size,
      "t=0.3 must be a genuinely wider radius than t=0.5 on this corpus")
    assert(mbSame.subsetOf(exactSame),
      s"multi-band grouped non-dups together: ${(mbSame -- exactSame).take(5)}")
    val recall = exactSame.intersect(mbSame).size.toDouble / exactSame.size
    assert(recall >= 0.9, s"group recall $recall too low " +
      s"(exact=${exactSame.size}, multiband=${mbSame.size})")
  }

  test("multiBandBuckets candidates equal the per-banding union (offset isolation)") {
    // the one-join multi-band path must be pair-for-pair the union of
    // the per-banding joins — an offset bug mixing configs in one
    // (band, bh) key space would create cross-config phantom buckets
    val d = Tables(spark, sfDir).documents
    val sigs = Dedup.minHashSignatures(d, "text", "doc_id", 3, 64).cache()
    val fused = Dedup.candidatesFromBanded(
        Dedup.multiBandBuckets(sigs, 64, Seq(16, 32)), 10000)
      .as[(Long, Long)].collect().toSet
    val per = Dedup.lshCandidates(sigs, 16, 4).as[(Long, Long)].collect().toSet ++
      Dedup.lshCandidates(sigs, 32, 2).as[(Long, Long)].collect().toSet
    sigs.unpersist(blocking = false)
    assert(fused == per,
      s"fused-vs-per-banding diff: ${(fused -- per).take(3)} / ${(per -- fused).take(3)}")
  }

  test("scale ensemble dedup (LSH + clustered cosine) refines the exact ensemble, recall >= 0.9") {
    // q173's production form: swap both exact pair sources for their
    // index-backed siblings. Every scale pair is exact-VERIFIED
    // (LSH candidates re-scored on gram sets; clustered candidates on
    // true cosine), so the same-group relation can only refine —
    // subset + recall is the whole contract
    import graft.functions.VectorOps
    val d = Tables(spark, sfDir).documents
    val e = Tables(spark, sfDir).embeddings
    def samePairs(labels: Map[Long, Long]): Set[(Long, Long)] =
      labels.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
      }.toSet
    val exactPairs = Dedup.jaccardPairs(d, "text", "doc_id", n = 3, threshold = 0.5)
      .select("id_a", "id_b")
      .unionAll(VectorOps.cosineAllPairs(e, "vec_id", "embedding", threshold = 0.45)
        .select("id_a", "id_b"))
    val exact = Dedup.labelGroups(d, "doc_id", exactPairs, "id_a", "id_b")
      .select(col("doc_id"), col("group")).as[(Long, Long)].collect().toMap
    val idx = VectorOps.IvfIndex.build(e, "vec_id", "embedding", c = 8)
    val scalePairs = Dedup.minHashNearDups(d, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b")
      .unionAll(VectorOps.clusteredCosinePairs(idx, threshold = 0.45, probes = 2)
        .select("id_a", "id_b"))
    val scale = Dedup.labelGroups(d, "doc_id", scalePairs, "id_a", "id_b")
      .select(col("doc_id"), col("group")).as[(Long, Long)].collect().toMap
    idx.close()
    val exactSame = samePairs(exact)
    val scaleSame = samePairs(scale)
    assert(exactSame.nonEmpty)
    assert(scaleSame.subsetOf(exactSame),
      s"scale ensemble grouped non-dups: ${(scaleSame -- exactSame).take(5)}")
    val recall = exactSame.intersect(scaleSame).size.toDouble / exactSame.size
    assert(recall >= 0.9, s"ensemble recall $recall too low " +
      s"(exact=${exactSame.size}, scale=${scaleSame.size})")
  }

  test("q177 (scale-form ensemble query) refines q173's exact grouping, recall >= 0.9") {
    // The declared-query-surface contract for the scale ensemble: q177's
    // labels partition q173's components (every scale pair is
    // exact-verified, so CC can only refine) with group-pair recall
    // >= 0.9 at the query's shipped settings
    import graft.queries.Queries
    def samePairs(labels: Map[Long, Long]): Set[(Long, Long)] =
      labels.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
      }.toSet
    val exact = Queries.q173_ensemble_dedup(spark, sfDir)
      .select(col("doc_id"), col("group_id")).as[(Long, Long)].collect().toMap
    val scale = Queries.q177_ensemble_dedup_scale(spark, sfDir)
      .select(col("doc_id"), col("group_id")).as[(Long, Long)].collect().toMap
    spark.catalog.clearCache() // both queries cache index/CC state
    assert(scale.keySet == exact.keySet, "q177 must label every document")
    val exactSame = samePairs(exact)
    val scaleSame = samePairs(scale)
    assert(exactSame.nonEmpty, "fixture should contain ensemble dup groups")
    assert(scaleSame.subsetOf(exactSame),
      s"q177 grouped non-dups together: ${(scaleSame -- exactSame).take(5)}")
    val recall = exactSame.intersect(scaleSame).size.toDouble / exactSame.size
    assert(recall >= 0.9, s"q177 recall $recall too low " +
      s"(exact=${exactSame.size}, scale=${scaleSame.size})")
  }

  test("dupSpanStats: crafted span semantics (overlap merge, within-doc repeats, short docs)") {
    val docs = Seq(
      // docs 1 and 2 share the 5-token run "v w x y z" twice over via a
      // 6-token shared window: positions 1 and 2 of doc 1 both duplicate
      // → merged coverage 6 tokens, not 10
      (1L, "v w x y z q extra one"),
      (2L, "other v w x y z q tail"),
      (3L, "nothing shared here at all five"),
      (4L, "short doc"),                       // < 5 tokens → 0 spans
      // within-doc repetition: the same 5-gram twice in ONE doc is
      // duplicated even though no other doc has it
      (5L, "r1 r2 r3 r4 r5 sep r1 r2 r3 r4 r5")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(docs, "text", "doc_id", n = 5, hashed = false)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc1: 4 span starts; starts 1,2 duplicated ("v w x y z", "w x y z q")
    //   → coverage = 5 + 1 = 6
    assert(got(1L) == ((4L, 2L, 6L)), s"doc1: ${got(1L)}")
    // doc2: 4 span starts; starts 2,3 duplicated → same merged coverage
    assert(got(2L) == ((4L, 2L, 6L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((2L, 0L, 0L)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0L)), s"doc4: ${got(4L)}")
    // doc5: 7 span starts; starts 1 and 7 are the repeated gram — far
    // apart → coverage 10
    assert(got(5L) == ((7L, 2L, 10L)), s"doc5: ${got(5L)}")
  }

  test("dupSpanStats hashed scale path matches the string form; stripDupSpans repairs") {
    val docs = Tables(spark, sfDir).documents
    val s = Dedup.dupSpanStats(docs, "text", "doc_id", n = 5, hashed = false)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val h = Dedup.dupSpanStats(docs, "text", "doc_id", n = 5, hashed = true)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(s == h, "8-byte gram keys must not change any stat on the fixture")
    assert(s.exists(_._3 > 0), "fixture should contain duplicated spans")
    // repair: covered tokens drop, clean docs untouched
    val crafted = Seq(
      (1L, "a b c d e tail1"),
      (2L, "head a b c d e"),
      (3L, "totally distinct text right here")
    ).toDF("doc_id", "text")
    val fixed = Dedup.stripDupSpans(crafted, "text", "doc_id", n = 5, hashed = true)
      .as[(Long, String)].collect().toMap
    assert(fixed(1L) == "tail1", s"doc1: '${fixed(1L)}'")
    assert(fixed(2L) == "head", s"doc2: '${fixed(2L)}'")
    assert(fixed(3L) == "totally distinct text right here")
    // post-repair: no duplicated 5-gram spans remain in the repaired corpus
    val again = Dedup.dupSpanStats(
        Dedup.stripDupSpans(crafted, "text", "doc_id", n = 5), "text", "id", n = 5)
      .filter(col("dup_spans") > 0).count()
    assert(again == 0L)
  }

  test("keepBest: argmax-quality survivor per component, ties to min id") {
    val ids = Seq(
      (1L, 10L), (2L, 50L), (3L, 20L),   // component {1,2,3}: best = 2
      (4L, 7L), (5L, 7L),                // component {4,5}: tie → min id 4
      (6L, 1L)                           // singleton keeps itself
    ).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.keepBest(ids, "doc_id", pairs, "id_a", "id_b", col("q"))
      .select("doc_id", "group", "keeper", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (4L, 4L, 4L, true), (5L, 4L, 4L, false),
      (6L, 6L, 6L, true)))
    // exactly one keeper per group, always a member of its group
    val byGroup = got.groupBy(_._2)
    assert(byGroup.values.forall(g => g.count(_._4) == 1))
    assert(byGroup.values.forall(g => g.map(_._1).contains(g.head._3)))
  }

  test("simHashNearDups matches brute-force hamming join on the sf0.001 corpus") {
    val fps = Dedup.simHash(Tables(spark, sfDir).documents, "text", "doc_id").cache()
    val got = Dedup.simHashNearDups(fps, maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bf = fps.as("a").join(fps.as("b"), col("a.id") < col("b.id"))
      .filter(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= 10)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(got == bf, s"candidates missed ${(bf -- got).size} of ${bf.size} pairs")
  }

  test("editDistancePairs: blocked Levenshtein pairs with threshold and key gating") {
    val d = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "the quick brown fox jumped over the lazy cat"),  // dist 5 from 1
      (3L, "en", "the quick entirely different tail of words here"), // same 2-prefix, far
      (4L, "de", "the quick brown fox jumps over the lazy dog"),   // lang blocks the pair
      (5L, "en", "a quick brown fox jumps over the lazy dog"),     // first token differs: declared miss
      (6L, "en", "word")                                           // <2 tokens: no block key
    ).toDF("doc_id", "lang", "text")
    val got = Dedup.editDistancePairs(d, "doc_id", "text", maxDist = 10,
        blockCols = Seq("lang"))
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 5L)))
    // distance value is the classic Levenshtein: verify against the
    // unthresholded builtin on the one surviving pair
    val full = d.filter($"doc_id" === 1L).crossJoin(
        d.filter($"doc_id" === 2L).withColumnRenamed("text", "t2"))
      .select(levenshtein($"text", $"t2")).as[Int].head()
    assert(full == 5)
    // tight threshold drops the pair instead of clamping its distance
    assert(Dedup.editDistancePairs(d, "doc_id", "text", maxDist = 4,
      blockCols = Seq("lang")).count() == 0)
  }
}
