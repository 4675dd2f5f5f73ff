package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // Crafted graph: 3-cycle 1→2→3→1 plus a source node 4→1 (in-degree 0).
  // All out-degrees are 1, so contributions are whole ranks.
  private def cycleGraph = (
    Seq(1L, 2L, 3L, 4L).toDF("id"),
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
  )

  test("pageRankInt: hand-computed micro-unit ranks after 1 and 2 rounds") {
    val (nodes, edges) = cycleGraph
    // round 1: node1 ← {3,4} = 2,000,000 → 150000 + 1,700,000;
    // nodes 2,3 ← one full rank → stay 1,000,000; node 4 ← ∅ → base only
    val r1 = GraphOps.pageRankInt(nodes, "id", edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 1850000L, 2L -> 1000000L, 3L -> 1000000L, 4L -> 150000L))
    // round 2 from r1: node1 ← 1,000,000 + 150,000;
    // node2 ← 1,850,000; node3 ← 1,000,000
    val r2 = GraphOps.pageRankInt(nodes, "id", edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 1127500L, 2L -> 1722500L, 3L -> 1000000L, 4L -> 150000L))
  }

  test("weightedPageRankInt: strong ties carry proportionally more rank; w≡1 equals pageRankInt") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    // W(1)=4; round 1: 2 ← (1e6·3)div4 = 750000 → 150000+637500;
    // 3 ← 250000 → 150000+212500; 1 ← base only
    val r1 = GraphOps.weightedPageRankInt(nodes, "id", edges,
        "src", "dst", "w", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 150000L, 2L -> 787500L, 3L -> 362500L), s"got $r1")
    // uniform weights reduce EXACTLY to the unweighted op
    val uni = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    val nodes4 = Seq(1L, 2L, 3L, 4L).toDF("id")
    val a = GraphOps.pageRankInt(nodes4, "id", uni.toDF("src", "dst"),
        "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.weightedPageRankInt(nodes4, "id",
        uni.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
        "src", "dst", "w", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(a == b, s"w=1 must equal pageRankInt: $a vs $b")
    spark.catalog.clearCache()
  }

  test("weightedPageRankInt: zero, negative, AND null weights are rejected loudly") {
    val nodes = Seq(1L, 2L).toDF("id")
    for (w <- Seq(0L, -3L)) {
      intercept[IllegalArgumentException] {
        GraphOps.weightedPageRankInt(nodes, "id",
          Seq((1L, 2L, w)).toDF("src", "dst", "w"), "src", "dst", "w",
          iters = 1)
      }
    }
    // a NULL weight must fail too: min() skips nulls, so a pure min
    // guard passes while (rank·w) div __ws silently NULLs that edge's
    // contribution under ANSI-off — the exact failure the guard exists
    // to prevent
    val ex = intercept[IllegalArgumentException] {
      GraphOps.weightedPageRankInt(nodes, "id",
        Seq((1L, 2L, Some(3L)), (2L, 1L, None)).toDF("src", "dst", "w"),
        "src", "dst", "w", iters = 1)
    }
    assert(ex.getMessage.contains("null"), ex.getMessage)
    spark.catalog.clearCache()
  }

  test("personalizedPageRankInt: seed teleport only, unreachable nodes rank exactly 0") {
    // chain 1→2→3 plus a disconnected 4→5; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val seeds = Seq(1L).toDF("id")
    // r0 = 1e6 on the seed; round 1: 1→150000 (base only),
    // 2→(8500·1e6)//1e4 = 850000; round 2: 2←(8500·150000)//1e4 =
    // 127500, 3←(8500·850000)//1e4 = 722500; 4,5 stay 0 exactly
    val r2 = GraphOps.personalizedPageRankInt(nodes, "id", seeds, "id",
        edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 150000L, 2L -> 127500L, 3L -> 722500L,
      4L -> 0L, 5L -> 0L), s"got $r2")
    // determinism under partitioning (integer arithmetic, no float sums)
    val again = GraphOps.personalizedPageRankInt(nodes.repartition(7), "id",
        seeds, "id", edges.repartition(5), "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(again == r2)
  }

  test("pageRankInt: deterministic across re-runs and partitioning") {
    val (nodes, edges) = cycleGraph
    val a = GraphOps.pageRankInt(nodes, "id", edges, "src", "dst", iters = 4)
      .as[(Long, Long)].collect().toSet
    val b = GraphOps.pageRankInt(nodes.repartition(7), "id",
        edges.repartition(5), "src", "dst", iters = 4)
      .as[(Long, Long)].collect().toSet
    assert(a == b, "integer ranks must not depend on partitioning")
  }

  test("pageRankInt: dangling nodes receive but never donate; duplicate node rows collapse") {
    // 1→2 only: node 2 is dangling (keeps receiving, donates nothing)
    val nodes = Seq(1L, 2L, 2L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = GraphOps.pageRankInt(nodes, "id", edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toSeq.sorted
    // round1: n1=150000, n2=1,000,000 → 150000+850000=1000000
    // round2: n1=150000, n2 ← 150000 → 150000 + (8500*150000) div 10000 = 277500
    assert(r == Seq((1L, 150000L), (2L, 277500L)))
  }

  test("hashWalks: edges followed, sinks stop early, contiguous prefixes, bit-identical re-run") {
    // 1 -> {2, 3}, 2 -> {1}, 3 is a sink: a walk entering 3 must stop
    // (its emitted prefix stays); a start at a sink never appears (no
    // out-edges means no start)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    def run() = GraphOps.hashWalks(edges, "src", "dst", steps = 4, walksPerNode = 3)
      .as[(Long, Long, Int, Long)].collect().toSet
    val got = run()
    assert(got == run(), "walk corpus must be bit-identical across re-runs")
    graft.ops.ScaleOps.release()
    // starts = nodes with out-edges only
    assert(got.filter(_._3 == 0).map(_._1) == Set(1L, 2L))
    assert(got.filter(_._3 == 0).size == 2 * 3, "walksPerNode starts per start node")
    val eSet = Set((1L, 2L), (1L, 3L), (2L, 1L))
    val byWalk = got.groupBy(r => (r._1, r._2))
    byWalk.foreach { case ((s, w), rows) =>
      val path = rows.toSeq.sortBy(_._3)
      // contiguous steps from 0 (a sink stop truncates, never gaps)
      assert(path.map(_._3) == (0 until path.size), s"gapped walk ($s,$w): $path")
      // every hop is a real directed edge
      path.map(_._4).sliding(2).foreach {
        case Seq(a, b) => assert(eSet((a, b)), s"non-edge hop $a->$b in ($s,$w)")
        case _ => ()
      }
      // a walk only ends early at the sink (node 3) — otherwise full length
      if (path.size < 5) assert(path.last._4 == 3L,
        s"walk ($s,$w) stopped at a non-sink: $path")
    }
  }

  test("triangleCounts: K4 minus an edge, any input orientation, loops dropped") {
    // vertices 1..4, complete except (3,4); triangles {1,2,3} and {1,2,4}
    // — edges given in mixed orientation, with a duplicate and a loop
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L), (2L, 3L), (4L, 1L), (2L, 4L), (5L, 5L))
      .toDF("x", "y")
    val got = GraphOps.triangleCounts(edges, "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("triangleCounts matches brute force on a hashed random graph") {
    // deterministic pseudo-random graph: edge (i,j) present iff
    // xxhash64(i*97+j) lands in the bottom 30% — dense enough for many
    // triangles, no RNG
    val ids = (1L to 30L)
    val all = for (i <- ids; j <- ids if i < j) yield (i, j)
    val edges = all.toDF("x", "y")
      .filter(pmod(xxhash64($"x" * 97 + $"y"), lit(10L)) < 3)
    val got = GraphOps.triangleCounts(edges, "x", "y")
      .as[(Long, Long)].collect().toMap
    val e = edges.as[(Long, Long)].collect().toSet
    def has(i: Long, j: Long) = e.contains((i min j, i max j))
    val triples = for (i <- ids; j <- ids if i < j; k <- ids if j < k
      if has(i, j) && has(j, k) && has(i, k)) yield Seq(i, j, k)
    val brute = triples.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == brute)
  }

  test("kCorePeel: fixpoint equals the true k-core on a crafted graph") {
    // triangle {1,2,3} each also linked to hub 4 → K4-ish dense core
    // {1,2,3,4}; a pendant chain 4—5—6 and a spur 3—7 must peel away.
    // True 2-core = {1,2,3,4} with all six core edges.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (3L, 7L)).toDF("x", "y")
    val got = GraphOps.kCorePeel(edges, "x", "y", k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"expected the dense 2-core, got $got")
    // once at fixpoint, more rounds change nothing
    val more = GraphOps.kCorePeel(edges, "x", "y", k = 2, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(more == got)
  }

  test("kCorePeel: cascade — each round peels the next fringe layer") {
    // path 1—2—3—4—5: k=2 peel removes both endpoints each round until
    // nothing is left (a path has no 2-core)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("x", "y")
    val r1 = GraphOps.kCorePeel(edges, "x", "y", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(2L -> 1L, 3L -> 2L, 4L -> 1L), s"round 1: $r1")
    val r3 = GraphOps.kCorePeel(edges, "x", "y", k = 2, rounds = 3)
    assert(r3.isEmpty, "a path graph must peel to nothing at k = 2")
  }

  test("kCorePeel: orientation, duplicates and loops are normalized") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 4L)).toDF("x", "y")
    val got = GraphOps.kCorePeel(edges, "x", "y", k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("bfsWithin: hop distances on a path graph, bounded by rounds") {
    // path 1—2—3—4—5, source {1}: after 3 rounds dists are 0,1,2,3; 5 unreached
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("x", "y")
    val src = Seq(1L).toDF("id")
    val got = GraphOps.bfsWithin(edges, "x", "y", src, "id", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), s"got $got")
  }

  test("bfsWithin: multiple sources take the minimum; undirected traversal; loops dropped") {
    // sources {1, 6}; edge given as 6→5 but traversal must go 5←6 too
    val edges = Seq((1L, 2L), (2L, 3L), (6L, 5L), (5L, 4L), (7L, 7L)).toDF("x", "y")
    val src = Seq(1L, 6L, 6L).toDF("id")
    val got = GraphOps.bfsWithin(edges, "x", "y", src, "id", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L,
      6L -> 0L, 5L -> 1L, 4L -> 2L), s"got $got")
  }

  test("pageRankInt: rejects bad damping and zero iterations") {
    val (nodes, edges) = cycleGraph
    intercept[IllegalArgumentException] {
      GraphOps.pageRankInt(nodes, "id", edges, "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pageRankInt(nodes, "id", edges, "src", "dst", dampingBp = 10001)
    }
  }

  test("biasedHashWalks: matches a driver-side ticket mirror; bias observable; bit-identical re-run") {
    // two triangles sharing node 3 plus a pendant 7→1: mixes return
    // edges, distance-1 (common) neighbors, and far jumps
    val edgeList = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L), (3L, 4L), (4L, 3L), (4L, 5L), (5L, 4L), (3L, 5L), (5L, 3L),
      (7L, 1L)).distinct
    val P = 1000000007L
    def mirror(steps: Int, walks: Int,
               wr: Long, wc: Long, wf: Long): Set[(Long, Long, Int, Long)] = {
      val adj = edgeList.groupBy(_._1).map { case (s, es) =>
        s -> es.map(_._2).distinct.sorted }
      val eset = edgeList.toSet
      val out = collection.mutable.Set[(Long, Long, Int, Long)]()
      for (start <- adj.keys; walk <- 0L until walks.toLong) {
        var node = start; var prev = start
        out += ((start, walk, 0, node))
        var t = 1; var alive = true
        while (t <= steps && alive) {
          adj.get(node) match {
            case None => alive = false
            case Some(ns) =>
              val ws = ns.map(d => if (d == prev) wr
                else if (eset((prev, d))) wc else wf)
              val h = (start * 2654435761L % P + walk * 2246822519L % P +
                t * 3266489917L % P + node * 668265263L % P) % P
              val r = h % ws.sum
              var cum = 0L; var pick = -1
              for (i <- ns.indices if pick < 0) {
                cum += ws(i); if (r < cum) pick = i
              }
              prev = node; node = ns(pick)
              out += ((start, walk, t, node))
          }
          t += 1
        }
      }
      out.toSet
    }
    val edges = edgeList.toDF("src", "dst")
    val got = GraphOps.biasedHashWalks(edges, "src", "dst",
        steps = 3, walksPerNode = 2)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(got == mirror(3, 2, 1L, 4L, 2L),
      s"got ${got.toSeq.sorted}\nexp ${mirror(3, 2, 1L, 4L, 2L).toSeq.sorted}")
    // the bias is live: extreme return weight forces 1↔2 ping-pong
    // from start 7 (7→1, then every later step returns)
    val pingPong = GraphOps.biasedHashWalks(edges, "src", "dst",
        steps = 3, walksPerNode = 1,
        wReturn = 1000000L, wCommon = 1L, wFar = 1L)
      .filter(col("start") === 7L)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(pingPong == mirror(3, 1, 1000000L, 1L, 1L)
      .filter(_._1 == 7L), s"ping-pong: $pingPong")
    val nodesAt = pingPong.toSeq.sortBy(_._3).map(_._4)
    assert(nodesAt.head == 7L && nodesAt(1) == 1L,
      s"pendant start must step to its only neighbor: $nodesAt")
    // deterministic under partitioning
    val again = GraphOps.biasedHashWalks(edges.repartition(7), "src", "dst",
        steps = 3, walksPerNode = 2)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(again == got)
    intercept[IllegalArgumentException] {
      GraphOps.biasedHashWalks(edges, "src", "dst", steps = 1,
        walksPerNode = 1, wReturn = 0L)
    }
    spark.catalog.clearCache()
  }

  test("resourceAllocationInt: hand-computed RA scores, hub cap, pair orientation") {
    // common neighbors: 5 ← {1,2,3} (deg 3), 6 ← {1,2} (deg 2), 7 ← {4}
    val edges = Seq((1L, 5L), (2L, 5L), (3L, 5L), (1L, 6L), (2L, 6L),
      (4L, 7L)).toDF("src", "dst")
    val got = GraphOps.resourceAllocationInt(edges, "src", "dst")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, n, ra) => (a, b) -> (n, ra) }.toMap
    // w(z=5) = 10⁶ div 3 = 333333; w(z=6) = 500000
    assert(got == Map(
      (1L, 2L) -> (2L, 833333L),
      (1L, 3L) -> (1L, 333333L),
      (2L, 3L) -> (1L, 333333L)), s"got $got")
    assert(got.keys.forall { case (a, b) => a < b })
    // hub cap: dropping z=5 (deg 3 > cap 2) leaves only the z=6 pair
    val capped = GraphOps.resourceAllocationInt(edges, "src", "dst",
        maxNeighborDeg = 2L)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, n, ra) => (a, b) -> (n, ra) }.toMap
    assert(capped == Map((1L, 2L) -> (1L, 500000L)), s"capped $capped")
    intercept[IllegalArgumentException] {
      GraphOps.resourceAllocationInt(edges, "src", "dst", maxNeighborDeg = 0L)
    }
    spark.catalog.clearCache()
  }

  test("hitsInt: matches a driver-side integer mirror; normalized sums bounded; partition-invariant") {
    // two hubs (1 weak, 2 strong), shared authorities 3/4, a back-edge
    // 5→1, a pure authority (4: no out-edges), a minor hub 6
    val edgeList = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (2L, 5L),
      (5L, 1L), (6L, 3L))
    // the op's recurrence in driver Longs (floor division on
    // non-negatives == Long truncation)
    def mirror(iters: Int): Map[Long, (Long, Long)] = {
      val nodes = edgeList.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      var h = nodes.map(_ -> (1000000000L / nodes.size)).toMap
      var a = Map.empty[Long, Long]
      for (_ <- 1 to iters) {
        val araw = nodes.map(v =>
          v -> edgeList.filter(_._2 == v).map(e => h(e._1)).sum).toMap
        val at = araw.values.sum
        a = araw.map { case (k, x) => k -> x * 1000000000L / at }
        val hraw = nodes.map(u =>
          u -> edgeList.filter(_._1 == u).map(e => a(e._2)).sum).toMap
        val ht = hraw.values.sum
        h = hraw.map { case (k, x) => k -> x * 1000000000L / ht }
      }
      nodes.map(v => v -> (h(v), a(v))).toMap
    }
    val got = GraphOps.hitsInt(edgeList.toDF("src", "dst"), "src", "dst",
        iters = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (id, hb, au) => id -> (hb, au) }.toMap
    assert(got == mirror(2), s"got $got\nexp ${mirror(2)}")
    // sum-normalization: each column totals ≤ 1e9 (floor loss only)
    assert(got.values.map(_._1).sum <= 1000000000L)
    assert(got.values.map(_._2).sum <= 1000000000L)
    assert(got.values.map(_._1).sum > 999999000L) // and loses < 1000 ppb
    // hub/authority separation: 2 out-hubs 1; 3 is the top authority
    assert(got(2L)._1 > got(1L)._1, s"hub order: $got")
    assert(got(3L)._2 > got(4L)._2, s"auth order: $got")
    assert(got(4L)._1 == 0L, "a node with no out-edges is a zero hub")
    // integer arithmetic ⇒ identical under any partitioning
    val again = GraphOps.hitsInt(edgeList.toDF("src", "dst").repartition(7),
        "src", "dst", iters = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (id, hb, au) => id -> (hb, au) }.toMap
    assert(again == got)
    spark.catalog.clearCache()
  }

  // Two structurally distinct communities with no cross edges: a
  // 4-clique (both directions) and a directed 5-cycle widened with
  // reverse edges — walks never cross, so positive PMI mass is strictly
  // within-community and the embedding must reflect it.
  private def twoClusterEdges: Seq[(Long, Long)] = {
    val a = for (i <- 0L to 3L; j <- 0L to 3L if i != j) yield (i, j)
    val ring = (0 until 5).map(i => (10L + i, 10L + (i + 1) % 5))
    (a ++ ring ++ ring.map(_.swap)).toSeq
  }

  private def twoClusterPairs = GraphOps.skipGramPairs(
    GraphOps.hashWalks(twoClusterEdges.toDF("src", "dst"), "src", "dst",
      steps = 3, walksPerNode = 4), window = 2)

  test("ppmiEmbedInt: deterministic, full grid, values in micro range") {
    val e1 = GraphOps.ppmiEmbedInt(twoClusterPairs, "center", "context", "n",
        dims = 8, iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()
    val e2 = GraphOps.ppmiEmbedInt(twoClusterPairs.repartition(7),
        "center", "context", "n", dims = 8, iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(e1 == e2, "integer embedding must be partition-invariant")
    assert(e1.size == 9 * 8, s"9 nodes x 8 dims, got ${e1.size}")
    assert(e1.forall { case (_, _, v) => v >= 0L && v <= 1000000L },
      "max-normalized values live in [0, 1e6]")
    // every dim is max-normalized: some node hits exactly 1e6 per dim
    val maxPerDim = e1.groupBy(_._2).map { case (j, rows) => j -> rows.map(_._3).max }
    assert(maxPerDim.values.forall(_ == 1000000L), s"dim maxima: $maxPerDim")
    spark.catalog.clearCache()
  }

  test("ppmiEmbedInt: fused lazy rounds release every interior block on ScaleOps.release") {
    // r15 optimization restructured the trainer's internals (lazy
    // checkpoints materialized by the maxima collect, sparse inter-round
    // state, the pp guard folded into round 1): the lifecycle contract —
    // materialize the returned frame, then release() drains every
    // interior cache/leaf — must survive the new shape, or long-lived
    // sessions leak one nodes/partials leaf pair per call
    graft.ops.ScaleOps.release()
    val resident0 = spark.sparkContext.getPersistentRDDs.keySet
    val out = GraphOps.ppmiEmbedInt(twoClusterPairs, "center", "context", "n",
      dims = 4, iters = 2)
    assert(out.count() == 9 * 4, "dense output: every node x dim row present")
    graft.ops.ScaleOps.release()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- resident0
    assert(leaked.isEmpty, s"interior blocks leaked past release(): $leaked")
    // the empty-pp guard still fires (relocated into round 1): a single
    // pair sits exactly at independence (n·N = nc·nx), so no positive
    // lift survives and the trainer must refuse during construction
    import spark.implicits._
    val flat = Seq((1L, 2L, 5L)).toDF("center", "context", "n")
    val ex = intercept[IllegalArgumentException](
      GraphOps.ppmiEmbedInt(flat, "center", "context", "n", dims = 2, iters = 1))
    assert(ex.getMessage.contains("above independence"), ex.getMessage)
    // the guard path must leak nothing either: rawCk is untracked when
    // the round-0 guard fires, so the failure path releases it itself
    // (r15 advice) and release() drains the tracked pairs/pp caches
    graft.ops.ScaleOps.release()
    val leakedGuard = spark.sparkContext.getPersistentRDDs.keySet -- resident0
    assert(leakedGuard.isEmpty,
      s"empty-pp guard path leaked blocks past release(): $leakedGuard")
  }

  test("ppmiEmbedInt -> embedVectors -> IvfIndex: nearest neighbors follow edge locality") {
    val vecs = GraphOps.embedVectors(
      GraphOps.ppmiEmbedInt(twoClusterPairs, "center", "context", "n",
        dims = 8, iters = 2)).cache()
    val collected = vecs.as[(Long, Array[Float])].collect().toMap
    assert(collected.size == 9 && collected.values.forall(_.length == 8))
    // cosine locality: average within-community similarity must beat
    // average cross-community similarity (the embedding's entire point)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val ids = collected.keys.toSeq.sorted
    val sims = for (i <- ids; j <- ids if i < j)
      yield (i, j, cos(collected(i), collected(j)))
    val (within, cross) = sims.partition { case (i, j, _) => (i < 10L) == (j < 10L) }
    val wAvg = within.map(_._3).sum / within.size
    val cAvg = cross.map(_._3).sum / cross.size
    assert(wAvg > cAvg,
      f"within-community cosine $wAvg%.4f must beat cross $cAvg%.4f")
    // the vectors ingest into the ANN family unchanged: an exact-probe
    // IVF search over ALL nodes — aggregate neighborhood purity must
    // beat the blind baseline (A nodes: 3 of 8 candidates are
    // same-community, ring nodes: 4 of 8 → blind ≈ 0.44 of 27 ≈ 12)
    val idx = graft.functions.VectorOps.IvfIndex.build(vecs, "id", "embedding",
      c = 2)
    val near = idx.search(vecs, "id", "embedding",
        k = 3, nprobe = 2) // each query's own id is excluded by search
      .as[(Long, Long, Double)].collect()
    assert(near.length == 9 * 3, s"expected 27 neighbor rows, got ${near.length}")
    val same = near.count { case (q, id, _) => (q < 10L) == (id < 10L) }
    assert(same > 16,
      s"same-community neighbors $same/27 must beat the blind baseline ~12")
    // q261's exactness rung: at nprobe = c the probed search IS the
    // exact cosine top-k (the declared query's half-probe recall is
    // measured in tools/RecallAudit against this)
    val brute = graft.functions.VectorOps.annBruteForce(
        vecs, "id", "embedding", vecs, "id", "embedding", k = 3)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val fullProbe = near.map { case (q, id, _) => (q, id) }.toSet
    assert(fullProbe == brute,
      "full-probe IVF over the PPMI vectors must equal brute-force cosine top-3")
    // q266's machinery rung: full-probe MIPS search equals the exact
    // dot top-3 (driver-recomputed over the same collected vectors) —
    // scores are RAW dots because the query's augmented coordinate is 0
    val dotBrute = (for (q <- ids) yield {
      val qv = collected(q).map(_.toDouble)
      ids.filter(_ != q)
        .map(i => (i, collected(i).map(_.toDouble).zip(qv)
          .map { case (x, y) => x * y }.sum))
        .sortBy { case (i, d) => (-d, i) }.take(3).map { case (i, _) => (q, i) }
    }).flatten.toSet
    val mips = graft.functions.VectorOps.MipsIndex.build(
      vecs, "id", "embedding", c = 2)
    val dotProbe = mips.searchDot(vecs, "id", "embedding", k = 3, nprobe = 2)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(dotProbe == dotBrute,
      "full-probe MIPS search must equal the exact dot top-3")
    mips.close()
    idx.close()
    vecs.unpersist(blocking = false)
    graft.ops.ScaleOps.release()
    spark.catalog.clearCache()
  }
}
