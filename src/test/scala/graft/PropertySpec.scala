package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.MapStore

/** Property tests for the store facade and upsert/dedup ops (SURVEY §5:
  * generalizes the reference's fixed edge-case unit tests —
  * `map_test.go:25-114`). Raw ScalaCheck generators sampled under fixed
  * seeds (no scalatestplus bridge in the offline dep set).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  val kvs: Gen[List[(String, String)]] =
    Gen.listOf(Gen.zip(Gen.alphaNumStr.map(_.take(8)), Gen.alphaNumStr.map(_.take(8))))

  test("MapStore: put sequence ≡ last-write-wins map; getAll = pointwise get") {
    samples(kvs, 50).foreach { entries =>
      val s = new MapStore[String]
      entries.foreach { case (k, v) => s.put(k, v) }
      val expected = entries.foldLeft(Map.empty[String, String]) { case (m, (k, v)) => m + (k -> v) }
      expected.foreach { case (k, v) => assert(s.get(k).contains(v)) }
      val keys = entries.map(_._1) ++ List("definitely-missing-key")
      assert(s.getAll(keys) == expected.filter(kv => keys.contains(kv._1)))
    }
  }

  test("MapStore: delete is precise and idempotent") {
    samples(kvs, 50).foreach { entries =>
      val s = new MapStore[String]
      s.putAll(entries.toMap)
      entries.headOption.foreach { case (k, _) =>
        s.delete(k); s.delete(k)
        assert(s.get(k).isEmpty)
        (entries.toMap - k).foreach { case (k2, v2) => assert(s.get(k2).contains(v2)) }
      }
    }
  }

  test("cdcApply equals a driver-side last-writer-wins fold on random op logs") {
    // keys 0..5, distinct seqs (shuffled 0..n), ops I/U/D, payload tag
    val opsGen: Gen[List[(Long, String, Long, String)]] = for {
      n <- Gen.choose(1, 40)
      keys <- Gen.listOfN(n, Gen.choose(0L, 5L))
      kinds <- Gen.listOfN(n, Gen.oneOf("I", "U", "D"))
    } yield keys.zip(kinds).zipWithIndex.map { case ((k, o), i) =>
      (k, s"p$i", i.toLong, o)
    }
    val snapRows = Seq((0L, "s0", -1L), (2L, "s2", -1L), (9L, "s9", -1L))
    samples(opsGen, 30).foreach { ops =>
      val snapshot = snapRows.toDF("k", "payload", "seq")
      val opsDf = ops.toDF("k", "payload", "seq", "op")
      val got = graft.ops.RelOps.cdcApply(snapshot, opsDf, Seq("k"), "op",
        Seq(org.apache.spark.sql.functions.col("seq")))
        .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
      // driver fold: newest op per key decides; untouched snapshot stays
      val newest = ops.groupBy(_._1).map { case (k, os) => k -> os.maxBy(_._3) }
      val expected = snapRows.map(r => r._1 -> r._2).toMap
        .removedAll(newest.keys) ++
        newest.collect { case (k, (_, p, _, o)) if o != "D" => k -> p }
      assert(got == expected, s"ops=$ops got=$got expected=$expected")
    }
  }

  test("scd2Lookup equals a brute-force interval scan on random event logs") {
    import org.apache.spark.sql.functions.col
    val gen: Gen[(List[(Long, Long, Long, String)], List[(Long, Long, Long)])] = for {
      n <- Gen.choose(1, 40)
      users <- Gen.listOfN(n, Gen.choose(1L, 4L))
      ts <- Gen.listOfN(n, Gen.choose(0L, 30L)) // dense → equal-ts changes occur
      types <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
      m <- Gen.choose(1, 25)
      pu <- Gen.listOfN(m, Gen.choose(1L, 4L))
      pt <- Gen.listOfN(m, Gen.choose(-2L, 32L)) // probes before/inside/past
    } yield (
      users.lazyZip(ts).lazyZip(types).toList.zipWithIndex.map {
        case ((u, t, ty), i) => (u, t, i.toLong, ty) },
      pu.lazyZip(pt).toList.zipWithIndex.map {
        case ((u, p), i) => (u, p, (1000 + i).toLong) })
    samples(gen, 25).foreach { case (events, probes) =>
      val evDf = events.toDF("user_id", "ts", "event_id", "event_type")
      val dim = graft.ops.RelOps.scd2(evDf, "user_id", "ts", "event_id", "event_type")
      val prDf = probes.toDF("user_id", "p", "pid")
      val got = graft.ops.RelOps.scd2Lookup(dim, "user_id", "event_id",
          "event_type", prDf, col("user_id"), col("pid"), col("p"))
        .collect().map(r => r.getLong(1) -> Option(r.getString(2))).toMap
      // brute force: change rows under (ts, event_id) order; the interval
      // [from, next-from) containing p wins (open interval: to = None)
      val intervals = events.groupBy(_._1).view.mapValues { es =>
        val changes = es.sortBy(e => (e._2, e._3))
          .foldLeft(List.empty[(Long, String)]) { (acc, e) =>
            if (acc.nonEmpty && acc.head._2 == e._4) acc else (e._2, e._4) :: acc
          }.reverse
        changes.zip(changes.drop(1).map(c => Option(c._1)) :+ None)
      }.toMap
      val expected = probes.map { case (u, p, pid) =>
        pid -> intervals.getOrElse(u, Nil).collectFirst {
          case ((from, ty), to) if from <= p && to.forall(_ > p) => ty
        }
      }.toMap
      assert(got == expected, s"events=$events probes=$probes got=$got")
    }
  }

  val keyedRows: Gen[List[(Int, Int, String)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 10), Gen.alphaNumStr.map(_.take(4))))

  test("latestByKey picks exactly the max (orderCols) row per key (vs reference impl)") {
    samples(keyedRows, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("k", "ts", "v")
      val got = graft.ops.RelOps.latestByKey(df,
          Seq(org.apache.spark.sql.functions.col("k")),
          Seq(org.apache.spark.sql.functions.col("ts"),
            org.apache.spark.sql.functions.col("v")))
        .as[(Int, Int, String)].collect().toSet
      val want = rows.groupBy(_._1).values.map(_.maxBy(r => (r._2, r._3))).toSet
      assert(got == want)
    }
  }

  test("dedupExact: one survivor per text, minimal id, idempotent") {
    val docsGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 100000L), Gen.oneOf("aa bb", "cc dd", "ee ff", "gg hh")))
    samples(docsGen, 6).map(d => d.distinctBy(_._1)).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = graft.dedup.Dedup.dedupExact(df, "text", "doc_id")
        .as[(Long, String)].collect().toSeq
      val want = docs.groupBy(_._2).values.map(_.minBy(_._1)).toSet
      assert(out.toSet == want)
      val again = graft.dedup.Dedup.dedupExact(out.toDF("doc_id", "text"), "text", "doc_id")
        .as[(Long, String)].collect().toSet
      assert(again == out.toSet)
    }
  }

  private val hashArrays: Gen[List[Long]] =
    Gen.listOfN(30, Gen.choose(Long.MinValue, Long.MaxValue))

  test("signature kernels are order-invariant (set/multiset semantics)") {
    import graft.functions.HashKernels
    val rows = samples(hashArrays, 20).filter(_.nonEmpty)
      .map(l => (l, new scala.util.Random(l.hashCode.toLong).shuffle(l)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        (HashKernels.minhashSignature(org.apache.spark.sql.functions.col("a"), 16) =!=
          HashKernels.minhashSignature(org.apache.spark.sql.functions.col("b"), 16)).as("mh"),
        (HashKernels.simhash(org.apache.spark.sql.functions.col("a")) =!=
          HashKernels.simhash(org.apache.spark.sql.functions.col("b"))).as("sh"))
      .filter(org.apache.spark.sql.functions.col("mh") ||
        org.apache.spark.sql.functions.col("sh"))
      .count()
    assert(bad == 0L, "permuting the input must not change minhash or simhash")
  }

  test("chunkTokens reproduces a reference slicer for arbitrary texts and configs") {
    val texts: Gen[List[String]] = Gen.listOfN(15,
      Gen.listOf(Gen.oneOf("ab", "c", "ddd", "e", "")).map(_.mkString(" ")))
    val cfg: Gen[(Int, Int)] = for {
      sz <- Gen.choose(1, 6); ov <- Gen.choose(0, sz - 1)
    } yield (sz, ov)
    samples(Gen.zip(texts, cfg), 10).foreach { case (ts, (sz, ov)) =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.ops.CorpusOps.chunkTokens(df, "doc_id", "text", sz, ov)
        .select("id", "chunk_idx", "start_tok", "n_tokens", "chunk_text")
        .as[(Long, Long, Long, Long, String)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toList).toMap
      val step = sz - ov
      ts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
        val want = (0 until toks.length by step).zipWithIndex.map { case (st, ci) =>
          val chunk = toks.slice(st, st + sz)
          (i.toLong, ci.toLong, st.toLong, chunk.length.toLong, chunk.mkString(" "))
        }.toList
        assert(got.getOrElse(i.toLong, Nil) == want,
          s"doc '$t' size=$sz overlap=$ov")
      }
    }
  }

  test("connectedComponents equals a driver-side union-find on random graphs") {
    val edges: Gen[List[(Long, Long)]] =
      Gen.listOfN(25, Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    samples(edges, 6).filter(_.nonEmpty).foreach { es =>
      val got = graft.dedup.Dedup.connectedComponents(es.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      // reference: union-find keeping the min id as every root
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = es.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
      assert(got == want)
    }
  }

  test("SortedIntersectCount equals the naive set intersection for arbitrary sets") {
    import graft.functions.HashKernels
    val pairs = samples(Gen.zip(hashArrays, hashArrays), 30)
      .map { case (a, b) => (a.distinct.sorted, b.distinct.sorted) }
    val df = pairs.toDF("a", "b")
    val got = df.select(HashKernels.sortedIntersectCount(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")))
      .as[Long].collect().toSeq
    val want = pairs.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong }
    assert(got == want)
  }

  test("CM sketch: estimate never under-counts on generated key streams") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val streams: Gen[List[Long]] =
      Gen.listOfN(200, Gen.chooseNum(0L, 50L)) // small key space forces collisions
    samples(streams, 10).filter(_.nonEmpty).foreach { ks =>
      val df = ks.toDF("k")
      val sketch = graft.ops.SketchOps.cmsBuild(df, "k", depth = 3, width = 8)
      val exact = df.groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
      val rows = graft.ops.SketchOps.cmsEstimate(sketch, exact, "k", depth = 3, width = 8)
        .select(col("k"), col("n_exact"), col("n_est"))
        .as[(Long, Long, Long)].collect()
      rows.foreach { case (k, ex, est) =>
        assert(est >= ex, s"under-count for key $k: est $est < exact $ex")
        assert(est <= ks.size, s"estimate $est exceeds stream length ${ks.size}")
      }
    }
  }

  test("histSketch quantiles sandwich the exact discrete percentile for generated data") {
    val data: Gen[List[Long]] = Gen.listOfN(60, Gen.chooseNum(0L, 500L))
    val widths = Seq(1L, 7L, 32L)
    samples(data, 8).filter(_.nonEmpty).zipWithIndex.foreach { case (xs, i) =>
      val width = widths(i % widths.length)
      val df = xs.map(x => ("g", x)).toDF("grp", "x")
      val sk = graft.ops.SketchOps.histSketch(df, "grp", "x", width)
      val got = graft.ops.SketchOps.histQuantiles(sk, width, Seq(2500, 5000, 9900))
        .as[(String, Long, Long, Long, Long)].head()
      val sorted = xs.sorted.toIndexedSeq
      def exact(p: Int) = sorted(((p.toLong * xs.size + 9999) / 10000).toInt - 1)
      for ((q, p) <- Seq(got._3 -> 2500, got._4 -> 5000, got._5 -> 9900)) {
        assert(q <= exact(p) && exact(p) < q + width,
          s"width=$width p=$p: sketch $q vs exact ${exact(p)} (xs=$xs)")
      }
      // width 1 degenerates to the exact answer
      if (width == 1L)
        assert(Seq(got._3, got._4, got._5) == Seq(exact(2500), exact(5000), exact(9900)))
    }
  }

  test("winsorizedStats: fences bound the clamped sum; idempotent on pre-clamped data") {
    val data: Gen[List[Long]] = Gen.listOfN(30, Gen.chooseNum(0L, 100000L))
    samples(data, 8).filter(_.size >= 3).foreach { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
        .toDF("grp", "id", "x")
      val r = graft.ops.CorpusOps.winsorizedStats(df, "grp", "x", pTailBp = 1000)
        .as[(String, Long, Long, Long, Long, Double)].head()
      val (_, n, lo, hi, sumW, meanW) = r
      assert(n == xs.size && lo <= hi)
      assert(sumW >= n * lo && sumW <= n * hi, s"clamped sum out of fence bounds: $r")
      assert(meanW >= lo.toDouble && meanW <= hi.toDouble)
      // clamping an already-clamped series is a no-op
      val clamped = xs.map(x => math.max(lo, math.min(hi, x)))
      assert(sumW == clamped.sum, s"clamped sum mismatch: $r vs ${clamped.sum}")
    }
  }

  test("weightedMedianMadDistributed equals the brute halving rule on random weighted multisets") {
    // the executor-side MAD bracket fold must reproduce the per-row
    // halving rule on adversarial shapes: dense ties, zero weights
    // (legal candidate values that never advance the cumulative),
    // single-row groups, all-zero-weight groups, medians ON bucket
    // bounds (dLo = dHi radii)
    import org.apache.spark.sql.functions.col
    val gen: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(1, 60)
      ks <- Gen.listOfN(n, Gen.choose(0L, 2L))
      vs <- Gen.listOfN(n, Gen.choose(0L, 8L))
      ws <- Gen.listOfN(n, Gen.choose(0L, 3L))
    } yield ks.lazyZip(vs).lazyZip(ws).toList
    def bruteMedian(rs: Seq[(Long, Long, Long, Long)]): Long = {
      val sorted = rs.sortBy { case (_, v, _, tie) => (v, tie) }
      val tot = sorted.map(_._3).sum
      var cum = 0L
      sorted.collectFirst {
        case (_, v, w, _) if { cum += w; 2L * cum >= tot } => v }.get
    }
    samples(gen, 12).foreach { rows0 =>
      val rows = rows0.zipWithIndex.map { case ((k, v, w), i) =>
        (k, v, w, i.toLong) }
      val got = graft.ops.RelOps.weightedMedianMadDistributed(
          rows.toDF("k", "v", "w", "tie").repartition(5), Seq("k"),
          col("v"), col("w"), Seq(col("tie")))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      graft.ops.ScaleOps.release()
      val expected = rows.groupBy(_._1).map { case (k, rs) =>
        val m = bruteMedian(rs)
        k -> ((m, bruteMedian(rs.map { case (kk, v, w, t) =>
          (kk, math.abs(v - m), w, t) })))
      }
      assert(got == expected, s"rows=$rows: $got vs $expected")
    }
  }

  test("sigmaClip agrees with double-math |x-mean| > kσ on generated data away from ties") {
    import org.apache.spark.sql.functions.col
    val data: Gen[List[Long]] = Gen.listOfN(40, Gen.chooseNum(0L, 10000L))
    samples(data, 10).filter(_.size > 1).foreach { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
      val got = graft.ops.CorpusOps.sigmaClip(df, "id", "x", k = 2)
        .select(col("id"), col("is_outlier")).as[(Long, Boolean)].collect().toMap
      val n = xs.size.toDouble
      val mean = xs.sum / n
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / n
      xs.zipWithIndex.foreach { case (x, i) =>
        val lhs = (x - mean) * (x - mean)
        val rhs = 4 * variance
        // only check away from the float boundary — the integer form is the
        // exact tie-breaker there and double math is not
        if (math.abs(lhs - rhs) > 1e-6 * math.max(1.0, rhs))
          assert(got(i.toLong) == (lhs > rhs),
            s"x=$x mean=$mean var=$variance: got ${got(i.toLong)}")
      }
    }
  }

  test("decayAttribution equals a driver-side sessionize+ticket fold on random event logs") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val M = 60000000L // one minute in micros
    // clustered timestamps so keys produce BOTH multi-event sessions
    // and gap-separated ones
    val eventGen = for {
      uid <- Gen.choose(1L, 5L)
      base <- Gen.choose(0L, 5L)
      off <- Gen.choose(0L, 45L)
      et <- Gen.oneOf("view", "click", "other", "purchase")
      cents <- Gen.choose(0L, 800L)
    } yield (uid, base * 120 * M + off * M, et, cents / 100.0)
    def mirror(evs: Seq[(Long, Long, Long, String, Double)],
               gapMin: Int, hlMin: Int): Map[String, (Long, Long)] = {
      val gapUs = gapMin * M; val hlUs = hlMin * M
      val acc = collection.mutable.Map[String, (Long, Long)]()
        .withDefaultValue((0L, 0L))
      for ((_, evs0) <- evs.groupBy(_._1)) {
        val sorted = evs0.sortBy(e => (e._2, e._3))
        val sessions = collection.mutable.ArrayBuffer(
          collection.mutable.ArrayBuffer.empty[(Long, Long, String, Double)])
        var last = Long.MinValue
        for (e <- sorted) {
          if (last != Long.MinValue && e._2 - last >= gapUs)
            sessions += collection.mutable.ArrayBuffer.empty
          sessions.last += ((e._2, e._3, e._4, e._5))
          last = e._2
        }
        for (s <- sessions if s.nonEmpty) {
          val conv = s.filter(_._3 == "purchase")
          val cvu = conv.map(e => BigDecimal(e._4)
            .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
            .*(BigDecimal(1000000L)).toLongExact).sum
          val ntouch = s.count(_._3 != "purchase")
          if (cvu > 0 && ntouch > 0) {
            val anchor = conv.map(_._1).max
            val tws = s.filter(e => e._3 != "purchase" && e._1 <= anchor)
              .map(e => (e._3,
                1000000L / (1L << math.min((anchor - e._1) / hlUs, 20L).toInt)))
            val sw = tws.map(_._2).sum
            if (sw > 0) for ((ch, w) <- tws) {
              val (nt, cm) = acc(ch)
              acc(ch) = (nt + 1, cm + cvu * w / sw)
            }
          }
        }
      }
      acc.toMap
    }
    for (seedBase <- Seq(0, 1000, 2000)) {
      val raw = (0 until 400).flatMap(i =>
        eventGen.apply(Gen.Parameters.default, Seed((seedBase + i).toLong)))
      val evs = raw.zipWithIndex.map { case ((u, ts, et, v), i) =>
        (u, ts, i.toLong, et, v) }
      val df = evs.toDF("user_id", "tsu", "event_id", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("tsu"))).drop("tsu")
      val got = graft.ops.RelOps.decayAttribution(df, "user_id", "ts",
          "event_id", "event_type", "value", convType = "purchase")
        .select("channel", "n_touches", "credit_micro")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == mirror(evs, 30, 10), s"seed $seedBase: $got")
      spark.catalog.clearCache()
    }
  }
}
