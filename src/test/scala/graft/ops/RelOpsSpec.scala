package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class RelOpsSpec extends SparkSpec {
  import spark.implicits._

  test("explodeWords splits on single space and drops empties") {
    val df = Seq("a b  c", "", "d").toDF("t")
    val words = RelOps.explodeWords(df, "t").as[String].collect().sorted
    assert(words.toSeq == Seq("a", "b", "c", "d"))
  }

  test("wordCount counts per word") {
    val df = Seq("x y", "y z", "y").toDF("t")
    val m = RelOps.wordCount(df, "t").as[(String, Long)].collect().toMap
    assert(m == Map("x" -> 1L, "y" -> 3L, "z" -> 1L))
  }

  test("latestByKey keeps newest row per key with deterministic tie-break") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only"), (3, 7, "a"), (3, 7, "b"))
      .toDF("k", "ts", "v")
    val got = RelOps.latestByKey(df, Seq($"k"), Seq($"ts", $"v"))
      .as[(Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, 20, "new"), (2, 5, "only"), (3, 7, "b")))
  }

  test("topK is deterministic under score ties") {
    val df = Seq((1, 5.0), (2, 5.0), (3, 9.0), (4, 1.0)).toDF("id", "score")
    val got = RelOps.topK(df, $"score", $"id", 2).as[(Int, Double)].collect().toSeq
    assert(got == Seq((3, 9.0), (1, 5.0)))
  }

  test("semi/anti joins partition the left side") {
    val t = Tables(spark, sfDir)
    val withO = RelOps.existsIn(t.customer, t.orders.withColumnRenamed("o_custkey", "c_custkey"), Seq("c_custkey")).count()
    val without = RelOps.notExistsIn(t.customer, t.orders.withColumnRenamed("o_custkey", "c_custkey"), Seq("c_custkey")).count()
    assert(withO + without == t.customer.count())
    assert(withO > 0)
  }

  test("asOfJoin picks the latest right row at-or-before leftTs; null-extends no-match") {
    val left = Seq((1L, "k1", 100L), (2L, "k1", 5L), (3L, "k2", 50L)).toDF("id", "k", "ts")
    val right = Seq(("k1", 10L, "r10"), ("k1", 90L, "r90"), ("k1", 200L, "r200"),
      ("k2", 60L, "r60")).toDF("rk", "rts", "rv")
    val got = RelOps.asOfJoin(left, right, Seq("k"), Seq("rk"),
        "id", "ts", "rts", "rv")
      .select("id", "rv").as[(Long, Option[String])].collect().toMap
    assert(got == Map(
      1L -> Some("r90"),  // latest ≤ 100
      2L -> None,         // only later matches exist → null-extended
      3L -> None))        // k2's only row is at 60 > 50
  }

  test("asOfJoin lookback bounds the match window; outside-horizon rows null-extend") {
    val left = Seq((1L, "k1", 100L), (2L, "k1", 5L), (3L, "k2", 50L)).toDF("id", "k", "ts")
    val right = Seq(("k1", 10L, "r10"), ("k1", 90L, "r90"), ("k1", 200L, "r200"),
      ("k2", 60L, "r60")).toDF("rk", "rts", "rv")
    // horizon 15: id=1 (ts=100) sees only rts ∈ [85, 100] → r90 still wins;
    // with horizon 5 the same row's only candidate r90 falls outside → null
    val tight = RelOps.asOfJoin(left, right, Seq("k"), Seq("rk"),
        "id", "ts", "rts", "rv", lookback = Some(lit(5L)))
      .select("id", "rv").as[(Long, Option[String])].collect().toMap
    assert(tight == Map(1L -> None, 2L -> None, 3L -> None))
    val wide = RelOps.asOfJoin(left, right, Seq("k"), Seq("rk"),
        "id", "ts", "rts", "rv", lookback = Some(lit(15L)))
      .select("id", "rv").as[(Long, Option[String])].collect().toMap
    assert(wide == Map(1L -> Some("r90"), 2L -> None, 3L -> None))
  }

  test("bounded asOfJoin with a covering horizon equals the unbounded form") {
    val t = graft.core.Tables(spark, sfDir)
    def run(lb: Option[org.apache.spark.sql.Column]) = RelOps.asOfJoin(
        t.events.select("event_id", "user_id", "ts"),
        t.orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        Seq("user_id"), Seq("o_custkey"),
        "event_id", "ts", "o_orderdate", "o_orderkey", lookback = lb)
      .select("event_id", "o_orderkey")
    val unbounded = run(None)
    val covering = run(Some(expr("INTERVAL 36500 DAYS"))) // 100y ⊇ all history
    assert(unbounded.exceptAll(covering).count() == 0
      && covering.exceptAll(unbounded).count() == 0)
    // and a horizon that predates part of the order history must null-extend more
    val bounded = run(Some(expr("INTERVAL 9000 DAYS")))
    val nullsUnbounded = unbounded.filter(col("o_orderkey").isNull).count()
    val nullsBounded = bounded.filter(col("o_orderkey").isNull).count()
    assert(nullsBounded > nullsUnbounded)
    assert(bounded.count() == unbounded.count()) // still one row per event
  }

  test("intervalJoin matches brute-force overlap, each pair exactly once") {
    // spans chosen to cross bucket boundaries (width 10): a long interval
    // touching 3 buckets, touching-endpoint pairs, disjoint pairs, and
    // negative coordinates (floorDiv must floor, not truncate)
    val l = Seq((1L, 0L, 25L), (2L, 8L, 12L), (3L, 40L, 41L), (4L, -15L, -5L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 25L, 30L), (11L, 9L, 9L), (12L, 100L, 110L), (13L, -7L, 3L))
      .toDF("rid", "rs", "re")
    val got = RelOps.intervalJoin(l, r, "ls", "le", "rs", "re", bucketWidth = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    val brute = l.crossJoin(r)
      .filter($"ls" <= $"re" && $"rs" <= $"le")
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got == brute) // == catches both misses AND duplicate emissions
    assert(got.contains((1L, 10L)) && got.contains((4L, 13L)))
  }

  test("intervalJoin key gating restricts pairs to matching keys") {
    val l = Seq(("a", 1L, 0L, 10L), ("b", 2L, 0L, 10L)).toDF("kl", "lid", "ls", "le")
    val r = Seq(("a", 10L, 5L, 15L), ("b", 11L, 50L, 60L)).toDF("kr", "rid", "rs", "re")
    val got = RelOps.intervalJoin(l, r, "ls", "le", "rs", "re",
        bucketWidth = 4L, keys = Seq("kl" -> "kr"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L))) // b-b pair is disjoint; a-b never joined
  }

  test("scd2 collapses consecutive duplicates into validity intervals") {
    val e = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
      (2L, 5L, "x"),
      (3L, 7L, "p"), (3L, 7L, "q") // same ts: event_id breaks the tie
    ).toDF("uid", "ts", "attr")
    val got = RelOps.scd2(e.withColumn("eid", $"ts"), "uid", "ts", "eid", "attr")
      .select("uid", "attr", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, "a", 10L, Some(30L)), // 20L collapsed into the first interval
      (1L, "b", 30L, Some(40L)),
      (1L, "a", 40L, None),      // a-again after b is a NEW interval
      (2L, "x", 5L, None),
      (3L, "p", 7L, Some(7L)), (3L, "q", 7L, None)))
  }

  test("gapFillDaily: zero rows on gap days, per-key spans only") {
    val e = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 09:00:00"),
      (1L, "2024-01-04 10:00:00"), // gap: Jan 2-3 filled with 0
      (2L, "2024-02-10 12:00:00")  // single day: span of one, no fill
    ).toDF("uid", "s").withColumn("ts", to_timestamp($"s"))
    val got = RelOps.gapFillDaily(e, "uid", "ts")
      .select(col("k"), col("d").cast("string"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 2L), (1L, "2024-01-02", 0L),
      (1L, "2024-01-03", 0L), (1L, "2024-01-04", 1L),
      (2L, "2024-02-10", 1L)))
  }

  test("rollingDaily: calendar-true trailing window over the gap-filled series") {
    val e = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 09:00:00"),
      (1L, "2024-01-03 10:00:00"), (1L, "2024-01-05 11:00:00")
    ).toDF("uid", "s").withColumn("ts", to_timestamp($"s"))
    val got = RelOps.rollingDaily(e, "uid", "ts", windowDays = 3)
      .select(col("d").cast("string"), col("n"), col("n_roll"))
      .as[(String, Long, Long)].collect()
      .map { case (d, n, r) => d -> ((n, r)) }.toMap
    assert(got == Map(
      "2024-01-01" -> ((2L, 2L)),       // window covers Jan 1 only
      "2024-01-02" -> ((0L, 2L)),       // Jan 1-2
      "2024-01-03" -> ((1L, 3L)),       // Jan 1-3
      "2024-01-04" -> ((0L, 1L)),       // Jan 2-4 (Jan 1 rolls off)
      "2024-01-05" -> ((1L, 2L))))      // Jan 3-5
  }

  test("basketPairs: unordered pair counts, repeats collapsed, item frequencies") {
    val b = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 20L), // repeated item in a basket counts once
      (3L, 30L)                        // singleton basket: no pairs
    ).toDF("basket", "item")
    val got = RelOps.basketPairs(b, "basket", "item")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, 20L, 2L, 2L, 2L),   // together in baskets 1 and 2
      (10L, 30L, 1L, 2L, 2L),
      (20L, 30L, 1L, 2L, 2L)))
  }

  test("auditChecks: crafted violations counted; clean checks report zero") {
    val d = Seq(
      (1L, 1L, 5L, 0.1),
      (1L, 2L, -3L, 0.2),   // nonpositive qty
      (2L, 1L, 4L, 1.5),    // discount out of range
      (2L, 1L, 7L, 0.0)     // duplicate (orderkey, line) identity
    ).toDF("ok", "line", "qty", "disc")
    val got = RelOps.auditChecks(d,
        Seq("bad_qty" -> (col("qty") <= 0),
          "bad_disc" -> (col("disc") < 0 || col("disc") > 1)),
        dupKeys = Seq("ok", "line"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("bad_qty" -> 1L, "bad_disc" -> 1L, "duplicate_key" -> 1L))
  }

  test("cohortRetention: day cohorts, distinct per cell, gaps preserved") {
    val e = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 21:00:00"), // same day twice: 1 cell row
      (1L, "2024-01-03 09:00:00"),                              // day 2 skipped
      (2L, "2024-01-01 10:00:00"), (2L, "2024-01-02 10:00:00"),
      (3L, "2024-01-02 23:59:59")
    ).toDF("uid", "s").withColumn("ts", to_timestamp($"s"))
    val got = RelOps.cohortRetention(e, "uid", "ts")
      .select(col("cohort").cast("string"), col("days_since"), col("users"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L), // u1+u2 on their first day
      ("2024-01-01", 1L, 1L), // only u2 returns next day
      ("2024-01-01", 2L, 1L), // u1 returns on day 2 (gap at day 1)
      ("2024-01-02", 0L, 1L))) // u3's own cohort
  }

  test("funnel: ordered steps, time bound enforced, monotone drop-off") {
    val e = Seq(
      // u1 completes all three in order within bounds
      (1L, "view", 100L), (1L, "click", 150L), (1L, "purchase", 200L),
      // u2 clicks BEFORE viewing: click doesn't count
      (2L, "click", 90L), (2L, "view", 100L),
      // u3 clicks too late (view at 100, window 100)
      (3L, "view", 100L), (3L, "click", 201L),
      // u4 views only
      (4L, "view", 50L),
      // u5 purchase without click
      (5L, "view", 10L), (5L, "purchase", 20L)
    ).toDF("uid", "etype", "ts")
    val got = RelOps.funnel(e, "uid", "etype", "ts",
        Seq("view", "click", "purchase"), lit(100L))
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 5L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("ewmaDyadicDaily: hand-computed ×128 kernel over a gapped series") {
    // key "a": 2 events on day 1, gap on day 2, 1 event on day 3
    val d = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 11:00:00")),
      ("a", java.sql.Timestamp.valueOf("2024-01-03 09:00:00"))
    ).toDF("k", "ts")
    val got = RelOps.ewmaDyadicDaily(d, "k", "ts")
      .orderBy("d").as[(String, java.sql.Date, Long, Long, Double)].collect().toSeq
    // day1: 64·2 = 128 (ewma 1.0); day2: 64·0 + 32·2 = 64 (0.5);
    // day3: 64·1 + 32·0 + 16·2 = 96 (0.75)
    assert(got.map(r => (r._3, r._4, r._5)) ==
      Seq((2L, 128L, 1.0), (0L, 64L, 0.5), (1L, 96L, 0.75)))
  }

  test("ewmaDyadicDaily kernel sums to exactly 1 on a constant series") {
    // 10 consecutive days of exactly 3 events: once the kernel is fully
    // inside the series (day ≥ 8) the smoothed value must equal 3
    val d = (0 until 10).flatMap(i => Seq.fill(3)(
      ("k", java.sql.Timestamp.valueOf(f"2024-02-${i + 1}%02d 12:00:00"))))
      .toDF("k", "ts")
    val got = RelOps.ewmaDyadicDaily(d, "k", "ts")
      .orderBy("d").as[(String, java.sql.Date, Long, Long, Double)].collect()
    got.drop(7).foreach { r =>
      assert(r._4 == 384L && r._5 == 3.0, s"full-kernel day off: $r")
    }
  }

  test("firstTouchAttribution: sessions split on the gap, first event tags, conversions counted") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = Seq(
      // user 1, session 1: view → purchase (converts, value 10)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 4.0),
      (1L, ts("2024-01-01 10:10:00"), 2L, "purchase", 10.0),
      // user 1, session 2 (exactly 30 min after previous → new session):
      // click only, no conversion
      (1L, ts("2024-01-01 10:40:00"), 3L, "click", 1.0),
      // user 2, one session: click → purchase ×2 (values 5 + 7)
      (2L, ts("2024-01-02 09:00:00"), 4L, "click", 2.0),
      (2L, ts("2024-01-02 09:05:00"), 5L, "purchase", 5.0),
      (2L, ts("2024-01-02 09:10:00"), 6L, "purchase", 7.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = RelOps.firstTouchAttribution(d, "user_id", "ts", "event_id",
        "event_type", "value", convType = "purchase")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("view") == (("view", 1L, 1L, 10.0)))
    assert(got("click") == (("click", 2L, 1L, 12.0)))
    assert(got.size == 2)
  }

  test("firstTouchAttribution: ties on ts break by the tie column; sub-gap events stay in session") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = Seq(
      // two events at the same instant: event_id order decides first touch
      (1L, ts("2024-01-01 10:00:00"), 2L, "click", 0.0),
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      // 29m59s later — still the same session
      (1L, ts("2024-01-01 10:29:59"), 3L, "purchase", 3.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = RelOps.firstTouchAttribution(d, "user_id", "ts", "event_id",
        "event_type", "value", convType = "purchase")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("view", 1L, 1L, 3.0)))
  }

  test("zoneMapAudit: sorted layout prunes, shuffled layout doesn't") {
    // 40 rows, 4 "files" of 10; values 0..39. Predicate 25..29 touches
    // one file when sorted by x, but every file when x is scattered by
    // a stride permutation
    val d = (0L until 40L).map(i => (i, (i * 13) % 40)).toDF("id", "x")
    val sorted = RelOps.zoneMapAudit(d, "x", Seq($"x", $"id"),
        rowsPerFile = 10, loInclusive = 25L, hiInclusive = 29L)
      .as[(Long, Long)].head()
    assert(sorted == ((4L, 3L)), s"sorted layout: $sorted")
    val scattered = RelOps.zoneMapAudit(d, "x", Seq($"id"),
        rowsPerFile = 10, loInclusive = 25L, hiInclusive = 29L)
      .as[(Long, Long)].head()
    // stride-13 permutation spreads 25..29 across all 4 files → 0 pruned
    assert(scattered == ((4L, 0L)), s"scattered layout: $scattered")
  }

  test("transitionCounts: bigrams respect per-key order, probabilities sum to 1 per source") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"),
      (2L, ts("2024-01-01 09:00:00"), 4L, "a"),
      (2L, ts("2024-01-01 09:01:00"), 5L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = RelOps.transitionCounts(d, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // from a: →b (user1), →c (user2); from b: →a
    assert(got == Map(("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("olsTrendDaily: exact slope on a linear series; degenerate group nulls") {
    // key "up": counts 1,2,3 on three consecutive days → slope exactly 1
    // (one event on day1, two on day2, three on day3)
    val rows =
      (1 to 1).map(_ => ("up", java.sql.Timestamp.valueOf("2024-03-01 01:00:00"))) ++
      (1 to 2).map(_ => ("up", java.sql.Timestamp.valueOf("2024-03-02 01:00:00"))) ++
      (1 to 3).map(_ => ("up", java.sql.Timestamp.valueOf("2024-03-03 01:00:00"))) ++
      Seq(("one", java.sql.Timestamp.valueOf("2024-03-01 01:00:00")))
    val got = RelOps.olsTrendDaily(rows.toDF("k", "ts"), "k", "ts")
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val (_, nd, slope, _) = got("up")
    assert(nd == 3L && slope.contains(1.0), s"expected slope 1: ${got("up")}")
    // single-day group: zero x-variance → null slope/intercept
    assert(got("one") == (("one", 1L, None, None)))
  }

  test("concurrencyPeak: overlapping sessions counted, touching endpoints not double-counted") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = Seq(
      // three users whose sessions overlap at 10:10
      (1L, ts("2024-01-01 10:00:00"), 1L), (1L, ts("2024-01-01 10:15:00"), 2L),
      (2L, ts("2024-01-01 10:05:00"), 3L), (2L, ts("2024-01-01 10:12:00"), 4L),
      (3L, ts("2024-01-01 10:10:00"), 5L), (3L, ts("2024-01-01 10:11:00"), 6L),
      // user 4 starts exactly when user 1's session ends — the −1 sorts
      // first, so the peak must stay 3
      (4L, ts("2024-01-01 10:15:00"), 7L)
    ).toDF("user_id", "ts", "event_id")
    val got = RelOps.concurrencyPeak(d, "user_id", "ts", "event_id")
      .as[(Long, java.sql.Timestamp)].head()
    assert(got._1 == 3L, s"peak should be 3: $got")
    assert(got._2 == ts("2024-01-01 10:10:00"),
      s"earliest peak instant should be user 3's start: $got")
  }

  test("nearestJoin matches a driver-side brute force on random data") {
    val rng = new scala.util.Random(7)
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val left = (1L to 40L).map(i => (i, 1L + rng.nextInt(3), ts(rng.nextInt(5000))))
    val right = (100L to 130L).map(i => (1L + rng.nextInt(3), i, ts(rng.nextInt(5000)), i * 0.5))
    val w = 900L // seconds
    val want = left.map { case (eid, k, lts) =>
      val cands = right.filter { case (rk, _, rts, _) =>
        rk == k && math.abs(rts.getTime - lts.getTime) <= w * 1000L
      }
      if (cands.isEmpty) (eid, None)
      else {
        val best = cands.minBy { case (_, oid, rts, _) =>
          (math.abs(rts.getTime - lts.getTime), rts.getTime, oid)
        }
        (eid, Some(best._2))
      }
    }.toMap
    val got = RelOps.nearestJoin(
        left.toDF("eid", "uid", "ts"), right.toDF("cust", "oid", "ots", "price"),
        Seq("uid"), Seq("cust"), "eid", "ts", "ots", "oid",
        expr(s"INTERVAL $w SECONDS"))
      .select($"eid", $"oid").as[(Long, Option[Long])].collect().toMap
    assert(got == want, s"diff: ${got.toSet.diff(want.toSet).take(5)}")
  }

  test("sessionPaths matches a driver-side brute force on random event logs") {
    val rng = new scala.util.Random(11)
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val types = Array("view", "click", "buy")
    val rows = (1L to 120L).map { i =>
      (1L + rng.nextInt(4), ts(rng.nextInt(3 * 3600)), i, types(rng.nextInt(3)))
    }
    // reference: sort per key by (ts, tie), split at >= 30-min gaps,
    // take each session's first 3 types
    val want = rows.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(r => (r._2.getTime, r._3))
      val sessions = sorted.foldLeft(Vector.empty[Vector[(Long, String)]]) {
        case (acc, (_, t, _, et)) =>
          if (acc.nonEmpty && t.getTime - acc.last.last._1 < 30 * 60 * 1000L)
            acc.init :+ (acc.last :+ (t.getTime, et))
          else acc :+ Vector((t.getTime, et))
      }
      sessions.map(_.take(3).map(_._2).mkString(">"))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = RelOps.sessionPaths(rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type")
      .as[(String, Long)].collect().toMap
    assert(got == want, s"diff: ${got.toSet.diff(want.toSet).take(5)} / ${want.toSet.diff(got.toSet).take(5)}")
  }

  test("seasonalOutliers: spike flagged, calendar gaps skip, steady days pass") {
    // 21 days of 10 events/day for key "a", except: day 15 spikes to 50
    // and day 10 is MISSING entirely (so day 17 has no lag partner)
    def dayRows(day: Int, cnt: Int) = (1 to cnt).map { i =>
      ("a", java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), i)
    }
    val rows = (1 to 21).filter(_ != 10).flatMap { d =>
      dayRows(d, if (d == 15) 50 else 10)
    }
    val got = RelOps.seasonalOutliers(rows.toDF("event_type", "ts", "i"),
        "event_type", "ts")
      .as[(String, java.sql.Date, Long, Long, Boolean)].collect().toSeq
    val byDay = got.map(r => r._2.toString -> r).toMap
    // residual rows exist only where day AND day-7 both exist:
    // 8,9,11..16,18..21 = 12 rows (no 10, no 17)
    assert(got.size == 12, s"got ${got.map(_._2)}")
    assert(!byDay.contains("2024-01-17") && !byDay.contains("2024-01-10"))
    assert(byDay("2024-01-15")._4 == 40L && byDay("2024-01-15")._5,
      s"spike must flag: ${byDay("2024-01-15")}")
    assert(got.filter(_._5).map(_._2.toString) == Seq("2024-01-15"),
      s"only the spike flags: $got")
    assert(byDay("2024-01-16")._4 == 0L && !byDay("2024-01-16")._5)
  }

  test("nearestJoin: closest either side, earlier-ts tie-break, horizon gates, null-extend") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-10 12:00:00")), // nearest is AFTER (+2d vs -5d)
      (2L, 10L, ts("2024-01-04 00:00:00")), // equidistant ±1d → earlier wins
      (3L, 10L, ts("2024-03-01 00:00:00")), // nothing within 30d → null
      (4L, 99L, ts("2024-01-10 12:00:00"))  // key gating: no user-99 orders
    ).toDF("eid", "uid", "ts")
    val right = Seq(
      (10L, 100L, ts("2024-01-05 12:00:00"), 1.0),
      (10L, 101L, ts("2024-01-12 12:00:00"), 2.0),
      (10L, 102L, ts("2024-01-03 00:00:00"), 3.0)
    ).toDF("cust", "oid", "ots", "price")
    val got = RelOps.nearestJoin(left, right, Seq("uid"), Seq("cust"),
        "eid", "ts", "ots", "oid", expr("INTERVAL 30 DAYS"))
      .select($"eid", $"oid", $"price")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, Some(101L), Some(2.0)), // +2d beats -5d and -7.5d
      (2L, Some(102L), Some(3.0)), // tie ±1d: 01-03 (earlier) beats 01-05
      (3L, None, None),
      (4L, None, None)), s"got $got")
    // the ±horizon must sit INSIDE the join condition (q59 discipline)
    val plan = RelOps.nearestJoin(left, right, Seq("uid"), Seq("cust"),
        "eid", "ts", "ots", "oid", expr("INTERVAL 30 DAYS"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Join") && plan.contains("30"),
      s"horizon missing from join:\n$plan")
  }

  test("sessionPaths: gap-split sessions, depth-bounded prefixes, deterministic order") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = Seq(
      // user 1, session 1: view > click > buy > extra (extra beyond depth 3)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:10:00"), 3L, "buy"),
      (1L, ts("2024-01-01 10:15:00"), 4L, "extra"),
      // user 1, session 2 (90-min gap): view > click > buy again
      (1L, ts("2024-01-01 12:00:00"), 5L, "view"),
      (1L, ts("2024-01-01 12:01:00"), 6L, "click"),
      (1L, ts("2024-01-01 12:02:00"), 7L, "buy"),
      // user 2: a lone view (single-event session)
      (2L, ts("2024-01-01 10:00:00"), 8L, "view"),
      // user 3: ts tie broken by event_id (10 before 11)
      (3L, ts("2024-01-01 09:00:00"), 11L, "click"),
      (3L, ts("2024-01-01 09:00:00"), 10L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = RelOps.sessionPaths(d, "user_id", "ts", "event_id", "event_type")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("view>click>buy", 2L), // highest count first
      ("view", 1L),
      ("view>click", 1L)), s"got $got")
    // partitioning must not change the assembled prefixes
    val again = RelOps.sessionPaths(d.repartition(7), "user_id", "ts",
      "event_id", "event_type").as[(String, Long)].collect().toSeq
    assert(again == got)
  }

  test("concurrencyPeak: point (single-event) sessions are visible for an instant") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // a log of ONLY zero-duration sessions: two users fire a lone event
    // at the same instant, a third an hour later — the end-exclusive
    // sweep would report max_concurrent = 0 here
    val d = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L),
      (2L, ts("2024-01-01 09:00:00"), 2L),
      (3L, ts("2024-01-01 10:00:00"), 3L)
    ).toDF("user_id", "ts", "event_id")
    val got = RelOps.concurrencyPeak(d, "user_id", "ts", "event_id")
      .as[(Long, java.sql.Timestamp)].head()
    assert(got._1 == 2L && got._2 == ts("2024-01-01 09:00:00"),
      s"two simultaneous point sessions should peak at 2: $got")
  }

  test("deltaJoin emits exactly the new join rows, each once (multiset identity)") {
    val a0 = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val da = Seq((2L, "a2x"), (3L, "a3")).toDF("k", "av")
    val b0 = Seq((1L, "b1"), (3L, "b3"), (3L, "b3b")).toDF("k", "bv")
    val db = Seq((2L, "b2"), (3L, "b3c")).toDF("k", "bv")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, String)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    val delta = multiset(RelOps.deltaJoin(a0, da, b0, db, Seq("k")))
    val full = multiset(a0.unionByName(da).join(b0.unionByName(db), Seq("k")))
    val old = multiset(a0.join(b0, Seq("k")))
    // full = old ⊎ delta, as multisets
    val recombined = (old.keySet ++ delta.keySet).map(k =>
      k -> (old.getOrElse(k, 0) + delta.getOrElse(k, 0))).toMap
    assert(recombined == full,
      s"old ⊎ delta != full:\nold=$old\ndelta=$delta\nfull=$full")
    assert(delta.nonEmpty && delta.values.forall(_ >= 1))
  }

  test("q06 wordcount on fixtures is non-empty and ordered") {
    val rows = graft.queries.Queries.q06_wordcount(spark, sfDir).as[(String, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("weightedMedian: halving rule, weights dominate, even split takes the lower median") {
    val rows = Seq(
      ("a", 1L, 1L, 1L), ("a", 2L, 1L, 2L), ("a", 3L, 1L, 3L), // plain median 2
      ("b", 1L, 5L, 1L), ("b", 10L, 1L, 2L),                   // weight pulls to 1
      ("c", 1L, 1L, 1L), ("c", 2L, 1L, 2L)                     // even: lower median 1
    ).toDF("k", "v", "w", "tie")
    val got = RelOps.weightedMedian(rows, Seq("k"), col("v"), col("w"),
        Seq(col("tie")))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L, "c" -> 1L), s"medians: $got")
  }

  test("weight-type contract: DECIMAL(x,0) accepted (lossless), fractional types rejected") {
    val rows = Seq(("a", 1L, 1L, 1L), ("a", 2L, 1L, 2L), ("a", 3L, 1L, 3L))
      .toDF("k", "v", "w", "tie")
    // a scale-0 decimal weight is integral by type — same result as long
    val dec = RelOps.weightedMedian(
        rows.withColumn("w", col("w").cast("decimal(18,0)")),
        Seq("k"), col("v"), col("w"), Seq(col("tie")))
      .as[(String, Long)].collect().toMap
    assert(dec == Map("a" -> 2L), s"decimal-weight median: $dec")
    // fractional types still fail loudly at analysis time
    for (t <- Seq("double", "decimal(18,2)")) {
      val e = intercept[IllegalArgumentException] {
        RelOps.weightedMedian(rows.withColumn("w", col("w").cast(t)),
          Seq("k"), col("v"), col("w"), Seq(col("tie")))
      }
      assert(e.getMessage.contains("INTEGRAL"), s"$t: ${e.getMessage}")
    }
  }

  test("linearAttribution: exact micro-unit equal split, flooring, non-converting sessions excluded") {
    import org.apache.spark.sql.functions.to_timestamp
    val ev = Seq(
      // user A, one session: 2 views + 1 click + purchase 1.000001 —
      // the floor rule drops exactly one micro-unit
      ("A", "2024-01-01 10:00:00", 1L, "view", 0.0),
      ("A", "2024-01-01 10:01:00", 2L, "click", 0.0),
      ("A", "2024-01-01 10:02:00", 3L, "view", 0.0),
      ("A", "2024-01-01 10:03:00", 4L, "purchase", 1.000001),
      // user A, second session (past the 30-min gap), no purchase
      ("A", "2024-01-01 12:00:00", 5L, "view", 0.0),
      // user C: 2 clicks + purchase 2.5 — even split, no remainder
      ("C", "2024-01-01 09:00:00", 6L, "click", 0.0),
      ("C", "2024-01-01 09:05:00", 7L, "click", 0.0),
      ("C", "2024-01-01 09:06:00", 8L, "purchase", 2.5),
      // user B: purchase with NO touches — nothing to credit
      ("B", "2024-01-01 08:00:00", 9L, "purchase", 5.0)
    ).toDF("user_id", "tss", "event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = RelOps.linearAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "value", convType = "purchase")
      .select("channel", "n_touches", "n_session_credits", "credit_micro")
      .as[(String, Long, Long, Long)].collect().toSet
    // A's session: cvu=1000001, ntouch=3 → view (1000001*2) div 3 =
    // 666667, click 1000001 div 3 = 333333 (one micro dropped, same on
    // any engine); C's: click (2500000*2) div 2 = 2500000
    assert(got == Set(
      ("view", 2L, 1L, 666667L),
      ("click", 3L, 2L, 333333L + 2500000L)), s"credits: $got")
  }

  test("positionAttribution: U-shape 40/20/40 exact, 1-/2-touch degenerate shapes") {
    import org.apache.spark.sql.functions.to_timestamp
    val ev = Seq(
      // user A: 4 touches (v,c,v,c) + purchase 1.0 → first/last 40%,
      // two middles 10% each (2000 div 2 bp)
      ("A", "2024-01-01 10:00:00", 1L, "view", 0.0),
      ("A", "2024-01-01 10:01:00", 2L, "click", 0.0),
      ("A", "2024-01-01 10:02:00", 3L, "view", 0.0),
      ("A", "2024-01-01 10:03:00", 4L, "click", 0.0),
      ("A", "2024-01-01 10:04:00", 5L, "purchase", 1.0),
      // user B: single touch → 100%
      ("B", "2024-01-01 10:00:00", 6L, "click", 0.0),
      ("B", "2024-01-01 10:01:00", 7L, "purchase", 2.0),
      // user C: two touches → 50/50
      ("C", "2024-01-01 10:00:00", 8L, "view", 0.0),
      ("C", "2024-01-01 10:01:00", 9L, "click", 0.0),
      ("C", "2024-01-01 10:02:00", 10L, "purchase", 4.0)
    ).toDF("user_id", "tss", "event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = RelOps.positionAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "value", convType = "purchase")
      .select("channel", "n_touches", "credit_micro")
      .as[(String, Long, Long)].collect().toSet
    // A: view 400000+100000, click 100000+400000; B: click 2000000;
    // C: view 2000000, click 2000000
    assert(got == Set(
      ("view", 3L, 400000L + 100000L + 2000000L),
      ("click", 4L, 100000L + 400000L + 2000000L + 2000000L)), s"credits: $got")
  }

  test("decayAttribution: dyadic half-life weights, anchor boundary, post-anchor and all-stale sessions excluded") {
    import org.apache.spark.sql.functions.to_timestamp
    val ev = Seq(
      // A: view 25 min before purchase (d=2, w=250000), click 10 min
      // before (d=1, w=500000); Σw=750000, cvu=1000000
      ("A", "2024-01-01 10:00:00", 1L, "view", 0.0),
      ("A", "2024-01-01 10:15:00", 2L, "click", 0.0),
      ("A", "2024-01-01 10:25:00", 3L, "purchase", 1.0),
      // B: only touch AFTER the anchor — converting session, no credit
      ("B", "2024-01-01 10:00:00", 4L, "purchase", 2.0),
      ("B", "2024-01-01 10:05:00", 5L, "view", 0.0),
      // C: touch exactly AT the anchor (d=0, w=1000000, full credit)
      ("C", "2024-01-01 10:00:00", 6L, "click", 0.0),
      ("C", "2024-01-01 10:00:00", 7L, "purchase", 3.0)
    ).toDF("user_id", "tss", "event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = RelOps.decayAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "value", convType = "purchase")
      .select("channel", "n_touches", "credit_micro")
      .as[(String, Long, Long)].collect().toSet
    // A: view (1000000·250000) div 750000 = 333333,
    //    click (1000000·500000) div 750000 = 666666 (one micro dropped);
    // C: click 3000000
    assert(got == Set(
      ("view", 1L, 333333L),
      ("click", 2L, 666666L + 3000000L)), s"credits: $got")
    // all-stale session: with halflife 1 min a 25-min-old touch is past
    // the 20-half-life cap (w=0) — the Σw>0 gate drops the whole
    // session rather than dividing by zero
    val stale = Seq(
      ("E", "2024-01-01 10:00:00", 1L, "view", 0.0),
      ("E", "2024-01-01 10:25:00", 2L, "purchase", 1.0)
    ).toDF("user_id", "tss", "event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val none = RelOps.decayAttribution(stale, "user_id", "ts", "event_id",
      "event_type", "value", convType = "purchase", halflifeMinutes = 1)
    assert(none.count() == 0L, "stale-only session must earn nothing")
    // same frame at the default half-life: d=2, full single-touch credit
    val fresh = RelOps.decayAttribution(stale, "user_id", "ts", "event_id",
        "event_type", "value", convType = "purchase")
      .select("channel", "n_touches", "credit_micro")
      .as[(String, Long, Long)].collect().toSet
    assert(fresh == Set(("view", 1L, 1000000L)), s"got $fresh")
    spark.catalog.clearCache()
  }

  test("attributionCompare: every column equals its standalone rail; first-touch credits the eligible session's full value") {
    import org.apache.spark.sql.functions.to_timestamp
    // a mix exercising all four rails: multi-touch session with distinct
    // first/middle/last channels + decay ages, a 1-touch session, a
    // non-converting session, a no-touch conversion
    val ev = Seq(
      ("A", "2024-01-01 10:00:00", 1L, "view", 0.0),
      ("A", "2024-01-01 10:15:00", 2L, "click", 0.0),
      ("A", "2024-01-01 10:20:00", 3L, "mail", 0.0),
      ("A", "2024-01-01 10:25:00", 4L, "purchase", 1.000001),
      ("A", "2024-01-01 12:00:00", 5L, "view", 0.0), // separate, no purchase
      ("B", "2024-01-01 09:00:00", 6L, "click", 0.0),
      ("B", "2024-01-01 09:06:00", 7L, "purchase", 2.5),
      ("C", "2024-01-01 08:00:00", 8L, "purchase", 5.0) // nothing to credit
    ).toDF("user_id", "tss", "event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    def rail(df: org.apache.spark.sql.DataFrame, valueCol: String) =
      df.select(col("channel"), col(valueCol)).as[(String, Long)].collect().toMap
    val cmp = RelOps.attributionCompare(ev, "user_id", "ts", "event_id",
      "event_type", "value", convType = "purchase")
    val gotLin = rail(cmp, "linear_micro")
    val gotPos = rail(cmp, "position_micro")
    val gotDec = rail(cmp, "decay_micro")
    val gotFirst = rail(cmp, "first_micro")
    val lin = rail(RelOps.linearAttribution(ev, "user_id", "ts", "event_id",
      "event_type", "value", convType = "purchase"), "credit_micro")
    val pos = rail(RelOps.positionAttribution(ev, "user_id", "ts", "event_id",
      "event_type", "value", convType = "purchase"), "credit_micro")
    val dec = rail(RelOps.decayAttribution(ev, "user_id", "ts", "event_id",
      "event_type", "value", convType = "purchase"), "credit_micro")
    def pad(m: Map[String, Long]) =
      gotLin.keySet.map(k => k -> m.getOrElse(k, 0L)).toMap
    assert(gotLin == pad(lin), s"linear: $gotLin vs $lin")
    assert(gotPos == pad(pos), s"position: $gotPos vs $pos")
    assert(gotDec == pad(dec), s"decay: $gotDec vs $dec")
    // first-touch: A's 1000001 on view (its first touch), B's 2500000 on
    // click; C has no touches and credits nothing anywhere
    assert(gotFirst == Map("view" -> 1000001L, "click" -> 2500000L,
      "mail" -> 0L), s"first: $gotFirst")
    // comparability: each rail's column sums to total cvu minus floor loss
    val total = 1000001L + 2500000L
    Seq(gotFirst, gotLin, gotPos, gotDec).foreach { m =>
      assert(m.values.sum <= total && m.values.sum >= total - 10L,
        s"column sum ${m.values.sum} strays from $total")
    }
    graft.ops.ScaleOps.release()
    spark.catalog.clearCache()
  }

  test("weightedQuantiles: one-pass multi-bp matches the brute-force rule on dense ties") {
    // low-cardinality groups × dense value ties: the de-skew rewrite must
    // not disturb the integer basis-point rule at ANY partition split
    val rnd = new scala.util.Random(7)
    // weights include 0 (zero-weight rows are legal candidate values
    // that never advance the cumulative) — the bracket arithmetic must
    // agree with the plain rule on them too
    val rows = (1L to 600L).map { i =>
      (s"g${i % 3}", rnd.nextInt(12).toLong, rnd.nextInt(10).toLong, i)
    }
    def brute(bp: Long): Map[String, Long] =
      rows.groupBy(_._1).map { case (k, rs) =>
        val sorted = rs.sortBy { case (_, v, _, tie) => (v, tie) }
        val tot = sorted.map(_._3).sum
        var cum = 0L
        k -> sorted.collectFirst {
          case (_, v, w, _) if { cum += w; 10000L * cum >= bp * tot } => v
        }.get
      }
    val df = rows.toDF("k", "v", "w", "tie").repartition(7)
    // extreme fences (1 bp / 10000 bp) exercise the first/last bracket
    // buckets; the mid fences the interior
    val fences = Seq(1 -> "p001", 2500 -> "p25", 5000 -> "p50",
      7500 -> "p75", 10000 -> "p100")
    for (np <- Seq(1, 4, 32)) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", np)
      try {
        val got = RelOps.weightedQuantiles(df, Seq("k"), col("v"), col("w"),
            Seq(col("tie")), fences)
          .as[(String, Long, Long, Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
        val expected = rows.map(_._1).distinct.map(k =>
          k -> ((brute(1)(k), brute(2500)(k), brute(5000)(k),
            brute(7500)(k), brute(10000)(k)))).toMap
        assert(got == expected, s"shuffle.partitions=$np: $got vs $expected")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("weightedQuantiles: distributed bracket path carries 100k groups exactly") {
    // the round-10 form collected per-(bucket, group) partials on the
    // driver (documented to ~10k groups); the distributed coarse CDF
    // must carry per-domain-scale group cardinality with the SAME
    // integer basis-point rule — zero driver-held partials
    val rnd = new scala.util.Random(13)
    val nGroups = 100000
    val rows = (0 until nGroups).flatMap { g =>
      (0 until 1 + rnd.nextInt(4)).map { j =>
        (g.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(5).toLong, j.toLong)
      }
    }
    def brute(bp: Long): Map[Long, Long] =
      rows.groupBy(_._1).map { case (k, rs) =>
        val sorted = rs.sortBy { case (_, v, _, tie) => (v, tie) }
        val tot = sorted.map(_._3).sum
        var cum = 0L
        k -> sorted.collectFirst {
          case (_, v, w, _) if { cum += w; 10000L * cum >= bp * tot } => v
        }.get
      }
    val df = rows.toDF("k", "v", "w", "tie").repartition(16)
    val got = RelOps.weightedQuantiles(df, Seq("k"), col("v"), col("w"),
        Seq(col("tie")), Seq(5000 -> "p50", 9900 -> "p99"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val (b50, b99) = (brute(5000), brute(9900))
    val expected = (0L until nGroups.toLong).map(k =>
      k -> ((b50(k), b99(k)))).toMap
    assert(got.size == nGroups, s"group count: ${got.size}")
    assert(got == expected)
  }

  test("weightedMedianMad: fused fold matches the brute-force two-pass rule at any split") {
    // the MAD pass folds pass-1's distinct-value cum structure around the
    // median — must equal the plain per-row halving rule on BOTH passes,
    // including dense ties and the D=0 / no-below-rows edges
    val rnd = new scala.util.Random(11)
    val rows = (1L to 600L).map { i =>
      (s"g${i % 3}", rnd.nextInt(12).toLong, rnd.nextInt(9).toLong + 1L, i)
    } ++ (1L to 5L).map(i => ("const", 7L, 2L, 1000L + i)) // all-equal group: mad 0
    def bruteMedian(rs: Seq[(String, Long, Long, Long)]): Long = {
      val sorted = rs.sortBy { case (_, v, _, tie) => (v, tie) }
      val tot = sorted.map(_._3).sum
      var cum = 0L
      sorted.collectFirst {
        case (_, v, w, _) if { cum += w; 2L * cum >= tot } => v }.get
    }
    val expected = rows.groupBy(_._1).map { case (k, rs) =>
      val m = bruteMedian(rs)
      val dev = rs.map { case (kk, v, w, tie) => (kk, math.abs(v - m), w, tie) }
      k -> ((m, bruteMedian(dev)))
    }
    val df = rows.toDF("k", "v", "w", "tie").repartition(7)
    for (np <- Seq(1, 4, 32)) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", np)
      try {
        val got = RelOps.weightedMedianMad(df, Seq("k"), col("v"), col("w"),
            Seq(col("tie")))
          .as[(String, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got == expected, s"shuffle.partitions=$np: $got vs $expected")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("weightedMedianMadDistributed: equals the driver form and the brute rule; carries 20k groups") {
    // same brute rule as the driver-form test, then a high-cardinality
    // run the driver form's collected partials are documented NOT to
    // carry — the executor-side bracket fold must stay exact
    def bruteMedian(rs: Seq[(Long, Long, Long, Long)]): Long = {
      val sorted = rs.sortBy { case (_, v, _, tie) => (v, tie) }
      val tot = sorted.map(_._3).sum
      var cum = 0L
      sorted.collectFirst {
        case (_, v, w, _) if { cum += w; 2L * cum >= tot } => v }.get
    }
    def bruteMad(rows: Seq[(Long, Long, Long, Long)]): Map[Long, (Long, Long)] =
      rows.groupBy(_._1).map { case (k, rs) =>
        val m = bruteMedian(rs)
        val dev = rs.map { case (kk, v, w, tie) => (kk, math.abs(v - m), w, tie) }
        k -> ((m, bruteMedian(dev)))
      }
    val rnd = new scala.util.Random(17)
    // small, tie-dense: distributed == driver == brute at several splits
    val small = (1L to 600L).map { i =>
      (i % 3, rnd.nextInt(12).toLong, rnd.nextInt(9).toLong + 1L, i)
    }
    val smallDf = small.toDF("k", "v", "w", "tie").repartition(7)
    for (np <- Seq(1, 4, 32)) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", np)
      try {
        val dist = RelOps.weightedMedianMadDistributed(smallDf, Seq("k"),
            col("v"), col("w"), Seq(col("tie")))
          .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        val drv = RelOps.weightedMedianMad(smallDf, Seq("k"),
            col("v"), col("w"), Seq(col("tie")))
          .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(dist == bruteMad(small), s"np=$np vs brute: $dist")
        assert(dist == drv, s"np=$np distributed vs driver form")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    graft.ops.ScaleOps.release()
    // 20k groups, a few rows each — past the point a reviewer should
    // collect per-(bucket, group) partials to the driver
    val nGroups = 20000
    val big = (0 until nGroups).flatMap { g =>
      (0 until 2 + rnd.nextInt(4)).map { j =>
        (g.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(5).toLong + 1L, j.toLong)
      }
    }
    val got = RelOps.weightedMedianMadDistributed(
        big.toDF("k", "v", "w", "tie").repartition(16), Seq("k"),
        col("v"), col("w"), Seq(col("tie")))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    graft.ops.ScaleOps.release()
    val expected = bruteMad(big)
    assert(got.size == nGroups, s"group count: ${got.size}")
    assert(got == expected)
  }

  test("zoneMapAuditSorted: closed form equals the rank-based audit, straddle stays conservative") {
    // value multiset with ties and a straddling file: 0,0,…,40,…,1200 —
    // the boundary-count form must reproduce the rank-based audit exactly
    val vals = Seq.fill(7)(10L) ++ (0L until 25L).map(_ * 40L) ++ Seq(1200L, 1200L)
    val d = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    for ((lo, hi) <- Seq((100L, 400L), (0L, 5L), (2000L, 3000L), (-10L, 9999L),
        (480L, 480L))) {
      val rank = RelOps.zoneMapAudit(d, "x", Seq($"x", $"id"),
          rowsPerFile = 10, loInclusive = lo, hiInclusive = hi)
        .as[(Long, Long)].head()
      val closed = RelOps.zoneMapAuditSorted(d, "x",
          rowsPerFile = 10, loInclusive = lo, hiInclusive = hi)
        .as[(Long, Long)].head()
      assert(closed == rank, s"[$lo,$hi]: closed $closed vs rank $rank")
    }
  }

  test("scd2Lookup: as-of snapshot semantics on crafted intervals") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: a@10:00, b@11:00 (a collapses 10:00-11:00, b open);
    // user 2: two changes at the SAME instant (c then d by event_id) —
    // c's interval is zero-length and must match nothing
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "b"),
      (2L, ts("2024-01-01 09:00:00"), 3L, "c"),
      (2L, ts("2024-01-01 09:00:00"), 4L, "d")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val dim = RelOps.scd2(events, "user_id", "ts", "event_id", "event_type")
    val probes = Seq(
      (1L, 10L, ts("2024-01-01 09:59:59")), // before first interval → null
      (1L, 11L, ts("2024-01-01 10:00:00")), // exactly at a start → a
      (1L, 12L, ts("2024-01-01 10:59:59")), // inside closed interval → a
      (1L, 13L, ts("2024-01-01 11:00:00")), // boundary: a closed, b open → b
      (1L, 14L, ts("2024-01-02 00:00:00")), // deep in the open interval → b
      (2L, 15L, ts("2024-01-01 09:00:00")), // zero-length c skipped → d
      (2L, 16L, ts("2024-01-01 08:59:59"))  // before any change → null
    ).toDF("user_id", "pid", "p")
    val got = RelOps.scd2Lookup(dim, "user_id", "event_id", "event_type",
        probes, col("user_id"), col("pid"), col("p"))
      .collect().map(r => r.getLong(1) -> Option(r.getString(2))).toMap
    assert(got == Map(
      10L -> None, 11L -> Some("a"), 12L -> Some("a"), 13L -> Some("b"),
      14L -> Some("b"), 15L -> Some("d"), 16L -> None), s"got $got")
  }

  test("cdcApply: I/U/D last-writer-wins on crafted ops; untouched rows pass through") {
    val snapshot = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "attr", "v")
    val ops = Seq(
      (2L, "b2", 21L, 5L, "U"), (2L, "b3", 22L, 7L, "U"), // newest wins
      (3L, "c", 30L, 6L, "D"),                            // delete key 3
      (4L, "d", 40L, 6L, "I"),                            // insert new key
      (5L, "e", 50L, 6L, "I"), (5L, "e", 50L, 8L, "D"),   // insert then delete
      (6L, "f", 60L, 6L, "D")                             // delete absent key: no-op
    ).toDF("k", "attr", "v", "seq", "op")
    val got = RelOps.cdcApply(snapshot, ops, Seq("k"), "op", Seq(col("seq")))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L), (2L, "b3", 22L), (4L, "d", 40L)),
      s"cdc result: $got")
  }

  test("privacyAudit: k-anonymity rows-at-risk and l-diversity classes on crafted classes") {
    // class A: 6 rows, 4 distinct users (safe at k=5, diverse at l=3)
    // class B: 3 rows, 1 user (at risk AND low diversity)
    // class C: 5 rows, 2 users (safe size, low diversity)
    val rows =
      (1 to 6).map(i => ("A", "d1", (i % 4).toLong)) ++
      (1 to 3).map(_ => ("B", "d1", 9L)) ++
      (1 to 5).map(i => ("C", "d2", (i % 2).toLong))
    val df = rows.toDF("qi1", "qi2", "user").repartition(5)
    val got = RelOps.privacyAudit(df, Seq("qi1", "qi2"), "user", k = 5L, l = 3L)
      .as[(Long, Long, Long)].head()
    assert(got == ((3L, 3L, 2L)), s"(classes, rowsAtRisk, lowDiversity) = $got")
  }

  test("paretoFrontier2: crafted strict-dominance semantics incl. both-axes ties") {
    // (8,5) twice: exact ties on both axes all survive; (8,4) loses to
    // (8,5) same-x; (7,5) loses to (8,5) strictly-greater-x; (0,0)
    // loses to everything; the staircase (10,1),(8,5),(6,6),(5,9),(1,10)
    // is the frontier
    val pts = Seq(
      (1L, 10L, 1L), (2L, 8L, 5L), (3L, 8L, 5L), (4L, 8L, 4L),
      (5L, 6L, 6L), (6L, 5L, 9L), (7L, 2L, 9L), (8L, 1L, 10L),
      (9L, 7L, 5L), (10L, 0L, 0L))
    val df = spark.createDataFrame(pts).toDF("id", "x", "y")
      .repartition(5) // non-local input + multi-partition range split
    val got = RelOps.paretoFrontier2(df, "x", "y", partitions = 4)
      .select("id").as[Long].collect().toSet
    spark.catalog.clearCache()
    assert(got == Set(1L, 2L, 3L, 5L, 6L, 8L),
      s"frontier mismatch: $got")
  }

  test("paretoFrontierGrouped matches per-group brute force on dense random ties") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 600L).map(i =>
      (s"g${i % 3}", i, rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    def dominated(a: (String, Long, Long, Long)) = pts.exists(b =>
      b._1 == a._1 && b._3 >= a._3 && b._4 >= a._4 &&
        (b._3 > a._3 || b._4 > a._4))
    val expected = pts.filterNot(dominated).map(p => (p._1, p._2)).toSet
    val df = pts.toDF("g", "id", "x", "y").repartition(7)
    for (np <- Seq(1, 4, 32)) {
      val got = RelOps.paretoFrontierGrouped(df, Seq("g"), "x", "y",
          partitions = np)
        .select("g", "id").as[(String, Long)].collect().toSet
      assert(got == expected, s"partitions=$np: $got vs $expected")
    }
    // de-skew contract: heavy windows partition by (bucket, group)
    val windows = windowNodes(RelOps.paretoFrontierGrouped(df, Seq("g"),
      "x", "y", partitions = 8))
    assert(windows.forall(_.partitionSpec.nonEmpty))
    assert(windows.exists(_.partitionSpec.size >= 2),
      "per-group skyline must partition beyond the group key")
  }

  test("paretoFrontier2 matches the brute-force dominance scan on dense random ties") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 400L).map(i => (i, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    def dominated(a: (Long, Long, Long)) = pts.exists(b =>
      b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3))
    val expected = pts.filterNot(dominated).map(_._1).toSet
    val df = spark.createDataFrame(pts).toDF("id", "x", "y").repartition(7)
    for (np <- Seq(1, 3, 32)) {
      val got = RelOps.paretoFrontier2(df, "x", "y", partitions = np)
        .select("id").as[Long].collect().toSet
      spark.catalog.clearCache()
      assert(got == expected, s"partitions=$np: $got vs $expected")
    }
  }
}
