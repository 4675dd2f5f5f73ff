package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management operators for the 100 TB deployment
  * shape. The reference never needed these (single-threaded instances,
  * `README.md:75-76`); at cluster scale they are the difference between
  * a plan that finishes and one that hot-spots a single reducer.
  */
object ScaleOps {

  // Frames cached inside the range-partition ops (globalRank /
  // globalRunningSum / paretoFrontier2) are registered here so
  // long-lived sessions can release them without a blanket
  // clearCache(): Verify/Bench clear everything between queries, but a
  // library caller composing many rank passes in one session calls
  // [[release]] once the results are materialized.
  private val trackedCaches =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  // Checkpoint leaves an iterated op RETURNS (hitsInt's final
  // normalizers read them) register here: clearCache() never frees
  // localCheckpoint blocks (RDD-level, the round-10 rule), so without
  // registration a library caller composing many graph ops leaks one
  // leaf pair per call until releaseAll's block-manager sweep. The
  // op's contract (materialize the result before any release) is
  // unchanged — [[release]] is the caller's explicit "results are
  // materialized" signal, after which a truncated leaf is garbage.
  private val trackedCheckpoints =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  private[graft] def trackCheckpoint(df: DataFrame): DataFrame = synchronized {
    // registration REQUIRES the localCheckpoint leaf shape: the prune
    // below keeps only LogicalRDD entries, so a derived frame would be
    // silently evicted without release on the next registration — fail
    // at the call site instead (register the checkpointed leaf itself)
    require(df.queryExecution.logical
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      "trackCheckpoint requires a localCheckpoint leaf (LogicalRDD plan), " +
        s"got ${df.queryExecution.logical.nodeName} - register the " +
        "checkpointed frame, not a derivation of it")
    // the prune must read the LEAF RDD's storage level: a localCheckpoint
    // frame persists at the RDD level and never registers with the
    // CacheManager, so Dataset.storageLevel is ALWAYS NONE for it — a
    // Dataset-level prune would silently evict (without releasing) every
    // previously tracked leaf on each registration
    trackedCheckpoints.filterInPlace(_.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
      case _ => false
    })
    trackedCheckpoints += df
    df
  }

  private[graft] def trackCache(df: DataFrame): DataFrame = synchronized {
    // Drop entries already unpersisted elsewhere (clearCache() between
    // queries): otherwise the registry grows without bound in a
    // long-lived session, and — worse — every retained DataFrame pins
    // its plan tree, whose RDD/shuffle/broadcast references the
    // ContextCleaner can then NEVER reclaim (the round-9 long-session
    // bench degradation was exactly this accumulation class).
    trackedCaches.filterInPlace(
      _.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    val cached = df.cache()
    trackedCaches += cached
    cached
  }

  /** Unpersist every frame cached by the range-partition ops AND
    * release every tracked checkpoint leaf. CACHED entries are safe —
    * lazy downstream plans re-compute from source if re-executed
    * later; CHECKPOINT leaves are NOT (truncated lineage is
    * unrecoverable once its blocks drop), so like [[releaseAll]] this
    * must only run when no returned iterated-op frame (hitsInt,
    * ppmiEmbedInt, …) will be re-executed afterwards. The registry is
    * process-global: don't call mid-flight while a concurrent
    * pipeline's op is still executing.
    */
  def release(): Unit = synchronized {
    trackedCaches.foreach(_.unpersist(blocking = false))
    trackedCaches.clear()
    trackedCheckpoints.foreach(graft.dedup.Dedup.releaseCheckpoint)
    trackedCheckpoints.clear()
  }

  /** Run `body` and release ONLY the caches/checkpoint leaves it tracked
    * — the scoped form of [[release]] for a long-lived caller (a
    * maintainer's per-cycle rebuild) that must not blanket-release other
    * pipelines' tracked frames. `body`'s RESULT must be fully
    * materialized before it returns (localCheckpoint(true) /
    * cache+count): the interior frames its lineage read are released the
    * moment the scope closes. Same process-global caveat as [[release]]:
    * frames tracked by a CONCURRENT pipeline while `body` runs would be
    * swept with the scope — don't interleave tracking pipelines across
    * threads with an open scope.
    */
  def scoped[T](body: => T): T = {
    val (c0, k0) = synchronized {
      // identity sets — DataFrame has no value equality, so contains()
      // below is reference comparison, exactly what a scope needs
      (trackedCaches.toSet, trackedCheckpoints.toSet)
    }
    // finally: a THROWING body's partial interiors are orphans (no
    // result frame will ever read them) and must release all the same
    try body
    finally synchronized {
      val newCaches = trackedCaches.filterNot(c0.contains)
      val newCkpts = trackedCheckpoints.filterNot(k0.contains)
      newCaches.foreach(_.unpersist(blocking = false))
      newCkpts.foreach(graft.dedup.Dedup.releaseCheckpoint)
      trackedCaches.filterInPlace(c0.contains)
      trackedCheckpoints.filterInPlace(k0.contains)
    }
  }

  /** Whether any tracked cache is still registered — the cheap dirty
    * check a long-lived runner (Bench) uses to skip the full
    * [[releaseAll]] sweep on queries that cached nothing.
    */
  private[graft] def hasTracked: Boolean = synchronized {
    trackedCaches.nonEmpty || trackedCheckpoints.nonEmpty
  }

  /** Session-level cleanup between independent pipelines in a LONG-LIVED
    * driver (Bench/Verify call this between queries): clears the catalog
    * cache, drains this registry, and unpersists every RDD still pinned
    * in the block manager — which is what releases `localCheckpoint`
    * blocks that `clearCache()` (catalog-level) never touches. Only call
    * when no returned frame will be re-executed: a localCheckpoint has
    * truncated lineage, so its data is unrecoverable once unpersisted.
    * `blocking = true` waits for block removal — a runner that samples
    * resident-RDD telemetry right after the sweep needs it (async
    * removal transiently reports leaked blocks that aren't).
    */
  def releaseAll(spark: org.apache.spark.sql.SparkSession,
                 blocking: Boolean = false): Unit = {
    spark.catalog.clearCache()
    release()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking))
  }

  /** Rendezvous (highest-random-weight) placement: each key goes to the
    * node index maximizing the modular hash `H(key, i) =
    * ((key+1) · ((A + i·B) mod P)) mod P` — a PER-NODE MULTIPLIER
    * family (an additive `key·A + (i+1)·B` form makes one key's node
    * values an arithmetic progression with a structured argmax; see
    * the inline comment) — coordination-free data placement whose defining
    * property is MINIMAL MOVEMENT (Thaler & Ravishankar 1998): growing
    * the node set relocates only the keys the NEW node wins, ~1/(n+1)
    * of them, and every moved key lands on the new node (no
    * peer-to-peer churn — the invariant ScaleOpsSpec owns). Integer
    * arithmetic on the walk rails' hash family, so assignments
    * hash-check cross-engine; ties break to the lowest index. Keys are
    * cast to long and share the id-range contract (≲ 3.4e9 — re-key
    * larger spaces first). Per-row cost is an n-way literal
    * struct-max — no shuffle, no join; n is a config constant
    * (placement targets), capped at 1024.
    */
  def rendezvousAssign(df: DataFrame, keyCol: String, n: Int,
                       outCol: String = "node"): DataFrame = {
    require(n >= 1 && n <= 1024, s"n must be in [1, 1024], got $n")
    if (n == 1) df.withColumn(outCol, lit(0L))
    else {
      val key = col(keyCol).cast("long")
      // per-node MULTIPLIERS, not a shared multiplier plus a per-node
      // offset: an additive family makes the n values of one key an
      // arithmetic progression whose argmax is structured (a 5→6 grow
      // moved 1.3% of keys instead of ~17%); a multiplicative family
      // decorrelates the argmax across keys. Multipliers are reduced
      // mod P first so key·mult stays ≤ ~3.4e9 · 1e9 < 2^63.
      val hs = (0 until n).map { i =>
        val mult = (2654435761L + i * 2246822519L) % 1000000007L
        struct(
          pmod((key + 1L) * lit(mult), lit(1000000007L)).as("h"),
          lit(-i.toLong).as("negi"))
      }
      df.withColumn(outCol, (-greatest(hs: _*).getField("negi")).cast("long"))
    }
  }

  /** Two-phase salted aggregation for skewed grouping keys: rows fan out
    * over `buckets` sub-keys (map-side), partials combine per (key, salt),
    * then a second cheap aggregation merges the partials per key. Use for
    * decomposable aggregates (sum/count here) when one key dominates —
    * e.g. a boilerplate document hash or a null-ish tenant — and AQE's
    * skew handling can't help because the skew is *within one group*, not
    * one partition.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted count — same shape, count-specific merge. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count("*").as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("cnt"))
  }

  /** Skew-safe fact⋈dim equi-join via salt replication: each fact row
    * gets a salt in [0, salt), the dim side replicates `salt`× (explode
    * over a literal sequence — dim rows are the small side by contract),
    * and the join key becomes (key, salt) — a key that hot-spots one
    * reducer under a plain shuffle join spreads over `salt` of them.
    * Use when ONE join key dominates (null-ish tenant, boilerplate hash)
    * and the dim side is too big to broadcast outright but cheap to
    * replicate `salt`×; AQE's skew-join split handles partition-level
    * skew, this handles single-key skew beyond what a split can fix.
    * The salt derives from `monotonically_increasing_id` — any
    * distribution-only value is correct here, because the salt never
    * reaches the output: the result multiset is invariant (proven by
    * q112's plain-join oracle).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, salt: Int = 16): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val f = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1L))))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"), "inner")
      .drop("__salt")
  }

  /** Morton (Z-order) value of two non-negative integer keys: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1. Sorting or
    * range-partitioning a table by this value clusters rows that are
    * close in BOTH dimensions — the multi-dimensional layout trick
    * (Delta/Iceberg Z-ORDER) that lets min/max zone maps prune scans on
    * either predicate column, where a lexicographic sort only prunes the
    * leading one. Pure integer bit arithmetic (shift/and/or), identical
    * on any engine, built as one codegen'd expression.
    */
  def zOrderValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
                  bits: Int): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** N-column Morton value — [[zOrderValue]] generalized: bit i of
    * column j lands at position `i·n + j` (round-robin interleave), so
    * the curve clusters on ALL `n` dimensions at once — the 3-4-column
    * layouts real lakehouse Z-ORDER jobs run. Same pure shift/and/or
    * arithmetic, one codegen'd expression; `n·bits ≤ 63` keeps the
    * value in a signed long. The 2-column form stays as the
    * hand-unrolled special case (identical value for n = 2).
    */
  def zOrderValueN(cols: Seq[org.apache.spark.sql.Column],
                   bits: Int): org.apache.spark.sql.Column = {
    val n = cols.size
    require(n >= 2, s"need at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must fit a signed long: n=$n bits=$bits")
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * n + j)
    ).reduce(_ bitwiseOR _)
  }

  /** Write a table bucketed + sorted by its join key. Two tables bucketed
    * the same way join with ZERO shuffle (the Exchange disappears from
    * the plan — asserted in ScaleOpsSpec): the 100 TB co-located-join
    * path for repeatedly-joined fact/dim pairs, replacing kasper's
    * co-partitioned-topics requirement (`README.md:37-39`) with a
    * storage-level contract.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Sort-on-write: range-partition by `key`, sort within each
    * partition, and cap file size — the layout whose zone-map payoff
    * the q147 audit measures. Every output file covers a disjoint key
    * range (ScaleOpsSpec reads the files back and asserts it), so a
    * range predicate on `key` prunes to the touched files under any
    * min/max-stats reader (parquet row-group stats, Delta/Iceberg file
    * stats). `partitions` bounds the range shuffle;
    * `maxRecordsPerFile` caps file size WITHIN a range partition
    * without another shuffle.
    */
  def writeSorted(df: DataFrame, dir: String, key: String,
                  partitions: Int, maxRecordsPerFile: Int,
                  format: String = "parquet"): Unit = {
    require(partitions >= 1 && maxRecordsPerFile >= 1)
    // both builtin columnar sources carry the min/max file/stripe stats
    // the sorted layout exists for (parquet row groups, ORC stripes) —
    // anything else would silently drop the pruning contract
    require(format == "parquet" || format == "orc",
      s"writeSorted needs a stats-carrying columnar format, got $format")
    df.repartitionByRange(partitions, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .format(format).save(dir)
  }

  /** Compaction: rewrite a many-small-files table into
    * `ceil(n / targetRows)` evenly-sized files — the small-file problem
    * (each file is a task, a name-node entry, an open-file handle; 10⁶
    * kilobyte files ruin a 100 TB scan) fixed with ONE round-robin
    * repartition, no sort. For a layout that should also prune, use
    * [[writeSorted]] instead.
    */
  private val compactSeq = new java.util.concurrent.atomic.AtomicLong()

  def writeCompacted(df: DataFrame, dir: String, targetRows: Long): Unit = {
    require(targetRows >= 1)
    // The input lineage executes exactly ONCE: the first write stages
    // the data to a sibling dir with the row count observed for free on
    // the way through; the compaction pass then rereads the staged
    // parquet (columnar, already computed — cheap relative to the
    // expensive pipelines compaction typically follows) into
    // ceil(n/targetRows) files. No count() double-scan, and no
    // localCheckpoint of a possibly-100TB input into executor storage.
    val spark = df.sparkSession
    // Staging dir resolved via hadoop Path so it is a TRUE SIBLING of
    // the output regardless of trailing slashes in `dir` (a string
    // concat on "out/" would stage INSIDE the output dir, and the
    // final overwrite of `dir` would delete the staged parquet before
    // the lazy read of it executes).
    val outPath = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(
      outPath.getParent, outPath.getName + ".graft_compact_staging").toString
    val obs = new org.apache.spark.sql.Observation(
      s"graft_compact_${compactSeq.incrementAndGet()}") // observe names must be unique per plan
    df.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(tmp)
    val n = obs.get("n").asInstanceOf[Long]
    val files = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    spark.read.parquet(tmp).repartition(files).write.mode("overwrite").parquet(dir)
    val path = new org.apache.hadoop.fs.Path(tmp)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(path, true)
  }

  /** Bloom-pruned semi-join: filter the BIG side's scan with a compact
    * Bloom filter built from the small side's keys BEFORE the exact
    * semi-join runs — the classic shuffle-reduction rail when the big
    * side must shuffle anyway (key sets too large to broadcast-join
    * outright, but whose MEMBERSHIP fits in a few MB of bloom bits at
    * ~10 bits/key). Spark's own InjectRuntimeFilter plays this trick
    * for eligible shuffle joins; this form makes it explicit,
    * deterministic, and composable with any downstream shape.
    *
    * Correctness is unconditional: the filter has NO false negatives,
    * so the pre-filter only drops rows the semi-join would drop, and
    * the residual exact semi-join removes the false positives — the
    * result EQUALS the plain semi-join at any fpp (the salting/IVM
    * result-invariance discipline; q170's oracle is the plain
    * semi-join). The per-row probe is the scalar codegen'd
    * [[graft.functions.BloomKernel.mightContain]] — no allocation, no
    * shuffle, stays inside the scan's WholeStageCodegen span.
    *
    * `expectedItems` sizes the filter (overestimate is just bits); the
    * build is Spark's distributed `stat.bloomFilter` aggregation, not
    * a driver loop. Keys must be integral (cast to long on both sides).
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    import graft.functions.BloomKernel
    val bytes = BloomKernel.serialize(
      small.select(col(smallKey).cast("long").as("k"))
        .stat.bloomFilter(col("k"), expectedItems, fpp))
    val pre = big.filter(
      BloomKernel.mightContain(col(bigKey).cast("long"), bytes))
    pre.join(small.select(col(smallKey).cast("long").as(s"__$bigKey"))
        .distinct(),
      pre(bigKey).cast("long") === col(s"__$bigKey"), "left_semi")
  }

  /** Equi-depth range split points from a DETERMINISTIC sample — the
    * planning half of range-partitioned layout
    * (`RangePartitioner.sketch` made reproducible): sample rows whose
    * [[graft.ops.CorpusOps.sampleRank]] bucket (id-keyed arithmetic
    * hash, no RNG) falls under `sampleBp` basis points, ntile the
    * sample into `buckets` equal-depth ranges under the (key, id)
    * total order, and report each bucket's key span. Re-runs and both
    * engines produce byte-identical bounds — unlike
    * `repartitionByRange`'s opaque reservoir sketch, these bounds can
    * be persisted, diffed run-over-run, and fed to a writer as the
    * stable partition contract.
    *
    * Scale shape: the only total order is over the SAMPLE
    * (sampleBp/10000 of the rows — audit-scale, like zoneMapAudit's),
    * after a scan-side hash filter; at 100 TB with 10 bp that is a
    * 0.1% single-partition sort, the same cost class Spark's own range
    * sampling pays. Output: (bucket, lo, hi, n_sample).
    */
  def sampledRangeBounds(df: DataFrame, keyCol: String, idCol: String,
                         buckets: Int, sampleBp: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    require(sampleBp >= 1 && sampleBp <= 10000,
      s"sampleBp must be basis points in [1, 10000], got $sampleBp")
    import graft.ops.CorpusOps.sampleRank
    val s = df.select(col(keyCol).as("k"), col(idCol).as("id"))
      .filter(pmod(sampleRank(col("id")), lit(10000L)) < sampleBp)
    s.withColumn("bucket",
        ntile(buckets).over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .groupBy("bucket")
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"),
        count(lit(1)).as("n_sample"))
      .orderBy("bucket")
  }

  /** Key-multiplicity profile (frequency of frequencies): how many keys
    * have exactly n rows — the skew diagnostic that decides between a
    * plain join and [[saltedJoin]]/[[saltedSum]] BEFORE the expensive
    * join runs. Two map-side-combinable aggregations; the second one's
    * key space is the distinct multiplicity set (tiny — bounded by the
    * heaviest key), so the profile costs one pass over the data however
    * skewed it is.
    */
  def multiplicityProfile(df: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_keys"))
  }

  /** Profile-driven aggregation: run [[multiplicityProfile]]'s one-pass
    * skew diagnostic, then pick plain vs [[saltedSum]] by whether the
    * heaviest key exceeds `skewThreshold` rows — the decide-BEFORE-the-
    * expensive-shuffle discipline the profile exists for, packaged as
    * an operator so pipelines don't hand-roll the branch. The result
    * is IDENTICAL either way (addition is associative-commutative; the
    * q93 invariance oracle proves it) — only the plan changes: salted
    * two-stage aggregation when a key would hot-spot one reducer,
    * plain map-side-combinable groupBy otherwise.
    *
    * Cost model honesty: the profile is one extra map-side-combinable
    * pass over the input. Worth it exactly when the input is reused or
    * large enough that a hot-key straggler dominates; for one-shot
    * small aggregations call [[saltedSum]]/plain directly.
    */
  /** Distributed global rank: `row_number()` under a TOTAL order
    * without the single-partition Window a bare
    * `Window.orderBy(...)` compiles to (the classic driver-melting
    * anti-pattern at scale — WindowExec warns and serializes). Shape:
    * range-repartition on the order columns (equal keys co-locate, so
    * partition p's keys sort strictly before partition p+1's), count
    * rows per partition (one collect bounded by the partition count),
    * broadcast the cumulative offsets back, and add each partition's
    * offset to its LOCAL row_number — which is exact because the local
    * order within a range partition extends to the global order across
    * them. `orderCols` must be a total order (break ties with a unique
    * id) or ranks are nondeterministic across runs.
    *
    * Cost: one range shuffle + one count pass over the shuffled frame
    * (cached between the two reads; caller releases via clearCache) vs
    * the single-partition sort's one-node materialization of the whole
    * input. Reference workloads sort per partition only
    * (`partition_processor.go` consumes in offset order); a corpus-wide
    * rank is exactly the op that must NOT be expressed with their
    * single-threaded shape at 100 TB.
    */
  def globalRank(df: DataFrame, rankCol: String,
                 orderCols: Seq[org.apache.spark.sql.Column],
                 partitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "globalRank needs at least one order column")
    val spark = df.sparkSession
    val np = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // referenced twice: counts + ranked output (DAG-reuse rule); tracked
    // for release()
    val ranged = trackCache(df.repartitionByRange(np, orderCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until np).scanLeft(0L) { (acc, p) =>
      acc + counts.getOrElse(p, 0L)
    }
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until np).map(p => org.apache.spark.sql.Row(p, offsets(p))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    ranged.join(broadcast(offsetDf), "__pid")
      .withColumn(rankCol, row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__off")
  }

  /** Distributed global prefix (running) sum under a TOTAL order — the
    * [[globalRank]] discipline applied to `sum(value) OVER (ORDER BY …
    * ROWS UNBOUNDED PRECEDING)`, which a bare `Window.orderBy` would
    * serialize into one partition: range-repartition on the order
    * columns, sum each partition's values (one collect bounded by the
    * partition count), broadcast the cumulative per-partition offsets
    * back, and add each partition's offset to its LOCAL running sum.
    * Exact because equal keys co-locate under range partitioning and
    * the local order within a partition extends to the global order
    * across them. `orderCols` must be a total order or tied rows'
    * intermediate sums are nondeterministic (the final value past the
    * tie group is always exact). `valueCol` must be integral (LONG
    * running sums; offsets are exact).
    *
    * Output: the input columns plus `outCol`. Internally caches the
    * ranged frame (two reads); released via clearCache()/[[release]].
    */
  def globalRunningSum(df: DataFrame, valueCol: org.apache.spark.sql.Column,
                       orderCols: Seq[org.apache.spark.sql.Column],
                       outCol: String, partitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "globalRunningSum needs an order column")
    val spark = df.sparkSession
    val np = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = trackCache(df.repartitionByRange(np, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__grsv", valueCol.cast("long")))
    val sums = ranged.groupBy("__pid").agg(sum(col("__grsv")).as("__s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    val offsets = (0 until np).scanLeft(0L) { (acc, p) =>
      acc + sums.getOrElse(p, 0L)
    }
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until np).map(p => org.apache.spark.sql.Row(p, offsets(p))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsetDf), "__pid")
      .withColumn(outCol, sum(col("__grsv")).over(w) + col("__off"))
      .drop("__pid", "__off", "__grsv")
  }

  /** PER-GROUP running sum whose parallelism does NOT degrade to the
    * group count — the fix for `sum(w) OVER (PARTITION BY k ORDER BY v)`
    * when `k` has few values (a 3-value key "partitions" the window but
    * serializes n/3 rows per task — a straggler by construction at
    * 100×).
    *
    * Shape (ONE full-data shuffle — the same movement as the skewed
    * window it replaces, but with buckets × groups parallelism):
    *  1. sampled range bounds of the LEADING order column — a
    *     deterministic hash-ranked TakeOrdered of ≤ 200·partitions rows
    *     (bounded driver memory at any input size; arithmetic hash, no
    *     RNG, so every execution buckets identically — deliberately NOT
    *     `repartitionByRange` + `spark_partition_id()`, whose sampled
    *     bounds are not guaranteed to agree across the two executions a
    *     multi-reference plan makes);
    *  2. each row's range bucket is a codegen'd chain of
    *     `when(v ≥ bound)` adds — a PURE monotone function of the
    *     order value, so equal values always co-bucket and per-(bucket,
    *     group) running sums extend to the global per-group order
    *     exactly;
    *  3. per-(bucket, group) partial sums — map-side-combinable on the
    *     INPUT partitioning (only combined partials shuffle; the tiny
    *     partials frame is cached — read for offsets and totals);
    *  4. cumulative offsets per group over that tiny frame, BROADCAST
    *     back (bucket×group-cardinality rows — broadcastable precisely
    *     in the low-group-cardinality regime this op exists for);
    *  5. the heavy running sum, partitioned by (bucket, group) — the
    *     single full shuffle.
    *
    * `orderCols` are PLAIN columns (ascending order is applied here)
    * and must total-order rows within a group; `valueCol` must be
    * integral; order columns must be non-null. A single order-value
    * dominating a group still serializes (range bucketing cannot split
    * equal keys — salt upstream if one value exceeds ~1/partitions of a
    * group). The input is scanned three times (bounds sample, partials,
    * the windowed output) — cache upstream lineage if it is expensive
    * (the DAG-reuse rule).
    *
    * `totalCol` (optional) also attaches each group's TOTAL sum —
    * computed for free from the partials already in hand, so callers
    * needing cumulative AND total (every quantile rule is
    * `cum ≥ frac·total`) never rescan the input.
    *
    * Output: input columns plus `outCol` (and `totalCol` if requested).
    */
  def groupedRunningSum(df: DataFrame, keys: Seq[String],
                        valueCol: org.apache.spark.sql.Column,
                        orderCols: Seq[org.apache.spark.sql.Column],
                        outCol: String, partitions: Int = 0,
                        totalCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "groupedRunningSum needs group keys")
    require(orderCols.nonEmpty, "groupedRunningSum needs an order column")
    val spark = df.sparkSession
    val np = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val kcols = keys.map(col)
    val lead = orderCols.head
    // 1. deterministic sampled bounds (collect bounded by 200·np)
    val values = df
      .select(lead.as("__sv"), xxhash64((kcols ++ orderCols): _*).as("__sh"))
      .orderBy(col("__sh"), col("__sv")).limit(np * 200)
      .select("__sv").orderBy(col("__sv")).collect()
      .map(_.get(0))
    val step = math.max(1, values.length / np)
    val bounds = values.indices.collect {
      case i if i > 0 && i % step == 0 => values(i)
    }.distinct
    // 2. codegen'd monotone bucket assignment (pure function — every
    // execution of every reference agrees)
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(lead >= lit(b), 1).otherwise(0)
    }
    val bucketed = df.withColumn("__gb", bucket)
      .withColumn("__grsv", valueCol.cast("long"))
    // 3. map-side-combinable partials; tiny by construction, cached
    // (read for offsets + totals; released via clearCache()/[[release]])
    val parts = trackCache(bucketed.groupBy((col("__gb") +: kcols): _*)
      .agg(sum(col("__grsv")).as("__ps")))
    // 4. per-group cumulative offsets over the tiny partials frame
    val wOff = Window.partitionBy(kcols: _*).orderBy(col("__gb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts
      .withColumn("__off", coalesce(sum(col("__ps")).over(wOff), lit(0L)))
    val offsPlus = (totalCol match {
      case Some(tc) =>
        offs.join(parts.groupBy(kcols: _*).agg(sum(col("__ps")).as(tc)), keys)
      case None => offs
    }).drop("__ps")
    // 5. the one full shuffle: broadcast offsets in, window by
    // (bucket, group)
    val wRun = Window.partitionBy((col("__gb") +: kcols): _*)
      .orderBy(orderCols.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsPlus), "__gb" +: keys)
      .withColumn(outCol, sum(col("__grsv")).over(wRun) + col("__off"))
      .drop("__gb", "__grsv", "__off")
  }

  /** Exact SQL `ntile(k)` bucket computed from a 1-based global rank and
    * the row count — so an equal-fill tile table can ride [[globalRank]]
    * instead of the single-partition Window a bare `ntile(k) OVER
    * (ORDER BY …)` compiles to. Standard ntile semantics: with
    * `n = rem·(s+1) + (k−rem)·s` (`s = n div k`, `rem = n mod k`) the
    * first `rem` buckets hold `s+1` rows — NOT the `ceil(k·rank/n)`
    * approximation, which disagrees whenever `k ∤ n`. Pure integer
    * arithmetic (spec-checked against Spark's own ntile at n mod k ≠ 0).
    */
  def ntileFromRank(rankCol: String, nCol: String, k: Int):
      org.apache.spark.sql.Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    // rem = n mod k buckets of size s+1 first, then buckets of size s;
    // all integer `div` arithmetic (identical on both engines).
    expr(
      s"""CASE WHEN $rankCol <= ($nCol % $k) * ($nCol div $k + 1)
         |  THEN ($rankCol + $nCol div $k) div ($nCol div $k + 1)
         |  ELSE $nCol % $k
         |    + ($rankCol - ($nCol % $k) * ($nCol div $k + 1) + $nCol div $k - 1)
         |      div ($nCol div $k)
         |END""".stripMargin)
  }

  def skewAwareSum(df: DataFrame, keys: Seq[String], valueCol: String,
                   skewThreshold: Long = 1000000L,
                   buckets: Int = 32): DataFrame = {
    require(skewThreshold >= 1 && buckets >= 1)
    val hottest = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx")).head()
    val maxMult = if (hottest.isNullAt(0)) 0L else hottest.getLong(0)
    if (maxMult > skewThreshold) saltedSum(df, keys, valueCol, buckets)
    else df.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as(s"sum_$valueCol"))
  }
}
