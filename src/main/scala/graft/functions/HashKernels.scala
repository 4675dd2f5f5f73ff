package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native (whole-stage-codegen) signature kernels for the dedup family.
  *
  * The HOF formulations (`array_min(transform(...))` per seed,
  * `aggregate(...)` per bit) are CodegenFallback: 64 interpreted array
  * passes per document — the dominant cost of MinHash/SimHash signatures
  * at scale (the reference's equivalents are tight native loops in its
  * engine; kasper itself has no sketching surface). These expressions
  * compute the whole signature in ONE pass over the token-hash array with
  * primitive arithmetic, exactly reproducing the remix family
  * `h·A_i + B_i` (A_i odd golden-ratio multiples, wrapping longs) so
  * existing signatures and LSH bucketing are bit-identical.
  */
object HashKernels {

  val GoldenA = 0x9E3779B97F4A7C15L
  val GoldenB = 0xC2B2AE3D27D4EB4FL

  /** `numHashes` min-hashes over an `array<long>` of element hashes, one
    * pass. Empty input yields Long.MaxValue sentinels (upstream shingling
    * always emits ≥ 1 gram, so this is unreachable in the dedup path).
    */
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSignature(GraftSqlBridge.expression(hashes), numHashes))

  /** 64-bit SimHash (per-bit majority vote) over an `array<long>` of
    * token hashes, one pass.
    */
  def simhash(hashes: Column): Column =
    GraftSqlBridge.column(SimHashFingerprint(GraftSqlBridge.expression(hashes)))

  /** One-permutation MinHash (Li/Owen/Zhang 2012): the element hashes are
    * scattered into `numHashes` bins by their top bits and the minimum
    * kept per bin — O(|set|) total instead of O(numHashes·|set|), the
    * signature cost that matters when documents are long. Empty bins are
    * densified by borrowing the next non-empty bin's value (circularly)
    * remixed with the bin index, so short documents still produce full
    * signatures with bin-decorrelated values. Same output shape as
    * [[minhashSignature]]; bucket semantics differ (use one family
    * consistently per index).
    */
  def onePermSignature(hashes: Column, numHashes: Int): Column =
    GraftSqlBridge.column(OnePermSignature(GraftSqlBridge.expression(hashes), numHashes))

  /** |A ∩ B| for two ASC-sorted `array<long>` columns via a single merge
    * pass — the verify kernel for set-similarity joins. With distinct
    * sorted sets, jaccard = i / (|A|+|B|−i), so `array_union` never needs
    * materializing (array_intersect/array_union are interpreted and
    * allocate; this is a codegen'd count).
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Per-element xxhash64 over an `array<string>`, one native pass —
    * BIT-IDENTICAL to `transform(arr, x => xxhash64(x))` (it calls the
    * same XXH64 over the same UTF-8 bytes with the same seed), minus
    * the interpreted lambda dispatch per element. Null elements hash to
    * the seed (42), exactly like the HOF form.
    */
  def arrayXxHash64(strings: Column): Column =
    GraftSqlBridge.column(ArrayXxHash64(GraftSqlBridge.expression(strings)))

  /** ASC-sorted DISTINCT word-n-gram hashes, chained directly from an
    * `array<long>` of token hashes — the whole shingling stage (gram
    * string building + per-gram string hash + array_distinct + sort) in
    * one native pass with zero allocation beyond the output array.
    * Fewer than `n` tokens degrade to a single whole-sequence hash,
    * mirroring [[graft.text.TextFunctions.shingles]]'s fallback. Gram
    * values are a different (chained) hash family than
    * `xxhash64(gram_string)` — equality structure is identical, so every
    * consumer (candidate joins, jaccard verify, MinHash) is unaffected.
    */
  def ngramSetHashes(tokenHashes: Column, n: Int): Column =
    GraftSqlBridge.column(NgramSetHashes(GraftSqlBridge.expression(tokenHashes), n))

  /** [[sortedRunStats]] over the NON-distinct n-gram hashes of a
    * token-hash array, fused into one native pass: build every
    * overlapping gram hash (same chained family as [[ngramSetHashes]]),
    * sort, and run-count — the whole repetition-metrics reduction
    * (previously three interpreted HOF passes: gram-string transform,
    * per-gram xxhash64, array_sort) without materializing any
    * intermediate column. Fewer than `n` tokens yield `(0, 0, 0)` —
    * no n-grams to measure (callers gate on token count anyway).
    */
  def ngramRunStats(tokenHashes: Column, n: Int): Column =
    GraftSqlBridge.column(NgramRunStats(GraftSqlBridge.expression(tokenHashes), n))

  /** Run-length stats over an ASC-sorted `array<long>` in one pass:
    * `(total, dup, top)` = element count, elements belonging to runs of
    * length > 1, and the longest run. The per-document reduction behind
    * repetition metrics — equal grams sort adjacent, so duplicate and
    * top-gram occupancy fall out of one scan with NO shuffle (the
    * groupBy-gram formulation shuffles the whole gram stream twice).
    */
  def sortedRunStats(a: Column): Column =
    GraftSqlBridge.column(SortedRunStats(GraftSqlBridge.expression(a)))

  /** `buckets` occupancy counts of an `array<long>` of gram hashes,
    * bucketed by the hash's top log₂(buckets) bits, one pass — the
    * compact per-document sketch behind the PPJoin+-style suffix
    * refinement: for any two gram sets, |A∩B| ≤ Σᵢ min(hA[i], hB[i])
    * (an intersection element lands in the same bucket on both sides),
    * so the bound is exact while shipping `buckets` longs instead of
    * the full set. `buckets` must be a power of two in [2, 256].
    */
  def hashBucketCounts(hashes: Column, buckets: Int): Column =
    GraftSqlBridge.column(HashBucketCounts(GraftSqlBridge.expression(hashes), buckets))

  /** Σᵢ min(a[i], b[i]) over two equal-length `array<long>` count
    * columns — the candidate-side evaluation of the
    * [[hashBucketCounts]] intersection bound (a `zip_with` +
    * `aggregate` HOF would be two interpreted passes per candidate
    * pair; this is one codegen'd loop).
    */
  def minSumCounts(a: Column, b: Column): Column =
    GraftSqlBridge.column(MinSumCounts(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Minimum virtual ticket for deterministic weighted sampling: min over
    * i ∈ [0, w) of `((id·2654435761 + i·40503) mod p)² mod p` with
    * p = 1000000007 — BIT-IDENTICAL to the `sequence` + `aggregate` HOF
    * fold of the same arithmetic, minus the up-to-`w`-element array each
    * row of the HOF form materializes (interpreted, allocating — the
    * exact pattern the project bans in hot paths). Returns
    * `Long.MaxValue` when `w` ≤ 0 (the never-wins sentinel). Wrap
    * semantics on `id·2654435761` are Java `long` overflow on both
    * forms (ANSI off), so the swap is oracle-invisible.
    */
  def weightedMinTicket(id: Column, w: Column): Column =
    GraftSqlBridge.column(WeightedMinTicket(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(w)))
}

case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val h = arr.getLong(t)
      var i = 0
      while (i < numHashes) {
        val v = h * (HashKernels.GoldenA * (2L * i + 1L)) + HashKernels.GoldenB * i
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $t = 0; $t < $n; $t++) {
         |  final long $h = $a.getLong($t);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    final long $v = $h * (${HashKernels.GoldenA}L * (2L * $i + 1L))
         |      + ${HashKernels.GoldenB}L * (long) $i;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-permutation MinHash signature with rotation densification.
  * `numHashes` must be a power of two ≤ 4096 (bins are addressed by the
  * hash's top bits). Interpreted and codegen paths are identical.
  */
case class OnePermSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0 && (numHashes & (numHashes - 1)) == 0 && numHashes <= 4096,
    "numHashes must be a power of two in [1, 4096]")

  private val shift = 64 - java.lang.Integer.numberOfTrailingZeros(numHashes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val h = arr.getLong(t)
      val bin = (h >>> shift).toInt
      if (h < mins(bin)) mins(bin) = h
      t += 1
    }
    // densify: borrow from the next non-empty bin (circular), remixed by
    // bin index so borrowed values don't create spurious band collisions
    var i = 0
    while (i < numHashes) {
      if (mins(i) == Long.MaxValue) {
        var j = (i + 1) % numHashes
        var hops = 0
        while (mins(j) == Long.MaxValue && hops < numHashes) {
          j = (j + 1) % numHashes; hops += 1
        }
        if (mins(j) != Long.MaxValue)
          mins(i) = mins(j) * HashKernels.GoldenA + i * HashKernels.GoldenB
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val t = ctx.freshName("t"); val h = ctx.freshName("h")
      val bin = ctx.freshName("bin"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val hops = ctx.freshName("hops")
      s"""
         |final int $n = $a.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $t = 0; $t < $n; $t++) {
         |  final long $h = $a.getLong($t);
         |  final int $bin = (int) ($h >>> $shift);
         |  if ($h < $mins[$bin]) $mins[$bin] = $h;
         |}
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  if ($mins[$i] == Long.MAX_VALUE) {
         |    int $j = ($i + 1) % $numHashes;
         |    int $hops = 0;
         |    while ($mins[$j] == Long.MAX_VALUE && $hops < $numHashes) {
         |      $j = ($j + 1) % $numHashes; $hops++;
         |    }
         |    if ($mins[$j] != Long.MAX_VALUE) {
         |      $mins[$i] = $mins[$j] * ${HashKernels.GoldenA}L + (long) $i * ${HashKernels.GoldenB}L;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merge-count of common elements in two ASC-sorted long arrays.
  * Inputs MUST be sorted (e.g. via `array_sort`); duplicates count once
  * per aligned occurrence, so pass distinct sets for set semantics.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"inputs must be array<bigint>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    java.lang.Long.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Top-bits bucket occupancy counts of a hash array (see
  * [[HashKernels.hashBucketCounts]]).
  */
case class HashBucketCounts(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets >= 2 && buckets <= 256 && Integer.bitCount(buckets) == 1,
    s"buckets must be a power of two in [2, 256], got $buckets")

  private val shift = 64 - Integer.numberOfTrailingZeros(buckets)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Long](buckets)
    var i = 0
    while (i < n) {
      counts((arr.getLong(i) >>> shift).toInt) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |final long[] $counts = new long[$buckets];
         |for (int $i = 0; $i < $n; $i++) {
         |  $counts[(int) ($a.getLong($i) >>> $shift)] += 1L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ min over two equal-length count arrays (see
  * [[HashKernels.minSumCounts]]). Mismatched lengths sum over the
  * shorter prefix (unreachable from the library paths, which always
  * build both sides with one `buckets` constant).
  */
case class MinSumCounts(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"inputs must be array<bigint>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0L
    while (i < n) {
      val x = a.getLong(i); val y = b.getLong(i)
      s += (if (x < y) x else y)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($i);
         |  $s += ($x < $y) ? $x : $y;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass per-element xxhash64 of a string array (seed 42, Spark's
  * default — see [[HashKernels.arrayXxHash64]]).
  */
case class ArrayXxHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $out[$i] = 42L; }
         |  else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    $out[$i] = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct chained n-gram hashes over an `array<long>` of token
  * hashes (see [[HashKernels.ngramSetHashes]]). The chain is
  * rotate-xor-multiply per element with a splitmix64 finalizer — strong
  * mixing, deterministic, no RNG state.
  */
case class NgramSetHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val out =
      if (len < n) {
        var h = NgramSetHashes.Seed
        var j = 0
        while (j < len) {
          h = java.lang.Long.rotateLeft(h, 13) ^ (arr.getLong(j) * HashKernels.GoldenA)
          j += 1
        }
        Array(NgramSetHashes.fin(h))
      } else {
        val grams = new Array[Long](len - n + 1)
        var i = 0
        while (i <= len - n) {
          var h = NgramSetHashes.Seed
          var j = 0
          while (j < n) {
            h = java.lang.Long.rotateLeft(h, 13) ^ (arr.getLong(i + j) * HashKernels.GoldenA)
            j += 1
          }
          grams(i) = NgramSetHashes.fin(h)
          i += 1
        }
        java.util.Arrays.sort(grams)
        var u = 0
        var k = 1
        while (k < grams.length) {
          if (grams(k) != grams(u)) { u += 1; grams(u) = grams(k) }
          k += 1
        }
        if (u + 1 == grams.length) grams else java.util.Arrays.copyOf(grams, u + 1)
      }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len"); val grams = ctx.freshName("grams")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val u = ctx.freshName("u"); val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val fin =
        s"""$h ^= $h >>> 30; $h *= 0xBF58476D1CE4E5B9L;
           |$h ^= $h >>> 27; $h *= 0x94D049BB133111EBL;
           |$h ^= $h >>> 31;""".stripMargin
      s"""
         |final int $len = $a.numElements();
         |long[] $out;
         |if ($len < $n) {
         |  long $h = ${NgramSetHashes.Seed}L;
         |  for (int $j = 0; $j < $len; $j++) {
         |    $h = Long.rotateLeft($h, 13) ^ ($a.getLong($j) * ${HashKernels.GoldenA}L);
         |  }
         |  $fin
         |  $out = new long[]{$h};
         |} else {
         |  final long[] $grams = new long[$len - $n + 1];
         |  for (int $i = 0; $i <= $len - $n; $i++) {
         |    long $h = ${NgramSetHashes.Seed}L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $h = Long.rotateLeft($h, 13) ^ ($a.getLong($i + $j) * ${HashKernels.GoldenA}L);
         |    }
         |    $fin
         |    $grams[$i] = $h;
         |  }
         |  java.util.Arrays.sort($grams);
         |  int $u = 0;
         |  for (int $k = 1; $k < $grams.length; $k++) {
         |    if ($grams[$k] != $grams[$u]) { $u++; $grams[$u] = $grams[$k]; }
         |  }
         |  $out = ($u + 1 == $grams.length) ? $grams : java.util.Arrays.copyOf($grams, $u + 1);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramSetHashes {
  val Seed = 0x2545F4914F6CDD1DL

  private[functions] def fin(h0: Long): Long = {
    var h = h0
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }
}

/** Fused repetition-metrics kernel (see [[HashKernels.ngramRunStats]]):
  * non-distinct overlapping n-gram hashes → sort → run-length stats
  * `(total, dup, top)`, all inside one generated loop. Gram hashing is
  * the [[NgramSetHashes]] chain, so a gram's hash equals its set-form
  * hash — the dedup and repetition surfaces stay cross-checkable.
  */
case class NgramRunStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("total", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("dup", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) {
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, 0L))
    } else {
      val grams = new Array[Long](len - n + 1)
      var i = 0
      while (i <= len - n) {
        var h = NgramSetHashes.Seed
        var j = 0
        while (j < n) {
          h = java.lang.Long.rotateLeft(h, 13) ^ (arr.getLong(i + j) * HashKernels.GoldenA)
          j += 1
        }
        grams(i) = NgramSetHashes.fin(h)
        i += 1
      }
      java.util.Arrays.sort(grams)
      var dup = 0L; var top = 0L; var run = 0L
      var t = 0
      while (t < grams.length) {
        if (t > 0 && grams(t) == grams(t - 1)) run += 1
        else {
          if (run > 1) dup += run
          if (run > top) top = run
          run = 1
        }
        t += 1
      }
      if (run > 1) dup += run
      if (run > top) top = run
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](grams.length.toLong, dup, top))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len"); val grams = ctx.freshName("grams")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      val dup = ctx.freshName("dup"); val top = ctx.freshName("top")
      val run = ctx.freshName("run")
      val fin =
        s"""$h ^= $h >>> 30; $h *= 0xBF58476D1CE4E5B9L;
           |$h ^= $h >>> 27; $h *= 0x94D049BB133111EBL;
           |$h ^= $h >>> 31;""".stripMargin
      s"""
         |final int $len = $a.numElements();
         |if ($len < $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{0L, 0L, 0L});
         |} else {
         |  final long[] $grams = new long[$len - $n + 1];
         |  for (int $i = 0; $i <= $len - $n; $i++) {
         |    long $h = ${NgramSetHashes.Seed}L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $h = Long.rotateLeft($h, 13) ^ ($a.getLong($i + $j) * ${HashKernels.GoldenA}L);
         |    }
         |    $fin
         |    $grams[$i] = $h;
         |  }
         |  java.util.Arrays.sort($grams);
         |  long $dup = 0L; long $top = 0L; long $run = 0L;
         |  for (int $t = 0; $t < $grams.length; $t++) {
         |    if ($t > 0 && $grams[$t] == $grams[$t - 1]) { $run++; }
         |    else {
         |      if ($run > 1L) $dup += $run;
         |      if ($run > $top) $top = $run;
         |      $run = 1L;
         |    }
         |  }
         |  if ($run > 1L) $dup += $run;
         |  if ($run > $top) $top = $run;
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{(long) $grams.length, $dup, $top});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass run-length stats `(total, dup, top)` over an ASC-sorted
  * `array<long>`. Inputs MUST be sorted (e.g. via `array_sort`).
  */
case class SortedRunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("total", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("dup", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var dup = 0L; var top = 0L; var run = 0L
    var i = 0
    while (i < n) {
      if (i > 0 && arr.getLong(i) == arr.getLong(i - 1)) run += 1
      else {
        if (run > 1) dup += run
        if (run > top) top = run
        run = 1
      }
      i += 1
    }
    if (run > 1) dup += run
    if (run > top) top = run
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, dup, top))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dup = ctx.freshName("dup"); val top = ctx.freshName("top")
      val run = ctx.freshName("run")
      s"""
         |final int $n = $a.numElements();
         |long $dup = 0L; long $top = 0L; long $run = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i > 0 && $a.getLong($i) == $a.getLong($i - 1)) { $run++; }
         |  else {
         |    if ($run > 1L) $dup += $run;
         |    if ($run > $top) $top = $run;
         |    $run = 1L;
         |  }
         |}
         |if ($run > 1L) $dup += $run;
         |if ($run > $top) $top = $run;
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{(long) $n, $dup, $top});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHashFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h = arr.getLong(t)
      var j = 0
      while (j < 64) {
        cnt(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (cnt(j) > 0) fp |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |final int $n = $a.numElements();
         |final int[] $cnt = new int[64];
         |for (int $t = 0; $t < $n; $t++) {
         |  final long $h = $a.getLong($t);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $cnt[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($cnt[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Min virtual ticket over `w` quadratic-hash draws (see
  * [[HashKernels.weightedMinTicket]]). Inputs are two LONGs (id, w);
  * `w` ≤ 0 yields `Long.MaxValue`. The per-row loop is O(w) integer
  * arithmetic with zero allocation — callers bound `w` (weightedSample's
  * `maxWeight`) so a degenerate weight can't turn one row into a
  * million-iteration task.
  */
case class WeightedMinTicket(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"inputs must be (bigint, bigint), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val id = l.asInstanceOf[Long]; val w = r.asInstanceOf[Long]
    val base = id * 2654435761L
    var best = Long.MaxValue
    var i = 0L
    while (i < w) {
      var t = (base + i * 40503L) % 1000000007L
      if (t < 0L) t += 1000000007L
      val s = (t * t) % 1000000007L
      if (s < best) best = s
      i += 1L
    }
    java.lang.Long.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, w) => {
      val base = ctx.freshName("base"); val best = ctx.freshName("best")
      val i = ctx.freshName("i"); val t = ctx.freshName("t"); val s = ctx.freshName("s")
      s"""
         |final long $base = $id * 2654435761L;
         |long $best = Long.MAX_VALUE;
         |for (long $i = 0L; $i < $w; $i++) {
         |  long $t = ($base + $i * 40503L) % 1000000007L;
         |  if ($t < 0L) $t += 1000000007L;
         |  final long $s = ($t * $t) % 1000000007L;
         |  if ($s < $best) $best = $s;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
