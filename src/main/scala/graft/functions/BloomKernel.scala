package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-membership kernel over gram-hash arrays.
  *
  * The exact decontamination path ([[graft.ops.CorpusOps.decontaminate]],
  * q47) broadcasts the held-out gram-hash SET — ~16+ bytes per gram once
  * it lands in a hashed relation. When the held-out side itself is large
  * (a full eval-suite union at 100 TB corpus scale), a Bloom filter at
  * fpp 1e-6 holds the same membership surface in ~3.6 bytes per gram
  * with ZERO false negatives: the filter can only over-flag, so a
  * bloom-gated pass is a safe pre-filter (or, with a tolerable doc-level
  * FP rate, the whole check). Kasper's closest surface is the keyed
  * store lookup (`/root/reference/kasper.go:59-71`); the sketching trade
  * is the 100 TB generalization its single-node stores never needed.
  *
  * The filter is built once (distributed aggregation via
  * `DataFrameStatFunctions.bloomFilter`, i.e. Spark's own sketch — no
  * driver-side item loop), serialized, and shipped to executors inside
  * the expression; each task deserializes it once (lazy / codegen
  * constructor state, NOT per row). The per-row work is a primitive loop
  * over the doc's gram array — no shuffle, no per-element lambda
  * dispatch, stays inside whole-stage codegen.
  */
case class BloomCountHits(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<bigint>, got $other")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0; var c = 0L
    while (i < n) {
      if (bloom.mightContainLong(a.getLong(i))) c += 1
      i += 1
    }
    java.lang.Long.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // bytes ride the plan's reference array; the filter is rebuilt once
      // per generated-class instance (constructor state), never per row
      val bytesRef = ctx.addReferenceObj("graftBloomBytes", bloomBytes, "byte[]")
      val filterCls = classOf[BloomFilter].getName
      val bloomVar = ctx.addMutableState(filterCls, "graftBloom",
        v => s"""try {
                |  $v = $filterCls.readFrom(new java.io.ByteArrayInputStream($bytesRef));
                |} catch (java.io.IOException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |final int $n = $a.numElements();
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($bloomVar.mightContainLong($a.getLong($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Scalar sibling of [[BloomCountHits]]: membership of ONE long key —
  * the join-pruning form (see [[graft.ops.ScaleOps.bloomSemiJoin]]),
  * kept scalar so the hot scan never allocates a per-row array. Same
  * ship-once/rebuild-per-task filter lifecycle.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be bigint, got $other")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainLong(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, k => {
      val bytesRef = ctx.addReferenceObj("graftBloomBytes", bloomBytes, "byte[]")
      val filterCls = classOf[BloomFilter].getName
      val bloomVar = ctx.addMutableState(filterCls, "graftBloom",
        v => s"""try {
                |  $v = $filterCls.readFrom(new java.io.ByteArrayInputStream($bytesRef));
                |} catch (java.io.IOException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      s"${ev.value} = $bloomVar.mightContainLong($k);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomKernel {

  /** Number of hits of an `array<long>` column against a serialized
    * [[BloomFilter]] — one codegen'd pass, no false negatives by
    * construction.
    */
  def countHits(grams: Column, bloomBytes: Array[Byte]): Column =
    GraftSqlBridge.column(BloomCountHits(GraftSqlBridge.expression(grams), bloomBytes))

  /** Scalar membership of a long key ([[BloomMightContain]]). */
  def mightContain(key: Column, bloomBytes: Array[Byte]): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(key), bloomBytes))

  /** Serialize a built filter for shipping inside [[BloomCountHits]]. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }
}
