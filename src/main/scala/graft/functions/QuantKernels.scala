package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native kernels for scalar-quantized (int8) vector search.
  *
  * [[Sq8Encode]] compresses an `array<double>` to one byte per
  * dimension plus three doubles of per-vector metadata — the 4×-smaller
  * representation an IVF index caches in memory at scale (FAISS's
  * IVF-SQ8 layout). [[Sq8Dot]] scores a full-precision query against
  * the codes without materializing the dequantized vector. Codes follow
  * exactly [[graft.ops.CorpusOps.quantizeInt8]]:
  * `code = ⌊(x−mn)·255/(mx−mn)⌋ − 128` (constant vectors code to 0),
  * so the two surfaces are cross-checkable.
  */
object QuantKernels {
  def sq8Encode(v: Column): Column =
    GraftSqlBridge.column(Sq8Encode(GraftSqlBridge.expression(v)))

  def sq8Dot(code: Column, q: Column): Column =
    GraftSqlBridge.column(Sq8Dot(
      GraftSqlBridge.expression(code), GraftSqlBridge.expression(q)))

  def pqAdcSum(codes: Column, table: Column, k: Int): Column =
    GraftSqlBridge.column(PqAdcSum(
      GraftSqlBridge.expression(codes), GraftSqlBridge.expression(table), k))

  /** Reconstructed value of dimension i: mn + (code_i + 128) · step. */
  def approxCosine(codeStruct: Column, q: Column, qNorm2: Column, qSum: Column): Column = {
    import org.apache.spark.sql.functions._
    val dotCode = sq8Dot(codeStruct.getField("code"), q)
    val dotHat = codeStruct.getField("mn") * qSum +
      codeStruct.getField("step") * (dotCode + lit(128.0) * qSum)
    dotHat / sqrt(qNorm2 * codeStruct.getField("nrm2"))
  }
}

/** ADC (asymmetric distance computation) partial-dot sum for product
  * quantization: `Σ_j table[j·k + code_j]` — the per-vector score is
  * `m` array lookups instead of `dim` multiplies. `codes` is the
  * per-vector subspace code array (m entries ∈ [0,k)), `table` the
  * per-query lookup of dot(q_j, centroid_{j,c}) laid out j-major.
  */
case class PqAdcSum(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k > 0, "k must be positive")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"inputs must be (array<bigint>, array<double>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val tbl = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = codes.numElements()
    if (tbl.numElements() != m * k) null
    else {
      var s = 0.0
      var j = 0
      while (j < m) {
        val c = codes.getLong(j)
        // a code outside [0,k) would read out of the ADC table's bounds
        // (UnsafeArrayData.getDouble does no range check) — null instead
        if (c < 0L || c >= k) return null
        s += tbl.getDouble(j * k + c.toInt); j += 1
      }
      java.lang.Double.valueOf(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j"); val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
         |final int $m = $a.numElements();
         |if ($b.numElements() != $m * $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    final long $c = $a.getLong($j);
         |    if ($c < 0L || $c >= ${k}L) { ${ev.isNull} = true; break; }
         |    $s += $b.getDouble($j * $k + (int) $c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass int8 scalar quantization of an `array<double>`:
  * `struct(mn, step, nrm2, code)` where `code[i] = ⌊(x_i−mn)/step⌋−128`
  * (signed bytes), `step = (mx−mn)/255` (0 for constant vectors, whose
  * codes are all 0), and `nrm2 = Σ x̂_i²` — the reconstructed vector's
  * squared norm, precomputed so search never dequantizes.
  */
case class Sq8Encode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("mn", DoubleType, nullable = false),
    StructField("step", DoubleType, nullable = false),
    StructField("nrm2", DoubleType, nullable = false),
    StructField("code", BinaryType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var mn = Double.MaxValue; var mx = -Double.MaxValue
    var i = 0
    while (i < n) {
      val x = arr.getDouble(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    if (n == 0) { mn = 0.0; mx = 0.0 }
    val step = (mx - mn) / 255.0
    val code = new Array[Byte](n)
    var nrm2 = 0.0
    i = 0
    while (i < n) {
      val c = if (step == 0.0) 0
              else math.floor((arr.getDouble(i) - mn) * 255.0 / (mx - mn)).toInt - 128
      code(i) = c.toByte
      val xh = mn + (c + 128) * step
      nrm2 += xh * xh
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](mn, step, nrm2, code))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val mn = ctx.freshName("mn"); val mx = ctx.freshName("mx")
      val x = ctx.freshName("x"); val st = ctx.freshName("st")
      val code = ctx.freshName("code"); val c = ctx.freshName("c")
      val xh = ctx.freshName("xh"); val nrm2 = ctx.freshName("nrm2")
      s"""
         |final int $n = $a.numElements();
         |double $mn = Double.MAX_VALUE; double $mx = -Double.MAX_VALUE;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $a.getDouble($i);
         |  if ($x < $mn) $mn = $x;
         |  if ($x > $mx) $mx = $x;
         |}
         |if ($n == 0) { $mn = 0.0; $mx = 0.0; }
         |final double $st = ($mx - $mn) / 255.0;
         |final byte[] $code = new byte[$n];
         |double $nrm2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final int $c = ($st == 0.0) ? 0
         |    : (int) Math.floor(($a.getDouble($i) - $mn) * 255.0 / ($mx - $mn)) - 128;
         |  $code[$i] = (byte) $c;
         |  final double $xh = $mn + ($c + 128) * $st;
         |  $nrm2 += $xh * $xh;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$mn, $st, $nrm2, $code});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ q_i · code_i over a signed-byte code and an `array<double>` query —
  * the quantized-dot building block (`dot(q, x̂)` follows from it with
  * per-vector mn/step, see [[QuantKernels.approxCosine]]). Lengths must
  * match; mismatch yields null (like [[VectorCosine]]).
  */
case class Sq8Dot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"inputs must be (binary, array<double>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val code = l.asInstanceOf[Array[Byte]]
    val q = r.asInstanceOf[ArrayData]
    if (code.length != q.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < code.length) { s += q.getDouble(i) * code(i); i += 1 }
      java.lang.Double.valueOf(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |if ($a.length != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $s += $b.getDouble($i) * $a[$i];
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
