package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native (whole-stage-codegen) cosine similarity over two
  * `array<double>` columns.
  *
  * Spark's array higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback — every element goes through interpreted lambda
  * dispatch, which dominates brute-force ANN scans. This expression fuses
  * dot product and both norms into one primitive loop (`doGenCode`), and
  * keeps exactly the sequential left-fold accumulation order of the HOF
  * formulation and the DuckDB oracle, so results stay bit-identical.
  *
  * Semantics: cos = Σaᵢbᵢ / sqrt(Σaᵢ²·Σbᵢ²), folding elements 0..n-1 in
  * order; null or length-mismatched inputs → null.
  */
case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Null on length mismatch (and on null elements) even when the inputs
    * are non-nullable — without this the generated code assigns to a
    * literal-false isNull and falls back to interpreted eval.
    */
  override def nullable: Boolean = true

  /** Element null-checks are emitted only when the input array types can
    * actually hold nulls, keeping the hot loop branch-free on the usual
    * containsNull=false embeddings.
    */
  private def mayHaveNullElements: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(DoubleType, containsNull = false) ||
      left.dataType == ArrayType(DoubleType, containsNull = true)) {
      right.dataType match {
        case ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"right side must be array<double>, got ${right.dataType}")
      }
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"left side must be array<double>, got ${left.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = mayHaveNullElements
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // null element → null result, matching the zip_with/aggregate HOF
      // formulation (null product poisons the fold)
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    java.lang.Double.valueOf(dot / math.sqrt(na * nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val elementNullCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elementNullCheck
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native dot product over two `array<double>` columns — the same
  * sequential left-fold order as the `zip_with`/`aggregate` HOF
  * formulation (and [[VectorCosine]]'s numerator), so results are
  * bit-identical to both; null / length-mismatched inputs → null.
  *
  * Exists because `VectorOps.dot` sits on build-time hot paths (PQ
  * codebook training scores every sub-slice against k centroids per
  * Lloyd pass; ADC table construction takes m·nprobe dots per query) —
  * interpreted lambda dispatch dominated those loops.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def mayHaveNullElements: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"both sides must be array<double>, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = mayHaveNullElements
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val elementNullCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elementNullCheck
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorKernel {
  /** Column-level native cosine; inputs must already be array<double>
    * (use [[VectorOps.toDoubleArr]] on float embeddings).
    */
  def cosineNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(VectorCosine(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column-level native dot product; inputs must already be array<double>. */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(VectorDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
