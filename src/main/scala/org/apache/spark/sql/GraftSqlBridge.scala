package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the public `Column` API node-based (connect-compatible)
  * and the classic expression accessors `private[sql]`; registering
  * custom `Expression`s from library code goes through this package-level
  * bridge — the same pattern third-party Spark extensions use.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register graft's native expressions for SQL use
    * (`SELECT vector_cosine(a, b) ...`).
    */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vector_cosine",
      exprs => graft.functions.VectorCosine(exprs.head, exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => graft.functions.MinHashSignature(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction(
      "simhash",
      exprs => graft.functions.SimHashFingerprint(exprs.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => graft.functions.SortedIntersectCount(exprs.head, exprs(1)),
      "built-in")
  }
}
