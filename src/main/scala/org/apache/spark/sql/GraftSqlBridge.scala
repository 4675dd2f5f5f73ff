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
    // every builder validates arity up front so wrong-arity SQL fails
    // analysis with a readable message, not IndexOutOfBoundsException
    def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
      require(exprs.length == n, s"$name takes $n argument(s), got ${exprs.length}")
      exprs
    }
    reg.createOrReplaceTempFunction(
      "vector_cosine",
      exprs => { arity("vector_cosine(a, b)", 2)(exprs)
        graft.functions.VectorCosine(exprs.head, exprs(1)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      "vector_dot",
      exprs => { arity("vector_dot(a, b)", 2)(exprs)
        graft.functions.VectorDot(exprs.head, exprs(1)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => {
        // numHashes must be a literal: it sizes the generated kernel loop.
        // Guarded here so a column argument fails analysis with a clear
        // message instead of eval(null) exploding on an unbound attribute.
        require(exprs.length == 2,
          s"minhash_signature(hashes, numHashes) takes 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          "minhash_signature's numHashes must be a constant (foldable) expression")
        graft.functions.MinHashSignature(exprs.head,
          exprs(1).eval(null).asInstanceOf[Number].intValue())
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "simhash",
      exprs => { arity("simhash(tokenHashes)", 1)(exprs)
        graft.functions.SimHashFingerprint(exprs.head) },
      "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => { arity("sorted_intersect_count(a, b)", 2)(exprs)
        graft.functions.SortedIntersectCount(exprs.head, exprs(1)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      "lang_id",
      exprs => { arity("lang_id(tokens)", 1)(exprs)
        graft.text.LangIdExpr(exprs.head) },
      "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_run_stats",
      exprs => { arity("sorted_run_stats(sortedHashes)", 1)(exprs)
        graft.functions.SortedRunStats(exprs.head) },
      "built-in")
    reg.createOrReplaceTempFunction(
      "array_xxhash64",
      exprs => { arity("array_xxhash64(tokens)", 1)(exprs)
        graft.functions.ArrayXxHash64(exprs.head) },
      "built-in")
    reg.createOrReplaceTempFunction(
      "ngram_set_hashes",
      exprs => {
        require(exprs.length == 2,
          s"ngram_set_hashes(tokenHashes, n) takes 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          "ngram_set_hashes's n must be a constant (foldable) expression")
        graft.functions.NgramSetHashes(exprs.head,
          exprs(1).eval(null).asInstanceOf[Number].intValue())
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "ngram_run_stats",
      exprs => {
        require(exprs.length == 2,
          s"ngram_run_stats(tokenHashes, n) takes 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          "ngram_run_stats's n must be a constant (foldable) expression")
        graft.functions.NgramRunStats(exprs.head,
          exprs(1).eval(null).asInstanceOf[Number].intValue())
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "sq8_encode",
      exprs => { arity("sq8_encode(vector)", 1)(exprs)
        graft.functions.Sq8Encode(exprs.head) },
      "built-in")
    reg.createOrReplaceTempFunction(
      "sq8_dot",
      exprs => { arity("sq8_dot(code, q)", 2)(exprs)
        graft.functions.Sq8Dot(exprs.head, exprs(1)) },
      "built-in")
  }
}
