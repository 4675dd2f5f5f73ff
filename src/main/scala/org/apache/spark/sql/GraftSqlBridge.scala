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

  // every builder validates arity up front so wrong-arity SQL fails
  // analysis with a readable message, not IndexOutOfBoundsException
  private def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
    require(exprs.length == n, s"$name takes $n argument(s), got ${exprs.length}")
    exprs
  }

  // literal int arguments size generated kernel loops — guarded so a
  // column argument fails analysis with a clear message instead of
  // eval(null) exploding on an unbound attribute
  private def litInt(fn: String, argName: String)(e: Expression): Int = {
    require(e.foldable, s"$fn's $argName must be a constant (foldable) expression")
    e.eval(null).asInstanceOf[Number].intValue()
  }

  // literal string arguments carry compile-time phrase/term lists —
  // same foldability guard as litInt
  private def litString(fn: String, argName: String)(e: Expression): String = {
    require(e.foldable, s"$fn's $argName must be a constant (foldable) expression")
    val v = e.eval(null)
    require(v != null, s"$fn's $argName must not be null")
    v.toString
  }

  /** The SQL function surface: one builder per native kernel. Shared by
    * the per-session [[registerFunctions]] and the
    * `SparkSessionExtensions` injection path ([[injectFunctions]] via
    * `graft.core.GraftExtensions`).
    */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_cosine" -> (exprs => { arity("vector_cosine(a, b)", 2)(exprs)
      graft.functions.VectorCosine(exprs.head, exprs(1)) }),
    "vector_dot" -> (exprs => { arity("vector_dot(a, b)", 2)(exprs)
      graft.functions.VectorDot(exprs.head, exprs(1)) }),
    "minhash_signature" -> (exprs => {
      arity("minhash_signature(hashes, numHashes)", 2)(exprs)
      graft.functions.MinHashSignature(exprs.head,
        litInt("minhash_signature", "numHashes")(exprs(1)))
    }),
    "simhash" -> (exprs => { arity("simhash(tokenHashes)", 1)(exprs)
      graft.functions.SimHashFingerprint(exprs.head) }),
    "sorted_intersect_count" -> (exprs => {
      arity("sorted_intersect_count(a, b)", 2)(exprs)
      graft.functions.SortedIntersectCount(exprs.head, exprs(1)) }),
    "lang_id" -> (exprs => { arity("lang_id(tokens)", 1)(exprs)
      graft.text.LangIdExpr(exprs.head) }),
    "sorted_run_stats" -> (exprs => {
      arity("sorted_run_stats(sortedHashes)", 1)(exprs)
      graft.functions.SortedRunStats(exprs.head) }),
    "array_xxhash64" -> (exprs => { arity("array_xxhash64(tokens)", 1)(exprs)
      graft.functions.ArrayXxHash64(exprs.head) }),
    "ngram_set_hashes" -> (exprs => {
      arity("ngram_set_hashes(tokenHashes, n)", 2)(exprs)
      graft.functions.NgramSetHashes(exprs.head,
        litInt("ngram_set_hashes", "n")(exprs(1)))
    }),
    "ngram_run_stats" -> (exprs => {
      arity("ngram_run_stats(tokenHashes, n)", 2)(exprs)
      graft.functions.NgramRunStats(exprs.head,
        litInt("ngram_run_stats", "n")(exprs(1)))
    }),
    "sq8_encode" -> (exprs => { arity("sq8_encode(vector)", 1)(exprs)
      graft.functions.Sq8Encode(exprs.head) }),
    "sq8_dot" -> (exprs => { arity("sq8_dot(code, q)", 2)(exprs)
      graft.functions.Sq8Dot(exprs.head, exprs(1)) }),
    "nfc_normalize" -> (exprs => { arity("nfc_normalize(text)", 1)(exprs)
      graft.text.NfcNormalizeExpr(exprs.head) }),
    "phrase_tf" -> (exprs => { arity("phrase_tf(tokens, 'w1 w2 ...')", 2)(exprs)
      graft.text.PhraseTfExpr(exprs.head,
        litString("phrase_tf", "phrase")(exprs(1)).split(' ').toSeq
          .filter(_.nonEmpty)) }),
    "min_span" -> (exprs => { arity("min_span(tokens, 't1 t2 ...')", 2)(exprs)
      graft.text.MinSpanExpr(exprs.head,
        litString("min_span", "terms")(exprs(1)).split(' ').toSeq
          .filter(_.nonEmpty)) })
  )

  /** Register graft's native expressions on an EXISTING session
    * (`SELECT vector_cosine(a, b) ...`). Idempotent.
    */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** Injection path for `spark.sql.extensions=graft.core.GraftExtensions`:
    * the same function surface, registered at session BUILD time — the
    * mechanism a cluster deployment uses so every session (including
    * pure-SQL ones) sees the kernels without calling into library code.
    */
  def injectFunctions(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        b))
    }
}
