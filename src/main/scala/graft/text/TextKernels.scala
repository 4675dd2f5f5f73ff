package graft.text

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (whole-stage-codegen) text kernels.
  *
  * The HOF language-ID form ([[TextFunctions.langIdHof]]) evaluates one
  * interpreted `filter(tokens, x => array_contains(profile, lower(x)))`
  * lambda per language — five CodegenFallback passes over every token
  * array. [[LangIdExpr]] scores all profiles in ONE pass with a word →
  * language-bitmask hash lookup, producing byte-identical results
  * (argmax of profile hits, alphabetical tie-break, "und" on zero hits).
  */
object TextKernels {
  def langIdNative(tokensCol: Column): Column =
    GraftSqlBridge.column(LangIdExpr(GraftSqlBridge.expression(tokensCol)))
}

/** One-pass language-ID over an `array<string>` token column.
  *
  * Profiles are fixed at [[TextFunctions.langProfiles]]; languages are
  * scored by counting tokens whose lowercase form appears in the
  * profile's word list (a token in several profiles scores each — same
  * as the per-language HOF filters). Ties break to the alphabetically
  * smallest language code; zero hits yields "und".
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<string>, got $other")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val langs = LangIdExpr.langs
    val cnt = new Array[Int](langs.length)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val mask = LangIdExpr.wordMask.get(arr.getUTF8String(t).toLowerCase)
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            cnt(java.lang.Integer.numberOfTrailingZeros(m)) += 1
            m &= m - 1
          }
        }
      }
      t += 1
    }
    var best = -1
    var bestC = 0
    var i = 0
    while (i < langs.length) {
      if (cnt(i) > bestC) { bestC = cnt(i); best = i }
      i += 1
    }
    if (best < 0) LangIdExpr.und else langs(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val map = ctx.addReferenceObj("graftLangWordMask", LangIdExpr.wordMask,
        classOf[java.util.HashMap[_, _]].getName)
      val langs = ctx.addReferenceObj("graftLangs", LangIdExpr.langs,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val L = LangIdExpr.langs.length
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val t = ctx.freshName("t"); val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      s"""
         |final int $n = $a.numElements();
         |final int[] $cnt = new int[$L];
         |for (int $t = 0; $t < $n; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    Integer $m = (Integer) $map.get($a.getUTF8String($t).toLowerCase());
         |    if ($m != null) {
         |      int ${m}v = $m.intValue();
         |      while (${m}v != 0) {
         |        $cnt[Integer.numberOfTrailingZeros(${m}v)]++;
         |        ${m}v &= ${m}v - 1;
         |      }
         |    }
         |  }
         |}
         |int $best = -1; int $bestC = 0;
         |for (int $i = 0; $i < $L; $i++) {
         |  if ($cnt[$i] > $bestC) { $bestC = $cnt[$i]; $best = $i; }
         |}
         |${ev.value} = ($best < 0)
         |  ? org.apache.spark.unsafe.types.UTF8String.fromString("und")
         |  : $langs[$best];
       """.stripMargin
    })
}

object LangIdExpr {
  /** Alphabetically ordered language codes — ascending argmax scan makes
    * "first max wins" the alphabetical tie-break.
    */
  private[text] val langs: Array[UTF8String] =
    TextFunctions.langProfiles.map(_._1).sorted.map(UTF8String.fromString).toArray

  private[text] val und: UTF8String = UTF8String.fromString("und")

  /** word → bitmask of language indices (a word may appear in several
    * profiles, e.g. "la" in es/fr/it).
    */
  private[text] val wordMask: java.util.HashMap[UTF8String, java.lang.Integer] = {
    val idx = langs.zipWithIndex.map { case (l, i) => l.toString -> i }.toMap
    val m = new java.util.HashMap[UTF8String, java.lang.Integer]()
    for ((lang, words) <- TextFunctions.langProfiles; w <- words) {
      val bit = 1 << idx(lang)
      val key = UTF8String.fromString(w)
      val prev = m.get(key)
      m.put(key, java.lang.Integer.valueOf(if (prev == null) bit else prev.intValue() | bit))
    }
    m
  }
}
