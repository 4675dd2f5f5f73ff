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

  def phraseTfNative(tokensCol: Column, phrase: Seq[String]): Column =
    GraftSqlBridge.column(PhraseTfExpr(GraftSqlBridge.expression(tokensCol), phrase))

  def minSpanNative(tokensCol: Column, terms: Seq[String]): Column =
    GraftSqlBridge.column(MinSpanExpr(GraftSqlBridge.expression(tokensCol), terms))

  def nfcNormalizeNative(textCol: Column): Column =
    GraftSqlBridge.column(NfcNormalizeExpr(GraftSqlBridge.expression(textCol)))
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

/** Occurrence count of an exact token phrase — the native form of
  * [[TextSearch.phraseTfHof]] (one primitive pass, no per-position index
  * array, no interpreted lambda; byte-identical results incl. overlaps
  * and null-element non-matches). Long, never null for non-null input.
  */
case class PhraseTfExpr(child: Expression, phrase: Seq[String])
    extends UnaryExpression {
  require(phrase.nonEmpty, "phrase must be non-empty")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<string>, got $other")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  @transient private lazy val words: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val L = words.length
    var cnt = 0L
    var i = 0
    while (i <= n - L) {
      var j = 0
      var ok = true
      while (ok && j < L) {
        if (arr.isNullAt(i + j) || !arr.getUTF8String(i + j).equals(words(j))) ok = false
        j += 1
      }
      if (ok) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("graftPhraseWords", words,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val ok = ctx.freshName("ok")
      s"""
         |final int $n = $a.numElements();
         |long $cnt = 0L;
         |for (int $i = 0; $i <= $n - ${words.length}; $i++) {
         |  boolean $ok = true;
         |  for (int $j = 0; $ok && $j < ${words.length}; $j++) {
         |    if ($a.isNullAt($i + $j) ||
         |        !$a.getUTF8String($i + $j).equals($w[$j])) $ok = false;
         |  }
         |  if ($ok) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
}

/** Smallest token-window length containing EVERY one of `terms` (each at
  * least once, any order) — the proximity primitive phrase adjacency
  * cannot express ("spark" near "join", not necessarily adjacent).
  * Standard two-pointer sliding window, O(tokens) per row with k-sized
  * count state; null when some term never occurs (no window exists).
  */
case class MinSpanExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "terms must be non-empty")
  require(terms.distinct == terms, "terms must be distinct")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be array<string>, got $other")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  @transient private lazy val termIdx: java.util.HashMap[UTF8String, java.lang.Integer] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Integer]()
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), java.lang.Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = terms.length
    val cnt = new Array[Int](k)
    var covered = 0
    var best = Long.MaxValue
    var lo = 0
    var hi = 0
    while (hi < n) {
      if (!arr.isNullAt(hi)) {
        val ix = termIdx.get(arr.getUTF8String(hi))
        if (ix != null) {
          val x = ix.intValue()
          cnt(x) += 1
          if (cnt(x) == 1) covered += 1
          while (covered == k) {
            if (hi - lo + 1 < best) best = (hi - lo + 1).toLong
            if (!arr.isNullAt(lo)) {
              val lx = termIdx.get(arr.getUTF8String(lo))
              if (lx != null) {
                val y = lx.intValue()
                cnt(y) -= 1
                if (cnt(y) == 0) covered -= 1
              }
            }
            lo += 1
          }
        }
      }
      hi += 1
    }
    if (best == Long.MaxValue) null else java.lang.Long.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val map = ctx.addReferenceObj("graftSpanTerms", termIdx,
        classOf[java.util.HashMap[_, _]].getName)
      val k = terms.length
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val covered = ctx.freshName("covered"); val best = ctx.freshName("best")
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val ix = ctx.freshName("ix"); val lx = ctx.freshName("lx")
      s"""
         |final int $n = $a.numElements();
         |final int[] $cnt = new int[$k];
         |int $covered = 0; int $lo = 0;
         |long $best = Long.MAX_VALUE;
         |for (int $hi = 0; $hi < $n; $hi++) {
         |  if (!$a.isNullAt($hi)) {
         |    Integer $ix = (Integer) $map.get($a.getUTF8String($hi));
         |    if ($ix != null) {
         |      if (++$cnt[$ix.intValue()] == 1) $covered++;
         |      while ($covered == $k) {
         |        if ($hi - $lo + 1 < $best) $best = (long) ($hi - $lo + 1);
         |        if (!$a.isNullAt($lo)) {
         |          Integer $lx = (Integer) $map.get($a.getUTF8String($lo));
         |          if ($lx != null && --$cnt[$lx.intValue()] == 0) $covered--;
         |        }
         |        $lo++;
         |      }
         |    }
         |  }
         |}
         |if ($best == Long.MAX_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $best; }
       """.stripMargin
    })
}

/** Unicode NFC normalization (canonical decomposition + composition,
  * `java.text.Normalizer`) as a native codegen kernel — the standard
  * first step of text canonicalization before hashing/dedup: two
  * byte-distinct spellings of the same text (`e` + combining U+0301 vs
  * precomposed `é`, the U+212B Ångström singleton vs U+00C5) must not
  * defeat exact dedup or split token counts. A `Normalizer.isNormalized`
  * fast path returns the input UTF8String untouched for already-NFC
  * text (all ASCII in particular), so the common corpus row costs one
  * scan and zero allocation.
  *
  * Reference: kasper treats values as opaque bytes end to end
  * (processor.go); normalization is a curation-engine concern layered
  * on top.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"input must be string, got $other")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      s"""
         |final String $s = $in.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $in;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })
}
