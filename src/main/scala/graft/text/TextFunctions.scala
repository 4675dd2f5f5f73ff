package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression library for training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions` higher-
  * order functions (codegen'd, no UDFs, no driver-side work), so each
  * combinator stays inside whole-stage codegen and scales linearly with
  * the scan — the property that matters at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenizer; empty tokens dropped. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish token estimate: runs of letters, runs of digits, or single
    * non-space symbols — the shape of a byte-pair pre-tokenizer's input
    * segmentation. Whitespace is the explicit ASCII class (Java's `\s`)
    * rather than `\s`, because Java counts vertical tab as whitespace and
    * RE2 (the DuckDB oracle engine) does not — the explicit class means
    * both engines segment identically on any input.
    */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit("[\\p{L}]+|[\\p{N}]+|[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]")).cast("long")

  /** Distinct word n-gram shingles (space-joined). Documents shorter than
    * `n` tokens degrade to a single whole-text shingle.
    */
  def shingles(c: Column, n: Int): Column = shinglesOf(tokens(c), n)

  /** Shingles from an already-materialized token array (tokenize once,
    * shingle many — the fused-pipeline form).
    */
  def shinglesOf(t: Column, n: Int): Column =
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", t)))

  /** Adjacent token pairs (with multiplicity, in order) from a token
    * array — the collocation/bigram-LM unit. Documents under two tokens
    * yield null (explode() drops nulls, so they simply contribute no
    * pairs). Pure array HOF: stays inside the scan, no shuffle.
    */
  def bigramsOf(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
      .otherwise(lit(null))

  /** Fraction of tokens found in `stops` (exact int/int division —
    * deterministic across engines).
    */
  def stopwordRatio(c: Column, stops: Seq[String]): Column = {
    val t = tokens(c)
    val stopArr = array(stops.map(lit): _*)
    size(filter(t, x => array_contains(stopArr, x))).cast("double") /
      size(t).cast("double")
  }

  /** Fraction of distinct tokens — low values flag boilerplate/spam. */
  def uniqueTokenRatio(c: Column): Column = {
    val t = tokens(c)
    size(array_distinct(t)).cast("double") / size(t).cast("double")
  }

  /** Mean token length in characters. */
  def meanTokenLength(c: Column): Column = {
    val t = tokens(c)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
      size(t).cast("double")
  }

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(c: Column): Column =
    regexp_count(c, lit("[\\p{Punct}]")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Order-sensitive rolling document fingerprint: chained xxhash64 over
    * the token stream (hash chaining instead of polynomial arithmetic so
    * overflow semantics can't bite). Equal fingerprints ⇔ equal token
    * streams (mod collisions). `rollingFingerprintOf` takes an already-
    * materialized token array — prefer it when several fingerprints are
    * computed over the same document (tokenize once, fold many).
    */
  def rollingFingerprint(c: Column): Column = rollingFingerprintOf(tokens(c))
  def rollingFingerprintOf(tokensCol: Column): Column =
    aggregate(tokensCol, lit(0L), (acc, t) => xxhash64(acc, t))

  /** Winnowing-style fingerprint set: the `k` smallest distinct shingle
    * hashes. Near-identical docs share most of the set.
    */
  def winnowedFingerprints(c: Column, n: Int, k: Int): Column =
    winnowedOf(shingles(c, n), k)
  def winnowedOf(shinglesCol: Column, k: Int): Column =
    slice(array_sort(transform(shinglesCol, s => xxhash64(s))), 1, k)

  /** Common-word profiles for the n-gram/stopword language-ID heuristic.
    * Public high-frequency word lists, a few per language.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por", "con", "para"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour", "que", "sur"),
    "it" -> Seq("il", "di", "che", "la", "per", "una", "sono", "con", "non", "del")
  )

  /** Language-ID heuristic: argmax of profile-word hits, alphabetical
    * tie-break, "und" (undetermined) when nothing matches. `langIdOf`
    * takes a materialized token array (tokenize once) and routes to the
    * one-pass native kernel ([[LangIdExpr]]); [[langIdHof]] is the
    * reference higher-order-function formulation it is asserted
    * byte-identical to (five interpreted filter passes — spec use only).
    */
  def langId(c: Column): Column = langIdOf(tokens(c))
  def langIdOf(tokensCol: Column): Column = TextKernels.langIdNative(tokensCol)

  def langIdHof(tokensCol: Column): Column = {
    val scored = langProfiles.map { case (lang, words) =>
      val profile = array(words.map(lit): _*)
      struct(
        (-size(filter(tokensCol, x => array_contains(profile, lower(x))))).as("negScore"),
        lit(lang).as("lang"))
    }
    val best = array_min(array(scored: _*))
    when(best.getField("negScore") < 0, best.getField("lang")).otherwise(lit("und"))
  }
}
