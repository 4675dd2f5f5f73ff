package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  test("tokens and tokenCount handle multi-space and empty strings") {
    val df = Seq("a  b\tc", " x ", "").toDF("t")
    val got = df.select(tokenCount($"t")).as[Long].collect().toSeq
    assert(got == Seq(3L, 1L, 0L))
  }

  test("bpeTokenCount segments words, numbers and symbols") {
    val df = Seq("hello world42, ok!").toDF("t")
    // hello | world | 42 | , | ok | !
    assert(df.select(bpeTokenCount($"t")).as[Long].head() == 6L)
  }

  test("shingles produce distinct n-grams; short docs degrade to whole text") {
    val df = Seq("a b c d", "x y").toDF("t")
    val got = df.select(shingles($"t", 3)).as[Seq[String]].collect()
    assert(got(0).toSet == Set("a b c", "b c d"))
    assert(got(1) == Seq("x y"))
  }

  test("quality ratios are exact") {
    val df = Seq("the cat the dogs").toDF("t")
    val row = df.select(
      stopwordRatio($"t", Seq("the", "a")).as("sr"),
      uniqueTokenRatio($"t").as("ur"),
      meanTokenLength($"t").as("ml")).head()
    assert(row.getDouble(0) == 0.5)
    assert(row.getDouble(1) == 0.75)
    assert(row.getDouble(2) == 3.25)
  }

  test("langId picks the right profile and ties break deterministically") {
    val df = Seq(
      "the cat sat and it was good",
      "der hund und die katze ist nicht da",
      "el perro y la casa de los gatos",
      "zzz qqq www").toDF("t")
    val got = df.select(langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "und"))
  }

  test("native langId kernel is byte-identical to the HOF formulation") {
    // crafted edges: case-folding, multi-profile words ("la" ∈ es/fr/it,
    // "que" ∈ es/fr), alphabetical tie-breaks, zero-hit, empty doc
    val crafted = Seq(
      "THE Cat AND it", "que", "the der", "la la la", "",
      "le chien dans la maison est une", "il cane di che la per")
      .toDF("text")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("text")
    val all = crafted.union(docs)
      .select(tokens($"text").as("t"))
      .select(langIdOf($"t").as("native"), langIdHof($"t").as("hof"))
    assert(all.filter($"native" =!= $"hof").count() == 0)
    assert(all.filter($"native".isNull =!= $"hof".isNull).count() == 0)
    val craftedGot = crafted.select(langId($"text")).as[String].collect().toSeq
    assert(craftedGot == Seq("en", "es", "de", "es", "und", "fr", "it"))
  }

  test("lang_id is registered for SQL") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    val got = spark.sql(
      "SELECT lang_id(array('the', 'cat', 'and')) AS l").as[String].head()
    assert(got == "en")
  }

  test("rollingFingerprint is order-sensitive and deterministic") {
    val df = Seq("a b c", "a b c", "c b a").toDF("t")
    val fps = df.select(rollingFingerprint($"t")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("winnowedFingerprints overlap heavily for near-identical docs") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val near = base + " extra"
    val far = (1 to 50).map(i => s"v$i").mkString(" ")
    val df = Seq(base, near, far).toDF("t")
    val fps = df.select(winnowedFingerprints($"t", 3, 8)).as[Seq[Long]].collect()
    assert(fps(0).intersect(fps(1)).size >= 6)
    assert(fps(0).intersect(fps(2)).isEmpty)
  }

  test("NfcNormalizeExpr: composes combining marks and singletons, identity on NFC/ASCII, null-safe, SQL surface") {
    val rows = Seq(
      ("decomposed", "Cafe\u0301"),   // e + U+0301 -> e-acute
      ("singleton", "\u212B"),        // Angstrom sign -> U+00C5
      ("diaeresis", "o\u0308"),       // o + U+0308 -> o-diaeresis
      ("precomposed", "caf\u00E9"),   // already NFC
      ("ascii", "plain ascii text"),
      ("empty", ""),
      ("nul", null)
    ).toDF("k", "t")
    val got = rows.select($"k",
        TextKernels.nfcNormalizeNative($"t").as("n"))
      .as[(String, String)].collect().toMap
    assert(got("decomposed") == "Caf\u00E9")
    assert(got("singleton") == "\u00C5")
    assert(got("diaeresis") == "\u00F6")
    assert(got("precomposed") == "caf\u00E9")
    assert(got("ascii") == "plain ascii text")
    assert(got("empty") == "")
    assert(got("nul") == null)
    // interpreted path (eval) must agree with the codegen path above
    val e = NfcNormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("Cafe\u0301"))
    assert(e.eval(null).toString == "Caf\u00E9")
    // SQL-text surface through the injected registry
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    // (Spark's chr() is ASCII-mod-256, unlike DuckDB's — use the SQL
    // unicode escape to build the combining mark)
    val viaSql = spark.sql("SELECT nfc_normalize('Cafe\\u0301') AS n")
      .as[String].collect().head
    assert(viaSql == "Caf\u00E9")
    // non-string input is an analysis-time failure, not a runtime one
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(TextKernels.nfcNormalizeNative($"x")).collect()
    }
  }

  test("phrase_tf and min_span are registered for SQL and agree with the Column kernels") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    val df = Seq("the cat sat on the cat mat", "cat", "").toDF("text")
    df.createOrReplaceTempView("ptf_docs")
    val viaSql = spark.sql(
      """SELECT phrase_tf(split(text, ' '), 'the cat') AS tf,
        |       min_span(split(text, ' '), 'cat mat') AS span
        |FROM ptf_docs""".stripMargin)
      .as[(Long, Option[Long])].collect().toSeq
    val viaCol = df.select(
        TextKernels.phraseTfNative(split($"text", " "), Seq("the", "cat")),
        TextKernels.minSpanNative(split($"text", " "), Seq("cat", "mat")))
      .as[(Long, Option[Long])].collect().toSeq
    assert(viaSql == viaCol, s"sql $viaSql != column $viaCol")
    assert(viaSql.head._1 == 2L) // "the cat" occurs twice
    assert(viaSql.head._2.contains(2L)) // "cat mat" adjacent at the end
    // a non-constant phrase argument fails analysis, not execution
    intercept[Exception] {
      spark.sql("SELECT phrase_tf(split(text, ' '), text) FROM ptf_docs")
        .collect()
    }
  }
}
