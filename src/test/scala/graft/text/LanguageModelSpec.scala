package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Owns correctness for the bigram-LM quality rail: q78's count surface
  * is oracle-checked; the ln/exp-scored q79 is verified here by exact
  * driver-side recomputation (the q63 BM25 discipline).
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "the dog sat"),
    (4L, "cat"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("bigramsOf: adjacency, short docs degrade to empty") {
    val got = docs.select($"doc_id", LanguageModel.bigramsOf(
        TextFunctions.tokens($"text")).as("bg"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(got(0)._2 == Seq("the cat", "cat sat"))
    assert(got(3)._2.isEmpty, "single-token doc has no bigrams")
    assert(got(4)._2.isEmpty, "empty doc has no bigrams")
  }

  test("lmComponents match a driver-side recomputation (short docs kept with zeros)") {
    val texts = docs.as[(Long, String)].collect().toMap
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    val allBg = texts.values.flatMap(s => toks(s).sliding(2).filter(_.size == 2)
      .map(_.mkString(" "))).toSeq
    val bgCnt = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ugCnt = texts.values.flatMap(toks).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = LanguageModel.lmComponents(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long, Long)].collect()
    assert(got.length == 5, "every doc survives, bigram-less ones included")
    got.foreach { case (id, nb, sb, su) =>
      val bgs = toks(texts(id)).sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      assert(nb == bgs.size.toLong, s"doc $id n_bigrams")
      assert(sb == bgs.map(bgCnt).sum, s"doc $id sum_bg_cnt")
      assert(su == bgs.map(b => ugCnt(b.split(" ")(0))).sum, s"doc $id sum_ug_cnt")
    }
  }

  test("lmScore matches exact driver recomputation; bigram-less docs score null") {
    val texts = docs.as[(Long, String)].collect().toMap
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    val allBg = texts.values.flatMap(s => toks(s).sliding(2).filter(_.size == 2)
      .map(_.mkString(" "))).toSeq
    val bgCnt = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ugCnt = texts.values.flatMap(toks).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = ugCnt.size.toDouble
    val got = LanguageModel.lmScore(docs, "doc_id", "text").orderBy("id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val bgs = toks(texts(id)).sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      if (bgs.isEmpty) {
        assert(r.isNullAt(1) && r.isNullAt(2), s"doc $id: no bigram evidence")
      } else {
        val want = bgs.map { b =>
          math.log((bgCnt(b) + 1.0) / (ugCnt(b.split(" ")(0)) + v))
        }.sum / bgs.size
        assert(math.abs(r.getDouble(1) - want) < 1e-12, s"doc $id avg_logprob")
        assert(math.abs(r.getDouble(2) - math.exp(-want)) < 1e-9, s"doc $id ppl")
      }
    }
    // fluency ordering: a doc made of the corpus's most common bigram
    // pattern scores better (lower ppl) than a unique-bigram doc
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(2) < byId(3L).getDouble(2) ||
      byId(2L).getDouble(2) < byId(3L).getDouble(2),
      "'the cat' docs should be at least as fluent as the 'the dog' doc")
  }

  test("lmScore on the fixture corpus: one row per doc, finite scores for real docs") {
    val d = graft.core.Tables(spark, sfDir).documents
    val got = LanguageModel.lmScore(d, "doc_id", "text")
    assert(got.count() == d.count())
    val scored = got.filter($"avg_logprob".isNotNull)
    assert(scored.count() > 0)
    assert(scored.filter($"ppl" <= 0.0 || isnan($"ppl")).count() == 0)
  }

  test("nextTokenTopK: hand-checked successors, token cut, tie-breaks, plan") {
    val d = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"),
      (4L, "a cat"), (5L, "the cat sat")).toDF("doc_id", "text")
    // occurrences: the=4, cat=4, sat=3, ran=1, dog=1, a=1
    val got = LanguageModel.nextTokenTopK(d, "text", k = 2, topTokens = 2)
      .as[(String, Long, String, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    // top-2 tokens by (count desc, token): "cat" (4) then "the" (4)
    // cat → sat(2), ran(1); the → cat(3), dog(1)
    assert(got == Seq(
      ("cat", 1L, "sat", 2L, 4L), ("cat", 2L, "ran", 1L, 4L),
      ("the", 1L, "cat", 3L, 4L), ("the", 2L, "dog", 1L, 4L)), s"got $got")
    // the per-token top-k must be a rank-limited window, not a sort+filter
    val plan = LanguageModel.nextTokenTopK(d, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-token top-k should plan as WindowGroupLimit:\n$plan")
  }
}
