package graft.ops

import graft.SparkSpec
import graft.streaming.{Character, Fiction, FictionAndCharacters}

class FictionOpsSpec extends SparkSpec {
  import spark.implicits._

  private val chars = Seq(
    Character("c1", "Hero A", "http://w/a"),
    Character("c2", "Hero B", "http://w/b"),
    Character("c3", "Hero C", "http://w/c"))

  private val fics = Seq(
    Fiction("f1", "movie", "The Duo", Seq("c2", "c1")), // note: NOT sorted order
    Fiction("f2", "book", "Solo", Seq("c3")),
    Fiction("f3", "movie", "Ghost", Seq("c1", "c9")))   // c9 missing

  test("batch fictions join: suppression + characterIds-order arrays (KQ-8 batch)") {
    val out = FictionOps.joinBatch(fics.toDS(), chars.toDS()).collect()
      .sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq("f1", "f2"), "f3 suppressed (missing character)")
    val duo = out.head
    assert(duo.characters.map(_.id) == Seq("c2", "c1"),
      "array must follow characterIds order, not sorted order")
    assert(duo.characters.map(_.name) == Seq("Hero B", "Hero A"))
  }

  test("batch and streaming forms agree on the same input") {
    val batch = FictionOps.joinBatch(fics.toDS(), chars.toDS())
      .collect().map(f => f.id -> f).toMap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.JoinInput]
    val q = graft.streaming.StatefulOps.fictionsJoin(in.toDS())
      .writeStream.format("memory").queryName(s"fic_${System.nanoTime()}")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    in.addData(chars.map(c => graft.streaming.JoinInput(0, Some(c), None)) ++
      fics.map(f => graft.streaming.JoinInput(0, None, Some(f))): _*)
    q.processAllAvailable()
    val streaming = spark.table(q.name).as[FictionAndCharacters].collect()
      .groupBy(_.id).map { case (k, vs) => k -> vs.last }
    q.stop()

    assert(batch.keySet == streaming.keySet)
    batch.foreach { case (id, f) =>
      assert(streaming(id).characters == f.characters, s"mismatch for $id")
    }
  }
}
