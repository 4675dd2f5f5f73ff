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

  test("randomized: batch and streaming forms agree under arbitrary arrival orders") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val charIds = (0 until 12).map(i => s"c$i")
      val allChars = charIds.map(c => Character(c, s"N$c", s"http://w/$c"))
      // only a subset of characters ever arrives → some fictions suppressed
      val arriving = rnd.shuffle(allChars).take(8)
      val fictions = (0 until 6).map { i =>
        val n = 1 + rnd.nextInt(4)
        Fiction(s"f$i", "t", s"T$i", rnd.shuffle(charIds).take(n))
      }
      val events = rnd.shuffle(
        arriving.map(c => graft.streaming.JoinInput(0, Some(c), None)) ++
          fictions.map(f => graft.streaming.JoinInput(0, None, Some(f))))

      val batch = FictionOps.joinBatch(fictions.toDS(), arriving.toDS())
        .collect().map(f => f.id -> f.characters).toMap

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.JoinInput]
      val q = graft.streaming.StatefulOps.fictionsJoin(in.toDS())
        .writeStream.format("memory").queryName(s"rnd_${trial}_${System.nanoTime()}")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
      // deliver in random batching
      events.grouped(1 + rnd.nextInt(5)).foreach { g => in.addData(g: _*); q.processAllAvailable() }
      val streaming = spark.table(q.name).as[FictionAndCharacters].collect()
        .groupBy(_.id).map { case (k, vs) => k -> vs.last.characters }
      q.stop()

      assert(streaming.keySet == batch.keySet,
        s"trial $trial emit-set mismatch: streaming=${streaming.keySet} batch=${batch.keySet}")
      batch.foreach { case (id, cs) => assert(streaming(id) == cs, s"trial $trial: $id") }
    }
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
