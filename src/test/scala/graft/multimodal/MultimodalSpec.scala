package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  test("binary payload plumbing: schema, decode stub, determinism") {
    val df = Seq((1L, "hello world"), (2L, "")).toDF("id", "txt")
    val media = Multimodal.asMedia(df, "id", "txt", "image")
    assert(media.schema("payload").dataType.typeName == "binary")
    val decoded = Multimodal.decodeStub(media).collect().sortBy(_.id)
    assert(decoded.length == 2)
    assert(decoded(0).feature.length == 16)
    assert(math.abs(decoded(0).feature.sum - 1f) < 1e-5)
    assert(decoded(1).feature.sum == 0f) // empty payload
    // deterministic: same payload → same decode
    val again = Multimodal.decodeStub(media).collect().sortBy(_.id)
    assert(decoded.map(d => (d.width, d.height, d.nFrames)).toSeq ==
      again.map(d => (d.width, d.height, d.nFrames)).toSeq)
  }

  test("resize: nearest-neighbor downsample of a known 4x4 grid") {
    // 4x4 grid 0..15; 2x2 nearest-neighbor keeps rows/cols 0 and 2
    val grid = Array.tabulate[Byte](16)(_.toByte)
    val media = Seq(MediaRow(1L, "image", grid, Map.empty)).toDS()
    val out = Multimodal.resize(media, srcW = 4, srcH = 4, targetW = 2, targetH = 2)
      .collect().head
    assert((out.width, out.height) == (2, 2))
    assert(out.pixels.toSeq == Seq[Byte](0, 2, 8, 10))
    // upsample replicates source pixels
    val up = Multimodal.resize(media, 4, 4, 8, 8).collect().head
    assert(up.pixels.length == 64)
    assert(up.pixels(0) == 0 && up.pixels(1) == 0 && up.pixels(2) == 1)
    // short payload pads with zeros instead of failing
    val shortM = Seq(MediaRow(2L, "image", Array[Byte](7), Map.empty)).toDS()
    val padded = Multimodal.resize(shortM, 4, 4, 2, 2).collect().head
    assert(padded.pixels.toSeq == Seq[Byte](7, 0, 0, 0))
  }

  test("media near-dup: duplicate payload ranks first at cosine 1, disjoint ranges score 0") {
    // q151's composition on crafted media: doc 10 duplicates doc 1's
    // payload byte-for-byte; doc 11's bytes live in a disjoint histogram
    // range (low nibbles vs high nibbles), so its feature is orthogonal
    val lo = Array.tabulate[Byte](64)(i => (i % 16).toByte)         // bins 0
    val hi = Array.tabulate[Byte](64)(i => (0xF0 | (i % 16)).toByte) // bin 15
    val rows = Seq((1L, lo), (10L, lo.clone()), (11L, hi))
      .toDF("id", "payload")
      .select($"id", lit("image").as("kind"), $"payload",
        map(lit("source"), lit("spec")).as("meta"))
      .as[MediaRow]
    val feats = Multimodal.decodeStub(rows).toDF().select($"id", $"feature")
    val nn = graft.functions.VectorOps.annBruteForce(
        feats, "id", "feature", feats.filter($"id" === 1L), "id", "feature", k = 3)
      .filter($"id" =!= $"qid")
      .orderBy($"cos".desc, $"id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(nn.head == ((1L, 10L, 1.0)), s"duplicate payload must rank first: $nn")
    assert(nn.last._2 == 11L && math.abs(nn.last._3) < 1e-9,
      s"disjoint byte ranges must be orthogonal: $nn")
  }

  test("sampleFrames chunks the payload at stride") {
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val df = Seq(Tuple1(payload)).toDF("p")
    val frames = df.select(Multimodal.sampleFrames($"p", frameSize = 10, stride = 2))
      .as[Seq[Array[Byte]]].head()
    assert(frames.length == 5) // offsets 0,20,40,60,80
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).toSeq == (20 until 30).map(_.toByte))
  }
}
