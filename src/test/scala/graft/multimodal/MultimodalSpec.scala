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
