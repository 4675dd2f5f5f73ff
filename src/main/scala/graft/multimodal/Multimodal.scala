package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata. */
case class MediaRow(id: Long, kind: String, payload: Array[Byte],
                    meta: Map[String, String])

/** A resized single-channel image grid. */
case class ResizedMedia(id: Long, kind: String, width: Int, height: Int,
                        pixels: Array[Byte])

/** Decoded media features. In a real pipeline `width`/`height`/`nFrames`
  * come from the codec and `feature` from a model; here the decode step
  * is stubbed (see [[Multimodal.decodeStub]]) while the Spark plumbing —
  * schema, encoders, partition-wise batching — is real and tested.
  */
case class DecodedMedia(id: Long, kind: String, width: Int, height: Int,
                        nFrames: Int, feature: Array[Float])

/** Multimodal column handling for training-data pipelines.
  *
  * Images/audio/video are carried as `binary` columns with typed
  * metadata; decode/featurize run as partition-wise typed transforms
  * (`mapPartitions` with product encoders — the Scala analog of batched
  * pandas UDFs): one iterator per partition, so a real decoder would
  * amortize model/codec initialization across the partition, and the
  * binary payload never leaves the executor.
  */
object Multimodal {

  /** Wrap a DataFrame's id+binary columns as typed media rows. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String)
             (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
        col(payloadCol).cast("binary").as("payload"),
        map(lit("source"), lit("graft")).as("meta"))
      .as[MediaRow]
  }

  /** STUB DECODER — image/audio libs are unavailable in this container.
    * Emits a deterministic fake decode keyed on payload bytes: dimensions
    * from a byte hash, frame count from payload length, feature = 16-bin
    * normalized byte histogram (that part is a real featurizer). The
    * partition-wise iteration pattern is exactly what a codec-backed
    * implementation would use.
    */
  def decodeStub(ds: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model session)
      rows.map { m =>
        val h = java.util.Arrays.hashCode(m.payload)
        val width = 16 + math.floorMod(h, 1024)
        val height = 16 + math.floorMod(h >> 10, 1024)
        val nFrames = 1 + m.payload.length / 256
        DecodedMedia(m.id, m.kind, width, height, nFrames, byteHistogram(m.payload))
      }
    }
  }

  /** 16-bin normalized byte histogram — a deterministic stand-in for a
    * learned feature vector.
    */
  def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (bytes.isEmpty) return bins
    var i = 0
    while (i < bytes.length) { bins((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
    var j = 0
    while (j < 16) { bins(j) /= bytes.length.toFloat; j += 1 }
    bins
  }

  /** Resize an image-shaped payload to `targetW`×`targetH` by
    * nearest-neighbor resampling. The payload is interpreted as a
    * `srcW`×`srcH` single-channel byte grid (a codec-backed decode would
    * supply real dimensions/channels; the index-mapping resample below is
    * the real thing and channel-count-agnostic). Partition-wise like
    * [[decodeStub]] so codec/buffer reuse amortizes per partition.
    */
  def resize(ds: Dataset[MediaRow], srcW: Int, srcH: Int,
             targetW: Int, targetH: Int)
            (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    require(srcW > 0 && srcH > 0 && targetW > 0 && targetH > 0)
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { m =>
        val out = new Array[Byte](targetW * targetH)
        var y = 0
        while (y < targetH) {
          val sy = y * srcH / targetH
          var x = 0
          while (x < targetW) {
            val sx = x * srcW / targetW
            val idx = sy * srcW + sx
            out(y * targetW + x) =
              if (idx < m.payload.length) m.payload(idx) else 0
            x += 1
          }
          y += 1
        }
        ResizedMedia(m.id, m.kind, targetW, targetH, out)
      }
    }
  }

  /** Frame sampling for video-shaped payloads: fixed-size frames, every
    * `stride`-th kept. Column-level (codegen'd), no UDF.
    */
  def sampleFrames(payload: org.apache.spark.sql.Column, frameSize: Int, stride: Int)
    : org.apache.spark.sql.Column =
    transform(
      sequence(lit(0L),
        greatest(floor((octet_length(payload) - 1) / (frameSize * stride)).cast("long"), lit(0L))),
      i => substring(payload, (i * frameSize * stride + 1).cast("int"), lit(frameSize)))
}
