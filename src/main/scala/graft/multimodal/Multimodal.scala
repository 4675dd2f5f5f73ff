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

/** Decoded audio: true stream parameters from the codec, mono PCM
  * stats in exact integers (peak amplitude, zero crossings), and the
  * 16-bin amplitude-histogram feature (exact integer ratios).
  */
case class DecodedAudio(id: Long, kind: String, sampleRate: Int,
                        channels: Int, nSamples: Int, peak: Int,
                        zeroCrossings: Long, feature: Array[Float])

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

  /** REAL image decode via JDK ImageIO — the codec-backed sibling of
    * [[decodeStub]] behind the same seam (same input/output shape, same
    * partition-wise iteration), using only the codecs the JDK ships
    * (PNG/BMP/GIF/JPEG/WBMP — no new dependencies, works offline).
    * Emits TRUE dimensions from the decoded image, `nFrames = 1`, and
    * the [[byteHistogram]] featurizer over the decoded 8-bit LUMA grid
    * (integer BT.601 weights → deterministic for the lossless formats).
    * Undecodable payloads are dropped (flatMap) — the standard posture
    * for corrupt media in a training-data sweep, where a poison blob
    * must not kill a 100 TB pass. `ImageIO.setUseCache(false)` keeps
    * the decode on-heap (no temp-file spooling per image).
    */
  def decodeImage(ds: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      rows.flatMap { m =>
        decodeLuma(m.payload).map { case (w, h, luma) =>
          DecodedMedia(m.id, m.kind, w, h, 1, byteHistogram(luma))
        }
      }
    }
  }

  /** Decode to the raw luma GRID (one byte per pixel, row-major) — the
    * real-pixels input for [[resizeGrid]] and any downstream
    * vision featurizer. Same drop-on-corrupt contract as [[decodeImage]].
    */
  def decodeImageGrid(ds: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        decodeLuma(m.payload).map { case (w, h, luma) =>
          ResizedMedia(m.id, m.kind, w, h, luma)
        }
      }
    }
  }

  /** Nearest-neighbor resample of PER-ROW-dimensioned grids (the decoded
    * form, where every image carries its own width/height) to a fixed
    * `targetW`×`targetH` — the variable-input sibling of [[resize]],
    * completing the real chain decode → resize → featurize.
    */
  def resizeGrid(ds: Dataset[ResizedMedia], targetW: Int, targetH: Int)
                (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0)
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { m =>
        val out = new Array[Byte](targetW * targetH)
        if (m.width > 0 && m.height > 0) {
          var y = 0
          while (y < targetH) {
            val sy = y * m.height / targetH
            var x = 0
            while (x < targetW) {
              val sx = x * m.width / targetW
              val idx = sy * m.width + sx
              out(y * targetW + x) =
                if (idx < m.pixels.length) m.pixels(idx) else 0
              x += 1
            }
            y += 1
          }
        }
        ResizedMedia(m.id, m.kind, targetW, targetH, out)
      }
    }
  }

  /** A 64-bit perceptual image fingerprint. */
  case class MediaHash(id: Long, kind: String, dhash: Long)

  /** Difference-hash (dHash) perceptual fingerprint over decoded
    * single-channel grids: nearest-neighbor resample to 9×8 (the
    * [[resizeGrid]] kernel), then bit `y·8+x` is set iff the pixel
    * right of (x, y) is strictly brighter — 64 horizontal-gradient
    * signs. The image sibling of SimHash for the near-dup rail:
    * re-encodes, resizes, and GLOBAL brightness/contrast shifts
    * preserve gradient signs, so near-duplicate images land within a
    * few bits of Hamming distance (pair them with
    * `bit_count(a ^ b) <= r` over a band-bucketed candidate join,
    * exactly the q38 SimHash layout). Brightness invariance is
    * spec-pinned: a uniformly brightened copy hashes IDENTICALLY.
    *
    * Scale shape: one typed map over the decoded grids — no shuffle;
    * the candidate join downstream owns the pairing cost.
    */
  def dHash(ds: Dataset[ResizedMedia])(implicit spark: SparkSession): Dataset[MediaHash] = {
    import spark.implicits._
    resizeGrid(ds, 9, 8).mapPartitions { rows =>
      rows.map { m =>
        var h = 0L
        var k = 0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val a = m.pixels(y * 9 + x) & 0xFF
            val b = m.pixels(y * 9 + x + 1) & 0xFF
            if (b > a) h |= (1L << k)
            k += 1
            x += 1
          }
          y += 1
        }
        MediaHash(m.id, m.kind, h)
      }
    }
  }

  /** ImageIO decode + integer BT.601 luma ((299·R + 587·G + 114·B)/1000
    * over the ARGB int — exact integer arithmetic, platform-stable for
    * lossless codecs). Returns None when no installed reader accepts the
    * payload or decoding fails.
    */
  private def decodeLuma(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))).map { bi =>
        val (w, h) = (bi.getWidth, bi.getHeight)
        val luma = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = bi.getRGB(x, y)
            val l = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
              114 * (rgb & 0xFF)) / 1000
            luma(y * w + x) = l.toByte
            x += 1
          }
          y += 1
        }
        (w, h, luma)
      }
    } catch { case _: Exception => None }

  /** REAL audio decode via `javax.sound.sampled` (JDK-shipped: WAV/AIFF/AU
    * containers, PCM + the JDK's ULAW/ALAW converters — no new
    * dependencies, works offline) — the audio sibling of [[decodeImage]]
    * behind the same seam: partition-wise iteration, drop-on-corrupt.
    * Non-16-bit/-signed streams are converted through the JDK's codec
    * chain to PCM_SIGNED 16-bit, multi-channel frames mix down to mono
    * by integer channel average (truncating division — deterministic),
    * and the emitted stats are exact integers: true sample rate/channel
    * count from the header, mono sample count, peak |amplitude|, and
    * zero crossings (sign flips, zeros skipped). `feature` is the
    * 16-bin amplitude histogram ([[amplitudeHistogram]]) — same shape
    * as the image/stub features, so the ANN/dedup rails (q151's decode
    * → embed → neighbor composition) consume audio unchanged.
    */
  def decodeWav(ds: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[DecodedAudio] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { m =>
        decodePcmMono(m.payload).map { case (rate, ch, mono) =>
          var peak = 0
          var zc = 0L
          var prevSign = 0
          var i = 0
          while (i < mono.length) {
            val s = mono(i)
            val a = math.abs(s)
            if (a > peak) peak = a
            val sign = Integer.signum(s)
            if (sign != 0) {
              if (prevSign != 0 && sign != prevSign) zc += 1
              prevSign = sign
            }
            i += 1
          }
          DecodedAudio(m.id, m.kind, rate, ch, mono.length, peak, zc,
            amplitudeHistogram(mono))
        }
      }
    }
  }

  /** javax.sound decode to mono PCM16 ints: (sampleRate, srcChannels,
    * monoSamples). None when no installed reader accepts the payload or
    * conversion/decoding fails (the corrupt→drop contract).
    */
  private def decodePcmMono(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = src.getFormat
        val ch = f.getChannels
        val rate = math.round(f.getSampleRate)
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, ch, 2 * ch, f.getSampleRate, false)
        val pcm =
          if (f.matches(target)) src
          else javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
        val bytes = pcm.readAllBytes()
        val frameBytes = 2 * ch
        val nFrames = bytes.length / frameBytes
        val mono = new Array[Int](nFrames)
        var i = 0
        while (i < nFrames) {
          var acc = 0
          var c = 0
          while (c < ch) {
            val o = i * frameBytes + 2 * c
            acc += ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort.toInt
            c += 1
          }
          mono(i) = acc / ch // truncating integer mixdown — deterministic
          i += 1
        }
        Some((rate, ch, mono))
      } finally src.close()
    } catch { case _: Exception => None }

  /** 16-bin normalized amplitude histogram of PCM16 samples — bin =
    * top 4 bits of the zero-offset amplitude `(s + 32768) >> 12`; exact
    * integer counts under one division each, the audio analog of
    * [[byteHistogram]].
    */
  def amplitudeHistogram(samples: Array[Int]): Array[Float] = {
    val bins = new Array[Float](16)
    if (samples.isEmpty) return bins
    var i = 0
    while (i < samples.length) {
      val v = math.min(65535, math.max(0, samples(i) + 32768))
      bins(v >> 12) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { bins(j) /= samples.length.toFloat; j += 1 }
    bins
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
