package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to a typed metadata struct; decode / feature
  * extraction runs batch-at-a-time inside `mapPartitions` so a real codec
  * drops in without touching the plumbing.
  *
  * The decode step itself is STUBBED (this environment ships no image or
  * audio libraries): [[stubDecode]] produces deterministic fake features
  * derived from the payload bytes. Everything around it — schema, batch
  * iteration, partition-level reuse of a (would-be) decoder handle,
  * output shape — is the real, tested scale path.
  */
object Multimodal {

  /** Metadata carried beside every binary payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a text corpus as a fake media table: payload = UTF-8 bytes (a
    * stand-in for encoded image/audio bytes), metadata derived
    * deterministically from content. In production the payload column
    * comes straight from `spark.read.format("binaryFile")` or a parquet
    * lake with a binary column — the shape is identical.
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        when(pmod(xxhash64(col(textCol)), lit(2)) === 0, lit("image/png"))
          .otherwise(lit("audio/wav")).as("media_type"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col(textCol), lit(2)), lit(1080)) + 1).cast("int").as("height"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, byte_mean: Double, byte_entropy_q: Long,
      feature: Array[Float])

  final case class FrameFeatures(
      media_id: Long, frame_idx: Int, offset: Long, frame_feature: Array[Float])

  /** Frame sampling over video-like payloads: emit one feature vector per
    * sampled frame (every `strideBytes` of payload, up to `maxFrames`).
    * The frame decode is STUBBED (no codecs in this environment) as a
    * deterministic digest of the frame's byte window; the Spark shape —
    * one input row fanning out to N typed frame rows via `flatMap` inside
    * `mapPartitions`, decoder handle reused per partition — is the real
    * scale path (at 100 TB the fan-out happens executor-side, never
    * driver-side).
    */
  def sampleFrames(
      media: DataFrame, strideBytes: Int = 4096, maxFrames: Int = 8,
      featureDim: Int = 4): Dataset[FrameFeatures] = {
    require(strideBytes > 0 && maxFrames >= 1 && featureDim > 0,
      s"invalid params: strideBytes=$strideBytes maxFrames=$maxFrames featureDim=$featureDim")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder seam (see extractFeatures)
        val decodeFrame: (Array[Byte], Int, Int) => Array[Float] = { (bytes, from, until) =>
          val out = new Array[Float](featureDim)
          var i = from
          while (i < until && i < bytes.length) {
            out((i - from) % featureDim) += (bytes(i) & 0xff) / 255f
            i += 1
          }
          out
        }
        it.flatMap { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
          val nFrames = math.min(
            maxFrames, math.max(1, (bytes.length + strideBytes - 1) / strideBytes))
          (0 until nFrames).iterator.map { f =>
            val from = f * strideBytes
            FrameFeatures(id, f, from.toLong,
              decodeFrame(bytes, from, math.min(from + strideBytes, bytes.length)))
          }
        }
      }
  }

  final case class ResizedMedia(
      media_id: Long, n_bytes: Long, resized_n: Long, resized_sum: Long,
      resized: Array[Byte])

  /** "Resize" over binary payloads — the codec-free analog of image
    * resizing: deterministic stride decimation to at most `targetBytes`
    * (output byte j = input byte ⌊j·n/rn⌋ with rn = min(n, target); a
    * payload already at/below target passes through unchanged — no
    * upsampling). A real implementation decodes, resamples pixels, and
    * re-encodes inside the same `mapPartitions` seam; the byte-level stub
    * keeps the contract (bytes in, smaller bytes out, executor-side only)
    * exact and DuckDB-checkable.
    */
  def resizePayloads(media: DataFrame, targetBytes: Int): Dataset[ResizedMedia] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
          val n = bytes.length
          val rn = math.min(n, targetBytes)
          val out = new Array[Byte](rn)
          var sum = 0L
          var j = 0
          while (j < rn) {
            // long arithmetic: j*n overflows Int beyond ~2 GB payloads
            val b = bytes(((j.toLong * n) / rn).toInt)
            out(j) = b
            sum += b & 0xff
            j += 1
          }
          ResizedMedia(id, n.toLong, rn.toLong, sum, out)
        }
      }
  }

  /** Batch feature extraction over the payload column.
    *
    * `mapPartitions` gives one iterator per partition: a real
    * implementation opens its codec/model ONCE per partition (the
    * expensive part) and streams batches through it; the stub documents
    * that seam with a per-partition `decoder` value. Output features are
    * deterministic functions of the bytes so tests can pin them.
    */
  def extractFeatures(media: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    require(featureDim > 0, s"featureDim must be positive, got $featureDim")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Seam: in production this is the per-partition codec/model init
        // (e.g. an ONNX session or libjpeg handle), reused across rows.
        val decoder: Array[Byte] => Array[Float] = { bytes =>
          // STUB decode: deterministic fake "features" — dim-strided byte
          // averages. Replace with a real decoder; the signature
          // (bytes in, fixed-dim float vector out) is the contract.
          val out = new Array[Float](featureDim)
          if (bytes.nonEmpty) {
            var i = 0
            val sums = new Array[Long](featureDim)
            val counts = new Array[Long](featureDim)
            while (i < bytes.length) {
              val b = bytes(i) & 0xff
              sums(i % featureDim) += b
              counts(i % featureDim) += 1
              i += 1
            }
            var d = 0
            while (d < featureDim) {
              out(d) = if (counts(d) == 0) 0f else (sums(d).toDouble / counts(d)).toFloat
              d += 1
            }
          }
          out
        }
        it.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
          val n = bytes.length.toLong
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          val mean = if (n == 0) 0.0 else sum.toDouble / n
          // quantized byte-mean bucket as a cheap "entropy-like" stat
          val entropyQ = (mean / 16).toLong
          // half-up to match SQL round() on both engines (rint is half-even)
          MediaFeatures(id, n, math.floor(mean * 10000 + 0.5) / 10000, entropyQ, decoder(bytes))
        }
      }
  }
}
