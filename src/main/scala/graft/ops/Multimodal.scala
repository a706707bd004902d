package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to a typed metadata struct; decode / feature
  * extraction runs batch-at-a-time inside `mapPartitions` so a real codec
  * drops in without touching the plumbing.
  *
  * Three codec tiers share the seam:
  *  - REAL image path via the JVM's built-in `javax.imageio` (PNG/JPEG —
  *    no external deps): [[syntheticPngTable]] encodes, [[decodeImages]]
  *    decodes dimensions + pixel statistics, [[resizeImages]] decodes →
  *    nearest-neighbor resamples → re-encodes. PNG is lossless, so pixel
  *    arithmetic survives the round trip bit-exactly and the oracle can
  *    check it in SQL.
  *  - REAL audio path via the JVM's built-in `javax.sound.sampled`
  *    (WAV/PCM — no external deps): [[syntheticWavTable]] encodes
  *    deterministic 16-bit PCM through the real WAV writer,
  *    [[decodeAudio]] decodes format metadata + exact integer sample
  *    statistics, [[resampleAudio]] decodes → nearest-neighbor
  *    resamples frames → re-encodes, [[audioWindows]] fans one payload
  *    out to per-window sample moments (the RMS/loudness feature
  *    primitive). PCM is lossless, so sample arithmetic survives the
  *    round trip bit-exactly and the oracle replays it in SQL.
  *  - STUB byte-level path for media with no in-JVM codec (video):
  *    deterministic fake features derived from payload bytes. The
  *    surrounding shape — schema, batch iteration, per-partition decoder
  *    reuse, executor-side fan-out — is identical, so a native codec
  *    drops in without touching the plumbing.
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

  // --- real javax.imageio path ------------------------------------------

  /** Deterministic 8-bit grayscale PNG: pixel(x,y) = (id·31 + x·7 + y·13)
    * mod 256, encoded through the REAL ImageIO PNG writer. PNG is
    * lossless, so the decode side recovers exactly these samples — the
    * formula is the SQL oracle's ground truth.
    */
  def syntheticPng(id: Long, width: Int, height: Int,
      perturb00: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var v = ((id * 31 + x * 7 + y * 13) % 256).toInt
        // near-copy perturbation for dedup tests: nudge ONE pixel by ±8
        // WITHOUT mod-wrap (a wrap would shift the image mean by ~250 and
        // scatter the perceptual hash instead of staying a near-dup)
        if (perturb00 && x == 0 && y == 0) v = if (v < 248) v + 8 else v - 8
        raster.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "png", bos)
    require(ok, "no PNG writer available in this JVM")
    bos.toByteArray
  }

  /** Synthetic PNG corpus keyed by a non-negative id column: dimensions
    * (4 + id mod 13) × (4 + id mod 7), pixels per [[syntheticPng]]. The
    * encode runs executor-side in `mapPartitions` — the same place a real
    * pipeline's `binaryFile` scan or parquet binary column lands.
    */
  def syntheticPngTable(df: DataFrame, idCol: String,
      perturb00: Boolean = false, idOffset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 4 + (id % 13).toInt
          val h = 4 + (id % 7).toInt
          // dims/pixels keyed by the SOURCE id; idOffset relabels the
          // output row (near-copy corpora for dedup tests)
          (id + idOffset, syntheticPng(id, w, h, perturb00))
        }
      }
      .toDF("media_id", "payload")
  }

  final case class DecodedImage(
      media_id: Long, n_bytes: Long, decoded: Boolean, width: Int, height: Int,
      pixel_sum: Long, pixel_min: Int, pixel_max: Int)

  /** The shared decode prologue of [[decodeImages]]/[[resizeImages]]:
    * null/empty-safe ImageIO read, null on ANY decoder failure — JDK
    * image readers throw unchecked exceptions on malformed payloads
    * (ArrayIndexOutOfBounds, NegativeArraySize, CMMException, …), not
    * just IOException, and at corpus scale one crafted blob must not
    * kill the scan.
    */
  private def tryDecode(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null || bytes.isEmpty) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }

  /** REAL image decode at the codec seam: `javax.imageio.ImageIO.read`
    * per payload (PNG/JPEG/GIF/BMP — whatever the JVM's registered
    * readers handle), emitting dimensions and band-0 pixel statistics
    * (band 0 = gray for grayscale, red for RGB; callers needing luma
    * combine bands here). Per-partition seam: the in-memory-only cache
    * setting and reader lookup happen once per partition, rows stream
    * through. Undecodable/null payloads degrade to `decoded = false`
    * zero-stat rows rather than failing the job — at corpus scale one
    * corrupt blob must not kill the scan.
    */
  def decodeImages(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
          val img = tryDecode(bytes)
          if (img == null)
            DecodedImage(id, bytes.length.toLong, decoded = false, 0, 0, 0L, 0, 0)
          else {
            val raster = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            var sum = 0L
            var min = Int.MaxValue
            var max = Int.MinValue
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = raster.getSample(x, y, 0)
                sum += v
                if (v < min) min = v
                if (v > max) max = v
                x += 1
              }
              y += 1
            }
            DecodedImage(id, bytes.length.toLong, decoded = true, w, h, sum, min, max)
          }
        }
      }
  }

  /** REAL resize at the same seam: ImageIO decode → exact nearest-neighbor
    * resample (src index = ⌊dst·srcDim/dstDim⌋ — integer arithmetic, so
    * the oracle replays it in SQL; `java.awt` interpolating scalers are
    * not arithmetic-reproducible) → ImageIO PNG re-encode. Grayscale
    * band-0 resample; output schema matches [[syntheticPngTable]] so
    * resize chains into [[decodeImages]]. Undecodable payloads are
    * dropped here (flagged upstream by [[decodeImages]] if the caller
    * audits first — the curation-pipeline composition).
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytesOrNull) =>
          val img = tryDecode(bytesOrNull)
          if (img == null) Iterator.empty
          else {
            val src = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            val out = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val dst = out.getRaster
            var y = 0
            while (y < targetH) {
              val sy = (y.toLong * h / targetH).toInt
              var x = 0
              while (x < targetW) {
                val sx = (x.toLong * w / targetW).toInt
                dst.setSample(x, y, 0, src.getSample(sx, sy, 0))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Iterator.single((id, bos.toByteArray))
          }
        }
      }
      .toDF("media_id", "payload")
  }

  final case class ImageHash(media_id: Long, ahash: Long)

  /** Perceptual average-hash (aHash) over the REAL codec tier: decode →
    * exact nearest-neighbor 8×8 resample (`s(x,y) = ⌊x·w/8⌋,⌊y·h/8⌋` —
    * the same integer resample as [[resizeImages]]) → 64-bit hash with
    * bit `y·8+x` set iff `64·v > Σv` (cross-multiplied integer compare,
    * no division, so the bits are engine-exact and the oracle replays
    * them arithmetically). Visually-near images land within a few bits
    * of Hamming distance regardless of original resolution — the
    * standard image near-dup key. Undecodable payloads are dropped
    * (audit first with [[decodeImages]]'s decoded flag). Shuffle-free.
    */
  def imageAHash(media: DataFrame): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytesOrNull) =>
          val img = tryDecode(bytesOrNull)
          if (img == null) Iterator.empty
          else {
            val r = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            val v = new Array[Int](64)
            var s = 0L
            var y = 0
            while (y < 8) {
              val sy = (y.toLong * h / 8).toInt
              var x = 0
              while (x < 8) {
                val sx = (x.toLong * w / 8).toInt
                val px = r.getSample(sx, sy, 0)
                v(y * 8 + x) = px
                s += px
                x += 1
              }
              y += 1
            }
            var hash = 0L
            var i = 0
            while (i < 64) {
              if (64L * v(i) > s) hash |= (1L << i)
              i += 1
            }
            Iterator.single(ImageHash(id, hash))
          }
        }
      }
  }

  final case class ImageDHash(media_id: Long, dhash: Long)

  /** Perceptual difference-hash (dHash) over the same REAL codec tier as
    * [[imageAHash]]: decode → exact nearest-neighbor resample onto a
    * 9×8 grid (`sx = ⌊x·w/9⌋`, `sy = ⌊y·h/8⌋`) → 64-bit hash with bit
    * `y·8+x` set iff the pixel is DARKER than its right neighbor
    * (`v(x,y) < v(x+1,y)`). Pure integer compares between sampled
    * pixels — no mean, no division — so a uniform brightness shift
    * flips NO bits (every gradient sign survives), where aHash can flip
    * up to half its bits: the two hashes catch different edit classes,
    * which is why image dedup pipelines run both. Engine-exact; the
    * oracle replays the grid arithmetic. Undecodable payloads drop.
    * Shuffle-free.
    */
  def imageDHash(media: DataFrame): Dataset[ImageDHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytesOrNull) =>
          val img = tryDecode(bytesOrNull)
          if (img == null) Iterator.empty
          else {
            val r = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            var hash = 0L
            var y = 0
            while (y < 8) {
              val sy = (y.toLong * h / 8).toInt
              var x = 0
              var prev = r.getSample(0, sy, 0)
              while (x < 8) {
                val sx = ((x + 1).toLong * w / 9).toInt
                val next = r.getSample(sx, sy, 0)
                if (prev < next) hash |= (1L << (y * 8 + x))
                prev = next
                x += 1
              }
              y += 1
            }
            Iterator.single(ImageDHash(id, hash))
          }
        }
      }
  }

  /** Image near-dup pairs over [[imageAHash]] hashes: the 4-chunk
    * pigeonhole band join (any pair within `maxHamming ≤ 3` bits shares
    * at least one identical 16-bit chunk), then the exact
    * `bit_count(xor)` verify — the same never-all-pairs shape as the
    * SimHash text path; candidates are bounded by bucket collisions,
    * not n². Output: `(id_a, id_b, hamming)` with `id_a < id_b`.
    */
  def ahashNearDups(hashes: DataFrame, idCol: String = "media_id",
      hashCol: String = "ahash", maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-chunk pigeonhole is complete only to maxHamming 3: $maxHamming")
    val chunks = hashes.select(
      col(s"`$idCol`").as("__id"), col(s"`$hashCol`").as("__h"),
      explode(array((0 until 4).map(j => struct(
        lit(j).as("j"),
        (shiftrightunsigned(col(s"`$hashCol`"), 16 * j) bitwiseAND lit(0xFFFFL))
          .as("ck"))): _*)).as("__c"))
      .select(col("__id"), col("__h"),
        col("__c.j").as("__j"), col("__c.ck").as("__ck"))
    val a = chunks.select(col("__id").as("id_a"), col("__h").as("__ha"),
      col("__j"), col("__ck"))
    val b = chunks.select(col("__id").as("id_b"), col("__h").as("__hb"),
      col("__j"), col("__ck"))
    a.join(b, Seq("__j", "__ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // --- real javax.sound.sampled path (WAV / 16-bit PCM audio) ------------

  /** Deterministic 16-bit PCM WAV: interleaved
    * `sample(frame i, channel c) = ((id·31 + i·7919 + c·131) mod 65536) − 32768`
    * (full int16 swing; the 7919 frame stride wraps the int16 range
    * every ~8 frames, so adjacent-window energies are decorrelated —
    * a slow ramp would hand every pair of docs a near-identical
    * energy-gradient fingerprint), encoded through the REAL `javax.sound.sampled`
    * WAV writer. PCM WAV is lossless, so the decode side recovers
    * exactly these samples — the formula is the SQL oracle's ground
    * truth (the [[syntheticPng]] contract, audio tier). The canonical
    * WAVE container is a 44-byte RIFF header + `nFrames·channels·2`
    * data bytes, so even `n_bytes` is oracle-predictable.
    */
  def syntheticWav(id: Long, nFrames: Int, sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(nFrames > 0 && sampleRate > 0 && channels > 0,
      s"bad wav params frames=$nFrames rate=$sampleRate ch=$channels")
    val pcm = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val v = (((id * 31 + i.toLong * 7919 + c.toLong * 131) % 65536L) - 32768L).toInt
        val off = (i * channels + c) * 2
        pcm(off) = (v & 0xff).toByte // WAV PCM is little-endian
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthetic WAV corpus keyed by a non-negative id column: per id,
    * `nFrames = 50 + id mod 101`, `channels = 1 + id mod 2`, sample rate
    * 8000/11025/16000 by `id mod 3`, samples per [[syntheticWav]]. Ids
    * with `corruptMod > 0 && id mod corruptMod == 0` get a deliberately
    * non-WAV payload (the bytes "NOTAWAVE") so downstream decode must
    * exercise its corrupt-blob degradation. Encode runs executor-side in
    * `mapPartitions` — the same seam as [[syntheticPngTable]].
    */
  def syntheticWavTable(df: DataFrame, idCol: String,
      corruptMod: Long = 0L, perturb0: Boolean = false,
      idOffset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (corruptMod > 0 && id % corruptMod == 0)
            (id + idOffset,
              "NOTAWAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          else {
            val n = 50 + (id % 101).toInt
            val ch = 1 + (id % 2).toInt
            val rate = (id % 3) match {
              case 0 => 8000
              case 1 => 11025
              case _ => 16000
            }
            val wav = syntheticWav(id, n, rate, ch)
            if (perturb0) {
              // near-copy perturbation for dedup tests: nudge SAMPLE 0
              // by ±8 without int16 wrap (a wrap would swing one window's
              // energy by ~4e9 and scatter the perceptual hash instead of
              // staying a near-dup). Sample 0 lives in the canonical
              // 44-byte header's shadow: data offset 44, little-endian.
              val v = (((id * 31) % 65536L) - 32768L).toInt
              val nv = if (v <= 32759) v + 8 else v - 8
              wav(44) = (nv & 0xff).toByte
              wav(45) = ((nv >> 8) & 0xff).toByte
            }
            (id + idOffset, wav)
          }
        }
      }
      .toDF("media_id", "payload")
  }

  final case class DecodedAudio(
      media_id: Long, n_bytes: Long, decoded: Boolean, channels: Int,
      sample_rate: Int, bits: Int, n_frames: Long, duration_us: Long,
      sample_sum: Long, sample_sqsum: Long, sample_min: Int, sample_max: Int)

  /** Raw interleaved 16-bit PCM little-endian samples of a decodable
    * 16-bit PCM WAV payload, or null on any decode failure — the shared
    * decode prologue of the audio tier (the [[tryDecode]] contract:
    * audio parsers throw unchecked exceptions on malformed containers,
    * and one crafted blob must not kill a corpus scan). Returns the
    * format and the PCM data; callers parse samples from the bytes.
    */
  private def tryDecodePcm(bytes: Array[Byte])
      : (javax.sound.sampled.AudioFormat, Array[Byte]) =
    if (bytes == null || bytes.isEmpty) null
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) null
          else (fmt, ais.readAllBytes())
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => null }

  /** REAL audio decode at the codec seam:
    * `javax.sound.sampled.AudioSystem.getAudioInputStream` per payload
    * (16-bit PCM WAV — the JVM's built-in reader), emitting container
    * metadata (channels, rate, bit depth, frame count), the exact
    * integral duration `n_frames·1e6 DIV rate` in µs, and EXACT int64
    * sample moments over all channels — sum, sum-of-squares (the RMS
    * numerator: `rms = sqrt(sqsum/n)` is one caller-side float op),
    * min, max. All-integer outputs, so a SQL oracle replays every value
    * from the sample formula; no float fold anywhere. Undecodable,
    * null, or non-PCM16 payloads degrade to `decoded = false` zero-stat
    * rows rather than failing the job — at corpus scale one corrupt
    * blob must not kill the scan. Shuffle-free; per-partition seam as
    * [[decodeImages]].
    */
  def decodeAudio(media: DataFrame): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
          val dec = tryDecodePcm(bytes)
          if (dec == null)
            DecodedAudio(id, bytes.length.toLong, decoded = false,
              0, 0, 0, 0L, 0L, 0L, 0L, 0, 0)
          else {
            val (fmt, pcm) = dec
            val ch = fmt.getChannels
            val rate = fmt.getSampleRate.toInt
            val nSamples = pcm.length / 2
            val nFrames = (nSamples / ch).toLong
            var sum = 0L
            var sq = 0L
            var min = Int.MaxValue
            var max = Int.MinValue
            var s = 0
            while (s < nSamples) {
              val v = ((pcm(2 * s) & 0xff) | (pcm(2 * s + 1) << 8)).toShort.toInt
              sum += v
              sq += v.toLong * v
              if (v < min) min = v
              if (v > max) max = v
              s += 1
            }
            if (nSamples == 0) { min = 0; max = 0 }
            DecodedAudio(id, bytes.length.toLong, decoded = true, ch, rate, 16,
              nFrames, nFrames * 1000000L / rate, sum, sq, min, max)
          }
        }
      }
  }

  /** REAL audio resample at the same seam: decode → exact
    * nearest-neighbor frame resample (`dst frame i` copies `src frame
    * ⌊i·srcFrames/dstFrames⌋`, every channel — integer arithmetic, so
    * the oracle replays it in SQL; interpolating resamplers are not
    * arithmetic-reproducible) → WAV re-encode at `targetRate` with
    * `dstFrames = max(1, srcFrames·targetRate DIV srcRate)`. Output
    * schema matches [[syntheticWavTable]] so resample chains into
    * [[decodeAudio]] — the audio twin of [[resizeImages]]. Undecodable
    * payloads are dropped (flag upstream with [[decodeAudio]]'s
    * `decoded` first — the curation-pipeline composition).
    */
  def resampleAudio(media: DataFrame, targetRate: Int): DataFrame = {
    require(targetRate > 0, s"targetRate must be positive: $targetRate")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytesOrNull) =>
          val dec = tryDecodePcm(bytesOrNull)
          if (dec == null) Iterator.empty
          else {
            val (fmt, pcm) = dec
            val ch = fmt.getChannels
            val srcRate = fmt.getSampleRate.toInt
            val srcN = pcm.length / (2 * ch)
            if (srcN == 0) Iterator.empty
            else {
              val dstN = math.max(1L, srcN.toLong * targetRate / srcRate).toInt
              val out = new Array[Byte](dstN * ch * 2)
              var i = 0
              while (i < dstN) {
                val si = (i.toLong * srcN / dstN).toInt
                var c = 0
                while (c < ch) {
                  out((i * ch + c) * 2) = pcm((si * ch + c) * 2)
                  out((i * ch + c) * 2 + 1) = pcm((si * ch + c) * 2 + 1)
                  c += 1
                }
                i += 1
              }
              val ofmt = new javax.sound.sampled.AudioFormat(
                targetRate.toFloat, 16, ch, true, false)
              val ais = new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(out), ofmt, dstN.toLong)
              val bos = new java.io.ByteArrayOutputStream()
              javax.sound.sampled.AudioSystem.write(
                ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
              Iterator.single((id, bos.toByteArray))
            }
          }
        }
      }
      .toDF("media_id", "payload")
  }

  final case class AudioWindow(
      media_id: Long, window_idx: Int, n_samples: Long,
      sample_sum: Long, sample_sqsum: Long)

  /** Per-window sample moments over the REAL audio tier — the
    * RMS/loudness feature primitive (windowed energy is the first
    * feature every audio-quality filter computes): one payload fans out
    * to ⌈frames/windowFrames⌉ typed rows, each carrying EXACT int64
    * count/sum/sum-of-squares over all channels of its frame window
    * (`rms = sqrt(sqsum/n)` is one caller-side float op away; kept
    * integral here so oracles hash-match). The fan-out happens
    * executor-side via `flatMap` inside `mapPartitions` — the
    * [[sampleFrames]] shape with a REAL decoder. Undecodable payloads
    * emit no rows.
    */
  def audioWindows(media: DataFrame, windowFrames: Int): Dataset[AudioWindow] = {
    require(windowFrames > 0, s"windowFrames must be positive: $windowFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytesOrNull) =>
          val dec = tryDecodePcm(bytesOrNull)
          if (dec == null) Iterator.empty
          else {
            val (fmt, pcm) = dec
            val ch = fmt.getChannels
            val nFrames = pcm.length / (2 * ch)
            val nWin = (nFrames + windowFrames - 1) / windowFrames
            (0 until nWin).iterator.map { w =>
              val from = w * windowFrames
              val until = math.min(from + windowFrames, nFrames)
              var sum = 0L
              var sq = 0L
              var f = from
              while (f < until) {
                var c = 0
                while (c < ch) {
                  val s = f * ch + c
                  val v = ((pcm(2 * s) & 0xff) | (pcm(2 * s + 1) << 8)).toShort.toInt
                  sum += v
                  sq += v.toLong * v
                  c += 1
                }
                f += 1
              }
              AudioWindow(id, w, (until - from).toLong * ch, sum, sq)
            }
          }
        }
      }
  }

  // --- real frame-stream (video) path -------------------------------------

  /** Deterministic multi-frame media payload: `2 + id mod 4` PNG frames
    * (frame f's pixels keyed by seed `id·1000 + f`, dimensions constant
    * per media — `(4 + id mod 13) × (4 + id mod 7)`) concatenated into
    * one binary stream, MJPEG-style. This is the honest in-JVM stand-in
    * for a video container: there is no H.264/VP9 codec in the JDK, but
    * a frame STREAM with real per-frame image decoding exercises every
    * piece of real video plumbing — container scanning, frame
    * boundaries, stride sampling, per-frame decode, executor-side
    * fan-out — and PNG frames keep the pixel arithmetic lossless, so
    * the SQL oracle replays every sampled frame's stats exactly.
    */
  def syntheticFrameStream(id: Long): Array[Byte] = {
    val w = 4 + (id % 13).toInt
    val h = 4 + (id % 7).toInt
    val n = 2 + (id % 4).toInt
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < n) {
      bos.write(syntheticPng(id * 1000 + f, w, h))
      f += 1
    }
    bos.toByteArray
  }

  def syntheticFrameStreamTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticFrameStream(id))))
      .toDF("media_id", "payload")
  }

  /** One REAL-JPEG frame: a uniform-gray `w`×`h` single-band image
    * encoded through the platform JPEG writer at compression quality
    * 1.0. Uniform gray is the one pixel content whose JPEG roundtrip is
    * BIT-EXACT by construction: every AC coefficient is zero, the DC
    * coefficient quantizes by 1 at quality 1.0, grayscale has no chroma
    * subsampling, and edge-replication padding of partial blocks stays
    * uniform — so decode returns exactly `gray` in every pixel and the
    * SQL oracle replays `pixel_sum = w·h·gray` with no codec model.
    * (MultimodalSpec asserts the roundtrip over every gray level.)
    */
  def syntheticJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && gray >= 0 && gray <= 255,
      s"invalid frame: ${w}x$h gray=$gray")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic MJPEG payload: `2 + id mod 4` REAL JPEG frames (the
    * dimension formulas of [[syntheticFrameStream]]; frame f uniform at
    * gray `(id·31 + f·17) mod 256`) concatenated into one binary
    * stream — which IS the MJPEG container format (a bare JPEG frame
    * concatenation, split on SOI markers). Unlike the PNG tier this
    * exercises the actual lossy-codec path end-to-end: entropy-coded
    * scan data, marker-escaped bytes, SOI boundary scanning.
    */
  def syntheticMjpegStream(id: Long): Array[Byte] = {
    val w = 4 + (id % 13).toInt
    val h = 4 + (id % 7).toInt
    val n = 2 + (id % 4).toInt
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < n) {
      bos.write(syntheticJpeg(w, h, ((id * 31 + f * 17) % 256).toInt))
      f += 1
    }
    bos.toByteArray
  }

  def syntheticMjpegTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticMjpegStream(id))))
      .toDF("media_id", "payload")
  }

  final case class VideoFrame(
      media_id: Long, frame_idx: Int, decoded: Boolean,
      width: Int, height: Int, pixel_sum: Long)

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** JPEG SOI + marker intro (`FF D8 FF`) — the MJPEG frame-boundary
    * scan key. Safe inside ImageIO-encoded streams: entropy-coded data
    * escapes FF as FF 00, restart markers are FF D0–D7, and no marker
    * segment payload the writer emits contains a raw FF D8.
    */
  private val JpegSoi: Array[Byte] =
    Array(0xff, 0xd8, 0xff).map(_.toByte)

  /** REAL frame extraction from a frame-stream payload: scan the bytes
    * for PNG signatures (the container parse — the same boundary scan an
    * MJPEG splitter does on JPEG SOI markers), take every `stride`-th
    * frame up to `maxFrames` (sampling WITHOUT decoding the skipped
    * frames — the property that makes frame sampling cheap on real
    * video), and decode each sampled frame through the real ImageIO
    * reader for dimensions + exact band-0 pixel sum. A frame that fails
    * to decode degrades to a flagged row (`decoded = false`); payloads
    * with no signature at all emit nothing. One input row fans out to
    * its sampled frames via `flatMap` inside `mapPartitions` —
    * executor-side only, the [[sampleFrames]] shape with a REAL decoder
    * behind it.
    */
  def sampleVideoFrames(media: DataFrame, stride: Int = 1,
      maxFrames: Int = 64): Dataset[VideoFrame] =
    sampleFrameStreamBy(media, PngSignature, stride, maxFrames)

  /** [[sampleVideoFrames]] over MJPEG payloads: the same container
    * scan / stride sample / per-frame ImageIO decode, keyed on the JPEG
    * SOI marker — the REAL lossy-codec video tier
    * ([[syntheticMjpegTable]] is the fixture generator; any true MJPEG
    * byte stream splits the same way).
    */
  def sampleMjpegFrames(media: DataFrame, stride: Int = 1,
      maxFrames: Int = 64): Dataset[VideoFrame] =
    sampleFrameStreamBy(media, JpegSoi, stride, maxFrames)

  private def sampleFrameStreamBy(media: DataFrame, signature: Array[Byte],
      stride: Int, maxFrames: Int): Dataset[VideoFrame] = {
    require(stride >= 1 && maxFrames >= 1,
      s"invalid params: stride=$stride maxFrames=$maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        def sigAt(b: Array[Byte], off: Int): Boolean = {
          if (off + signature.length > b.length) return false
          var k = 0
          while (k < signature.length) {
            if (b(off + k) != signature(k)) return false
            k += 1
          }
          true
        }
        it.flatMap { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
          // container parse: frame starts = signature offsets
          val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
          var i = 0
          while (i < bytes.length) {
            if (sigAt(bytes, i)) { starts += i; i += signature.length }
            else i += 1
          }
          starts.indices.iterator
            .filter(_ % stride == 0)
            .take(maxFrames)
            .map { fi =>
              val from = starts(fi)
              val until = if (fi + 1 < starts.length) starts(fi + 1) else bytes.length
              val img = tryDecode(java.util.Arrays.copyOfRange(bytes, from, until))
              if (img == null) VideoFrame(id, fi, decoded = false, 0, 0, 0L)
              else {
                val r = img.getRaster
                var sum = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) { sum += r.getSample(x, y, 0); x += 1 }
                  y += 1
                }
                VideoFrame(id, fi, decoded = true, img.getWidth, img.getHeight, sum)
              }
            }
        }
      }
  }

  final case class AudioEnergyHash(media_id: Long, ehash: Long)

  /** Perceptual audio fingerprint over the REAL codec tier — the audio
    * twin of [[imageDHash]]: decode, bucket frames into 65 equal-share
    * windows (`frame i → window ⌊i·65/n⌋` — the SQL-replayable
    * assignment; empty windows carry zero energy), compute each
    * window's EXACT int64 energy `E_w = Σ v²` over all channels, and
    * set bit `w` iff `E_w < E_{w+1}` — the energy-envelope GRADIENT
    * signature. Pure integer compares between exact sums, so uniform
    * volume scaling (energies scale by the square of the gain) flips
    * NO bits — the edit class that defeats absolute-energy signatures;
    * a localized edit perturbs one window's energy and at most its two
    * adjacent comparisons. Near-dups land within a few Hamming bits:
    * feed [[ahashNearDups]] (`hashCol = "ehash"`) for the banded pair
    * join. Undecodable payloads drop. Shuffle-free.
    */
  def audioEnergyHash(media: DataFrame): Dataset[AudioEnergyHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytesOrNull) =>
          val dec = tryDecodePcm(bytesOrNull)
          if (dec == null) Iterator.empty
          else {
            val (fmt, pcm) = dec
            val ch = fmt.getChannels
            val nF = pcm.length / (2 * ch)
            if (nF == 0) Iterator.empty
            else {
              val e = new Array[Long](65)
              var i = 0
              while (i < nF) {
                val w = (i.toLong * 65 / nF).toInt
                var c = 0
                while (c < ch) {
                  val s = i * ch + c
                  val v = ((pcm(2 * s) & 0xff) | (pcm(2 * s + 1) << 8)).toShort.toLong
                  e(w) += v * v
                  c += 1
                }
                i += 1
              }
              var hash = 0L
              var w = 0
              while (w < 64) {
                if (e(w) < e(w + 1)) hash |= (1L << w)
                w += 1
              }
              Iterator.single(AudioEnergyHash(id, hash))
            }
          }
        }
      }
  }

  // --- byte-level stub path (no in-JVM codec: video) ---------------------

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, byte_mean: Double, byte_entropy_q: Long,
      feature: Array[Float])

  final case class FrameFeatures(
      media_id: Long, frame_idx: Int, offset: Long, frame_feature: Array[Float])

  /** Frame sampling over video-like payloads: emit one feature vector per
    * sampled frame (every `strideBytes` of payload, up to `maxFrames`).
    * The frame decode is STUBBED (no in-JVM video codec exists — unlike
    * the image/audio tiers, which decode for real above) as a
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
