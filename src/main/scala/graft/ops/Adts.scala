package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ADTS (AAC transport, ISO/IEC 14496-3 §1.A.3) frame-header census —
  * the compressed-audio analog of the [[H264]] NAL tier. Everything a
  * curation pipeline filters audio FILES by — codec profile, sample
  * rate, channel count, frame count, duration — lives in the fixed
  * 7/9-byte headers that front every ADTS frame; the AAC payload
  * itself is never entropy-decoded (the same decode ceiling the video
  * tiers document). Header fields are plain big-endian bit-fields:
  * 12-bit syncword, MPEG id, profile, sampling-frequency index (the
  * public 13-entry table), channel configuration, 13-bit frame length
  * (which chains the scan from frame to frame), and the
  * raw-data-blocks count that scales each frame's 1024-sample payload.
  *
  * Duration is exact header arithmetic:
  * `blocks · 1024 · 1000 / sampleRate` ms — no decode. A protection
  * bit of 0 inserts a 2-byte CRC between header and payload, which the
  * walk must skip; the fixture exercises both forms. Corrupt streams
  * (bad sync at any boundary, frame escaping the payload, config
  * changing mid-stream) degrade to `parse_ok = false` rows.
  *
  * Scale shape: one narrow `mapPartitions` pass, one row in → one row
  * out, cost linear in frame count (payload bytes are skipped by the
  * frame-length field, never read).
  */
object Adts {

  /** §1.A.3.2.1 sampling_frequency_index table. */
  private[ops] val SampleRates: Array[Int] = Array(
    96000, 88200, 64000, 48000, 44100, 32000, 24000,
    22050, 16000, 12000, 11025, 8000, 7350)

  final case class AdtsStats(
      media_id: Long, parse_ok: Boolean,
      profile: Int, sample_rate: Int, channels: Int,
      n_frames: Long, n_blocks: Long, n_crc_frames: Long,
      duration_ms: Long)

  private val Failed =
    AdtsStats(0L, parse_ok = false, 0, 0, 0, 0L, 0L, 0L, 0L)

  /** Walk one ADTS elementary stream. The stream's (profile, rate,
    * channels) config is read from the first header and must hold for
    * every frame — a mid-stream change is corrupt by this census's
    * contract (real encoders keep it constant per stream).
    */
  def parseAdts(id: Long, bytes: Array[Byte]): AdtsStats =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 7, "too short for an ADTS header")
      var p = 0
      var nFrames = 0L
      var nBlocks = 0L
      var nCrc = 0L
      var profile = -1
      var srIdx = -1
      var channels = -1
      while (p < b.length) {
        require(p + 7 <= b.length, "truncated header")
        // syncword: 12 set bits
        require((b(p) & 0xff) == 0xff && (b(p + 1) & 0xf0) == 0xf0, "bad sync")
        require((b(p + 1) & 0x06) == 0, "nonzero layer")
        val protAbsent = b(p + 1) & 1
        val prof = ((b(p + 2) & 0xff) >>> 6) & 3
        val sri = ((b(p + 2) & 0xff) >>> 2) & 0xf
        require(sri < SampleRates.length, "reserved sampling_frequency_index")
        val cfg = ((b(p + 2) & 1) << 2) | (((b(p + 3) & 0xff) >>> 6) & 3)
        require(cfg >= 1, "zero channel_configuration")
        // ISO/IEC 14496-3 Table 1.19: configs 1..6 coincide with the
        // channel count but config 7 means 7.1 = 8 channels (r18 ADVICE:
        // reporting the raw value lied on real 7.1 streams).
        val ch = if (cfg == 7) 8 else cfg
        if (nFrames == 0L) { profile = prof; srIdx = sri; channels = ch }
        else require(prof == profile && sri == srIdx && ch == channels,
          "config changed mid-stream")
        val frameLen = ((b(p + 3) & 3) << 11) |
          ((b(p + 4) & 0xff) << 3) | (((b(p + 5) & 0xff) >>> 5) & 7)
        val headerLen = if (protAbsent == 1) 7 else 9
        require(frameLen >= headerLen && p + frameLen <= b.length,
          "frame escapes payload")
        val rdb = (b(p + 6) & 3) + 1 // number_of_raw_data_blocks + 1
        nFrames += 1
        nBlocks += rdb
        if (protAbsent == 0) nCrc += 1
        p += frameLen
      }
      require(nFrames > 0, "no frames")
      val rate = SampleRates(srIdx)
      AdtsStats(id, parse_ok = true, profile, rate, channels,
        nFrames, nBlocks, nCrc,
        nBlocks * 1024L * 1000L / rate)
    } catch {
      case _: Exception => Failed.copy(media_id = id)
    }

  /** Header census over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt payloads flagged.
    */
  def adtsStats(media: DataFrame): Dataset[AdtsStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseAdts(id, bytes) })
  }

  // --- synthetic fixture ----------------------------------------------------

  /** Deterministic ADTS stream for media `id`: `3 + id%9` frames at
    * sampling index `id%13`, profile `id%4`, `1 + id%6` channels,
    * `1 + id%3` raw data blocks per frame; odd frames carry a CRC
    * (protection_absent = frame parity) so both header widths appear in
    * every stream; payload bytes are deterministic junk the parser must
    * skip via frame_length.
    */
  def syntheticAdts(id: Long): Array[Byte] = {
    val nFrames = 3 + (id % 9).toInt
    val srIdx = (id % 13).toInt
    val profile = (id % 4).toInt
    val channels = 1 + (id % 6).toInt
    val rdbMinus1 = (id % 3).toInt
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val protAbsent = if (f % 2 == 0) 1 else 0
      val crcLen = if (protAbsent == 1) 0 else 2
      val payloadLen = 10 + ((id * 7 + f * 13) % 50).toInt
      val frameLen = 7 + crcLen + payloadLen
      // byte 0: sync hi
      out.write(0xff)
      // byte 1: sync lo (4) | ID=0 (MPEG-4) | layer 00 | protection_absent
      out.write(0xf0 | protAbsent)
      // byte 2: profile(2) | sampling_frequency_index(4) | private(1) | ch hi(1)
      out.write((profile << 6) | (srIdx << 2) | ((channels >> 2) & 1))
      // byte 3: ch lo(2) | original(1) copy(1) cid(1) cstart(1) | frameLen hi(2)
      out.write(((channels & 3) << 6) | ((frameLen >> 11) & 3))
      // byte 4: frameLen mid(8)
      out.write((frameLen >> 3) & 0xff)
      // byte 5: frameLen lo(3) | buffer fullness hi(5)
      out.write(((frameLen & 7) << 5) | 0x1f)
      // byte 6: buffer fullness lo(6) | raw_data_blocks(2)
      out.write(0xfc | rdbMinus1)
      if (crcLen == 2) { out.write(0xbe); out.write(0xef) }
      var i = 0
      while (i < payloadLen) {
        out.write(((id * 31 + f * 17 + i * 7) % 251).toInt)
        i += 1
      }
      f += 1
    }
    out.toByteArray
  }

  def syntheticAdtsTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticAdts(id))))
      .toDF("media_id", "payload")
  }
}
