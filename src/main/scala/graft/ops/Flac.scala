package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** FLAC STREAMINFO census — the lossless-audio member of the
  * header-metadata family ([[Adts]]/[[Mp3]] cover the lossy side).
  * A FLAC file is the `fLaC` magic followed by metadata blocks —
  * 1-byte header (`last` bit + 7-bit type) + 24-bit big-endian length —
  * and the mandatory first block is STREAMINFO (type 0, 34 bytes),
  * whose packed bit-fields carry everything curation filters by:
  * sample rate (20 bits), channels−1 (3), bits-per-sample−1 (5), and
  * the 36-bit total sample count that gives an exact header-arithmetic
  * duration. Audio frames after the last metadata block are never
  * read.
  *
  * Census: rate/channels/bits, total samples, duration ms, metadata
  * block count, and the VORBIS_COMMENT (type 4) tag block — ID3's
  * analog here and where audio PII/attribution lives (r18 verdict #7):
  * the Xiph comment-header layout (little-endian u32 vendor length +
  * UTF-8 vendor string, u32 comment count, then per-comment u32
  * length + `FIELD=value` UTF-8, field names case-insensitive) is
  * walked fully; the census carries the vendor string, the TITLE and
  * ARTIST values, and the total tag count. Bad magic, a
  * non-STREAMINFO first block, a truncated block, zero rate, or a
  * VORBIS_COMMENT whose lengths escape the block degrade to
  * `parse_ok = false` rows — never a wrong-but-plausible extraction.
  */
object Flac {

  final case class FlacMeta(
      media_id: Long, parse_ok: Boolean,
      sample_rate: Int, channels: Int, bits_per_sample: Int,
      total_samples: Long, duration_ms: Long,
      n_blocks: Int, has_vorbis_comment: Int,
      vendor: Option[String], tag_title: Option[String],
      tag_artist: Option[String], n_tags: Int)

  private val Failed =
    FlacMeta(0L, parse_ok = false, 0, 0, 0, 0L, 0L, 0, 0,
      None, None, None, 0)

  /** Walk a METADATA_BLOCK_VORBIS_COMMENT payload (Xiph comment-header
    * spec). Returns (vendor, title, artist, n_tags); throws on any
    * length escaping the block so the caller degrades the row.
    */
  private def parseVorbisComment(b: Array[Byte], start: Int, len: Int)
      : (Option[String], Option[String], Option[String], Int) = {
    val end = start + len
    def u32le(p: Int): Long = {
      require(p + 4 <= end, "vorbis length field escapes block")
      ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    }
    var p = start
    val vlen = u32le(p); p += 4
    require(p + vlen <= end, "vendor string escapes block")
    val vendor = new String(b, p, vlen.toInt, "UTF-8")
    p += vlen.toInt
    val n = u32le(p); p += 4
    require(n <= len, "comment count exceeds block size") // cheap sanity
    var title: Option[String] = None
    var artist: Option[String] = None
    var i = 0L
    while (i < n) {
      val clen = u32le(p); p += 4
      require(p + clen <= end, "comment escapes block")
      val c = new String(b, p, clen.toInt, "UTF-8")
      p += clen.toInt
      val eq = c.indexOf('=')
      if (eq > 0) {
        // field names are case-insensitive ASCII per the spec
        c.substring(0, eq).toUpperCase(java.util.Locale.ROOT) match {
          case "TITLE" if title.isEmpty => title = Some(c.substring(eq + 1))
          case "ARTIST" if artist.isEmpty => artist = Some(c.substring(eq + 1))
          case _ => ()
        }
      }
      i += 1
    }
    (Some(vendor), title, artist, n.toInt)
  }

  def parseFlac(id: Long, bytes: Array[Byte]): FlacMeta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 8 && b(0) == 'f' && b(1) == 'L' &&
        b(2) == 'a' && b(3) == 'C', "bad magic")
      var p = 4
      var nBlocks = 0
      var hasVc = 0
      var rate = 0; var ch = 0; var bps = 0; var total = 0L
      var vendor: Option[String] = None
      var title: Option[String] = None
      var artist: Option[String] = None
      var nTags = 0
      var last = false
      while (!last) {
        require(p + 4 <= b.length, "truncated block header")
        val h = b(p) & 0xff
        last = (h & 0x80) != 0
        val typ = h & 0x7f
        require(typ != 127, "invalid block type")
        val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) |
          (b(p + 3) & 0xff)
        require(p + 4 + len <= b.length, "block escapes payload")
        if (nBlocks == 0) {
          // mandatory STREAMINFO first (§ format: METADATA_BLOCK_STREAMINFO)
          require(typ == 0 && len == 34, "first block not STREAMINFO")
          val s = p + 4
          // skip min/max blocksize (4) + min/max framesize (6) = 10 bytes
          val o = s + 10
          rate = ((b(o) & 0xff) << 12) | ((b(o + 1) & 0xff) << 4) |
            (((b(o + 2) & 0xff) >>> 4) & 0xf)
          require(rate > 0, "zero sample rate")
          ch = (((b(o + 2) & 0xff) >>> 1) & 7) + 1
          bps = (((b(o + 2) & 1) << 4) | (((b(o + 3) & 0xff) >>> 4) & 0xf)) + 1
          total = ((b(o + 3) & 0xfL) << 32) | ((b(o + 4) & 0xffL) << 24) |
            ((b(o + 5) & 0xffL) << 16) | ((b(o + 6) & 0xffL) << 8) |
            (b(o + 7) & 0xffL)
        } else if (typ == 4 && hasVc == 0) {
          // first VORBIS_COMMENT wins (the spec allows at most one;
          // tolerate-but-ignore duplicates rather than overwrite)
          hasVc = 1
          val (v, t, a, n) = parseVorbisComment(b, p + 4, len)
          vendor = v; title = t; artist = a; nTags = n
        }
        nBlocks += 1
        p += 4 + len
      }
      FlacMeta(id, parse_ok = true, rate, ch, bps, total,
        total * 1000L / rate, nBlocks, hasVc,
        vendor, title, artist, nTags)
    } catch {
      case _: Exception => Failed.copy(media_id = id)
    }

  /** STREAMINFO census over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt payloads flagged.
    */
  def flacMeta(media: DataFrame): Dataset[FlacMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseFlac(id, bytes) })
  }

  // --- synthetic fixture ----------------------------------------------------

  /** Deterministic FLAC header for media `id`: STREAMINFO with rate
    * `8000·(1+id%6)`, `1+id%8` channels, 8/12/16 bits, `1000·(3+id%7)`
    * total samples; on even ids a REAL spec-layout VORBIS_COMMENT
    * (vendor `graft flac 1.0`, `TITLE=Track <id>`,
    * `ARTIST=Artist <id%17>`, plus `ALBUM=Album <id%5>` when id%3=0 —
    * a lowercase `title=` duplicate on id%4=0 exercises both the
    * case-insensitive field match and first-wins); a PADDING block
    * closing the chain; then audio-frame junk the parser must never
    * reach.
    */
  def syntheticFlac(id: Long): Array[Byte] = {
    val rate = 8000 * (1 + (id % 6).toInt)
    val ch = 1 + (id % 8).toInt
    val bps = 8 + (id % 3).toInt * 4
    val total = 1000L * (3 + id % 7)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    def block(last: Boolean, typ: Int, payload: Array[Byte]): Unit = {
      out.write((if (last) 0x80 else 0) | typ)
      out.write((payload.length >>> 16) & 0xff)
      out.write((payload.length >>> 8) & 0xff)
      out.write(payload.length & 0xff)
      out.write(payload)
    }
    val si = new Array[Byte](34)
    // min/max blocksize 4096
    si(0) = 0x10; si(1) = 0x00; si(2) = 0x10; si(3) = 0x00
    // min/max framesize: junk-but-plausible
    si(4) = 0; si(5) = 1; si(6) = 0; si(7) = 0; si(8) = 2; si(9) = 0
    si(10) = ((rate >>> 12) & 0xff).toByte
    si(11) = ((rate >>> 4) & 0xff).toByte
    si(12) = (((rate & 0xf) << 4) | ((ch - 1) << 1) |
      (((bps - 1) >>> 4) & 1)).toByte
    si(13) = ((((bps - 1) & 0xf) << 4) | ((total >>> 32) & 0xf).toInt).toByte
    si(14) = ((total >>> 24) & 0xff).toByte
    si(15) = ((total >>> 16) & 0xff).toByte
    si(16) = ((total >>> 8) & 0xff).toByte
    si(17) = (total & 0xff).toByte
    // bytes 18..33: MD5 of the unencoded audio — junk here (never read)
    (18 until 34).foreach(i => si(i) = ((id * 7 + i) % 251).toByte)
    block(last = false, 0, si)
    if (id % 2 == 0) block(last = false, 4, syntheticVorbisComment(id))
    block(last = true, 1, new Array[Byte](8 + (id % 9).toInt)) // PADDING
    // audio frames: junk the parser never reaches
    (0 until 24).foreach(i => out.write(((id * 31 + i * 11) % 251).toInt))
    out.toByteArray
  }

  /** Real spec-layout Vorbis comment payload for media `id` — the
    * formulas the `multimodal_flac` oracle replays in SQL.
    */
  def syntheticVorbisComment(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); u32le(b.length); out.write(b)
    }
    str("graft flac 1.0")
    val tags = Seq(s"TITLE=Track $id", s"ARTIST=Artist ${id % 17}") ++
      (if (id % 3 == 0) Seq(s"ALBUM=Album ${id % 5}") else Nil) ++
      // a duplicate in a different case: the parser must match the
      // field case-insensitively AND keep the first value
      (if (id % 4 == 0) Seq(s"title=shadowed $id") else Nil)
    u32le(tags.length)
    tags.foreach(str)
    out.toByteArray
  }

  def syntheticFlacTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticFlac(id))))
      .toDF("media_id", "payload")
  }
}
