package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** MPEG-1/2 Layer III (MP3) frame-header census — the sibling of
  * [[Adts]] for the other ubiquitous audio framing. Every field a
  * curation filter keys on lives in the 4-byte frame headers (ISO/IEC
  * 11172-3 §2.4.1 layouts with the public bitrate/samplerate tables)
  * and the scan chains frame-to-frame by the header-derived frame
  * length — `floor(144000·br/rate) + pad` for MPEG-1 Layer III,
  * `72000`-scaled for MPEG-2 — so VBR streams census exactly without
  * decoding a single granule. Real files wrap the frames in metadata
  * tags, and a census that chokes on them is useless: a leading ID3v2
  * container (syncsafe 28-bit size, optional footer) is skipped, and a
  * trailing 128-byte ID3v1 `TAG` block terminates the scan cleanly.
  *
  * Census: MPEG version (1/2), sample rate, channel count (mode 3 =
  * mono), frame/padded-frame counts, min/max per-frame bitrate (the
  * VBR envelope), and exact duration by header arithmetic
  * (`frames · samplesPerFrame · 1000 / rate` ms; 1152 samples for
  * MPEG-1 Layer III, 576 for MPEG-2). Mid-stream version/rate/mode
  * changes, free-format (bitrate index 0), reserved indices, bad sync
  * at any boundary, and mid-frame truncation all degrade to
  * `parse_ok = false` rows; MPEG-2.5 and Layers I/II are outside this
  * census's contract and degrade likewise.
  *
  * Scale shape: one narrow `mapPartitions` pass, one row in → one row
  * out, cost linear in frame count (audio payload skipped by length).
  */
object Mp3 {

  /** MPEG-1 Layer III bitrate table (kbps), index 1–14 (§2.4.2.3). */
  private[ops] val BitratesV1: Array[Int] = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-2 Layer III bitrate table (kbps), index 1–14. */
  private[ops] val BitratesV2: Array[Int] = Array(
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  /** Sample-rate tables by version, index 0–2 (3 is reserved). */
  private[ops] val RatesV1: Array[Int] = Array(44100, 48000, 32000)
  private[ops] val RatesV2: Array[Int] = Array(22050, 24000, 16000)

  final case class Mp3Stats(
      media_id: Long, parse_ok: Boolean,
      version: Int, sample_rate: Int, channels: Int,
      n_frames: Long, n_padded: Long,
      bitrate_kbps_min: Int, bitrate_kbps_max: Int,
      duration_ms: Long)

  private val Failed =
    Mp3Stats(0L, parse_ok = false, 0, 0, 0, 0L, 0L, 0, 0, 0L)

  /** Bytes to skip for a leading ID3v2 container, 0 if absent. */
  private def id3v2Len(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    // syncsafe 28-bit size over bytes 6..9; high bit of each must be 0
    var sz = 0
    var i = 6
    while (i < 10) {
      require((b(i) & 0x80) == 0, "ID3v2 size not syncsafe")
      sz = (sz << 7) | (b(i) & 0x7f)
      i += 1
    }
    val footer = if ((b(5) & 0x10) != 0) 10 else 0
    val total = 10 + sz + footer
    require(total <= b.length, "ID3v2 tag escapes payload")
    total
  }

  /** Walk one MP3 stream. Version/rate/mode are read from the first
    * frame and must hold for every frame; per-frame bitrate may vary
    * (VBR) and is censused as an envelope.
    */
  def parseMp3(id: Long, bytes: Array[Byte]): Mp3Stats =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      var p = id3v2Len(b)
      require(p + 4 <= b.length, "too short for an MP3 header")
      var nFrames = 0L
      var nPadded = 0L
      var version = -1
      var rateIdx = -1
      var mode = -1
      var brMin = Int.MaxValue
      var brMax = 0
      while (p < b.length) {
        // trailing ID3v1: exactly 128 bytes starting "TAG" ends the scan
        if (b.length - p == 128 && b(p) == 'T' && b(p + 1) == 'A' && b(p + 2) == 'G') {
          p = b.length
        } else {
          require(p + 4 <= b.length, "truncated header")
          require((b(p) & 0xff) == 0xff && (b(p + 1) & 0xe0) == 0xe0, "bad sync")
          val ver = ((b(p + 1) & 0xff) >>> 3) & 3   // 3=MPEG1, 2=MPEG2, 0=2.5
          val layer = ((b(p + 1) & 0xff) >>> 1) & 3 // 1 = Layer III
          require(ver == 3 || ver == 2, "not MPEG-1/2")
          require(layer == 1, "not Layer III")
          val brIdx = ((b(p + 2) & 0xff) >>> 4) & 0xf
          require(brIdx >= 1 && brIdx <= 14, "free-format or bad bitrate index")
          val sri = ((b(p + 2) & 0xff) >>> 2) & 3
          require(sri < 3, "reserved samplerate index")
          val pad = ((b(p + 2) & 0xff) >>> 1) & 1
          val md = ((b(p + 3) & 0xff) >>> 6) & 3
          if (nFrames == 0L) { version = ver; rateIdx = sri; mode = md }
          else require(ver == version && sri == rateIdx && md == mode,
            "config changed mid-stream")
          val rate = (if (ver == 3) RatesV1 else RatesV2)(sri)
          val br = (if (ver == 3) BitratesV1 else BitratesV2)(brIdx)
          val frameLen =
            (if (ver == 3) 144000 else 72000) * br / rate + pad
          require(frameLen >= 4 && p + frameLen <= b.length,
            "frame escapes payload")
          nFrames += 1
          if (pad == 1) nPadded += 1
          brMin = math.min(brMin, br)
          brMax = math.max(brMax, br)
          p += frameLen
        }
      }
      require(nFrames > 0, "no frames")
      val rate = (if (version == 3) RatesV1 else RatesV2)(rateIdx)
      val spf = if (version == 3) 1152L else 576L
      Mp3Stats(id, parse_ok = true,
        version = if (version == 3) 1 else 2,
        sample_rate = rate,
        channels = if (mode == 3) 1 else 2,
        n_frames = nFrames, n_padded = nPadded,
        bitrate_kbps_min = brMin, bitrate_kbps_max = brMax,
        duration_ms = nFrames * spf * 1000L / rate)
    } catch {
      case _: Exception => Failed.copy(media_id = id)
    }

  // --- ID3v2 text frames (the EXIF analog for audio) -----------------------

  final case class Id3Meta(
      media_id: Long, parse_ok: Boolean, id3_version: Int,
      n_frames: Int, title: String, artist: String, album: String,
      year: String, genre: String)

  private val Id3Failed =
    Id3Meta(0L, parse_ok = false, 0, 0, "", "", "", "", "")

  /** Parse the leading ID3v2 container's TEXT frames (ID3v2.3 §3.3 /
    * v2.4 §4: 4-byte frame id, 4-byte size — plain in v2.3, syncsafe in
    * v2.4 — 2 flag bytes, then for `T***` frames an encoding byte +
    * text). Extracted: TIT2 title, TPE1 artist, TALB album, TYER/TDRC
    * year, TCON genre — the fields audio curation stratifies on.
    * Unknown frames are skipped by size; encodings 0 (ISO-8859-1) and
    * 3 (UTF-8) are decoded, others flag the file (v2.3's UTF-16 is
    * fixture-external by the dependency-free contract — documented,
    * like the codec ceilings). A file with NO ID3v2 container is a
    * flagged row: this op's contract is "extract the tag", not "maybe".
    */
  def parseId3(id: Long, bytes: Array[Byte]): Id3Meta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3',
        "no ID3v2 container")
      val ver = b(3) & 0xff
      require(ver == 3 || ver == 4, s"unsupported ID3v2.$ver")
      require((b(5) & 0x80) == 0, "unsynchronisation unsupported")
      val total = id3v2Len(b) // validates syncsafe size + bounds
      val end = total - (if ((b(5) & 0x10) != 0) 10 else 0)
      var p = 10
      var n = 0
      var title = ""; var artist = ""; var album = ""
      var year = ""; var genre = ""
      var done = false
      while (!done && p + 10 <= end) {
        if (b(p) == 0) done = true // zero-padding region
        else {
          val fid = new String(b, p, 4, "ISO-8859-1")
          require(fid.forall(c => c.isUpper || c.isDigit), s"bad frame id $fid")
          val sz =
            if (ver == 4) {
              var s = 0
              var i = p + 4
              while (i < p + 8) {
                require((b(i) & 0x80) == 0, "frame size not syncsafe")
                s = (s << 7) | (b(i) & 0x7f); i += 1
              }
              s
            } else
              ((b(p + 4) & 0xff) << 24) | ((b(p + 5) & 0xff) << 16) |
                ((b(p + 6) & 0xff) << 8) | (b(p + 7) & 0xff)
          require(sz >= 0 && p + 10 + sz <= end, "frame escapes tag")
          if (fid.startsWith("T") && sz >= 1) {
            // Frame status/format flags (ID3v2.3 §3.3 / v2.4 §4.1):
            // compression, encryption, grouping, and (v2.4) per-frame
            // unsynchronisation or a data-length indicator all change
            // the body layout — a flagged frame decoded as raw text
            // would be silently wrong, so degrade the row instead
            // (r18 ADVICE).
            require(b(p + 8) == 0 && b(p + 9) == 0,
              s"frame flags unsupported for $fid")
            val enc = b(p + 10) & 0xff
            require(enc == 0 || enc == 3, s"unsupported text encoding $enc")
            var to = p + 10 + sz
            while (to > p + 11 && b(to - 1) == 0) to -= 1 // trailing NULs
            val text = new String(b, p + 11, to - (p + 11),
              if (enc == 0) "ISO-8859-1" else "UTF-8")
            fid match {
              case "TIT2" => title = text
              case "TPE1" => artist = text
              case "TALB" => album = text
              case "TYER" | "TDRC" => year = text
              case "TCON" => genre = text
              case _ => ()
            }
          }
          n += 1
          p += 10 + sz
        }
      }
      require(n > 0, "empty ID3v2 container")
      Id3Meta(id, parse_ok = true, ver, n, title, artist, album, year, genre)
    } catch {
      case _: Exception => Id3Failed.copy(media_id = id)
    }

  /** ID3 text-frame extraction over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt/tag-less payloads
    * flagged.
    */
  def id3Meta(media: DataFrame): Dataset[Id3Meta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseId3(id, bytes) })
  }

  /** Fixture formulas shared with the multimodal_id3 oracle SQL. */
  def fixtureTitle(id: Long): String = s"title-${id % 23}"
  def fixtureArtist(id: Long): String = s"artist-${id % 11}"
  def fixtureAlbum(id: Long): String = s"album-${id % 7}"
  def fixtureYear(id: Long): String = s"${1990 + id % 35}"
  def fixtureGenre(id: Long): String = s"genre-${id % 5}"

  /** A tagged MP3: a real ID3v2.3 (even ids) / v2.4 (odd ids) container
    * holding the five text frames — v2.4 sizes syncsafe, v2.3 plain;
    * UTF-8 encoding byte on `id % 3 == 0` frames, ISO-8859-1 otherwise;
    * one unknown (`TXXX`) frame the parser must skip by size — followed
    * by the [[syntheticMp3]] frame stream for the same id.
    */
  def syntheticTaggedMp3(id: Long): Array[Byte] = {
    val v4 = id % 2 == 1
    val frames = new java.io.ByteArrayOutputStream()
    def frame(fid: String, text: String): Unit = {
      val enc = if (id % 3 == 0) 3 else 0
      val payload = Array((enc & 0xff).toByte) ++ text.getBytes("UTF-8")
      frames.write(fid.getBytes("ISO-8859-1"))
      val sz = payload.length
      if (v4) {
        frames.write((sz >>> 21) & 0x7f); frames.write((sz >>> 14) & 0x7f)
        frames.write((sz >>> 7) & 0x7f); frames.write(sz & 0x7f)
      } else {
        frames.write((sz >>> 24) & 0xff); frames.write((sz >>> 16) & 0xff)
        frames.write((sz >>> 8) & 0xff); frames.write(sz & 0xff)
      }
      frames.write(0); frames.write(0)
      frames.write(payload)
    }
    frame("TIT2", fixtureTitle(id))
    frame("TPE1", fixtureArtist(id))
    frame("TALB", fixtureAlbum(id))
    frame(if (v4) "TDRC" else "TYER", fixtureYear(id))
    frame("TCON", fixtureGenre(id))
    frame("TXXX", s"custom-${id % 3}") // unknown to the extractor: skipped
    val body = frames.toByteArray
    val pad = (id % 6).toInt // zero padding, routine in real tags
    val sz = body.length + pad
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(if (v4) 4 else 3); out.write(0); out.write(0)
    out.write((sz >>> 21) & 0x7f); out.write((sz >>> 14) & 0x7f)
    out.write((sz >>> 7) & 0x7f); out.write(sz & 0x7f)
    out.write(body)
    (0 until pad).foreach(_ => out.write(0))
    out.write(syntheticMp3(id))
    out.toByteArray
  }

  def syntheticTaggedMp3Table(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticTaggedMp3(id))))
      .toDF("media_id", "payload")
  }

  /** Header census over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt payloads flagged.
    */
  def mp3Stats(media: DataFrame): Dataset[Mp3Stats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseMp3(id, bytes) })
  }

  // --- synthetic fixture ----------------------------------------------------

  /** Deterministic MP3 stream for media `id`: `3 + id%8` Layer III
    * frames, MPEG-1 for even ids / MPEG-2 for odd, samplerate index
    * `id%3`, channel mode `id%4`, per-frame bitrate index
    * `1 + (id+f)%14` (a real VBR envelope), padding on odd frames when
    * `id%3 == 0`; `id%5 == 0` files lead with an ID3v2 container
    * (syncsafe-sized junk) and `id%4 == 0` files trail a 128-byte ID3v1
    * `TAG` block — the metadata wrappers every real lake contains.
    */
  def syntheticMp3(id: Long): Array[Byte] = {
    val nFrames = 3 + (id % 8).toInt
    val v1 = id % 2 == 0
    val sri = (id % 3).toInt
    val mode = (id % 4).toInt
    val rate = (if (v1) RatesV1 else RatesV2)(sri)
    val out = new java.io.ByteArrayOutputStream()
    if (id % 5 == 0) {
      val sz = 20 + (id % 30).toInt
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((sz >>> 21) & 0x7f); out.write((sz >>> 14) & 0x7f)
      out.write((sz >>> 7) & 0x7f); out.write(sz & 0x7f)
      var i = 0
      while (i < sz) { out.write(((id * 13 + i) % 251).toInt); i += 1 }
    }
    var f = 0
    while (f < nFrames) {
      val brIdx = 1 + ((id + f) % 14).toInt
      val br = (if (v1) BitratesV1 else BitratesV2)(brIdx)
      val pad = if (id % 3 == 0 && f % 2 == 1) 1 else 0
      val frameLen = (if (v1) 144000 else 72000) * br / rate + pad
      out.write(0xff)
      out.write(0xe0 | ((if (v1) 3 else 2) << 3) | (1 << 1) | 1) // ver|L3|no CRC
      out.write((brIdx << 4) | (sri << 2) | (pad << 1))
      out.write(mode << 6)
      var i = 4
      while (i < frameLen) {
        out.write(((id * 31 + f * 17 + i * 7) % 251).toInt)
        i += 1
      }
      f += 1
    }
    if (id % 4 == 0) {
      out.write('T'); out.write('A'); out.write('G')
      var i = 0
      while (i < 125) { out.write(((id * 7 + i) % 251).toInt); i += 1 }
    }
    out.toByteArray
  }

  def syntheticMp3Table(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticMp3(id))))
      .toDF("media_id", "payload")
  }
}
