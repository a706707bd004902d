package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ISO-BMFF (MP4, ISO/IEC 14496-12) container metadata extraction — the
  * dependency-free companion of [[H264]]. Real lakes hold H.264 in MP4
  * containers, not raw Annex-B; everything curation filters a video
  * FILE by — brand, track handler, duration, frame count, keyframe
  * cadence (the sync-sample table), codec configuration — is plain
  * big-endian box structure: a (size, fourcc) tree with tabular leaves.
  * No entropy decoding anywhere; the codec-private `avcC` record embeds
  * the SPS verbatim, so resolution/profile/level come from the SAME
  * spec-derived [[H264.parseSps]] the Annex-B tier uses (one parser,
  * two transports).
  *
  * Parsed (minimal, curation-sufficient): `ftyp` major brand; the first
  * video (`hdlr` = 'vide') track's `mdhd` timescale/duration,
  * `stts` sample count, `stss` sync-sample count (absent table = every
  * sample is a keyframe, per spec §8.6.2), and `stsd`/`avc1`/`avcC` →
  * SPS → dims/profile/level. Unknown boxes are skipped by size —
  * forward-compatible by construction, exactly how real demuxers
  * survive new box types.
  *
  * Pixel decode remains the documented codec-dep ceiling (README);
  * this tier is the container half of that missing item. Fixtures
  * ([[syntheticMp4]]) assemble structurally valid box trees through a
  * byte-level writer, embedding the [[H264]] builder's real escaped
  * SPS/PPS in `avcC`; the parser is independently pinned on a
  * hand-assembled golden box tree (Mp4Spec) that never touches the
  * builder. Scale shape: one narrow `mapPartitions` pass, cost linear
  * in box count (sample DATA is never touched — `mdat` skips by size).
  */
object Mp4 {

  // --- byte helpers -----------------------------------------------------

  private def be32(b: Array[Byte], off: Int): Long = {
    if (off + 4 > b.length) throw new IllegalArgumentException("box overrun")
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  }
  private def fourcc(b: Array[Byte], off: Int): String = {
    if (off + 4 > b.length) throw new IllegalArgumentException("box overrun")
    new String(b, off, 4, "ISO-8859-1")
  }

  /** Child boxes of `[from, until)`: (type, payloadFrom, payloadUntil).
    * 64-bit `size == 1` largesize and `size == 0` to-end forms handled
    * per §4.2; a size that escapes the parent is corrupt.
    */
  private def children(b: Array[Byte], from: Int, until: Int)
      : Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var i = from
    while (i + 8 <= until) {
      val size32 = be32(b, i)
      val typ = fourcc(b, i + 4)
      val (payFrom, boxEnd) =
        if (size32 == 1) {
          val hi = be32(b, i + 8); val lo = be32(b, i + 12)
          val sz = (hi << 32) | lo
          if (sz < 16 || i + sz > until) throw new IllegalArgumentException("bad largesize")
          (i + 16, i + sz.toInt)
        } else if (size32 == 0) (i + 8, until)
        else {
          if (size32 < 8 || i + size32 > until) throw new IllegalArgumentException("bad box size")
          (i + 8, i + size32.toInt)
        }
      out += ((typ, payFrom, boxEnd))
      i = boxEnd
    }
    out.toSeq
  }

  private def child(cs: Seq[(String, Int, Int)], typ: String)
      : Option[(Int, Int)] =
    cs.collectFirst { case (t, f, u) if t == typ => (f, u) }

  // --- per-file metadata --------------------------------------------------

  final case class Mp4Meta(
      media_id: Long, parse_ok: Boolean, brand: String,
      duration_ms: Long, n_samples: Long, n_keyframes: Long,
      width: Int, height: Int, profile_idc: Int, level_idc: Int)

  private val Failed =
    Mp4Meta(0L, parse_ok = false, "", 0L, 0L, 0L, 0, 0, 0, 0)

  /** The first 'vide'-handler track's demux-relevant box extents —
    * shared by the metadata tier ([[parseMp4]]) and the sample-data
    * demux ([[parseMp4Nals]]).
    */
  private final case class VideoTrack(
      brand: String, timescale: Long, duration: Long,
      stbl: Seq[(String, Int, Int)], avcCF: Int, avcCU: Int)

  private def findVideoTrack(b: Array[Byte]): VideoTrack = {
    val top = children(b, 0, b.length)
    val brand = child(top, "ftyp")
      .map { case (f, _) => fourcc(b, f) }.getOrElse("")
    val (moovF, moovU) = child(top, "moov")
      .getOrElse(throw new IllegalArgumentException("no moov"))
    val videoTrack = children(b, moovF, moovU)
      .filter(_._1 == "trak")
      .map { case (_, tf, tu) => children(b, tf, tu) }
      .find { tk =>
        child(tk, "mdia").exists { case (mf, mu) =>
          child(children(b, mf, mu), "hdlr").exists { case (hf, _) =>
            // FullBox(4) + pre_defined(4) then handler_type
            fourcc(b, hf + 8) == "vide"
          }
        }
      }
      .getOrElse(throw new IllegalArgumentException("no video track"))
    val (mdiaF, mdiaU) = child(videoTrack, "mdia").get
    val mdia = children(b, mdiaF, mdiaU)
    val (mdhdF, _) = child(mdia, "mdhd")
      .getOrElse(throw new IllegalArgumentException("no mdhd"))
    // mdhd v0: FullBox(4) + creation(4) + modification(4) + timescale(4)
    // + duration(4); v1 widens the three times to 64-bit (§8.4.2)
    val (timescale, duration) = b(mdhdF).toInt match {
      case 0 => (be32(b, mdhdF + 12), be32(b, mdhdF + 16))
      case 1 => (be32(b, mdhdF + 20),
        (be32(b, mdhdF + 24) << 32) | be32(b, mdhdF + 28))
      case _ => throw new IllegalArgumentException("unknown mdhd version")
    }
    require(timescale > 0, "zero timescale")
    // v1 64-bit durations: a sign-bit duration is corrupt per spec
    require(duration >= 0, "negative duration")
    val (minfF, minfU) = child(mdia, "minf")
      .getOrElse(throw new IllegalArgumentException("no minf"))
    val (stblF, stblU) = child(children(b, minfF, minfU), "stbl")
      .getOrElse(throw new IllegalArgumentException("no stbl"))
    val stbl = children(b, stblF, stblU)
    // stsd -> avc1 -> avcC
    val (stsdF, stsdU) = child(stbl, "stsd")
      .getOrElse(throw new IllegalArgumentException("no stsd"))
    val (avc1F, avc1U) = child(children(b, stsdF + 8, stsdU), "avc1")
      .getOrElse(throw new IllegalArgumentException("no avc1"))
    // VisualSampleEntry: 6 reserved + 2 data_ref_index + 16 pre_defined/
    // reserved + width(2) height(2) + 50 more bytes before child boxes
    val (avcCF, avcCU) = child(children(b, avc1F + 78, avc1U), "avcC")
      .getOrElse(throw new IllegalArgumentException("no avcC"))
    VideoTrack(brand, timescale, duration, stbl, avcCF, avcCU)
  }

  /** Parse one MP4 payload. The first 'vide'-handler track wins; files
    * with no video track, no avcC, or malformed boxes degrade to a
    * flagged row.
    */
  def parseMp4(id: Long, bytes: Array[Byte]): Mp4Meta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val vt = findVideoTrack(b)
      val stbl = vt.stbl
      // stts: FullBox(4) + entry_count + (sample_count, sample_delta)*
      val (sttsF, sttsU) = child(stbl, "stts")
        .getOrElse(throw new IllegalArgumentException("no stts"))
      val nStts = be32(b, sttsF + 4).toInt
      // entry table must fit ITS box, not merely the byte array — a
      // corrupt-but-in-bounds count must not census sibling-box bytes
      require(nStts >= 0 && sttsF + 8 + 8L * nStts <= sttsU, "stts entry overrun")
      var nSamples = 0L
      var i = 0
      while (i < nStts) { nSamples += be32(b, sttsF + 8 + 8 * i); i += 1 }
      // stss: sync samples; ABSENT table = every sample is sync (§8.6.2)
      val nKey = child(stbl, "stss")
        .map { case (f, _) => be32(b, f + 4) }.getOrElse(nSamples)
      // avcC: version(1) profile(1) compat(1) level(1) lengthSize(1)
      // numSPS(1, low 5 bits) + (len16, sps)*
      val avcCF = vt.avcCF
      require((b(avcCF + 5) & 0x1f) >= 1, "avcC without SPS")
      val spsLen = (((b(avcCF + 6) & 0xff) << 8) | (b(avcCF + 7) & 0xff))
      val spsNal = java.util.Arrays.copyOfRange(b, avcCF + 8, avcCF + 8 + spsLen)
      require((spsNal(0) & 0x1f) == 7, "avcC first parameter set not an SPS")
      val sps = H264.parseSps(H264.rbspUnescape(
        java.util.Arrays.copyOfRange(spsNal, 1, spsNal.length)))
      // overflow-safe ms conversion: duration * 1000 overflows Long for
      // extreme 64-bit v1 durations; split into whole + fractional parts
      // ((duration % timescale) * 1000 stays under 2^42 since timescale
      // is a u32)
      val durMs = vt.duration / vt.timescale * 1000L +
        (vt.duration % vt.timescale) * 1000L / vt.timescale
      Mp4Meta(id, parse_ok = true, vt.brand,
        durMs, nSamples, nKey,
        sps.width, sps.height, sps.profileIdc, sps.levelIdc)
    } catch {
      case _: Exception => Failed.copy(media_id = id)
    }

  // --- sample-data demux (§8.7: stsz/stsc/stco/co64 → mdat NALs) -----------

  /** avcC parameter sets + NAL length-prefix size: version(1)
    * profile(1) compat(1) level(1) | 0xfc+lengthSizeMinusOne(1) |
    * 0xe0+numSPS(1) (len16, sps)* | numPPS(1) (len16, pps)* —
    * ISO/IEC 14496-15 §5.2.4.1. Returns the SPS/PPS NAL units (header +
    * EBSP) in avcC order, exactly what an avcC→Annex-B transmux
    * prepends to the elementary stream.
    */
  private def avcCParams(b: Array[Byte], avcCF: Int, avcCU: Int)
      : (Int, Seq[Array[Byte]]) = {
    require(avcCF + 6 <= avcCU, "avcC truncated")
    val lengthSize = (b(avcCF + 4) & 3) + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = avcCF + 6
    def paramSets(n: Int): Unit = {
      var k = 0
      while (k < n) {
        require(p + 2 <= avcCU, "avcC truncated")
        val len = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
        require(len >= 1 && p + 2 + len <= avcCU, "avcC parameter set overrun")
        out += java.util.Arrays.copyOfRange(b, p + 2, p + 2 + len)
        p += 2 + len
        k += 1
      }
    }
    paramSets(b(avcCF + 5) & 0x1f)
    require(p + 1 <= avcCU, "avcC truncated before PPS count")
    val nPps = b(p) & 0xff
    p += 1
    paramSets(nPps)
    (lengthSize, out.toSeq)
  }

  /** Per-sample absolute byte extents `(offset, size)` from the sample
    * tables: stsz sizes (fixed or per-sample, §8.7.3), stsc
    * sample-to-chunk runs (§8.7.4), stco/co64 chunk offsets (§8.7.5).
    * Every table is bounds-checked against ITS OWN box; inconsistent
    * tables (chunks exhausting before samples, stsc not starting at
    * chunk 1, extents escaping the file) throw — callers degrade.
    */
  private def sampleExtents(b: Array[Byte], stbl: Seq[(String, Int, Int)])
      : Array[(Long, Int)] = {
    val (szF, szU) = child(stbl, "stsz")
      .getOrElse(throw new IllegalArgumentException("no stsz"))
    val fixed = be32(b, szF + 4)
    val nSamp = be32(b, szF + 8).toInt
    require(nSamp >= 0 && nSamp <= (1 << 24), "implausible sample count")
    val sizes: Array[Int] =
      if (fixed != 0) {
        require(fixed <= Int.MaxValue, "implausible fixed sample size")
        Array.fill(nSamp)(fixed.toInt)
      } else {
        require(szF + 12 + 4L * nSamp <= szU, "stsz entry overrun")
        Array.tabulate(nSamp) { i =>
          val v = be32(b, szF + 12 + 4 * i)
          require(v <= Int.MaxValue, "implausible sample size")
          v.toInt
        }
      }
    val offsets: Array[Long] = child(stbl, "stco") match {
      case Some((f, u)) =>
        val n = be32(b, f + 4).toInt
        require(n >= 0 && f + 8 + 4L * n <= u, "stco entry overrun")
        Array.tabulate(n)(i => be32(b, f + 8 + 4 * i))
      case None =>
        val (f, u) = child(stbl, "co64")
          .getOrElse(throw new IllegalArgumentException("no stco/co64"))
        val n = be32(b, f + 4).toInt
        require(n >= 0 && f + 8 + 8L * n <= u, "co64 entry overrun")
        Array.tabulate(n)(i =>
          (be32(b, f + 8 + 8 * i) << 32) | be32(b, f + 12 + 8 * i))
    }
    val (scF, scU) = child(stbl, "stsc")
      .getOrElse(throw new IllegalArgumentException("no stsc"))
    val nRuns = be32(b, scF + 4).toInt
    require(nRuns >= 1 && scF + 8 + 12L * nRuns <= scU, "stsc entry overrun")
    // (first_chunk 1-based, samples_per_chunk); sample_description_index
    // is demux-irrelevant here
    val runs = Array.tabulate(nRuns)(i =>
      (be32(b, scF + 8 + 12 * i).toInt, be32(b, scF + 12 + 12 * i).toInt))
    require(runs(0)._1 == 1, "stsc must start at chunk 1")
    val out = new Array[(Long, Int)](nSamp)
    var s = 0
    var r = 0
    var chunk = 1
    while (chunk <= offsets.length && s < nSamp) {
      while (r + 1 < nRuns && runs(r + 1)._1 <= chunk) r += 1
      val spc = runs(r)._2
      require(spc > 0, "nonpositive samples_per_chunk")
      var off = offsets(chunk - 1)
      var j = 0
      while (j < spc && s < nSamp) {
        val sz = sizes(s)
        require(off >= 0 && off + sz <= b.length, "sample escapes file")
        out(s) = (off, sz)
        off += sz
        s += 1
        j += 1
      }
      chunk += 1
    }
    require(s == nSamp, "chunk list exhausted before sample count")
    out
  }

  /** Sample-data demux → NAL census: slice every sample's bytes out of
    * the file via the stsz/stsc/stco(+co64) tables, convert the avcC
    * length-prefixed NAL framing to NAL units, prepend the avcC
    * parameter sets (exactly what an avcC→Annex-B transmux does), and
    * feed the SAME spec-derived census the Annex-B tier runs
    * ([[H264.censusNals]]). Corrupt tables/framing degrade to a flagged
    * row. Cost is linear in sample BYTES actually demuxed — the
    * metadata tier ([[parseMp4]]) stays mdat-blind for lakes that only
    * need container fields.
    */
  def parseMp4Nals(id: Long, bytes: Array[Byte]): H264.H264Stats =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val vt = findVideoTrack(b)
      val (lengthSize, params) = avcCParams(b, vt.avcCF, vt.avcCU)
      val extents = sampleExtents(b, vt.stbl)
      val sampleNals = extents.iterator.flatMap { case (off, sz) =>
        val nals = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        var p = off.toInt
        val end = off.toInt + sz
        while (p < end) {
          require(p + lengthSize <= end, "truncated NAL length prefix")
          var len = 0L
          var k = 0
          while (k < lengthSize) { len = (len << 8) | (b(p + k) & 0xffL); k += 1 }
          require(len >= 1 && p + lengthSize + len <= end, "NAL escapes sample")
          nals += java.util.Arrays.copyOfRange(
            b, p + lengthSize, p + lengthSize + len.toInt)
          p += lengthSize + len.toInt
        }
        nals
      }
      H264.censusNals(id, params.iterator ++ sampleNals)
    } catch {
      case _: Exception => H264.H264Stats(id, parse_ok = false, 0, 0, 0, 0,
        0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    }

  /** NAL census over MP4 payloads — one narrow `mapPartitions` pass,
    * one row per media, corrupt payloads flagged.
    */
  def mp4NalStats(media: DataFrame): Dataset[H264.H264Stats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseMp4Nals(id, bytes) })
  }

  /** Container metadata over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt payloads flagged.
    */
  def mp4Meta(media: DataFrame): Dataset[Mp4Meta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseMp4(id, bytes) })
  }

  // --- synthetic fixture ----------------------------------------------------

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val size = 8 + payload.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(size)
    out.write((size >>> 24) & 0xff); out.write((size >>> 16) & 0xff)
    out.write((size >>> 8) & 0xff); out.write(size & 0xff)
    out.write(typ.getBytes("ISO-8859-1"))
    payload.foreach(out.write)
    out.toByteArray
  }
  private def u32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Deterministic minimal MP4 for media `id`: brand isom; one video
    * track whose avcC embeds the [[H264]] builder's REAL escaped SPS
    * (so dims/profile replay the same generator formulas as
    * `multimodal_h264`); `5 + id%7` samples at 40 ms (25 fps, mdhd
    * timescale 1000); a keyframe every `1 + id%3` samples via stss —
    * except `id % 5 == 0` files, which OMIT stss to pin the
    * every-sample-is-sync default; sized `mdat` the parser must skip.
    */
  def syntheticMp4(id: Long): Array[Byte] = {
    val nSamples = 5 + (id % 7).toInt
    val gop = 1 + (id % 3).toInt
    val nKey = (nSamples + gop - 1) / gop
    val allSync = id % 5 == 0
    val high = id % 4 == 0

    // reuse the Annex-B builder's stream and lift its SPS/PPS NALs (the
    // escaped EBSP bytes avcC carries verbatim)
    val annexB = H264.syntheticAnnexBStream(id)
    // lift a NAL (header + EBSP) out of the Annex-B stream by type —
    // scan every start code, pick the first NAL of the wanted type
    def liftNal(nalType: Int): Array[Byte] = {
      val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i + 2 < annexB.length) {
        if (annexB(i) == 0 && annexB(i + 1) == 0 && annexB(i + 2) == 1) {
          starts += i + 3; i += 3
        } else i += 1
      }
      val k = starts.indexWhere(s => (annexB(s) & 0x1f) == nalType)
      require(k >= 0, s"no NAL of type $nalType in fixture stream")
      val start = starts(k)
      var e = if (k + 1 < starts.length) starts(k + 1) - 3 else annexB.length
      if (k + 1 < starts.length && e > start && annexB(e - 1) == 0) e -= 1
      java.util.Arrays.copyOfRange(annexB, start, e)
    }
    val spsNal = liftNal(7)
    val ppsNal = liftNal(8)

    val avcC = box("avcC",
      Array(1.toByte, (if (high) 100 else 66).toByte, 0.toByte, 30.toByte,
        0xff.toByte, 0xe1.toByte), // lengthSizeMinusOne=3, numSPS=1
      u16(spsNal.length), spsNal,
      Array(1.toByte), u16(ppsNal.length), ppsNal)
    val avc1 = box("avc1",
      new Array[Byte](6), u16(1),          // reserved, data_reference_index
      new Array[Byte](16),                  // pre_defined/reserved
      u16(16 * (1 + (id % 5).toInt)), u16(16 * (1 + (id % 3).toInt)), // nominal dims
      new Array[Byte](50),                  // resolution/frame_count/name/depth
      avcC)
    val stsd = box("stsd", u32(0), u32(1), avc1)
    val stts = box("stts", u32(0), u32(1), u32(nSamples.toLong), u32(40))
    val stss =
      if (allSync) Array.emptyByteArray
      else box("stss", u32(0), u32(nKey.toLong),
        (0 until nKey).flatMap(k => u32(1L + k.toLong * gop)).toArray)
    val stsz = box("stsz", u32(0), u32(0), u32(nSamples.toLong),
      (0 until nSamples).flatMap(_ => u32(16L)).toArray)
    val stsc = box("stsc", u32(0), u32(1), u32(1), u32(nSamples.toLong), u32(1))
    val stco = box("stco", u32(0), u32(1), u32(0))
    val stbl = box("stbl", stsd, stts, stss, stsz, stsc, stco)
    val minf = box("minf", stbl)
    val hdlr = box("hdlr", u32(0), u32(0), "vide".getBytes("ISO-8859-1"),
      new Array[Byte](12), Array(0.toByte))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0),
      u32(1000), u32(nSamples.toLong * 40), u16(0x55c4), u16(0))
    val mdia = box("mdia", mdhd, hdlr, minf)
    val tkhd = box("tkhd", u32(0), u32(0), u32(0), u32(1), u32(0), u32(0),
      new Array[Byte](52),
      u32(16L * (1 + id % 5) << 16), u32(16L * (1 + id % 3) << 16))
    val trak = box("trak", tkhd, mdia)
    val mvhd = box("mvhd", u32(0), u32(0), u32(0),
      u32(1000), u32(nSamples.toLong * 40), new Array[Byte](80))
    val moov = box("moov", mvhd, trak)
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), u32(0x200),
      "isomavc1".getBytes("ISO-8859-1"))
    val mdat = box("mdat", new Array[Byte](16 * nSamples)) // skipped by size
    ftyp ++ moov ++ mdat
  }

  def syntheticMp4Table(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticMp4(id))))
      .toDF("media_id", "payload")
  }

  /** Deterministic MP4 whose `mdat` holds the REAL length-prefixed
    * slice (and SEI) NALs of [[H264.syntheticAnnexBStream]]`(id)` —
    * SPS/PPS live in avcC, slices in samples, exactly the AVC file
    * format split. Sample tables are honest: per-sample stsz sizes,
    * `2 + id%3` samples per chunk (stsc with a short tail run),
    * chunks separated by `id%5` pad bytes the demuxer must skip via
    * stco — or co64 when `id % 7 == 0` — and a `id%2`-selected NAL
    * length-prefix width (4 or 2 bytes, avcC lengthSizeMinusOne). A
    * demuxed census therefore reproduces the Annex-B tier's NAL
    * multiset field-for-field, which is what the multimodal_mp4_nals
    * oracle predicts from the shared generator formulas.
    */
  def syntheticMp4Samples(id: Long): Array[Byte] = {
    val annexB = H264.syntheticAnnexBStream(id)
    val units = H264.nalOffsets(annexB).map { case (s, e) =>
      ((annexB(s) & 0x1f), java.util.Arrays.copyOfRange(annexB, s, e))
    }
    def first(t: Int): Array[Byte] = units.collectFirst {
      case (typ, u) if typ == t => u
    }.getOrElse(throw new IllegalStateException(s"fixture stream lacks NAL $t"))
    val spsNal = first(7)
    val ppsNal = first(8)
    val seiNal = first(6)
    val slices = units.collect { case (t, u) if t == 1 || t == 5 => (t, u) }

    val lengthSize = if (id % 2 == 0) 4 else 2
    def lp(nal: Array[Byte]): Array[Byte] = {
      require(lengthSize == 4 || nal.length < (1 << 16), "NAL too long for prefix")
      val pre =
        if (lengthSize == 4) u32(nal.length.toLong)
        else u16(nal.length)
      pre ++ nal
    }
    val samples: Seq[Array[Byte]] = slices.zipWithIndex.map { case ((_, u), k) =>
      if (k == 0) lp(seiNal) ++ lp(u) else lp(u)
    }
    val nFrames = samples.length
    val syncPositions = // 1-based sample numbers of IDR slices
      slices.zipWithIndex.collect { case ((5, _), k) => k + 1L }
    val spc = 2 + (id % 3).toInt
    val pad = (id % 5).toInt
    val chunks = samples.grouped(spc).toSeq
    val useCo64 = id % 7 == 0

    val high = id % 4 == 0
    val avcC = box("avcC",
      Array(1.toByte, (if (high) 100 else 66).toByte, 0.toByte, 30.toByte,
        (0xfc | (lengthSize - 1)).toByte, 0xe1.toByte),
      u16(spsNal.length), spsNal,
      Array(1.toByte), u16(ppsNal.length), ppsNal)
    val avc1 = box("avc1",
      new Array[Byte](6), u16(1),
      new Array[Byte](16),
      u16(16 * (1 + (id % 5).toInt)), u16(16 * (1 + (id % 3).toInt)),
      new Array[Byte](50),
      avcC)

    // chunk offsets relative to the mdat PAYLOAD start: each chunk is
    // preceded by `pad` bytes of 0xAA the demuxer must skip via the
    // offset table (contiguity is NOT assumable)
    val chunkSizes = chunks.map(_.map(_.length).sum)
    val relOffs = chunkSizes.scanLeft(pad.toLong) {
      case (acc, sz) => acc + sz + pad
    }.init

    def buildFile(chunkOffs: Seq[Long]): Array[Byte] = {
      val stsd = box("stsd", u32(0), u32(1), avc1)
      val stts = box("stts", u32(0), u32(1), u32(nFrames.toLong), u32(40))
      val stss = box("stss", u32(0), u32(syncPositions.length.toLong),
        syncPositions.flatMap(u32).toArray)
      val stsz = box("stsz", u32(0), u32(0), u32(nFrames.toLong),
        samples.flatMap(sm => u32(sm.length.toLong)).toArray)
      val fullRuns = nFrames / spc
      val rem = nFrames % spc
      val stscEntries =
        if (fullRuns == 0) Seq((1L, rem.toLong))
        else if (rem == 0) Seq((1L, spc.toLong))
        else Seq((1L, spc.toLong), (fullRuns + 1L, rem.toLong))
      val stsc = box("stsc", u32(0), u32(stscEntries.length.toLong),
        stscEntries.flatMap { case (fc, n) => u32(fc) ++ u32(n) ++ u32(1) }.toArray)
      val offBox =
        if (useCo64) box("co64", u32(0), u32(chunkOffs.length.toLong),
          chunkOffs.flatMap(o => u32(o >>> 32) ++ u32(o & 0xffffffffL)).toArray)
        else box("stco", u32(0), u32(chunkOffs.length.toLong),
          chunkOffs.flatMap(u32).toArray)
      val stbl = box("stbl", stsd, stts, stss, stsz, stsc, offBox)
      val minf = box("minf", stbl)
      val hdlr = box("hdlr", u32(0), u32(0), "vide".getBytes("ISO-8859-1"),
        new Array[Byte](12), Array(0.toByte))
      val mdhd = box("mdhd", u32(0), u32(0), u32(0),
        u32(1000), u32(nFrames.toLong * 40), u16(0x55c4), u16(0))
      val mdia = box("mdia", mdhd, hdlr, minf)
      val tkhd = box("tkhd", u32(0), u32(0), u32(0), u32(1), u32(0), u32(0),
        new Array[Byte](52),
        u32(16L * (1 + id % 5) << 16), u32(16L * (1 + id % 3) << 16))
      val trak = box("trak", tkhd, mdia)
      val mvhd = box("mvhd", u32(0), u32(0), u32(0),
        u32(1000), u32(nFrames.toLong * 40), new Array[Byte](80))
      val moov = box("moov", mvhd, trak)
      val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), u32(0x200),
        "isomavc1".getBytes("ISO-8859-1"))
      val mdatPayload = chunks.flatMap { ch =>
        Array.fill(pad)(0xaa.toByte) ++ ch.foldLeft(Array.emptyByteArray)(_ ++ _)
      }.toArray
      ftyp ++ moov ++ box("mdat", mdatPayload)
    }

    // two-pass offset resolution: box sizes are offset-VALUE independent
    // (fixed-width entries), so build once with placeholders to learn
    // the mdat payload's absolute position, then rebuild for real
    val probe = buildFile(relOffs.map(_ => 0L))
    val mdatPayloadStart =
      (probe.length - chunkSizes.map(_ + pad).sum) // mdat header already counted
    buildFile(relOffs.map(_ + mdatPayloadStart))
  }

  def syntheticMp4SamplesTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticMp4Samples(id))))
      .toDF("media_id", "payload")
  }
}
