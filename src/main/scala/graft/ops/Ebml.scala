package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EBML / Matroska / WebM container metadata — the other real-world
  * video container next to [[Mp4]]. Everything a curation pass filters
  * a WebM FILE by — doctype, timestamp scale, duration, track census,
  * codec ids, pixel dimensions — is plain EBML structure (RFC 8794):
  * variable-length-integer element IDs and sizes framing a tree, with
  * unsigned-int / float / ASCII leaves. No codec work anywhere; like
  * the MP4 tier, `Cluster` payloads (the media data) are skipped by
  * their size fields.
  *
  * Parsed: the `EBML` header's DocType; the first `Segment`'s `Info`
  * (TimestampScale — default 1 000 000 ns per RFC — and the float
  * Duration, folded to integral ms) and `Tracks` (count, first video
  * track's CodecID + PixelWidth/PixelHeight, first audio track's
  * CodecID). The `Segment` commonly carries the UNKNOWN-SIZE vint in
  * live-muxed files — supported for Segment only (extends to payload
  * end), rejected elsewhere; a size escaping its parent is corrupt.
  *
  * Scale shape: one narrow `mapPartitions` pass, cost linear in
  * element count above the cluster layer; corrupt payloads degrade to
  * `parse_ok = false` rows.
  */
object Ebml {

  final case class EbmlMeta(
      media_id: Long, parse_ok: Boolean, doctype: String,
      timescale_ns: Long, duration_ms: Long, n_tracks: Int,
      video_codec: String, audio_codec: String,
      width: Int, height: Int)

  private val Failed =
    EbmlMeta(0L, parse_ok = false, "", 0L, 0L, 0, "", "", 0, 0)

  // --- vint / leaf readers --------------------------------------------------

  /** Element ID: 1–4 bytes, marker bit KEPT (IDs are compared with it). */
  private def readId(b: Array[Byte], p: Int, until: Int): (Long, Int) = {
    require(p < until, "EBML overrun")
    val first = b(p) & 0xff
    require(first != 0, "invalid ID vint")
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    require(len >= 1 && len <= 4 && p + len <= until, "bad ID length")
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    (v, len)
  }

  /** Size vint: 1–8 bytes, marker stripped; all-ones = unknown size. */
  private def readSize(b: Array[Byte], p: Int, until: Int): (Long, Int, Boolean) = {
    require(p < until, "EBML overrun")
    val first = b(p) & 0xff
    require(first != 0, "invalid size vint")
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    require(len >= 1 && len <= 8 && p + len <= until, "bad size length")
    var v = (first & (0xff >>> len)).toLong
    var ones = (first & (0xff >>> len)) == (0xff >>> len)
    var i = 1
    while (i < len) {
      val x = b(p + i) & 0xff
      v = (v << 8) | x
      ones &&= x == 0xff
      i += 1
    }
    (v, len, ones)
  }

  private def uintLeaf(b: Array[Byte], from: Int, until: Int): Long = {
    val n = until - from
    require(n >= 1 && n <= 8, "bad uint leaf width")
    var v = 0L
    var i = from
    while (i < until) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  private def floatLeaf(b: Array[Byte], from: Int, until: Int): Double =
    until - from match {
      case 4 => java.lang.Float.intBitsToFloat(uintLeaf(b, from, until).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uintLeaf(b, from, until))
      case n => throw new IllegalArgumentException(s"bad float leaf width $n")
    }

  private def strLeaf(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, "US-ASCII")

  /** Child elements of `[from, until)`: (id, payFrom, payUntil).
    * Unknown-size elements are legal only when `id` ∈ `unknownOkIds`
    * (the Segment), extending to the parent's end.
    */
  private def children(b: Array[Byte], from: Int, until: Int,
      unknownOkIds: Set[Long] = Set.empty): Seq[(Long, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    var p = from
    while (p < until) {
      val (id, idLen) = readId(b, p, until)
      val (sz, szLen, unknown) = readSize(b, p + idLen, until)
      val payFrom = p + idLen + szLen
      val payUntil =
        if (unknown) {
          require(unknownOkIds.contains(id), f"unknown size on element 0x$id%x")
          until
        } else {
          require(sz >= 0 && payFrom + sz <= until, "element escapes parent")
          payFrom + sz.toInt
        }
      out += ((id, payFrom, payUntil))
      p = payUntil
    }
    out.toSeq
  }

  private def find(cs: Seq[(Long, Int, Int)], id: Long): Option[(Int, Int)] =
    cs.collectFirst { case (i, f, u) if i == id => (f, u) }

  // element IDs (Matroska registry)
  private val IdEbml = 0x1a45dfa3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimestampScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL
  private val IdCluster = 0x1f43b675L

  /** Parse one EBML payload into [[EbmlMeta]]. */
  def parseEbml(id: Long, bytes: Array[Byte]): EbmlMeta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val top = children(b, 0, b.length, unknownOkIds = Set(IdSegment))
      val (ebmlF, ebmlU) = find(top, IdEbml)
        .getOrElse(throw new IllegalArgumentException("no EBML header"))
      val doctype = find(children(b, ebmlF, ebmlU), IdDocType)
        .map { case (f, u) => strLeaf(b, f, u) }
        .getOrElse(throw new IllegalArgumentException("no DocType"))
      val (segF, segU) = find(top, IdSegment)
        .getOrElse(throw new IllegalArgumentException("no Segment"))
      val seg = children(b, segF, segU)
      val info = find(seg, IdInfo)
        .map { case (f, u) => children(b, f, u) }.getOrElse(Seq.empty)
      val timescale = find(info, IdTimestampScale)
        .map { case (f, u) => uintLeaf(b, f, u) }.getOrElse(1_000_000L)
      require(timescale > 0, "zero TimestampScale")
      val durationTicks = find(info, IdDuration)
        .map { case (f, u) => floatLeaf(b, f, u) }.getOrElse(0.0)
      require(!durationTicks.isNaN && durationTicks >= 0, "bad Duration")
      val durationMs =
        (durationTicks * timescale / 1e6).toLong // ns → ms, fixture-exact
      val trackEntries = find(seg, IdTracks)
        .map { case (f, u) => children(b, f, u) }.getOrElse(Seq.empty)
        .collect { case (IdTrackEntry, f, u) => children(b, f, u) }
      var videoCodec = ""; var audioCodec = ""
      var width = 0; var height = 0
      trackEntries.foreach { te =>
        val typ = find(te, IdTrackType)
          .map { case (f, u) => uintLeaf(b, f, u) }.getOrElse(0L)
        val codec = find(te, IdCodecId)
          .map { case (f, u) => strLeaf(b, f, u) }.getOrElse("")
        if (typ == 1L && videoCodec.isEmpty) {
          videoCodec = codec
          find(te, IdVideo).foreach { case (vf, vu) =>
            val v = children(b, vf, vu)
            width = find(v, IdPixelWidth)
              .map { case (f, u) => uintLeaf(b, f, u).toInt }.getOrElse(0)
            height = find(v, IdPixelHeight)
              .map { case (f, u) => uintLeaf(b, f, u).toInt }.getOrElse(0)
          }
        } else if (typ == 2L && audioCodec.isEmpty) audioCodec = codec
      }
      EbmlMeta(id, parse_ok = true, doctype, timescale, durationMs,
        trackEntries.length, videoCodec, audioCodec, width, height)
    } catch {
      case _: Exception => Failed.copy(media_id = id)
    }

  /** Container metadata over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt payloads flagged.
    */
  def ebmlMeta(media: DataFrame): Dataset[EbmlMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseEbml(id, bytes) })
  }

  // --- synthetic fixture ----------------------------------------------------

  private def vintSize(v: Long): Array[Byte] = {
    // minimal-length size vint (1–4 bytes covers every fixture size)
    if (v < 0x7f) Array((0x80 | v).toInt.toByte)
    else if (v < 0x3fff)
      Array((0x40 | (v >>> 8)).toInt.toByte, (v & 0xff).toByte)
    else if (v < 0x1fffff)
      Array((0x20 | (v >>> 16)).toInt.toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    else
      Array((0x10 | (v >>> 24)).toInt.toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  }
  private def idBytes(id: Long): Array[Byte] = {
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    (0 until n).map(i => ((id >>> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }
  private def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(Array.emptyByteArray)(_ ++ _)
    idBytes(id) ++ vintSize(body.length.toLong) ++ body
  }
  private def uintBytes(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    (0 until n).map(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  /** Deterministic WebM-shaped file for media `id`: EBML header with
    * DocType "webm"; a Segment holding Info (TimestampScale 1 000 000,
    * float64 Duration of `40·(5+id%7)` ticks), Tracks (one VP8/VP9
    * video track with the shared dimension formulas, plus an Opus audio
    * track unless `id % 3 == 0`), and a Cluster of junk the parser must
    * skip. `id % 5 == 0` files mux the Segment with the UNKNOWN-SIZE
    * vint (the live-stream form); the rest carry sized Segments.
    */
  def syntheticWebm(id: Long): Array[Byte] = {
    val durTicks = 40.0 * (5 + id % 7)
    val durBits = java.lang.Double.doubleToLongBits(durTicks)
    val header = el(IdEbml,
      el(IdDocType, "webm".getBytes("US-ASCII")))
    val info = el(IdInfo,
      el(IdTimestampScale, uintBytes(1_000_000L)),
      el(IdDuration, (0 until 8).map(i =>
        ((durBits >>> (8 * (7 - i))) & 0xff).toByte).toArray))
    val videoTrack = el(IdTrackEntry,
      el(IdTrackType, uintBytes(1L)),
      el(IdCodecId, (if (id % 2 == 0) "V_VP9" else "V_VP8").getBytes("US-ASCII")),
      el(IdVideo,
        el(IdPixelWidth, uintBytes(16L * (1 + id % 5))),
        el(IdPixelHeight, uintBytes(16L * (1 + id % 3)))))
    val audioTrack =
      if (id % 3 == 0) Array.emptyByteArray
      else el(IdTrackEntry,
        el(IdTrackType, uintBytes(2L)),
        el(IdCodecId, "A_OPUS".getBytes("US-ASCII")))
    val tracks = el(IdTracks, videoTrack, audioTrack)
    val cluster = el(IdCluster,
      (0 until 16 + (id % 32).toInt).map(i =>
        ((id * 31 + i * 7) % 251).toByte).toArray)
    val segBody = info ++ tracks ++ cluster
    val segment =
      if (id % 5 == 0)
        // live-mux form: unknown-size vint (1-byte, all value bits set)
        idBytes(IdSegment) ++ Array(0xff.toByte) ++ segBody
      else idBytes(IdSegment) ++ vintSize(segBody.length.toLong) ++ segBody
    header ++ segment
  }

  def syntheticWebmTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticWebm(id))))
      .toDF("media_id", "payload")
  }
}
