package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXIF / TIFF-IFD metadata extraction — the image analog of the
  * [[Mp4]] box walk. Curation filters routinely key on camera metadata
  * (orientation to fix rotation, DateTime for dedup/recency, Make/Model
  * for device stratification), and all of it is plain tabular TIFF 6.0
  * structure: a byte-order mark, then linked Image File Directories of
  * fixed 12-byte entries (tag, type, count, value-or-offset). No
  * compression, no codec — a bounds-checked byte walk, implemented from
  * the public TIFF 6.0 / EXIF 2.3 layouts.
  *
  * Two transports, one parser: bare TIFF payloads (the container the
  * IFDs live in) and JPEG APP1 segments (`Exif\0\0` + TIFF), located by
  * a marker-segment scan of the real JPEG byte stream. Both byte
  * orders (`II` little, `MM` big), both ASCII value placements (inline
  * when count ≤ 4, offset-addressed otherwise), and the EXIF sub-IFD
  * hop (tag 0x8769 → DateTimeOriginal) are exercised by the fixture
  * and pinned on hand-assembled golden bytes (ExifSpec) that never
  * touch the builder.
  *
  * Scale shape: one narrow `mapPartitions` pass, one row in → one row
  * out, cost linear in IFD entry count (pixel data is never touched).
  * Corrupt payloads degrade to `parse_ok = false` rows — the
  * [[Multimodal.decodeImages]] contract.
  */
object Exif {

  final case class ExifMeta(
      media_id: Long, parse_ok: Boolean, byte_order: String,
      n_entries: Int, orientation: Int,
      image_width: Long, image_height: Long,
      make: String, model: String,
      datetime: String, datetime_original: String)

  private val Failed =
    ExifMeta(0L, parse_ok = false, "", 0, 0, 0L, 0L, "", "", "", "")

  // --- endian-aware reads -------------------------------------------------

  private def u16(b: Array[Byte], off: Int, le: Boolean): Int = {
    if (off < 0 || off + 2 > b.length)
      throw new IllegalArgumentException("TIFF overrun")
    if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  }
  private def u32(b: Array[Byte], off: Int, le: Boolean): Long = {
    if (off < 0 || off + 4 > b.length)
      throw new IllegalArgumentException("TIFF overrun")
    if (le) (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    else ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  }

  // --- IFD walk -------------------------------------------------------------

  /** One parsed entry: (tag, type, count, raw 4-byte value field off). */
  private final case class Entry(tag: Int, typ: Int, count: Long, valOff: Int)

  /** Read the entries of the IFD at `ifdOff` (relative to `tiff`, the
    * TIFF header position). Count is sanity-bounded; the table must fit
    * the payload.
    */
  private def ifdEntries(b: Array[Byte], tiff: Int, ifdOff: Long,
      le: Boolean): Seq[Entry] = {
    require(ifdOff >= 8 && tiff + ifdOff + 2 <= b.length, "IFD offset escapes file")
    val base = tiff + ifdOff.toInt
    val n = u16(b, base, le)
    require(n <= 4096, "implausible IFD entry count")
    require(base + 2 + 12L * n + 4 <= b.length, "IFD table overrun")
    (0 until n).map { i =>
      val e = base + 2 + 12 * i
      Entry(u16(b, e, le), u16(b, e + 2, le), u32(b, e + 4, le), e + 8)
    }
  }

  /** Integer value of a SHORT(3)/LONG(4) count-1 entry. */
  private def intValue(b: Array[Byte], e: Entry, le: Boolean): Long = {
    require(e.count == 1, s"tag ${e.tag}: expected scalar")
    e.typ match {
      case 3 => u16(b, e.valOff, le).toLong
      case 4 => u32(b, e.valOff, le)
      case t => throw new IllegalArgumentException(s"tag ${e.tag}: type $t not integral")
    }
  }

  /** ASCII(2) value: inline in the value field when count ≤ 4, else at
    * the count-sized region the value field points to (offset relative
    * to the TIFF header). Trailing NULs stripped per TIFF 6.0.
    */
  private def asciiValue(b: Array[Byte], tiff: Int, e: Entry, le: Boolean): String = {
    require(e.typ == 2, s"tag ${e.tag}: expected ASCII")
    require(e.count >= 0 && e.count <= 65536, "implausible ASCII count")
    val n = e.count.toInt
    val from =
      if (n <= 4) e.valOff
      else {
        val off = u32(b, e.valOff, le)
        require(off >= 8 && tiff + off + n <= b.length, "ASCII value escapes file")
        tiff + off.toInt
      }
    require(from + n <= b.length, "ASCII value escapes file")
    var end = from + n
    while (end > from && b(end - 1) == 0) end -= 1
    new String(b, from, end - from, "US-ASCII")
  }

  /** Locate the TIFF header inside a JPEG: scan marker segments from
    * SOI for APP1 with the `Exif\0\0` identifier; entropy-coded data is
    * never reached (the scan stops at SOS).
    */
  private def tiffOffsetInJpeg(b: Array[Byte]): Int = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "not a JPEG")
    var p = 2
    while (p + 4 <= b.length) {
      require((b(p) & 0xff) == 0xff, "bad JPEG marker")
      var q = p
      while (q + 1 < b.length && (b(q + 1) & 0xff) == 0xff) q += 1 // fill bytes
      val m = b(q + 1) & 0xff
      if (m == 0xd9 || m == 0xda)
        throw new IllegalArgumentException("no Exif APP1 before SOS/EOI")
      val len = u16(b, q + 2, le = false)
      require(len >= 2 && q + 2 + len <= b.length, "JPEG segment overrun")
      if (m == 0xe1 && len >= 8 &&
          b(q + 4) == 'E' && b(q + 5) == 'x' && b(q + 6) == 'i' &&
          b(q + 7) == 'f' && b(q + 8) == 0 && b(q + 9) == 0)
        return q + 10
      p = q + 2 + len
    }
    throw new IllegalArgumentException("no Exif APP1 found")
  }

  /** Parse one payload — bare TIFF or JPEG-with-APP1 — into
    * [[ExifMeta]]. Unknown tags are skipped; absent tags yield 0/"";
    * malformed structure degrades to a flagged row.
    */
  def parseExif(id: Long, bytes: Array[Byte]): ExifMeta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 8, "too short")
      val tiff =
        if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) tiffOffsetInJpeg(b)
        else 0
      val le =
        if (b(tiff) == 'I'.toByte && b(tiff + 1) == 'I'.toByte) true
        else if (b(tiff) == 'M'.toByte && b(tiff + 1) == 'M'.toByte) false
        else throw new IllegalArgumentException("bad byte-order mark")
      require(u16(b, tiff + 2, le) == 42, "bad TIFF magic")
      val ifd0 = ifdEntries(b, tiff, u32(b, tiff + 4, le), le)
      def find(tag: Int, in: Seq[Entry] = ifd0): Option[Entry] =
        in.find(_.tag == tag)
      val exifIfd = find(0x8769).map { e =>
        ifdEntries(b, tiff, intValue(b, e, le), le)
      }.getOrElse(Seq.empty)
      ExifMeta(id, parse_ok = true,
        byte_order = if (le) "II" else "MM",
        n_entries = ifd0.length,
        orientation = find(0x0112).map(intValue(b, _, le).toInt).getOrElse(0),
        image_width = find(0x0100).map(intValue(b, _, le)).getOrElse(0L),
        image_height = find(0x0101).map(intValue(b, _, le)).getOrElse(0L),
        make = find(0x010f).map(asciiValue(b, tiff, _, le)).getOrElse(""),
        model = find(0x0110).map(asciiValue(b, tiff, _, le)).getOrElse(""),
        datetime = find(0x0132).map(asciiValue(b, tiff, _, le)).getOrElse(""),
        datetime_original = find(0x9003, exifIfd)
          .map(asciiValue(b, tiff, _, le)).getOrElse(""))
    } catch {
      case _: Exception => Failed.copy(media_id = id)
    }

  /** EXIF metadata over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt payloads flagged.
    */
  def exifMeta(media: DataFrame): Dataset[ExifMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseExif(id, bytes) })
  }

  // --- synthetic fixture ----------------------------------------------------

  /** Endian-aware TIFF writer used only by the fixture. */
  private final class TiffWriter(le: Boolean) {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      else { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (le) {
        out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
        out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
      } else {
        out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
        out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
    /** A 12-byte entry whose scalar value sits in the value field. */
    def entryScalar(tag: Int, typ: Int, v: Long): Unit = {
      w16(tag); w16(typ); w32(1L)
      if (typ == 3) { w16(v.toInt); w16(0) } else w32(v)
    }
    /** A 12-byte ASCII entry: inline when the NUL-terminated bytes fit
      * the value field, else offset-addressed.
      */
    def entryAscii(tag: Int, s: String, offset: Long): Unit = {
      val n = s.length + 1
      w16(tag); w16(2); w32(n.toLong)
      if (n <= 4) {
        val bs = (s + "\u0000").getBytes("US-ASCII")
        var i = 0
        while (i < 4) { out.write(if (i < bs.length) bs(i).toInt else 0); i += 1 }
      } else w32(offset)
    }
  }

  // --- GPS IFD (read) + in-place scrub (the media-PII write path) ----------

  final case class GpsMeta(
      media_id: Long, parse_ok: Boolean, has_gps: Int,
      lat_ref: String, lon_ref: String,
      lat_arcsec: Long, lon_arcsec: Long)

  private val GpsFailed = GpsMeta(0L, parse_ok = false, 0, "", "", 0L, 0L)

  /** RATIONAL(5) count-3 value (deg/min/sec as num/den pairs at the
    * offset the value field points to), folded to integer ARCSECONDS —
    * curation granularity (±~30 m), exact whenever each den divides its
    * num (the fixture guarantees it; real-file remainders floor).
    */
  private def rational3Arcsec(b: Array[Byte], tiff: Int, e: Entry,
      le: Boolean): Long = {
    require(e.typ == 5 && e.count == 3, s"tag ${e.tag}: expected RATIONAL x3")
    val off = u32(b, e.valOff, le)
    require(off >= 8 && tiff + off + 24 <= b.length, "RATIONAL value escapes file")
    val base = tiff + off.toInt
    def comp(i: Int): Long = {
      val num = u32(b, base + 8 * i, le)
      val den = u32(b, base + 8 * i + 4, le)
      require(den > 0, "zero RATIONAL denominator")
      num / den
    }
    comp(0) * 3600L + comp(1) * 60L + comp(2)
  }

  /** GPS extraction: IFD0's 0x8825 pointer → the GPS sub-IFD's
    * latitude/longitude refs (0x0001/0x0003) and RATIONAL×3 coordinates
    * (0x0002/0x0004), folded to SIGNED integer arcseconds (S/W
    * negative). A file without a GPS IFD is a clean `has_gps = 0` row —
    * geotag ABSENCE is data, not corruption; malformed structure still
    * flags.
    */
  def parseGps(id: Long, bytes: Array[Byte]): GpsMeta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 8, "too short")
      val tiff =
        if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) tiffOffsetInJpeg(b)
        else 0
      val le =
        if (b(tiff) == 'I'.toByte && b(tiff + 1) == 'I'.toByte) true
        else if (b(tiff) == 'M'.toByte && b(tiff + 1) == 'M'.toByte) false
        else throw new IllegalArgumentException("bad byte-order mark")
      require(u16(b, tiff + 2, le) == 42, "bad TIFF magic")
      val ifd0 = ifdEntries(b, tiff, u32(b, tiff + 4, le), le)
      ifd0.find(_.tag == 0x8825) match {
        case None => GpsMeta(id, parse_ok = true, 0, "", "", 0L, 0L)
        case Some(p) =>
          val gps = ifdEntries(b, tiff, intValue(b, p, le), le)
          def ref(tag: Int): String =
            gps.find(_.tag == tag).map(asciiValue(b, tiff, _, le)).getOrElse("")
          def arc(tag: Int): Long =
            gps.find(_.tag == tag).map(rational3Arcsec(b, tiff, _, le)).getOrElse(0L)
          val latRef = ref(0x0001)
          val lonRef = ref(0x0003)
          val lat = arc(0x0002) * (if (latRef == "S") -1L else 1L)
          val lon = arc(0x0004) * (if (lonRef == "W") -1L else 1L)
          GpsMeta(id, parse_ok = true, 1, latRef, lonRef, lat, lon)
      }
    } catch {
      case _: Exception => GpsFailed.copy(media_id = id)
    }

  /** GPS geotag census over a binary payload table. */
  def gpsMeta(media: DataFrame): Dataset[GpsMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseGps(id, bytes) })
  }

  /** Remove the geotag IN PLACE (copy-on-write): zero every
    * offset-addressed value region the GPS IFD references, zero the GPS
    * IFD block itself, and neutralize IFD0's 0x8825 pointer entry by
    * rewriting its tag to the well-known padding tag 0xEA1C with a zero
    * value — every OTHER offset in the file stays valid, which is what
    * makes in-place scrubbing safe where a structural rewrite would
    * have to relocate the whole IFD tree. Files without a geotag (or
    * without parseable EXIF at all) pass through untouched — a scrub
    * pass must be total over mixed corpora. A GPS entry with an
    * out-of-spec field type (not 1–12) also passes through rather than
    * guessing a value size and zeroing the wrong bytes — which is why a
    * privacy pipeline must VERIFY with [[gpsMeta]] after scrubbing and
    * quarantine any surviving `has_gps = 1` rows (exactly what the
    * media_gps_scrub gate and the gpsScrub probe do).
    */
  def stripGps(bytes: Array[Byte]): Array[Byte] = {
    val b0 = if (bytes == null) Array.emptyByteArray else bytes
    try {
      val b = b0.clone()
      val tiff =
        if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
          tiffOffsetInJpeg(b)
        else 0
      val le =
        if (b(tiff) == 'I'.toByte && b(tiff + 1) == 'I'.toByte) true
        else if (b(tiff) == 'M'.toByte && b(tiff + 1) == 'M'.toByte) false
        else throw new IllegalArgumentException("bad byte-order mark")
      require(u16(b, tiff + 2, le) == 42, "bad TIFF magic")
      val ifd0Off = u32(b, tiff + 4, le)
      val ifd0 = ifdEntries(b, tiff, ifd0Off, le)
      ifd0.find(_.tag == 0x8825) match {
        case None => b0 // no geotag: untouched
        case Some(pointer) =>
          val gpsOff = intValue(b, pointer, le)
          val gps = ifdEntries(b, tiff, gpsOff, le)
          // 1. zero each offset-addressed value region (inline values
          //    die with the table) — ALL twelve TIFF 6.0 field types,
          //    so an SRATIONAL/DOUBLE-typed vendor field can't leave
          //    coordinate bytes behind under a too-small size guess
          val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8,
            6 -> 1, 7 -> 1, 8 -> 2, 9 -> 4, 10 -> 8, 11 -> 4, 12 -> 8)
          gps.foreach { e =>
            require(typeSize.contains(e.typ),
              s"GPS entry tag ${e.tag}: unknown field type ${e.typ} — " +
                "refusing a scrub that could leave value bytes behind")
            val sz = typeSize(e.typ).toLong * e.count
            if (sz > 4) {
              val off = u32(b, e.valOff, le)
              require(off >= 8 && tiff + off + sz <= b.length,
                "GPS value escapes file")
              java.util.Arrays.fill(b, tiff + off.toInt,
                tiff + off.toInt + sz.toInt, 0.toByte)
            }
          }
          // 2. zero the GPS IFD block (count + entries + next pointer)
          val base = tiff + gpsOff.toInt
          java.util.Arrays.fill(b, base, base + 2 + 12 * gps.length + 4, 0.toByte)
          // 3. neutralize the pointer entry: padding tag 0xEA1C, LONG,
          //    count 1, value 0
          val entryOff = pointer.valOff - 8
          val w = if (le) Seq(0x1c, 0xea, 0x04, 0x00, 0x01, 0x00, 0x00, 0x00)
            else Seq(0xea, 0x1c, 0x00, 0x04, 0x00, 0x00, 0x00, 0x01)
          w.zipWithIndex.foreach { case (v, i) => b(entryOff + i) = v.toByte }
          java.util.Arrays.fill(b, pointer.valOff, pointer.valOff + 4, 0.toByte)
          b
      }
    } catch {
      case _: Exception => b0 // unparseable: pass through untouched
    }
  }

  /** Geotag scrub over a binary payload table — returns the table with
    * `payload` replaced by its scrubbed bytes (one narrow mapPartitions
    * pass; the downstream gate re-parses to prove the geotag gone and
    * everything else intact).
    */
  def scrubGps(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, stripGps(bytes)) })
      .toDF("media_id", "payload")
  }

  /** The fixture's generator formulas — shared with the
    * multimodal_exif oracle SQL, which predicts every field from the
    * SAME arithmetic while the engine earns it by walking real IFD
    * bytes. Short makes (`id % 4 == 0`) pin the inline-ASCII path.
    */
  def fixtureMake(id: Long): String =
    if (id % 4 == 0) s"m${id % 3}" else s"maker-${id % 3}"
  def fixtureModel(id: Long): String = s"model-${id % 5}"
  def fixtureDateTime(id: Long): String =
    f"2020:01:${1 + id % 28}%02d 12:00:${id % 60}%02d"
  def fixtureDateTimeOriginal(id: Long): String =
    f"2019:12:${1 + id % 28}%02d 08:30:${(id * 7) % 60}%02d"

  /** GPS fixture formulas — `id % 4 == 1` files carry NO geotag. */
  def fixtureHasGps(id: Long): Boolean = id % 4 != 1
  def fixtureLatRef(id: Long): String = if (id % 2 == 0) "N" else "S"
  def fixtureLonRef(id: Long): String = if (id % 3 == 0) "E" else "W"
  def fixtureLatArcsec(id: Long): Long = // unsigned magnitude
    (id % 90) * 3600L + (id % 60) * 60L + (id * 7) % 60
  def fixtureLonArcsec(id: Long): Long =
    (id % 180) * 3600L + (id * 3) % 60 * 60L + (id * 11) % 60

  /** The TIFF body: header + IFD0 (ascending tags incl. the EXIF
    * sub-IFD pointer and — for geotagged ids — the GPS IFD pointer) +
    * EXIF IFD (DateTimeOriginal) + GPS IFD (refs inline, RATIONAL×3
    * coordinates with MIXED denominators 1/2/4 so num/den is really
    * divided) + the offset-addressed data area.
    */
  def syntheticTiff(id: Long): Array[Byte] = {
    val le = id % 2 == 0
    val make = fixtureMake(id)
    val model = fixtureModel(id)
    val dt = fixtureDateTime(id)
    val dto = fixtureDateTimeOriginal(id)
    val hasGps = fixtureHasGps(id)
    val nIfd0 = if (hasGps) 8 else 7
    val ifd0Off = 8L
    val ifd0Size = 2 + nIfd0 * 12 + 4
    val exifOff = ifd0Off + ifd0Size
    val exifSize = 2 + 1 * 12 + 4
    val gpsOff = exifOff + exifSize
    val gpsSize = if (hasGps) 2 + 4 * 12 + 4 else 0
    var dataOff = gpsOff + gpsSize
    def reserve(n: Int): Long = { val o = dataOff; dataOff += n; o }
    def reserveAscii(s: String): Long =
      if (s.length + 1 <= 4) 0L else reserve(s.length + 1)
    val makeOff = reserveAscii(make)
    val modelOff = reserveAscii(model)
    val dtOff = reserveAscii(dt)
    val dtoOff = reserveAscii(dto)
    val latOff = if (hasGps) reserve(24) else 0L
    val lonOff = if (hasGps) reserve(24) else 0L
    val w = new TiffWriter(le)
    // header
    w.out.write(if (le) 'I' else 'M'); w.out.write(if (le) 'I' else 'M')
    w.w16(42); w.w32(ifd0Off)
    // IFD0, tags ascending per TIFF 6.0
    w.w16(nIfd0)
    w.entryScalar(0x0100, 4, 16L * (1 + id % 5))
    w.entryScalar(0x0101, 4, 16L * (1 + id % 3))
    w.entryAscii(0x010f, make, makeOff)
    w.entryAscii(0x0110, model, modelOff)
    w.entryScalar(0x0112, 3, 1 + id % 8)
    w.entryAscii(0x0132, dt, dtOff)
    w.entryScalar(0x8769, 4, exifOff)
    if (hasGps) w.entryScalar(0x8825, 4, gpsOff)
    w.w32(0L) // next IFD: none
    // EXIF sub-IFD
    w.w16(1)
    w.entryAscii(0x9003, dto, dtoOff)
    w.w32(0L)
    // GPS sub-IFD: refs inline (count 2), coordinates RATIONAL×3
    if (hasGps) {
      w.w16(4)
      w.entryAscii(0x0001, fixtureLatRef(id), 0L)
      w.w16(0x0002); w.w16(5); w.w32(3L); w.w32(latOff)
      w.entryAscii(0x0003, fixtureLonRef(id), 0L)
      w.w16(0x0004); w.w16(5); w.w32(3L); w.w32(lonOff)
      w.w32(0L)
    }
    // data area, in reservation order: NUL-terminated ASCII then the
    // rational blocks (deg den 1, min den 2, sec den 4 — division real)
    Seq(make, model, dt, dto).filter(_.length + 1 > 4).foreach { s =>
      w.out.write((s + "\u0000").getBytes("US-ASCII"))
    }
    if (hasGps) {
      def rat3(deg: Long, min: Long, sec: Long): Unit = {
        w.w32(deg); w.w32(1L)
        w.w32(min * 2); w.w32(2L)
        w.w32(sec * 4); w.w32(4L)
      }
      rat3(id % 90, id % 60, (id * 7) % 60)
      rat3(id % 180, (id * 3) % 60, (id * 11) % 60)
    }
    w.out.toByteArray
  }

  /** Splice an APP1 Exif segment right after a JPEG's SOI — where real
    * cameras put it.
    */
  def spliceApp1(jpeg: Array[Byte], tiff: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    val len = 2 + 6 + tiff.length
    require(len <= 0xffff, "APP1 too long")
    val out = new java.io.ByteArrayOutputStream(jpeg.length + len + 2)
    out.write(0xff); out.write(0xd8)
    out.write(0xff); out.write(0xe1)
    out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(tiff)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** Deterministic EXIF payload for media `id`: the [[syntheticTiff]]
    * IFD tree, bare for `id % 3 == 0` files and spliced as a real APP1
    * segment into a REAL encoded JPEG otherwise — both transports the
    * parser supports, exercised in every corpus.
    */
  def syntheticExifPayload(id: Long): Array[Byte] = {
    val tiff = syntheticTiff(id)
    if (id % 3 == 0) tiff
    else spliceApp1(
      Multimodal.syntheticJpeg(8, 8, (id % 256).toInt), tiff)
  }

  def syntheticExifTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticExifPayload(id))))
      .toDF("media_id", "payload")
  }
}
