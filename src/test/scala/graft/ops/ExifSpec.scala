package graft.ops

import graft.SparkSpec

/** Pins the TIFF-IFD walk on golden hand-assembled bytes (never the
  * builder), the builder↔parser differential across both byte orders
  * and both transports, the inline-vs-offset ASCII placements, and the
  * degrade contracts.
  */
class ExifSpec extends SparkSpec {

  /** A golden little-endian TIFF written byte-by-byte from the TIFF 6.0
    * layout: IFD0 with Orientation 6 (SHORT inline), ImageWidth 320
    * (LONG), Make "Acme" (5 bytes incl. NUL → offset-addressed), and an
    * EXIF sub-IFD holding DateTimeOriginal.
    */
  private def goldenLE: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }
    out.write('I'); out.write('I'); w16(42); w32(8)
    // IFD0: 4 entries → 2 + 48 + 4 = 54 bytes, ends at 62
    w16(4)
    w16(0x0100); w16(4); w32(1); w32(320)            // ImageWidth LONG
    w16(0x010f); w16(2); w32(5); w32(80)             // Make "Acme\0" at 80
    w16(0x0112); w16(3); w32(1); w16(6); w16(0)      // Orientation SHORT 6
    w16(0x8769); w16(4); w32(1); w32(62)             // EXIF IFD at 62
    w32(0)
    // EXIF IFD at 62: 1 entry → 2 + 12 + 4 = 18 bytes, ends at 80
    w16(1)
    w16(0x9003); w16(2); w32(20); w32(85)            // DateTimeOriginal at 85
    w32(0)
    // data area: Make at 80 (5 bytes), DateTimeOriginal at 85 (20)
    out.write("Acme".getBytes("US-ASCII")); out.write(0)
    out.write("2021:06:05 10:20:30".getBytes("US-ASCII")); out.write(0)
    out.toByteArray
  }

  /** The same content big-endian, value-for-value. */
  private def goldenBE: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    out.write('M'); out.write('M'); w16(42); w32(8)
    w16(4)
    w16(0x0100); w16(4); w32(1); w32(320)
    w16(0x010f); w16(2); w32(5); w32(80)
    w16(0x0112); w16(3); w32(1); w16(6); w16(0) // SHORT: first two value bytes
    w16(0x8769); w16(4); w32(1); w32(62)
    w32(0)
    w16(1)
    w16(0x9003); w16(2); w32(20); w32(85)
    w32(0)
    out.write("Acme".getBytes("US-ASCII")); out.write(0)
    out.write("2021:06:05 10:20:30".getBytes("US-ASCII")); out.write(0)
    out.toByteArray
  }

  test("golden hand-assembled IFDs parse field-for-field, both byte orders") {
    Seq(("II", goldenLE), ("MM", goldenBE)).foreach { case (order, bytes) =>
      val m = Exif.parseExif(1L, bytes)
      assert(m.parse_ok, s"$order: $m")
      assert(m.byte_order == order)
      assert(m.n_entries == 4)
      assert(m.orientation == 6, s"$order: $m")
      assert(m.image_width == 320L && m.image_height == 0L) // height absent
      assert(m.make == "Acme" && m.model == "")
      assert(m.datetime == "")
      assert(m.datetime_original == "2021:06:05 10:20:30", s"$order: $m")
    }
  }

  test("golden IFD inside a real JPEG APP1 parses identically") {
    val jpeg = Exif.spliceApp1(Multimodal.syntheticJpeg(8, 8, 100), goldenLE)
    val viaJpeg = Exif.parseExif(3L, jpeg)
    val bare = Exif.parseExif(3L, goldenLE)
    assert(viaJpeg == bare, s"jpeg=$viaJpeg bare=$bare")
    assert(viaJpeg.parse_ok)
  }

  test("builder -> parser: every field matches the generator formulas") {
    (0L until 120L).foreach { id =>
      val m = Exif.parseExif(id, Exif.syntheticExifPayload(id))
      assert(m.parse_ok, s"id=$id")
      assert(m.byte_order == (if (id % 2 == 0) "II" else "MM"), s"id=$id")
      assert(m.n_entries == (if (id % 4 == 1) 7 else 8), s"id=$id")
      assert(m.orientation == 1 + (id % 8), s"id=$id")
      assert(m.image_width == 16 * (1 + id % 5), s"id=$id")
      assert(m.image_height == 16 * (1 + id % 3), s"id=$id")
      assert(m.make == Exif.fixtureMake(id), s"id=$id make=${m.make}")
      assert(m.model == Exif.fixtureModel(id), s"id=$id")
      assert(m.datetime == Exif.fixtureDateTime(id), s"id=$id dt=${m.datetime}")
      assert(m.datetime_original == Exif.fixtureDateTimeOriginal(id), s"id=$id")
    }
  }

  test("inline (count<=4) and offset ASCII placements both round-trip") {
    // id % 4 == 0 → make "mN" (3 bytes with NUL → inline); others offset
    val inline = Exif.parseExif(4L, Exif.syntheticExifPayload(4L))
    assert(inline.make == "m1" && inline.make.length + 1 <= 4)
    val offset = Exif.parseExif(5L, Exif.syntheticExifPayload(5L))
    assert(offset.make == "maker-2" && offset.make.length + 1 > 4)
  }

  test("corrupt / truncated / exif-less payloads degrade to flagged rows") {
    assert(!Exif.parseExif(1L, null).parse_ok)
    assert(!Exif.parseExif(1L, Array.emptyByteArray).parse_ok)
    assert(!Exif.parseExif(1L, "not a tiff".getBytes).parse_ok)
    // a real JPEG with NO APP1: flagged, not thrown
    assert(!Exif.parseExif(1L, Multimodal.syntheticJpeg(8, 8, 10)).parse_ok)
    // bad magic
    val badMagic = goldenLE.clone(); badMagic(2) = 43
    assert(!Exif.parseExif(1L, badMagic).parse_ok)
    // IFD entry count escaping the payload
    val badCount = goldenLE.clone(); badCount(8) = 0xff.toByte
    assert(!Exif.parseExif(1L, badCount).parse_ok)
    // bare-TIFF truncation at EVERY prefix must flag ONE of the two
    // readers (the GPS rationals sit last, so late cuts clip parseGps's
    // bytes while parseExif's are complete), never throw
    val bare = Exif.syntheticExifPayload(6L) // id % 3 == 0 → bare TIFF
    (1 until bare.length).foreach { cut =>
      val t = java.util.Arrays.copyOf(bare, cut)
      assert(!Exif.parseExif(1L, t).parse_ok || !Exif.parseGps(1L, t).parse_ok,
        s"cut=$cut")
    }
    // JPEG-transport truncation: no-throw (cuts past the APP1 segment
    // legitimately still parse)
    val jpeg = Exif.syntheticExifPayload(7L)
    (1 until jpeg.length by 5).foreach { cut =>
      Exif.parseExif(1L, java.util.Arrays.copyOf(jpeg, cut))
    }
  }

  test("parseExif never throws on arbitrary byte soup (seeded fuzz)") {
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      Exif.parseExif(seed.toLong, b)
    }
    // adversarial: valid header + random IFD bytes
    (0 until 100).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](64)
      rnd.nextBytes(b)
      b(0) = 'I'; b(1) = 'I'; b(2) = 42; b(3) = 0
      b(4) = 8; b(5) = 0; b(6) = 0; b(7) = 0
      Exif.parseExif(seed.toLong, b)
    }
  }

  test("GPS builder -> parser: refs and signed arcseconds match the formulas") {
    (0L until 120L).foreach { id =>
      val g = Exif.parseGps(id, Exif.syntheticExifPayload(id))
      assert(g.parse_ok, s"id=$id")
      if (id % 4 == 1) {
        assert(g.has_gps == 0 && g.lat_ref == "" && g.lat_arcsec == 0L, s"id=$id")
      } else {
        assert(g.has_gps == 1, s"id=$id")
        assert(g.lat_ref == Exif.fixtureLatRef(id), s"id=$id")
        assert(g.lon_ref == Exif.fixtureLonRef(id), s"id=$id")
        val latSign = if (id % 2 == 0) 1L else -1L
        val lonSign = if (id % 3 == 0) 1L else -1L
        assert(g.lat_arcsec == latSign * Exif.fixtureLatArcsec(id), s"id=$id $g")
        assert(g.lon_arcsec == lonSign * Exif.fixtureLonArcsec(id), s"id=$id $g")
      }
    }
  }

  test("golden GPS: hand-assembled rational coordinates, both byte orders") {
    // graft a GPS IFD by hand onto a minimal TIFF: 37°51'30" S, 12°0'45" E
    Seq(true, false).foreach { le =>
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
      out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
      w16(42); w32(8)
      // IFD0: 1 entry (GPS pointer at 26) -> 2 + 12 + 4 = 18, ends 26
      w16(1); w16(0x8825); w16(4); w32(1); w32(26)
      w32(0)
      // GPS IFD at 26: 4 entries -> 2 + 48 + 4 = 54, ends 80
      w16(4)
      w16(0x0001); w16(2); w32(2)
      out.write('S'); out.write(0); w16(0) // inline "S\0" + pad
      w16(0x0002); w16(5); w32(3); w32(80)  // lat rationals at 80
      w16(0x0003); w16(2); w32(2)
      out.write('E'); out.write(0); w16(0)
      w16(0x0004); w16(5); w32(3); w32(104) // lon rationals at 104
      w32(0)
      // lat: 37/1 deg, 102/2 = 51 min, 120/4 = 30 sec
      w32(37); w32(1); w32(102); w32(2); w32(120); w32(4)
      // lon: 12/1 deg, 0/1 min, 45/1 sec
      w32(12); w32(1); w32(0); w32(1); w32(45); w32(1)
      val g = Exif.parseGps(2L, out.toByteArray)
      assert(g.parse_ok && g.has_gps == 1, s"le=$le $g")
      assert(g.lat_ref == "S" && g.lon_ref == "E", s"le=$le $g")
      assert(g.lat_arcsec == -(37L * 3600 + 51 * 60 + 30), s"le=$le $g")
      assert(g.lon_arcsec == 12L * 3600 + 45, s"le=$le $g")
    }
  }

  test("stripGps: geotag gone, every other field intact, GPS bytes zeroed") {
    (0L until 60L).foreach { id =>
      val orig = Exif.syntheticExifPayload(id)
      val scrubbed = Exif.stripGps(orig)
      val g = Exif.parseGps(id, scrubbed)
      assert(g.parse_ok && g.has_gps == 0, s"id=$id $g")
      val before = Exif.parseExif(id, orig)
      val after = Exif.parseExif(id, scrubbed)
      assert(after == before, s"id=$id non-GPS fields changed")
      if (Exif.fixtureHasGps(id)) {
        assert(!(scrubbed sameElements orig), s"id=$id: nothing scrubbed")
        // the coordinate rationals must be GONE from the bytes, not just
        // unreachable: the rational denominators (1/2/4, six nonzero u32s)
        // and the GPS entry tags all zero out, so the changed-byte count
        // has a hard floor well above a pointer-only rewrite (~8 bytes)
        val diff = orig.zip(scrubbed).count { case (a, b) => a != b }
        assert(diff >= 20, s"id=$id: only $diff bytes changed")
      } else assert(scrubbed sameElements orig, s"id=$id: no-GPS file touched")
    }
    // byte-level zeroing pinned on a known layout: id=6 is a bare TIFF
    // (6%3==0) with GPS (6%4!=1); the builder's arithmetic puts the GPS
    // IFD block at [128, 182) and the two rational blocks at [238, 286)
    locally {
      val sc = Exif.stripGps(Exif.syntheticExifPayload(6L))
      (128 until 182).foreach(i =>
        assert(sc(i) == 0, s"GPS IFD byte $i survived: ${sc(i)}"))
      (238 until 286).foreach(i =>
        assert(sc(i) == 0, s"rational byte $i survived: ${sc(i)}"))
    }
    // unparseable payloads pass through untouched, never throw
    val junk = "not exif".getBytes
    assert(Exif.stripGps(junk) sameElements junk)
    assert(Exif.stripGps(null).length == 0)
  }

  test("exifMeta: distributed parse over a payload table matches parseExif") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Exif.syntheticExifPayload(id)))
      .toDF("media_id", "payload")
    val got = Exif.exifMeta(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Exif.parseExif(id, Exif.syntheticExifPayload(id)))
    assert(got.toSeq == want)
  }
}
