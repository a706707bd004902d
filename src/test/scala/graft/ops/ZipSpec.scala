package graft.ops

import graft.SparkSpec

/** Pins the ZIP walk as a DIFFERENTIAL against the JDK (the fixture
  * writer and the read-back reference are both `java.util.zip`), plus
  * the degrade contracts the JDK reader doesn't exercise.
  */
class ZipSpec extends SparkSpec {

  test("builder -> parser: every field matches the formulas (JDK-written)") {
    (0L until 120L).foreach { id =>
      val m = Zip.parseZip(id, Zip.syntheticZip(id))
      val n = 2 + (id % 5).toInt
      assert(m.parse_ok, s"id=$id")
      assert(m.n_entries == n, s"id=$id")
      assert(m.n_stored == 1 && m.n_deflated == n - 1, s"id=$id")
      assert(m.total_uncompressed ==
        (0 until n).map(Zip.fixtureText(id, _).length.toLong).sum, s"id=$id")
      assert(m.first_name == "doc-0.txt", s"id=$id")
      assert(m.member0_text == Zip.fixtureText(id, 0), s"id=$id")
      assert(m.member1_text == Zip.fixtureText(id, 1), s"id=$id")
    }
  }

  test("walk == ZipInputStream, member-for-member (the JDK read-back)") {
    (0L until 40L).foreach { id =>
      val bytes = Zip.syntheticZip(id)
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val jdk = Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .map { e =>
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](256)
          var k = zin.read(tmp)
          while (k >= 0) { buf.write(tmp, 0, k); k = zin.read(tmp) }
          (e.getName, new String(buf.toByteArray, "UTF-8"))
        }.toList
      zin.close()
      val m = Zip.parseZip(id, bytes)
      assert(m.n_entries == jdk.length, s"id=$id")
      assert(m.first_name == jdk.head._1, s"id=$id")
      assert(m.member0_text == jdk.head._2, s"id=$id")
      assert(m.member1_text == jdk(1)._2, s"id=$id")
    }
  }

  test("corrupt / truncated / CRC-flipped archives degrade to flagged rows") {
    assert(!Zip.parseZip(1L, null).parse_ok)
    assert(!Zip.parseZip(1L, Array.emptyByteArray).parse_ok)
    assert(!Zip.parseZip(1L, "PK but not really a zip file".getBytes).parse_ok)
    val good = Zip.syntheticZip(7L)
    // flip one byte of the STORED member's data: the CRC check must
    // catch it (member0 is stored first, right after its local header)
    val flipped = good.clone()
    flipped(40) = (flipped(40) ^ 0x55).toByte
    assert(!Zip.parseZip(1L, flipped).parse_ok, "CRC mismatch not caught")
    // truncations must flag, never throw (EOCD lives at the tail, so
    // every cut loses it or the directory it points to)
    (1 until good.length by 3).foreach { cut =>
      assert(!Zip.parseZip(1L, java.util.Arrays.copyOf(good, cut)).parse_ok,
        s"cut=$cut")
    }
    // a trailing comment after EOCD is legal — the signature scan must
    // still find the record
    val eocd = good.length - 22
    val withComment = java.util.Arrays.copyOf(good, good.length + 9)
    withComment(eocd + 20) = 9 // comment length field
    "comment!!".getBytes.zipWithIndex.foreach { case (b, i) =>
      withComment(good.length + i) = b
    }
    assert(Zip.parseZip(1L, withComment).parse_ok, "comment broke the scan")
  }

  test("parseZip never throws on arbitrary byte soup (seeded fuzz)") {
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      Zip.parseZip(seed.toLong, b)
    }
    // adversarial: a real EOCD signature planted in junk
    (0 until 100).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](30 + rnd.nextInt(64))
      rnd.nextBytes(b)
      val p = b.length - 22
      b(p) = 0x50; b(p + 1) = 0x4b; b(p + 2) = 0x05; b(p + 3) = 0x06
      Zip.parseZip(seed.toLong, b)
    }
  }

  test("zip64: a 65536-entry JDK archive walks through the zip64 EOCD") {
    // 65536 is the smallest count where the classic EOCD is WRONG (its
    // count field saturates to the 0xFFFF sentinel): a non-zip64 walk
    // would stop one entry short and fail the directory-size check.
    val bytes = Zip.syntheticZip(3L, Zip.Zip64Entries)
    val m = Zip.parseZip(3L, bytes)
    assert(m.parse_ok, "zip64 archive flagged")
    assert(m.n_entries == Zip.Zip64Entries)
    assert(m.n_stored == 1 && m.n_deflated == Zip.Zip64Entries - 1)
    assert(m.member0_text == Zip.fixtureText(3L, 0))
    assert(m.member1_text == Zip.fixtureText(3L, 1))
    assert(m.total_uncompressed ==
      (0 until Zip.Zip64Entries).map(Zip.fixtureText(3L, _).length.toLong).sum)
    // differential: the JDK's own sequential reader agrees on the count
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var jdkCount = 0
    while (zin.getNextEntry != null) jdkCount += 1
    zin.close()
    assert(jdkCount == Zip.Zip64Entries)
    // corrupting the zip64 EOCD signature must degrade, not mis-walk
    var sigAt = -1
    var i = bytes.length - 200
    while (i < bytes.length - 3 && sigAt < 0) {
      if (bytes(i) == 0x50 && bytes(i + 1) == 0x4b &&
          bytes(i + 2) == 0x06 && bytes(i + 3) == 0x06) sigAt = i
      i += 1
    }
    assert(sigAt > 0, "no zip64 EOCD in fixture")
    val broken = bytes.clone()
    broken(sigAt + 3) = 0x7f
    assert(!Zip.parseZip(3L, broken).parse_ok)
  }

  /** One-member STORED archive assembled BY HAND so the two layouts the
    * JDK writer never emits for small data — per-entry zip64 sentinels
    * (0xFFFFFFFF sizes/offset deferring to the 0x0001 extra field) and
    * a non-EFS CP437 name — get golden coverage.
    */
  private def handZip(name: Array[Byte], efs: Boolean,
      zip64Entry: Boolean): Array[Byte] = {
    val data = "hand-data".getBytes("UTF-8")
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32((v >> 32) & 0xffffffffL) }
    val flag = if (efs) 0x0800 else 0
    // local header (always classic — sizes fit)
    w32(0x04034b50L); w16(20); w16(flag); w16(0); w16(0); w16(0)
    w32(crc.getValue); w32(data.length.toLong); w32(data.length.toLong)
    w16(name.length); w16(0)
    out.write(name); out.write(data)
    val cdOff = out.size()
    // central header, optionally with zip64 sentinels + 0x0001 extra
    w32(0x02014b50L); w16(45); w16(45); w16(flag); w16(0); w16(0); w16(0)
    w32(crc.getValue)
    if (zip64Entry) { w32(0xffffffffL); w32(0xffffffffL) }
    else { w32(data.length.toLong); w32(data.length.toLong) }
    w16(name.length)
    w16(if (zip64Entry) 28 else 0) // extra len
    w16(0); w16(0); w16(0); w32(0)
    if (zip64Entry) w32(0xffffffffL) else w32(0L) // local offset
    out.write(name)
    if (zip64Entry) {
      w16(0x0001); w16(24)
      w64(data.length.toLong); w64(data.length.toLong); w64(0L)
    }
    val cdSize = out.size() - cdOff
    // classic EOCD (counts/offsets fit — no zip64 EOCD needed for the
    // per-entry case; APPNOTE allows mixing)
    w32(0x06054b50L); w16(0); w16(0); w16(1); w16(1)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    out.toByteArray
  }

  test("zip64 per-entry sentinels resolve through the 0x0001 extra field") {
    val m = Zip.parseZip(9L, handZip("a.txt".getBytes("UTF-8"),
      efs = true, zip64Entry = true))
    assert(m.parse_ok, "per-entry zip64 flagged")
    assert(m.n_entries == 1 && m.member0_text == "hand-data")
    assert(m.total_uncompressed == "hand-data".length.toLong)
    // sentinel WITHOUT the extra field must degrade
    val noExtra = handZip("a.txt".getBytes("UTF-8"), efs = true,
      zip64Entry = true)
    // blank the extra header id so the walk can't find 0x0001
    var p = -1
    (0 until noExtra.length - 4).foreach { i =>
      if (noExtra(i) == 0x01 && noExtra(i + 1) == 0x00 &&
          noExtra(i + 2) == 24 && noExtra(i + 3) == 0x00 && p < 0) p = i
    }
    assert(p > 0)
    noExtra(p) = 0x63
    assert(!Zip.parseZip(9L, noExtra).parse_ok)
  }

  test("names decode as CP437 without EFS, UTF-8 with it (APPNOTE bit 11)") {
    // 0x81 0x82 = ü é in CP437; in UTF-8 the same bytes are invalid
    val raw = Array[Byte](0x81.toByte, 0x82.toByte, '.', 't', 'x', 't')
    val cp437 = Zip.parseZip(1L, handZip(raw, efs = false, zip64Entry = false))
    assert(cp437.parse_ok && cp437.first_name == "üé.txt")
    val utf8Name = "schön.txt".getBytes("UTF-8")
    val utf8 = Zip.parseZip(1L, handZip(utf8Name, efs = true, zip64Entry = false))
    assert(utf8.parse_ok && utf8.first_name == "schön.txt")
    // the JDK writer sets EFS, so its fixtures hit the UTF-8 branch
    val jdk = Zip.parseZip(2L, Zip.syntheticZip(2L))
    assert(jdk.first_name == "doc-0.txt")
  }

  test("zipMeta: distributed parse over a payload table matches parseZip") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Zip.syntheticZip(id)))
      .toDF("media_id", "payload")
    val got = Zip.zipMeta(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Zip.parseZip(id, Zip.syntheticZip(id)))
    assert(got.toSeq == want)
  }
}
