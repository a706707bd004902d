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

  test("zipMeta: distributed parse over a payload table matches parseZip") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Zip.syntheticZip(id)))
      .toDF("media_id", "payload")
    val got = Zip.zipMeta(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Zip.parseZip(id, Zip.syntheticZip(id)))
    assert(got.toSeq == want)
  }
}
