package graft.ops

import graft.SparkSpec

/** Pins the EBML walk on a golden hand-assembled element tree (never
  * the builder), the builder↔parser differential (sized AND
  * unknown-size Segments), and the degrade contracts.
  */
class EbmlSpec extends SparkSpec {

  /** Golden bytes written element-by-element from RFC 8794 + the
    * Matroska registry: DocType "matroska", TimestampScale 500 000,
    * float32 Duration 6000 ticks (→ 3000 ms), one audio track then one
    * video track (order swapped vs the builder), VP8 at 640×360, a
    * 2-byte-vint-sized Cluster of junk.
    */
  private def golden: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def raw(xs: Int*): Unit = xs.foreach(out.write)
    // EBML header: ID 1A45DFA3, size 11; DocType 4282 size 8
    raw(0x1a, 0x45, 0xdf, 0xa3, 0x8b)
    raw(0x42, 0x82, 0x88)
    out.write("matroska".getBytes("US-ASCII"))
    // Segment, sized
    val seg = new java.io.ByteArrayOutputStream()
    def sraw(xs: Int*): Unit = xs.foreach(seg.write)
    // Info 1549A966: TimestampScale 2AD7B1 (3 bytes: 0x07A120 = 500000),
    // Duration 4489 float32 6000.0f = 0x45BB8000
    sraw(0x15, 0x49, 0xa9, 0x66, 0x8e)
    sraw(0x2a, 0xd7, 0xb1, 0x83, 0x07, 0xa1, 0x20)
    sraw(0x44, 0x89, 0x84, 0x45, 0xbb, 0x80, 0x00)
    // Tracks 1654AE6B: audio entry FIRST (type 2, "A_AAC"),
    // then video entry (type 1, "V_VP8", 640x360)
    val audio = Array(0xae, 0x8a, 0x83, 0x81, 0x02, 0x86, 0x85) ++
      "A_AAC".getBytes("US-ASCII").map(_ & 0xff)
    val video = Array(0xae, 0x94, 0x83, 0x81, 0x01, 0x86, 0x85) ++
      "V_VP8".getBytes("US-ASCII").map(_ & 0xff) ++
      Array(0xe0, 0x88, 0xb0, 0x82, 0x02, 0x80, 0xba, 0x82, 0x01, 0x68)
    sraw(0x16, 0x54, 0xae, 0x6b)
    seg.write(0x80 | (audio.length + video.length))
    audio.foreach(seg.write); video.foreach(seg.write)
    // Cluster 1F43B675 with a 2-byte size vint (0x40 0x05) of 5 junk bytes
    sraw(0x1f, 0x43, 0xb6, 0x75, 0x40, 0x05, 0x11, 0x22, 0x33, 0x44, 0x55)
    val segBody = seg.toByteArray
    raw(0x18, 0x53, 0x80, 0x67)
    out.write(0x40); out.write(segBody.length) // 2-byte size vint
    out.write(segBody)
    out.toByteArray
  }

  test("golden hand-assembled tree parses field-for-field") {
    val m = Ebml.parseEbml(4L, golden)
    assert(m.parse_ok, m.toString)
    assert(m.doctype == "matroska")
    assert(m.timescale_ns == 500000L)
    assert(m.duration_ms == 3000L, m.toString) // 6000 ticks x 500000 ns
    assert(m.n_tracks == 2)
    assert(m.video_codec == "V_VP8" && m.audio_codec == "A_AAC")
    assert(m.width == 640 && m.height == 360, m.toString)
  }

  test("builder -> parser: every field matches the generator formulas") {
    (0L until 150L).foreach { id =>
      val m = Ebml.parseEbml(id, Ebml.syntheticWebm(id))
      assert(m.parse_ok, s"id=$id")
      assert(m.doctype == "webm", s"id=$id")
      assert(m.timescale_ns == 1_000_000L, s"id=$id")
      assert(m.duration_ms == 40 * (5 + id % 7), s"id=$id ${m.duration_ms}")
      assert(m.n_tracks == (if (id % 3 == 0) 1 else 2), s"id=$id")
      assert(m.video_codec == (if (id % 2 == 0) "V_VP9" else "V_VP8"), s"id=$id")
      assert(m.audio_codec == (if (id % 3 == 0) "" else "A_OPUS"), s"id=$id")
      assert(m.width == 16 * (1 + id % 5), s"id=$id")
      assert(m.height == 16 * (1 + id % 3), s"id=$id")
    }
  }

  test("unknown-size vint: legal on Segment, corrupt anywhere else") {
    // builder emits it on id % 5 == 0 — covered above; now an
    // unknown-size INFO must flag
    val good = Ebml.syntheticWebm(1L)
    val m = Ebml.parseEbml(1L, good)
    assert(m.parse_ok)
    // hand-build: EBML header + segment whose Info carries size 0xFF
    val out = new java.io.ByteArrayOutputStream()
    Seq(0x1a, 0x45, 0xdf, 0xa3, 0x86, 0x42, 0x82, 0x83).foreach(out.write)
    out.write("web".getBytes)
    Seq(0x18, 0x53, 0x80, 0x67, 0xff,
      0x15, 0x49, 0xa9, 0x66, 0xff).foreach(out.write)
    assert(!Ebml.parseEbml(1L, out.toByteArray).parse_ok)
  }

  test("corrupt / truncated payloads degrade to flagged rows") {
    assert(!Ebml.parseEbml(1L, null).parse_ok)
    assert(!Ebml.parseEbml(1L, Array.emptyByteArray).parse_ok)
    assert(!Ebml.parseEbml(1L, "not ebml".getBytes).parse_ok)
    // element size escaping its parent
    assert(!Ebml.parseEbml(1L,
      Array(0x1a, 0x45, 0xdf, 0xa3, 0xbf).map(_.toByte) ++
        new Array[Byte](4)).parse_ok)
    // truncation sweep over a sized-segment file: flag or legitimately
    // parse a prefix, never throw — and the FULL prefix set must
    // include flags (the tree is load-bearing)
    val good = Ebml.syntheticWebm(3L)
    val flags = (1 until good.length).count { cut =>
      !Ebml.parseEbml(1L, java.util.Arrays.copyOf(good, cut)).parse_ok
    }
    assert(flags > good.length / 2, s"only $flags/${good.length} cuts flagged")
  }

  test("parseEbml never throws on arbitrary byte soup (seeded fuzz)") {
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      Ebml.parseEbml(seed.toLong, b)
    }
    // adversarial: a valid EBML header ID + random tail
    (0 until 200).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](5 + rnd.nextInt(64))
      rnd.nextBytes(b)
      b(0) = 0x1a; b(1) = 0x45; b(2) = 0xdf.toByte; b(3) = 0xa3.toByte
      Ebml.parseEbml(seed.toLong, b)
    }
  }

  test("ebmlMeta: distributed parse over a payload table matches parseEbml") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Ebml.syntheticWebm(id)))
      .toDF("media_id", "payload")
    val got = Ebml.ebmlMeta(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Ebml.parseEbml(id, Ebml.syntheticWebm(id)))
    assert(got.toSeq == want)
  }
}
