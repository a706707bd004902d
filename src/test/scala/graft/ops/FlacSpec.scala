package graft.ops

import graft.SparkSpec

/** Pins the FLAC STREAMINFO census on golden hand-packed bits (never
  * the builder), the builder↔parser differential, and the degrade
  * contracts.
  */
class FlacSpec extends SparkSpec {

  /** Hand-packed: 44100 Hz, stereo, 16-bit, 88200 samples (→ 2000 ms),
    * one trailing last-flagged PADDING block.
    */
  private def golden: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x00); out.write(0); out.write(0); out.write(34) // STREAMINFO
    val si = new Array[Byte](34)
    si(10) = 0x0a; si(11) = 0xc4.toByte // 44100 = 0x0AC44: top 16 of 20 bits
    si(12) = 0x42 // rate low nibble 4 | (2-1)<<1 | bps-1 high bit 0
    si(13) = 0xf0.toByte // bps-1 = 15 low nibble | total samples top 0
    si(14) = 0x00; si(15) = 0x01; si(16) = 0x58; si(17) = 0x88.toByte // 88200
    out.write(si)
    out.write(0x81); out.write(0); out.write(0); out.write(3) // last PADDING
    out.write(0); out.write(0); out.write(0)
    out.toByteArray
  }

  test("golden hand-packed STREAMINFO parses field-for-field") {
    val m = Flac.parseFlac(7L, golden)
    assert(m.parse_ok, m.toString)
    assert(m.sample_rate == 44100 && m.channels == 2 && m.bits_per_sample == 16,
      m.toString)
    assert(m.total_samples == 88200L && m.duration_ms == 2000L, m.toString)
    assert(m.n_blocks == 2 && m.has_vorbis_comment == 0)
  }

  test("builder -> parser: every field matches the generator formulas") {
    (0L until 150L).foreach { id =>
      val m = Flac.parseFlac(id, Flac.syntheticFlac(id))
      val rate = 8000 * (1 + (id % 6).toInt)
      val total = 1000L * (3 + id % 7)
      assert(m.parse_ok, s"id=$id")
      assert(m.sample_rate == rate, s"id=$id")
      assert(m.channels == 1 + id % 8, s"id=$id")
      assert(m.bits_per_sample == 8 + (id % 3) * 4, s"id=$id")
      assert(m.total_samples == total, s"id=$id")
      assert(m.duration_ms == total * 1000L / rate, s"id=$id")
      assert(m.n_blocks == (if (id % 2 == 0) 3 else 2), s"id=$id")
      assert(m.has_vorbis_comment == (if (id % 2 == 0) 1 else 0), s"id=$id")
      if (id % 2 == 0) {
        assert(m.vendor.contains("graft flac 1.0"), s"id=$id: $m")
        // case-insensitive field match, FIRST value wins over the
        // lowercase `title=shadowed` duplicate on id%4=0
        assert(m.tag_title.contains(s"Track $id"), s"id=$id: $m")
        assert(m.tag_artist.contains(s"Artist ${id % 17}"), s"id=$id: $m")
        val want = 2 + (if (id % 3 == 0) 1 else 0) + (if (id % 4 == 0) 1 else 0)
        assert(m.n_tags == want, s"id=$id: $m")
      } else {
        assert(m.vendor.isEmpty && m.tag_title.isEmpty &&
          m.tag_artist.isEmpty && m.n_tags == 0, s"id=$id: $m")
      }
    }
  }

  test("VORBIS_COMMENT whose lengths escape the block degrades the row") {
    // rebuild id=2's file, then corrupt the VC payload's vendor length
    // to point past the block: the row must flag, not misextract
    val b = Flac.syntheticFlac(2L)
    val vcHdr = 4 + 4 + 34 // magic + STREAMINFO header + payload
    assert((b(vcHdr) & 0x7f) == 4, "fixture layout: VC block second")
    b(vcHdr + 4) = 0xff.toByte // vendor length low byte → escapes
    b(vcHdr + 5) = 0xff.toByte
    assert(!Flac.parseFlac(2L, b).parse_ok)
  }

  test("corrupt / truncated payloads degrade to flagged rows") {
    assert(!Flac.parseFlac(1L, null).parse_ok)
    assert(!Flac.parseFlac(1L, Array.emptyByteArray).parse_ok)
    assert(!Flac.parseFlac(1L, "OggSnot a flac".getBytes).parse_ok)
    // first block not STREAMINFO
    val wrongFirst = golden.clone(); wrongFirst(4) = 0x01
    assert(!Flac.parseFlac(1L, wrongFirst).parse_ok)
    // a block length escaping the payload
    val escape = golden.clone(); escape(7) = 0xff.toByte
    assert(!Flac.parseFlac(1L, escape).parse_ok)
    // zero sample rate
    val zeroRate = golden.clone()
    zeroRate(8 + 10) = 0; zeroRate(8 + 11) = 0
    zeroRate(8 + 12) = (zeroRate(8 + 12) & 0x0f).toByte
    assert(!Flac.parseFlac(1L, zeroRate).parse_ok)
    // truncation mid-STREAMINFO and mid-chain must flag, never throw
    (1 until golden.length).foreach { cut =>
      val st = Flac.parseFlac(1L, java.util.Arrays.copyOf(golden, cut))
      assert(!st.parse_ok, s"cut=$cut")
    }
  }

  test("parseFlac never throws on arbitrary byte soup (seeded fuzz)") {
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(b)
      if (b.length >= 4) { b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C' }
      Flac.parseFlac(seed.toLong, b)
    }
  }

  test("flacMeta: distributed parse over a payload table matches parseFlac") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Flac.syntheticFlac(id)))
      .toDF("media_id", "payload")
    val got = Flac.flacMeta(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Flac.parseFlac(id, Flac.syntheticFlac(id)))
    assert(got.toSeq == want)
  }
}
