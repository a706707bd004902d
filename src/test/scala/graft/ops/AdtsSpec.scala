package graft.ops

import graft.SparkSpec

/** Pins the ADTS header census on golden hand-packed frames (never the
  * builder), the builder↔parser differential, and the degrade
  * contracts.
  */
class AdtsSpec extends SparkSpec {

  /** Two hand-packed frames — AAC LC (profile 1), 44100 Hz (index 4),
    * stereo: frame 1 has no CRC and 1 raw data block, frame 2 carries a
    * CRC and 2 blocks. Bits packed by hand from §1.A.3.2.1.
    */
  private def golden: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def frame(protAbsent: Int, rdbMinus1: Int, payload: Int): Unit = {
      val crc = if (protAbsent == 1) 0 else 2
      val len = 7 + crc + payload
      out.write(0xff)
      out.write(0xf0 | protAbsent)
      // profile 1 (01), sri 4 (0100), private 0, ch hi 0 → 01 0100 0 0
      out.write(0x50)
      // ch lo 10, orig/home/cid/cstart 0000, len hi 2 bits
      out.write(0x80 | ((len >> 11) & 3))
      out.write((len >> 3) & 0xff)
      out.write(((len & 7) << 5) | 0x15) // fullness junk
      out.write(0x40 | rdbMinus1)        // fullness junk | rdb
      if (crc == 2) { out.write(0xca); out.write(0xfe) }
      (0 until payload).foreach(i => out.write(i * 37 & 0xff))
    }
    frame(protAbsent = 1, rdbMinus1 = 0, payload = 13)
    frame(protAbsent = 0, rdbMinus1 = 1, payload = 21)
    out.toByteArray
  }

  test("golden hand-packed frames census field-for-field") {
    val st = Adts.parseAdts(5L, golden)
    assert(st.parse_ok, st.toString)
    assert(st.profile == 1 && st.sample_rate == 44100 && st.channels == 2,
      st.toString)
    assert(st.n_frames == 2L && st.n_blocks == 3L && st.n_crc_frames == 1L)
    // 3 blocks · 1024 samples at 44100 Hz → 3072000 / 44100 = 69 ms (floor)
    assert(st.duration_ms == 69L, st.toString)
  }

  test("builder -> parser: every field matches the generator formulas") {
    (0L until 130L).foreach { id =>
      val st = Adts.parseAdts(id, Adts.syntheticAdts(id))
      val n = 3 + (id % 9)
      val blocks = n * (1 + id % 3)
      val rate = Adts.SampleRates((id % 13).toInt)
      assert(st.parse_ok, s"id=$id")
      assert(st.profile == id % 4, s"id=$id")
      assert(st.sample_rate == rate, s"id=$id")
      assert(st.channels == 1 + id % 6, s"id=$id")
      assert(st.n_frames == n, s"id=$id")
      assert(st.n_blocks == blocks, s"id=$id")
      assert(st.n_crc_frames == n / 2, s"id=$id") // odd frame ordinals
      assert(st.duration_ms == blocks * 1024L * 1000L / rate, s"id=$id")
    }
  }

  test("corrupt / truncated / config-shift streams degrade to flagged rows") {
    assert(!Adts.parseAdts(1L, null).parse_ok)
    assert(!Adts.parseAdts(1L, Array.emptyByteArray).parse_ok)
    assert(!Adts.parseAdts(1L, "not audio at all".getBytes).parse_ok)
    val good = Adts.syntheticAdts(9L)
    // frame boundaries from the generator formulas: a cut ON a boundary
    // is a legitimately shorter stream (fewer frames), anywhere else
    // clips a frame mid-body and must flag
    val boundaries = (0 until (3 + 9 % 9)).scanLeft(0) { (acc, f) =>
      acc + 7 + (if (f % 2 == 0) 0 else 2) + 10 + ((9 * 7 + f * 13) % 50)
    }.toSet
    (1 until good.length).foreach { cut =>
      val st = Adts.parseAdts(1L, java.util.Arrays.copyOf(good, cut))
      if (boundaries.contains(cut)) assert(st.parse_ok, s"boundary cut=$cut")
      else assert(!st.parse_ok, s"cut=$cut")
    }
    // trailing garbage after the last frame breaks the sync chain
    assert(!Adts.parseAdts(1L, good ++ Array[Byte](1, 2, 3)).parse_ok)
    // a mid-stream config change (second frame's profile flipped)
    val shifted = good.clone()
    val f2 = {
      // recompute first frame's length to find the second header
      val len = ((good(3) & 3) << 11) | ((good(4) & 0xff) << 3) |
        (((good(5) & 0xff) >>> 5) & 7)
      len
    }
    shifted(f2 + 2) = (shifted(f2 + 2) ^ 0x40).toByte
    assert(!Adts.parseAdts(1L, shifted).parse_ok)
    // reserved sampling_frequency_index (13) rejects
    val badSri = good.clone()
    badSri(2) = ((badSri(2) & 0xc3) | (13 << 2)).toByte
    assert(!Adts.parseAdts(1L, badSri).parse_ok)
  }

  test("parseAdts never throws on arbitrary byte soup (seeded fuzz)") {
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      Adts.parseAdts(seed.toLong, b)
    }
    // adversarial: valid sync + random header bits + truncations
    (0 until 200).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](7 + rnd.nextInt(40))
      rnd.nextBytes(b)
      b(0) = 0xff.toByte
      b(1) = (0xf0 | (seed & 1)).toByte
      Adts.parseAdts(seed.toLong, b)
    }
  }

  test("adtsStats: distributed census over a payload table matches parseAdts") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Adts.syntheticAdts(id)))
      .toDF("media_id", "payload")
    val got = Adts.adtsStats(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Adts.parseAdts(id, Adts.syntheticAdts(id)))
    assert(got.toSeq == want)
  }
}
