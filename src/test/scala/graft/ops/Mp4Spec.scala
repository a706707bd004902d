package graft.ops

import graft.SparkSpec

/** Pins the ISO-BMFF demux on evidence independent of the synthetic
  * builder (a golden hand-assembled box tree), plus the builder↔parser
  * differential, the absent-stss default, and the degrade contracts.
  */
class Mp4Spec extends SparkSpec {

  private def u32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def bx(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val size = 8 + payload.map(_.length).sum
    u32(size.toLong) ++ typ.getBytes("ISO-8859-1") ++
      payload.foldLeft(Array.emptyByteArray)(_ ++ _)
  }

  /** A golden file assembled field-by-field from the 14496-12 box
    * layouts (never the Mp4 builder): one video track, timescale 600,
    * duration 1200 (→ 2000 ms), stts of TWO runs (3×delta + 2×delta =
    * 5 samples), stss listing samples {1, 4} and an avcC whose SPS is
    * the H264Spec golden baseline SPS (60×30, profile 66) — so the
    * cross-layer reuse is pinned against hand bits on BOTH layers.
    */
  private def goldenMp4: Array[Byte] = {
    val bits =
      "01000010" + "00000000" + "00011110" +
        "1" + "1" + "1" + "1" + "010" + "0" +
        "00100" + "010" + "1" + "1" +
        "1" + "1" + "011" + "1" + "010" + "0" + "1"
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val spsRbsp = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val spsNal = Array(0x67.toByte) ++ H264.rbspEscape(spsRbsp)
    val avcC = bx("avcC",
      Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte),
      u16(spsNal.length), spsNal, Array[Byte](0)) // zero PPS: demux-irrelevant
    val avc1 = bx("avc1", new Array[Byte](6), u16(1), new Array[Byte](16),
      u16(64), u16(32), new Array[Byte](50), avcC)
    val stbl = bx("stbl",
      bx("stsd", u32(0), u32(1), avc1),
      bx("stts", u32(0), u32(2), u32(3), u32(240), u32(2), u32(240)),
      bx("stss", u32(0), u32(2), u32(1), u32(4)))
    val mdia = bx("mdia",
      bx("mdhd", u32(0), u32(0), u32(0), u32(600), u32(1200), u16(0), u16(0)),
      bx("hdlr", u32(0), u32(0), "vide".getBytes("ISO-8859-1"),
        new Array[Byte](12)),
      bx("minf", stbl))
    bx("ftyp", "mp42".getBytes("ISO-8859-1"), u32(0)) ++
      bx("moov", bx("trak", mdia)) ++
      bx("mdat", new Array[Byte](7))
  }

  test("golden hand-assembled box tree parses field-for-field") {
    val m = Mp4.parseMp4(9L, goldenMp4)
    assert(m.parse_ok, m.toString)
    assert(m.brand == "mp42")
    assert(m.duration_ms == 2000L) // 1200 ticks at timescale 600
    assert(m.n_samples == 5L)      // two stts runs: 3 + 2
    assert(m.n_keyframes == 2L)    // stss entry_count
    assert(m.width == 60 && m.height == 30) // the golden SPS, cropped
    assert(m.profile_idc == 66 && m.level_idc == 30)
  }

  test("mdhd version 1 (64-bit times) parses: golden v1 header") {
    // v1 layout: FullBox(version=1) + creation(8) + modification(8) +
    // timescale(4) + duration(8) — timescale 90000, duration 450000
    // ticks -> 5000 ms
    val mdhdV1 = bx("mdhd", Array[Byte](1, 0, 0, 0),
      new Array[Byte](16), u32(90000), u32(0), u32(450000), u16(0), u16(0))
    val golden = goldenMp4
    // graft the v1 mdhd in place of the golden file's v0 one by
    // rebuilding the tree around the same stbl/hdlr
    val bits =
      "01000010" + "00000000" + "00011110" +
        "1" + "1" + "1" + "1" + "010" + "0" +
        "00100" + "010" + "1" + "1" +
        "1" + "1" + "011" + "1" + "010" + "0" + "1"
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val spsRbsp = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val spsNal = Array(0x67.toByte) ++ H264.rbspEscape(spsRbsp)
    val avcC = bx("avcC", Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte),
      u16(spsNal.length), spsNal, Array[Byte](0))
    val avc1 = bx("avc1", new Array[Byte](6), u16(1), new Array[Byte](16),
      u16(64), u16(32), new Array[Byte](50), avcC)
    val stbl = bx("stbl",
      bx("stsd", u32(0), u32(1), avc1),
      bx("stts", u32(0), u32(1), u32(4), u32(112500)))
    val mdia = bx("mdia", mdhdV1,
      bx("hdlr", u32(0), u32(0), "vide".getBytes("ISO-8859-1"),
        new Array[Byte](12)),
      bx("minf", stbl))
    val file = bx("ftyp", "mp42".getBytes("ISO-8859-1"), u32(0)) ++
      bx("moov", bx("trak", mdia))
    val m = Mp4.parseMp4(2L, file)
    assert(m.parse_ok, m.toString)
    assert(m.duration_ms == 5000L, m.toString) // 450000 / 90000 * 1000
    assert(m.n_samples == 4L)
    assert(m.n_keyframes == 4L) // no stss: every sample sync
    assert(golden.nonEmpty)     // golden tree unchanged by this test
  }

  test("mdhd v1 extreme/negative durations: overflow-safe ms, sign-bit flags") {
    def v1File(durHi: Long, durLo: Long): Array[Byte] = {
      val mdhdV1 = bx("mdhd", Array[Byte](1, 0, 0, 0),
        new Array[Byte](16), u32(1000), u32(durHi), u32(durLo), u16(0), u16(0))
      val bits =
        "01000010" + "00000000" + "00011110" +
          "1" + "1" + "1" + "1" + "010" + "0" +
          "00100" + "010" + "1" + "1" +
          "1" + "1" + "011" + "1" + "010" + "0" + "1"
      val padded = bits + "0" * ((8 - bits.length % 8) % 8)
      val spsRbsp = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
      val spsNal = Array(0x67.toByte) ++ H264.rbspEscape(spsRbsp)
      val avcC = bx("avcC", Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte),
        u16(spsNal.length), spsNal, Array[Byte](0))
      val avc1 = bx("avc1", new Array[Byte](6), u16(1), new Array[Byte](16),
        u16(64), u16(32), new Array[Byte](50), avcC)
      val stbl = bx("stbl",
        bx("stsd", u32(0), u32(1), avc1),
        bx("stts", u32(0), u32(1), u32(4), u32(112500)))
      val mdia = bx("mdia", mdhdV1,
        bx("hdlr", u32(0), u32(0), "vide".getBytes("ISO-8859-1"),
          new Array[Byte](12)),
        bx("minf", stbl))
      bx("ftyp", "mp42".getBytes("ISO-8859-1"), u32(0)) ++
        bx("moov", bx("trak", mdia))
    }
    // 2^62 ticks at timescale 1000: duration * 1000 would overflow Long
    // (r17 ADVICE); split arithmetic is exact here (ms == ticks)
    val huge = Mp4.parseMp4(1L, v1File(1L << 30, 0L))
    assert(huge.parse_ok, huge.toString)
    assert(huge.duration_ms == (1L << 62), huge.toString)
    // sign-bit duration is corrupt: flagged, never a negative ms
    assert(!Mp4.parseMp4(1L, v1File(0x80000000L, 0L)).parse_ok)
  }

  test("stts entry_count escaping its box flags instead of reading siblings") {
    // entry_count 100 but ONE entry in the box: without the bound the
    // parser would census the following stss box's bytes as sample runs
    // and return parse_ok with garbage (r17 ADVICE)
    val bits =
      "01000010" + "00000000" + "00011110" +
        "1" + "1" + "1" + "1" + "010" + "0" +
        "00100" + "010" + "1" + "1" +
        "1" + "1" + "011" + "1" + "010" + "0" + "1"
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val spsRbsp = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val spsNal = Array(0x67.toByte) ++ H264.rbspEscape(spsRbsp)
    val avcC = bx("avcC", Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte),
      u16(spsNal.length), spsNal, Array[Byte](0))
    val avc1 = bx("avc1", new Array[Byte](6), u16(1), new Array[Byte](16),
      u16(64), u16(32), new Array[Byte](50), avcC)
    val stbl = bx("stbl",
      bx("stsd", u32(0), u32(1), avc1),
      bx("stts", u32(0), u32(100), u32(3), u32(240)),
      bx("stss", u32(0), u32(2), u32(1), u32(4)))
    val mdia = bx("mdia",
      bx("mdhd", u32(0), u32(0), u32(0), u32(600), u32(1200), u16(0), u16(0)),
      bx("hdlr", u32(0), u32(0), "vide".getBytes("ISO-8859-1"),
        new Array[Byte](12)),
      bx("minf", stbl))
    val file = bx("ftyp", "mp42".getBytes("ISO-8859-1"), u32(0)) ++
      bx("moov", bx("trak", mdia))
    assert(!Mp4.parseMp4(1L, file).parse_ok)
  }

  test("builder -> parser: every field matches the generator formulas") {
    (0L until 60L).foreach { id =>
      val m = Mp4.parseMp4(id, Mp4.syntheticMp4(id))
      val n = 5 + (id % 7)
      val gop = 1 + (id % 3)
      assert(m.parse_ok, s"id=$id")
      assert(m.brand == "isom")
      assert(m.duration_ms == n * 40, s"id=$id dur=${m.duration_ms}")
      assert(m.n_samples == n, s"id=$id")
      val wantKey = if (id % 5 == 0) n else (n + gop - 1) / gop
      assert(m.n_keyframes == wantKey, s"id=$id key=${m.n_keyframes}")
      assert(m.width == 16 * (1 + id % 5) - 2 * (id % 3), s"id=$id")
      assert(m.height == 16 * (1 + id % 3) - 2 * (id % 2), s"id=$id")
      assert(m.profile_idc == (if (id % 4 == 0) 100 else 66), s"id=$id")
      assert(m.level_idc == 30)
    }
  }

  test("absent stss means every sample is a keyframe (spec default)") {
    // id 0, 5, 10 ... omit stss by construction
    Seq(0L, 5L, 10L, 15L).foreach { id =>
      val m = Mp4.parseMp4(id, Mp4.syntheticMp4(id))
      assert(m.n_keyframes == m.n_samples, s"id=$id")
    }
    // and a non-multiple has a genuine gop split
    val m7 = Mp4.parseMp4(7L, Mp4.syntheticMp4(7L))
    assert(m7.n_keyframes < m7.n_samples)
  }

  test("corrupt / truncated / no-video payloads degrade to flagged rows") {
    assert(!Mp4.parseMp4(1L, null).parse_ok)
    assert(!Mp4.parseMp4(1L, Array.emptyByteArray).parse_ok)
    assert(!Mp4.parseMp4(1L, "not an mp4 at all".getBytes).parse_ok)
    // a valid-looking box whose size escapes the payload
    assert(!Mp4.parseMp4(1L, u32(1000) ++ "moov".getBytes ++
      new Array[Byte](4)).parse_ok)
    // an audio-only file: moov present, no 'vide' handler
    val soun = bx("moov", bx("trak", bx("mdia",
      bx("hdlr", u32(0), u32(0), "soun".getBytes("ISO-8859-1"),
        new Array[Byte](12)))))
    assert(!Mp4.parseMp4(1L, soun).parse_ok)
    // truncation at every prefix of a valid file must flag, never throw
    val good = Mp4.syntheticMp4(3L)
    Seq(1, 7, 8, 20, good.length / 2, good.length - 1).foreach { cut =>
      assert(!Mp4.parseMp4(1L, java.util.Arrays.copyOf(good, cut)).parse_ok,
        s"cut=$cut")
    }
  }

  test("parseMp4 never throws on arbitrary byte soup (seeded fuzz)") {
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      Mp4.parseMp4(seed.toLong, b)
    }
  }

  test("golden sample-table demux: hand-assembled stsz/stsc/stco census") {
    // never the builder: avcC carries the golden SPS (60x30) with a
    // 2-byte length prefix; two samples — [SEI, IDR-I slice] and
    // [IDR-I slice] — split across TWO chunks separated by pad bytes,
    // a 2-entry stsc, per-sample stsz, absolute stco offsets
    val bits =
      "01000010" + "00000000" + "00011110" +
        "1" + "1" + "1" + "1" + "010" + "0" +
        "00100" + "010" + "1" + "1" +
        "1" + "1" + "011" + "1" + "010" + "0" + "1"
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val spsRbsp = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val spsNal = Array(0x67.toByte) ++ H264.rbspEscape(spsRbsp)
    val ppsNal = Array[Byte](0x68, 0xce.toByte) // census counts, never parses
    val seiNal = Array[Byte](0x06, 0x05, 0x00)
    // hand slice header: first_mb ue(0), slice_type ue(7) (I, "all
    // slices"), pps_id ue(0), frame_num u(4) (log2MaxFrameNum=4 in the
    // golden SPS), idr_pic_id ue(0), poc_lsb u(4), stop bit
    val sliceBits = "1" + "0001000" + "1" + "0000" + "1" + "0000" + "1"
    val slicePad = sliceBits + "0" * ((8 - sliceBits.length % 8) % 8)
    val sliceNal = Array(0x65.toByte) ++
      slicePad.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    def lp2(n: Array[Byte]) = u16(n.length) ++ n
    val sample1 = lp2(seiNal) ++ lp2(sliceNal)
    val sample2 = lp2(sliceNal)
    val avcC = bx("avcC",
      Array[Byte](1, 66, 0, 30, 0xfd.toByte, 0xe1.toByte), // lengthSize 2
      u16(spsNal.length), spsNal, Array[Byte](1), u16(ppsNal.length), ppsNal)
    val avc1 = bx("avc1", new Array[Byte](6), u16(1), new Array[Byte](16),
      u16(64), u16(32), new Array[Byte](50), avcC)
    def stblWith(off1: Long, off2: Long) = bx("stbl",
      bx("stsd", u32(0), u32(1), avc1),
      bx("stts", u32(0), u32(1), u32(2), u32(240)),
      bx("stsz", u32(0), u32(0), u32(2),
        u32(sample1.length.toLong), u32(sample2.length.toLong)),
      bx("stsc", u32(0), u32(2), u32(1), u32(1), u32(1), u32(2), u32(1), u32(1)),
      bx("stco", u32(0), u32(2), u32(off1), u32(off2)))
    def fileWith(off1: Long, off2: Long): Array[Byte] = {
      val mdia = bx("mdia",
        bx("mdhd", u32(0), u32(0), u32(0), u32(600), u32(480), u16(0), u16(0)),
        bx("hdlr", u32(0), u32(0), "vide".getBytes("ISO-8859-1"),
          new Array[Byte](12)),
        bx("minf", stblWith(off1, off2)))
      bx("ftyp", "mp42".getBytes("ISO-8859-1"), u32(0)) ++
        bx("moov", bx("trak", mdia)) ++
        bx("mdat",
          Array[Byte](0x11, 0x22) ++ sample1 ++ // 2 pad bytes before chunk 1
            Array[Byte](0x33, 0x44, 0x55) ++ sample2) // 3 before chunk 2
    }
    val probe = fileWith(0L, 0L)
    val payloadStart = probe.length -
      (2 + sample1.length + 3 + sample2.length)
    val file = fileWith(payloadStart + 2L,
      payloadStart + 2L + sample1.length + 3L)
    val st = Mp4.parseMp4Nals(7L, file)
    assert(st.parse_ok, st.toString)
    assert(st.width == 60 && st.height == 30, st.toString)
    assert(st.profile_idc == 66 && st.level_idc == 30)
    assert(st.n_nals == 5L, st.toString) // sps + pps + sei + 2 slices
    assert((st.n_sps, st.n_pps, st.n_sei) == ((1L, 1L, 1L)))
    assert(st.n_idr == 2L && st.n_i == 2L && st.n_p == 0L && st.n_b == 0L)
    // wrong chunk-2 offset (off by the pad) must flag or miscount — it
    // reads pad bytes as a length prefix; assert it does NOT silently
    // reproduce the correct census
    val skewed = Mp4.parseMp4Nals(7L, fileWith(payloadStart + 2L,
      payloadStart + 2L + sample1.length))
    assert(skewed != st.copy(media_id = skewed.media_id), skewed.toString)
  }

  test("sample demux == Annex-B census, field-for-field (builder differential)") {
    (0L until 120L).foreach { id =>
      val viaMp4 = Mp4.parseMp4Nals(id, Mp4.syntheticMp4Samples(id))
      val viaAnnexB = H264.parseStream(id, H264.syntheticAnnexBStream(id))
      assert(viaMp4 == viaAnnexB, s"id=$id mp4=$viaMp4 annexb=$viaAnnexB")
      assert(viaMp4.parse_ok, s"id=$id")
    }
  }

  test("sample demux: truncation at every prefix flags, fuzz never throws") {
    val good = Mp4.syntheticMp4Samples(11L)
    (1 until good.length by 7).foreach { cut =>
      Mp4.parseMp4Nals(1L, java.util.Arrays.copyOf(good, cut)) // no throw
    }
    assert(!Mp4.parseMp4Nals(1L, java.util.Arrays.copyOf(good, good.length / 2)).parse_ok)
    assert(!Mp4.parseMp4Nals(1L, null).parse_ok)
    assert(!Mp4.parseMp4Nals(1L, Array.emptyByteArray).parse_ok)
    (0 until 300).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      Mp4.parseMp4Nals(seed.toLong, b)
    }
  }

  test("mp4NalStats: distributed demux over a payload table matches parseMp4Nals") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Mp4.syntheticMp4Samples(id)))
      .toDF("media_id", "payload")
    val got = Mp4.mp4NalStats(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Mp4.parseMp4Nals(id, Mp4.syntheticMp4Samples(id)))
    assert(got.toSeq == want)
  }

  test("mp4Meta: distributed parse over a payload table matches parseMp4") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Mp4.syntheticMp4(id)))
      .toDF("media_id", "payload")
    val got = Mp4.mp4Meta(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Mp4.parseMp4(id, Mp4.syntheticMp4(id)))
    assert(got.toSeq == want)
  }
}
