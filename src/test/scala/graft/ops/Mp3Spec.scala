package graft.ops

import graft.SparkSpec

/** Pins the MP3 header census on golden hand-packed frames (never the
  * builder), the builder↔parser differential (both MPEG versions, VBR
  * envelopes, ID3 wrappers), and the degrade contracts.
  */
class Mp3Spec extends SparkSpec {

  /** Two hand-packed MPEG-1 Layer III frames: 128 kbps / 44100 Hz /
    * mono / no padding — header bytes FF FB 90 C0, the classic
    * real-world MP3 signature; frame length 144000·128/44100 = 417.
    */
  private def golden: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until 2).foreach { f =>
      out.write(0xff); out.write(0xfb); out.write(0x90); out.write(0xc0)
      (4 until 417).foreach(i => out.write((f * 31 + i) & 0xff))
    }
    out.toByteArray
  }

  test("golden hand-packed frames census field-for-field") {
    val st = Mp3.parseMp3(3L, golden)
    assert(st.parse_ok, st.toString)
    assert(st.version == 1 && st.sample_rate == 44100 && st.channels == 1,
      st.toString)
    assert(st.n_frames == 2L && st.n_padded == 0L)
    assert(st.bitrate_kbps_min == 128 && st.bitrate_kbps_max == 128)
    // 2 frames · 1152 samples at 44100 Hz → 2304000 / 44100 = 52 ms
    assert(st.duration_ms == 52L, st.toString)
  }

  test("golden frames behind an ID3v2 tag and before an ID3v1 block") {
    val out = new java.io.ByteArrayOutputStream()
    // ID3v2.3, no flags, syncsafe size 130 (= 0x01 0x02: 1·128 + 2)
    out.write("ID3".getBytes("US-ASCII"))
    out.write(3); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(1); out.write(2)
    (0 until 130).foreach(i => out.write(i & 0x7f))
    out.write(golden)
    out.write("TAG".getBytes("US-ASCII"))
    (0 until 125).foreach(i => out.write(i & 0xff))
    val st = Mp3.parseMp3(4L, out.toByteArray)
    assert(st.parse_ok, st.toString)
    assert(st.n_frames == 2L && st.duration_ms == 52L, st.toString)
  }

  test("builder -> parser: every field matches the generator formulas") {
    (0L until 160L).foreach { id =>
      val st = Mp3.parseMp3(id, Mp3.syntheticMp3(id))
      val n = 3 + (id % 8).toInt
      val v1 = id % 2 == 0
      val rate = (if (v1) Mp3.RatesV1 else Mp3.RatesV2)((id % 3).toInt)
      val brs = (0 until n).map { f =>
        (if (v1) Mp3.BitratesV1 else Mp3.BitratesV2)(1 + ((id + f) % 14).toInt)
      }
      assert(st.parse_ok, s"id=$id")
      assert(st.version == (if (v1) 1 else 2), s"id=$id")
      assert(st.sample_rate == rate, s"id=$id")
      assert(st.channels == (if (id % 4 == 3) 1 else 2), s"id=$id")
      assert(st.n_frames == n, s"id=$id")
      assert(st.n_padded == (if (id % 3 == 0) n / 2 else 0), s"id=$id")
      assert(st.bitrate_kbps_min == brs.min, s"id=$id")
      assert(st.bitrate_kbps_max == brs.max, s"id=$id")
      val spf = if (v1) 1152L else 576L
      assert(st.duration_ms == n * spf * 1000L / rate, s"id=$id")
    }
  }

  test("corrupt / truncated / config-shift streams degrade to flagged rows") {
    assert(!Mp3.parseMp3(1L, null).parse_ok)
    assert(!Mp3.parseMp3(1L, Array.emptyByteArray).parse_ok)
    assert(!Mp3.parseMp3(1L, "definitely not an mp3".getBytes).parse_ok)
    // free-format bitrate index rejects
    val ff = golden.clone(); ff(2) = ((ff(2) & 0x0f)).toByte
    assert(!Mp3.parseMp3(1L, ff).parse_ok)
    // reserved samplerate index rejects
    val rs = golden.clone(); rs(2) = ((rs(2) & 0xf3) | 0x0c).toByte
    assert(!Mp3.parseMp3(1L, rs).parse_ok)
    // Layer I rejects (outside the census contract)
    val l1 = golden.clone(); l1(1) = ((l1(1) & 0xf9) | (3 << 1)).toByte
    assert(!Mp3.parseMp3(1L, l1).parse_ok)
    // version change on frame 2 rejects
    val vc = golden.clone(); vc(417 + 1) = ((vc(417 + 1) & 0xe7) | (2 << 3)).toByte
    assert(!Mp3.parseMp3(1L, vc).parse_ok)
    // mid-frame truncation flags; a frame-boundary cut is a shorter stream
    assert(!Mp3.parseMp3(1L, java.util.Arrays.copyOf(golden, 500)).parse_ok)
    assert(Mp3.parseMp3(1L, java.util.Arrays.copyOf(golden, 417)).parse_ok)
    // an ID3v2 size escaping the payload flags
    val bad = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    assert(!Mp3.parseMp3(1L, bad).parse_ok)
  }

  test("parseMp3 never throws on arbitrary byte soup (seeded fuzz)") {
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(700))
      rnd.nextBytes(b)
      Mp3.parseMp3(seed.toLong, b)
    }
    // adversarial: valid sync + random header bits
    (0 until 200).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](4 + rnd.nextInt(64))
      rnd.nextBytes(b)
      b(0) = 0xff.toByte
      b(1) = (0xe0 | (seed & 0x1f)).toByte
      Mp3.parseMp3(seed.toLong, b)
    }
  }

  test("golden hand-assembled ID3v2.3 tag extracts text frames field-for-field") {
    // hand bytes, never the builder: v2.3 plain sizes, two text frames
    // (ISO-8859-1 "Abc" title, UTF-8 "Xy" artist), one unknown frame
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII")); out.write(3); out.write(0); out.write(0)
    val body = {
      val f = new java.io.ByteArrayOutputStream()
      f.write("TIT2".getBytes); f.write(Array[Byte](0, 0, 0, 4)); f.write(0); f.write(0)
      f.write(0); f.write("Abc".getBytes("ISO-8859-1"))
      f.write("TPE1".getBytes); f.write(Array[Byte](0, 0, 0, 3)); f.write(0); f.write(0)
      f.write(3); f.write("Xy".getBytes("UTF-8"))
      f.write("PRIV".getBytes); f.write(Array[Byte](0, 0, 0, 2)); f.write(0); f.write(0)
      f.write(0x55); f.write(0x66)
      f.toByteArray
    }
    val sz = body.length
    out.write((sz >>> 21) & 0x7f); out.write((sz >>> 14) & 0x7f)
    out.write((sz >>> 7) & 0x7f); out.write(sz & 0x7f)
    out.write(body)
    val m = Mp3.parseId3(9L, out.toByteArray)
    assert(m.parse_ok, m.toString)
    assert(m.id3_version == 3 && m.n_frames == 3)
    assert(m.title == "Abc" && m.artist == "Xy")
    assert(m.album == "" && m.year == "" && m.genre == "")
  }

  test("ID3 builder -> parser: every field matches the generator formulas") {
    (0L until 140L).foreach { id =>
      val m = Mp3.parseId3(id, Mp3.syntheticTaggedMp3(id))
      assert(m.parse_ok, s"id=$id")
      assert(m.id3_version == (if (id % 2 == 1) 4 else 3), s"id=$id")
      assert(m.n_frames == 6, s"id=$id")
      assert(m.title == Mp3.fixtureTitle(id), s"id=$id")
      assert(m.artist == Mp3.fixtureArtist(id), s"id=$id")
      assert(m.album == Mp3.fixtureAlbum(id), s"id=$id")
      assert(m.year == Mp3.fixtureYear(id), s"id=$id")
      assert(m.genre == Mp3.fixtureGenre(id), s"id=$id")
      // and the SAME tagged payload still frame-censuses through
      // parseMp3 for ids whose mp3 body carries no second container
      if (id % 5 != 0) {
        val st = Mp3.parseMp3(id, Mp3.syntheticTaggedMp3(id))
        assert(st.parse_ok && st.n_frames == 3 + id % 8, s"id=$id")
      }
    }
  }

  test("ID3 degrade: tag-less / corrupt / escaping frames flag, fuzz never throws") {
    assert(!Mp3.parseId3(1L, null).parse_ok)
    assert(!Mp3.parseId3(1L, golden).parse_ok) // bare frames: no container
    assert(!Mp3.parseId3(1L, "ID3 but trash".getBytes).parse_ok)
    // a frame whose size escapes the tag
    val good = Mp3.syntheticTaggedMp3(2L)
    val bad = good.clone()
    bad(14) = 0x7f.toByte // first frame's v2.3 size hi byte -> huge
    assert(!Mp3.parseId3(1L, bad).parse_ok)
    (0 until 300).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(b)
      if (b.length >= 3) { b(0) = 'I'; b(1) = 'D'; b(2) = '3' }
      Mp3.parseId3(seed.toLong, b)
    }
  }

  test("id3Meta: distributed extraction over a payload table matches parseId3") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Mp3.syntheticTaggedMp3(id)))
      .toDF("media_id", "payload")
    val got = Mp3.id3Meta(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Mp3.parseId3(id, Mp3.syntheticTaggedMp3(id)))
    assert(got.toSeq == want)
  }

  test("mp3Stats: distributed census over a payload table matches parseMp3") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Mp3.syntheticMp3(id)))
      .toDF("media_id", "payload")
    val got = Mp3.mp3Stats(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Mp3.parseMp3(id, Mp3.syntheticMp3(id)))
    assert(got.toSeq == want)
  }
}
