package graft.ops

import graft.SparkSpec

/** Pins the H.264 NAL-layer parser on evidence INDEPENDENT of the
  * synthetic builder (golden bit patterns hand-assembled from the
  * ITU-T spec text), plus the builder↔parser differential the gate
  * rides and the degrade contracts.
  */
class H264Spec extends SparkSpec {

  // --- golden SPS: hand-assembled bits, never the BitWriter ----------
  // profile_idc=66, constraints=0, level_idc=30, sps_id=0 (ue: 1),
  // log2_max_frame_num_minus4=0 (1), poc_type=0 (1),
  // log2_max_poc_lsb_minus4=0 (1), max_num_ref_frames=1 (ue(1): 010),
  // gaps=0, pic_width_in_mbs_minus1=3 (ue(3): 00100),
  // pic_height_in_map_units_minus1=1 (ue(1): 010), frame_mbs_only=1,
  // direct_8x8=1, cropping=1, crops l/r/t/b = 0,2,0,1
  // (ue: 1, 011, 1, 010), vui=0, stop=1 → expect 64×32 cropped to
  // 60×30 (4:2:0 crop units: x2 luma px per crop step).
  test("golden SPS (baseline, cropped): hand-written bits parse to 60x30") {
    val bits =
      "01000010" + "00000000" + "00011110" + // profile 66, constraints, level 30
        "1" +       // sps_id ue(0)
        "1" +       // log2_max_frame_num_minus4 ue(0)
        "1" +       // poc_type ue(0)
        "1" +       // log2_max_poc_lsb_minus4 ue(0)
        "010" +     // max_num_ref_frames ue(1)
        "0" +       // gaps flag
        "00100" +   // width_mbs_minus1 ue(3) -> 4 MBs = 64
        "010" +     // height_map_units_minus1 ue(1) -> 2 MBs = 32
        "1" +       // frame_mbs_only
        "1" +       // direct_8x8
        "1" +       // frame_cropping_flag
        "1" + "011" + "1" + "010" + // crops: 0, 2, 0, 1
        "0" +       // vui
        "1"         // rbsp stop bit
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val bytes = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val sps = H264.parseSps(bytes)
    assert(sps.profileIdc == 66 && sps.levelIdc == 30)
    assert(sps.log2MaxFrameNum == 4 && sps.frameMbsOnly)
    assert(sps.width == 64 - 2 * 2, s"width ${sps.width}")   // 60
    assert(sps.height == 32 - 2 * 1, s"height ${sps.height}") // 30
  }

  // profile_idc=100 exercises the chroma branch INCLUDING a present
  // scaling matrix with one 16-entry list (all deltas 0 ⇒ ue(0)=1 per
  // se(0), 16 times), verifying the spec's scaling_list skip keeps the
  // downstream fields aligned.
  test("golden SPS (high profile + scaling list): branch and skip stay bit-aligned") {
    val bits =
      "01100100" + "00000000" + "00011110" + // profile 100, constraints, level 30
        "1" +        // sps_id ue(0)
        "010" +      // chroma_format_idc ue(1)
        "1" + "1" +  // bit_depth_luma/chroma ue(0)
        "0" +        // transform bypass
        "1" +        // seq_scaling_matrix_present_flag = 1
        "1" + ("1" * 16) + // list 0 present; 16 × se(0) = '1'
        "0" * 7 +    // lists 1..7 absent
        "1" +        // log2_max_frame_num_minus4 ue(0)
        "1" + "1" +  // poc_type 0, log2_max_poc_lsb_minus4 0
        "010" +      // max_num_ref_frames ue(1)
        "0" +        // gaps
        "1" +        // width_mbs_minus1 ue(0) -> 16
        "1" +        // height_map_units_minus1 ue(0) -> 16
        "1" + "1" +  // frame_mbs_only, direct_8x8
        "0" +        // no cropping
        "0" +        // vui
        "1"          // stop
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val bytes = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val sps = H264.parseSps(bytes)
    assert(sps.profileIdc == 100 && sps.chromaFormatIdc == 1)
    assert(sps.width == 16 && sps.height == 16)
  }

  test("emulation-prevention escape/unescape round-trips every 00 00 0x class") {
    val raws = Seq[Array[Byte]](
      Array(0, 0, 0), Array(0, 0, 1), Array(0, 0, 2), Array(0, 0, 3),
      Array(0, 0, 0, 0, 0), Array(1, 0, 0, 3, 0, 0, 1),
      Array.fill(16)(0.toByte),
      (0 until 64).map(i => ((i * 37) % 5 - 1).toByte).toArray)
    raws.foreach { raw =>
      val esc = H264.rbspEscape(raw)
      assert(H264.rbspUnescape(esc).toSeq == raw.toSeq, raw.toSeq.toString)
      // no unescaped start-code or 00 00 03 prefix survives in EBSP
      assert(!esc.toSeq.sliding(3).exists(s =>
        s == Seq[Byte](0, 0, 0) || s == Seq[Byte](0, 0, 1) ||
        s == Seq[Byte](0, 0, 2)), esc.toSeq.toString)
    }
  }

  test("builder streams force escaping (the SEI zero runs) in every payload") {
    (0L until 40L).foreach { id =>
      val bytes = H264.syntheticAnnexBStream(id)
      assert(bytes.toSeq.sliding(3).count(_ == Seq[Byte](0, 0, 3)) >= 2,
        s"id=$id: expected emulation-prevention bytes in the SEI")
    }
  }

  test("builder -> parser: every field matches the generator formulas") {
    (0L until 60L).foreach { id =>
      val st = H264.parseStream(id, H264.syntheticAnnexBStream(id))
      val (g, p, b) = (1 + id % 2, id % 3, id % 2)
      assert(st.parse_ok, s"id=$id")
      assert(st.profile_idc == (if (id % 4 == 0) 100 else 66), s"id=$id")
      assert(st.level_idc == 30)
      assert(st.width == 16 * (1 + id % 5) - 2 * (id % 3), s"id=$id w=${st.width}")
      assert(st.height == 16 * (1 + id % 3) - 2 * (id % 2), s"id=$id h=${st.height}")
      assert(st.n_nals == 3 + g * (1 + p + b), s"id=$id nals=${st.n_nals}")
      assert((st.n_sps, st.n_pps, st.n_sei) == ((1L, 1L, 1L)), s"id=$id")
      assert(st.n_idr == g && st.n_i == g, s"id=$id")
      assert(st.n_p == g * p && st.n_b == g * b, s"id=$id")
    }
  }

  test("corrupt / empty / slice-before-SPS payloads degrade to flagged rows") {
    assert(!H264.parseStream(1L, null).parse_ok)
    assert(!H264.parseStream(1L, Array.emptyByteArray).parse_ok)
    assert(!H264.parseStream(1L, Array[Byte](1, 2, 3, 4)).parse_ok)
    // a lone truncated slice NAL (no SPS): flagged, not thrown
    assert(!H264.parseStream(1L, Array[Byte](0, 0, 1, 0x65.toByte, 0x12)).parse_ok)
    // forbidden_zero_bit set: flagged
    assert(!H264.parseStream(1L,
      Array[Byte](0, 0, 1, 0x80.toByte, 0x12)).parse_ok)
  }

  test("exp-Golomb with 31 leading zeros rejects instead of Int overflow") {
    // an SPS whose seq_parameter_set_id field is 31 zero bits then the
    // marker: (1 << 31) would flip negative and yield a garbage-but-
    // accepted codeNum (r17 ADVICE) — the reader must throw (and the
    // stream path flag) instead
    val rbsp = Array[Byte](66, 0, 30, 0, 0, 0, 0x01, 0x55, 0x55, 0x55, 0x55)
    intercept[IllegalArgumentException](H264.parseSps(rbsp))
    val nal = Array[Byte](0, 0, 1, 0x67) ++ H264.rbspEscape(rbsp)
    assert(!H264.parseStream(1L, nal).parse_ok)
  }

  test("parseStream never throws on arbitrary byte soup (seeded fuzz)") {
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      // some soups contain start codes and parse "ok" with garbage
      // fields — fine; the contract under test is degrade-not-throw
      H264.parseStream(seed.toLong, b)
    }
    // adversarial: start code + every NAL type byte + truncated payloads
    (0 until 32).foreach { t =>
      (0 to 3).foreach { len =>
        val b = Array[Byte](0, 0, 1, t.toByte) ++ Array.fill(len)(0xff.toByte)
        H264.parseStream(t.toLong, b)
      }
    }
  }

  test("nalStats: distributed parse over a payload table matches parseStream") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, H264.syntheticAnnexBStream(id)))
      .toDF("media_id", "payload")
    val got = H264.nalStats(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id =>
      H264.parseStream(id, H264.syntheticAnnexBStream(id)))
    assert(got.toSeq == want)
  }
}
