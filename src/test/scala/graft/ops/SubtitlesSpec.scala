package graft.ops

import graft.SparkSpec

/** Pins the subtitle census on golden hand-written documents (never the
  * builder), the builder↔parser differential across both formats, and
  * the degrade contracts.
  */
class SubtitlesSpec extends SparkSpec {

  private val goldenSrt =
    """1
      |00:00:01,500 --> 00:00:03,000
      |Hello there
      |
      |2
      |00:00:02,500 --> 00:00:04,250
      |Two lines
      |of text
      |
      |""".stripMargin

  private val goldenVtt =
    """WEBVTT
      |
      |NOTE this block
      |must be skipped
      |
      |intro
      |00:00:00.000 --> 00:00:02.000 align:middle position:50%
      |Opening
      |
      |00:01:00.000 --> 00:01:01.000
      |Closing
      |""".stripMargin

  test("golden SRT: cue census field-for-field, overlap detected") {
    val st = Subtitles.parseSubs(1L, goldenSrt)
    assert(st.parse_ok && st.format == "srt", st.toString)
    assert(st.n_cues == 2L)
    assert(st.first_start_ms == 1500L && st.last_end_ms == 4250L)
    assert(st.total_span_ms == 1500L + 1750L)
    // "Hello there" = 11; "Two lines"(9) + "\n" + "of text"(7) = 17
    assert(st.total_chars == 28L, st.toString)
    assert(st.n_overlap == 1L) // cue 2 starts at 2500 < 3000
    // cps: 11 chars / 1.5 s = 7333 milli-cps; 17 / 1.75 = 9714
    assert(st.max_cps_milli == 9714L, st.toString)
  }

  test("golden WebVTT: NOTE skipped, settings ignored, identifiers handled") {
    val st = Subtitles.parseSubs(2L, goldenVtt)
    assert(st.parse_ok && st.format == "vtt", st.toString)
    assert(st.n_cues == 2L)
    assert(st.first_start_ms == 0L && st.last_end_ms == 61000L)
    assert(st.total_span_ms == 3000L)
    assert(st.total_chars == 7L + 7L)
    assert(st.n_overlap == 0L)
    assert(st.max_cps_milli == 7000L) // 7 chars / 1 s
  }

  test("builder -> parser: every field matches the cue arithmetic") {
    (0L until 150L).foreach { id =>
      val st = Subtitles.parseSubs(id, Subtitles.syntheticSubs(id))
      val n = Subtitles.fixtureCueCount(id)
      val sp = Subtitles.fixtureSpacing(id)
      val durs = (0 until n).map(Subtitles.fixtureDur(id, _))
      val chars = (0 until n).map(Subtitles.fixtureChars(id, _))
      assert(st.parse_ok, s"id=$id")
      assert(st.format == (if (id % 2 == 0) "vtt" else "srt"), s"id=$id")
      assert(st.n_cues == n, s"id=$id")
      assert(st.first_start_ms == 100L, s"id=$id")
      assert(st.last_end_ms ==
        (0 until n).map(k => Subtitles.fixtureStart(id, k) + durs(k)).max, s"id=$id")
      assert(st.total_span_ms == durs.map(_.toLong).sum, s"id=$id")
      assert(st.total_chars == chars.map(_.toLong).sum, s"id=$id")
      val wantOverlap = (1 until n).count(k => sp < durs(k - 1))
      assert(st.n_overlap == wantOverlap, s"id=$id")
      assert(st.max_cps_milli ==
        (0 until n).map(k => chars(k) * 1_000_000L / durs(k)).max, s"id=$id")
    }
  }

  test("corrupt / malformed documents degrade to flagged rows") {
    assert(!Subtitles.parseSubs(1L, null).parse_ok)
    assert(!Subtitles.parseSubs(1L, "").parse_ok)
    assert(!Subtitles.parseSubs(1L, "just some prose, no cues").parse_ok)
    // minutes out of range
    assert(!Subtitles.parseSubs(1L,
      "1\n00:99:00,000 --> 00:99:01,000\nx\n").parse_ok)
    // end before start
    assert(!Subtitles.parseSubs(1L,
      "1\n00:00:05,000 --> 00:00:04,000\nx\n").parse_ok)
    // cue with no text
    assert(!Subtitles.parseSubs(1L,
      "1\n00:00:01,000 --> 00:00:02,000\n\n").parse_ok)
    // WEBVTT header with zero cues
    assert(!Subtitles.parseSubs(1L, "WEBVTT\n\n").parse_ok)
    // VTT separator in an SRT timing line (wrong millisecond separator)
    assert(!Subtitles.parseSubs(1L,
      "1\n00:00:01.000 --> 00:00:02.000\nx\n").parse_ok)
  }

  test("parseSubs never throws on arbitrary text soup (seeded fuzz)") {
    val alphabet = "0123456789:,.->\n xWEBVTTNOTE"
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val sb = new StringBuilder()
      (0 until rnd.nextInt(400)).foreach(_ =>
        sb.append(alphabet(rnd.nextInt(alphabet.length))))
      Subtitles.parseSubs(seed.toLong, sb.toString)
    }
  }

  test("subStats: distributed census over a text table matches parseSubs") {
    import spark.implicits._
    val docs = (0L until 20L).map(id => (id, Subtitles.syntheticSubs(id)))
      .toDF("media_id", "text")
    val got = Subtitles.subStats(docs, "media_id", "text").collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Subtitles.parseSubs(id, Subtitles.syntheticSubs(id)))
    assert(got.toSeq == want)
  }
}
