package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SRT / WebVTT subtitle parsing — the text-adjacent tier of the video
  * family. Caption files are a standard training-data modality (ASR
  * supervision, video-text alignment), and everything a curation pass
  * filters them BY is cue-table structure: cue count, time coverage,
  * text volume, reading speed, and timing hygiene (overlapping or
  * non-monotone cues are the classic QC reject). Both formats are
  * plain text: SRT blocks are `index / HH:MM:SS,mmm --> HH:MM:SS,mmm /
  * text…` separated by blank lines; WebVTT leads with a `WEBVTT`
  * header, uses `.` for the millisecond separator, allows optional cue
  * identifiers and `NOTE` comment blocks (skipped by contract).
  *
  * Census (all exact integer arithmetic): cue count, first start /
  * last end, summed cue span, summed text characters (newlines between
  * a cue's lines count as one separator each), the count of cues
  * overlapping their predecessor, and the maximum reading speed in
  * milli-chars-per-second (`chars·1_000_000 / span_ms`, floor). Bad
  * timing syntax, minutes/seconds ≥ 60, end ≤ start, or a missing
  * WEBVTT header degrade to `parse_ok = false` rows.
  *
  * Scale shape: one narrow `mapPartitions` pass, one row in → one row
  * out, cost linear in cue count.
  */
object Subtitles {

  final case class SubStats(
      media_id: Long, parse_ok: Boolean, format: String,
      n_cues: Long, first_start_ms: Long, last_end_ms: Long,
      total_span_ms: Long, total_chars: Long, n_overlap: Long,
      max_cps_milli: Long)

  private val Failed =
    SubStats(0L, parse_ok = false, "", 0L, 0L, 0L, 0L, 0L, 0L, 0L)

  /** `HH:MM:SS<sep>mmm` → milliseconds; strict field ranges. */
  private def parseTs(s: String, sep: Char): Long = {
    val t = s.trim
    require(t.length == 12 && t(2) == ':' && t(5) == ':' && t(8) == sep,
      s"bad timestamp '$s'")
    def num(from: Int, len: Int): Int = {
      var v = 0
      var i = from
      while (i < from + len) {
        val c = t(i)
        require(c >= '0' && c <= '9', s"bad timestamp '$s'")
        v = v * 10 + (c - '0')
        i += 1
      }
      v
    }
    val hh = num(0, 2); val mm = num(3, 2); val ss = num(6, 2); val ms = num(9, 3)
    require(mm < 60 && ss < 60, s"timestamp field out of range '$s'")
    ((hh * 60L + mm) * 60L + ss) * 1000L + ms
  }

  /** Parse one subtitle document (format auto-detected: a WEBVTT header
    * wins, else SRT). Returns the cue census; malformed structure
    * degrades to a flagged row.
    */
  def parseSubs(id: Long, text: String): SubStats =
    try {
      val raw = if (text == null) "" else text
      val lines = raw.split("\n", -1).toIndexedSeq
      val isVtt = lines.nonEmpty && lines.head.startsWith("WEBVTT")
      val sep = if (isVtt) '.' else ','
      var i = if (isVtt) 1 else 0
      var nCues = 0L
      var firstStart = -1L
      var lastEnd = 0L
      var prevEnd = -1L
      var totalSpan = 0L
      var totalChars = 0L
      var nOverlap = 0L
      var maxCps = 0L
      while (i < lines.length) {
        val line = lines(i).trim
        if (line.isEmpty) i += 1
        else if (isVtt && line.startsWith("NOTE")) {
          // comment block: skip to the next blank line
          while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        } else {
          // optional identifier / SRT index line before the timing line
          var timingIdx = i
          if (!line.contains("-->")) {
            timingIdx = i + 1
            require(timingIdx < lines.length && lines(timingIdx).contains("-->"),
              s"no timing line after cue header '$line'")
          }
          val parts = lines(timingIdx).split("-->")
          require(parts.length == 2, s"bad timing line '${lines(timingIdx)}'")
          // WebVTT allows settings after the end timestamp
          val start = parseTs(parts(0), sep)
          val end = parseTs(parts(1).trim.split("\\s+")(0), sep)
          require(end > start, s"cue ends before it starts at line $timingIdx")
          var j = timingIdx + 1
          var chars = 0L
          var nTextLines = 0
          while (j < lines.length && lines(j).trim.nonEmpty) {
            chars += lines(j).length
            nTextLines += 1
            j += 1
          }
          require(nTextLines > 0, s"cue with no text at line $timingIdx")
          chars += nTextLines - 1 // newline separators inside the cue
          if (firstStart < 0) firstStart = start
          if (prevEnd >= 0 && start < prevEnd) nOverlap += 1
          prevEnd = end
          lastEnd = math.max(lastEnd, end)
          val span = end - start
          totalSpan += span
          totalChars += chars
          maxCps = math.max(maxCps, chars * 1_000_000L / span)
          nCues += 1
          i = j
        }
      }
      require(nCues > 0, "no cues")
      SubStats(id, parse_ok = true, if (isVtt) "vtt" else "srt",
        nCues, firstStart, lastEnd, totalSpan, totalChars, nOverlap, maxCps)
    } catch {
      case _: Exception => Failed.copy(media_id = id)
    }

  /** Cue census over a text column — one narrow `mapPartitions` pass,
    * one row per document, malformed documents flagged.
    */
  def subStats(docs: DataFrame, idCol: String, textCol: String): Dataset[SubStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(s"`$idCol`").cast("long"), col(s"`$textCol`").cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => parseSubs(id, text) })
  }

  // --- synthetic fixture ----------------------------------------------------

  /** Fixture cue arithmetic — shared with the subtitle_stats oracle. */
  def fixtureCueCount(id: Long): Int = 2 + (id % 6).toInt
  def fixtureSpacing(id: Long): Long = if (id % 7 == 0) 1000L else 2500L
  def fixtureStart(id: Long, k: Int): Long = 100L + k * fixtureSpacing(id)
  def fixtureDur(id: Long, k: Int): Long = 900L + (id * 13 + k * 7) % 1200
  def fixtureChars(id: Long, k: Int): Int = 10 + ((id + k) % 30).toInt

  private def fmtTs(ms: Long, sep: Char): String = {
    val hh = ms / 3600000L; val mm = ms / 60000L % 60
    val ss = ms / 1000L % 60; val mmm = ms % 1000
    f"$hh%02d:$mm%02d:$ss%02d$sep$mmm%03d"
  }

  /** Deterministic subtitle document: WebVTT for even ids (with a NOTE
    * comment block and per-cue identifiers), SRT for odd (with index
    * lines); `2 + id%6` cues at `id%7==0 ? 1000 : 2500` ms spacing with
    * 900–2099 ms durations (so only the dense-spacing files overlap),
    * cue text split across two lines whose combined census length is
    * `10 + (id+k)%30`.
    */
  def syntheticSubs(id: Long): String = {
    val vtt = id % 2 == 0
    val sep = if (vtt) '.' else ','
    val sb = new StringBuilder()
    if (vtt) sb.append("WEBVTT\n\nNOTE deterministic fixture\nsecond comment line\n\n")
    (0 until fixtureCueCount(id)).foreach { k =>
      val start = fixtureStart(id, k)
      val end = start + fixtureDur(id, k)
      if (vtt) sb.append(s"c$k\n") else sb.append(s"${k + 1}\n")
      sb.append(fmtTs(start, sep)).append(" --> ").append(fmtTs(end, sep))
      if (vtt) sb.append(" align:start") // settings the parser must ignore
      sb.append('\n')
      // two text lines totalling chars-1 glyphs + 1 newline separator
      val total = fixtureChars(id, k)
      val l1 = (total - 1) / 2
      val l2 = total - 1 - l1
      sb.append("x" * l1).append('\n').append("y" * l2).append('\n')
      sb.append('\n')
    }
    sb.toString
  }

  def syntheticSubsTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticSubs(id))))
      .toDF("media_id", "text")
  }
}
