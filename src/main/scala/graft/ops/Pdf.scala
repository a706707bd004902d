package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PDF object/xref census — the document-lake container tier's most
  * common format. The curation-relevant surface is structural: header
  * version, cross-reference topology (classic table vs compressed
  * xref stream, incremental-update chain depth), object accounting,
  * page count, encryption flag, and the Info producer string —
  * everything a triage pass needs before deciding whether a document
  * is worth a (non-trivial, library-backed) content extraction.
  *
  * Implemented dependency-free from the public ISO 32000-1 layout:
  * `startxref` found from the tail, then either a classic `xref`
  * table (20-byte entries, subsection headers) or an xref STREAM
  * (/Type /XRef: /W field widths, /Index subsections, FlateDecode via
  * `java.util.zip.Inflater` — PDF Flate is RFC 1950 zlib — plus the
  * PNG row predictors /DecodeParms prescribes), then the trailer
  * dictionary, following /Prev through the incremental-update chain
  * (newest section wins per object). Page count is EARNED through
  * object resolution — /Root → catalog → /Pages → /Count — via a
  * minimal recursive-descent parser over PDF values (dicts, arrays,
  * names, numbers, literal/hex strings, indirect references), not a
  * regex heuristic. When /Encrypt is present the census still walks
  * structure (xref and dict KEYS are never encrypted) but reports the
  * producer as null — string VALUES are ciphertext under standard
  * security handlers and echoing bytes would be garbage-as-data.
  *
  * Corrupt/truncated payloads degrade to `parse_ok = false` rows.
  * Objects living inside object streams (/Type /ObjStm, xref type-2
  * entries) are counted in the census but cannot be resolved by this
  * walk; a census that NEEDS one (e.g. the catalog itself) degrades
  * rather than guessing.
  *
  * Scale shape: one narrow `mapPartitions` pass; cost is linear in
  * xref entries plus the handful of objects the census touches
  * (catalog, pages node, info) — content streams are never read.
  */
object Pdf {

  final case class PdfMeta(
      media_id: Long, parse_ok: Boolean,
      version: String, xref_type: String, n_xref_sections: Int,
      size_total: Long, n_in_use: Long, n_pages: Long,
      encrypted: Boolean, producer: String)

  private val Failed =
    PdfMeta(0L, parse_ok = false, "", "", 0, 0L, 0L, 0L,
      encrypted = false, null)

  // --- minimal PDF value model ---------------------------------------------

  private final case class PName(v: String)
  private final case class PRef(num: Long)

  /** Recursive-descent parser over the byte-transparent Latin-1 view
    * (ISO-8859-1 is 1:1 bytes↔chars, so string indexes ARE byte
    * offsets — the property every xref offset depends on).
    */
  private final class Lexer(val s: String) {
    var p: Int = 0

    def skipWs(): Unit = {
      var go = true
      while (go && p < s.length) {
        val c = s.charAt(p)
        if (c == ' ' || c == '\n' || c == '\r' || c == '\t' ||
            c == '\f' || c == 0) p += 1
        else if (c == '%') { // comment to EOL
          while (p < s.length && s.charAt(p) != '\n' && s.charAt(p) != '\r')
            p += 1
        } else go = false
      }
    }

    def expect(lit: String): Unit = {
      require(s.startsWith(lit, p), s"expected '$lit' at $p")
      p += lit.length
    }

    private def isDelim(c: Char): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' ||
        c == 0 || c == '/' || c == '<' || c == '>' || c == '[' ||
        c == ']' || c == '(' || c == ')' || c == '%'

    def name(): PName = {
      expect("/")
      val from = p
      while (p < s.length && !isDelim(s.charAt(p))) p += 1
      PName(s.substring(from, p))
    }

    def number(): Any = {
      val from = p
      if (p < s.length && (s.charAt(p) == '+' || s.charAt(p) == '-')) p += 1
      var dot = false
      while (p < s.length &&
          (s.charAt(p).isDigit || (s.charAt(p) == '.' && !dot))) {
        if (s.charAt(p) == '.') dot = true
        p += 1
      }
      val t = s.substring(from, p)
      require(t.nonEmpty && t != "+" && t != "-", s"bad number at $from")
      if (dot) t.toDouble else t.toLong
    }

    /** Literal string `( ... )` with nesting + the standard escapes. */
    def literalString(): String = {
      expect("(")
      val out = new StringBuilder
      var depth = 1
      while (depth > 0) {
        require(p < s.length, "unterminated literal string")
        val c = s.charAt(p); p += 1
        c match {
          case '\\' =>
            require(p < s.length, "dangling escape")
            val e = s.charAt(p); p += 1
            e match {
              case 'n' => out += '\n'
              case 'r' => out += '\r'
              case 't' => out += '\t'
              case 'b' => out += '\b'
              case 'f' => out += '\f'
              case '(' => out += '('
              case ')' => out += ')'
              case '\\' => out += '\\'
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && p < s.length &&
                    s.charAt(p) >= '0' && s.charAt(p) <= '7') {
                  v = v * 8 + (s.charAt(p) - '0'); p += 1; k += 1
                }
                out += v.toChar
              case '\n' => () // line continuation
              case other => out += other
            }
          case '(' => depth += 1; out += '('
          case ')' => depth -= 1; if (depth > 0) out += ')'
          case other => out += other
        }
      }
      out.toString
    }

    def hexString(): String = {
      expect("<")
      val from = p
      while (p < s.length && s.charAt(p) != '>') p += 1
      require(p < s.length, "unterminated hex string")
      val hex = s.substring(from, p).filterNot(c =>
        c == ' ' || c == '\n' || c == '\r' || c == '\t')
      p += 1
      val padded = if (hex.length % 2 == 1) hex + "0" else hex
      padded.grouped(2)
        .map(h => Integer.parseInt(h, 16).toChar).mkString
    }

    def dict(): Map[String, Any] = {
      expect("<<")
      val out = Map.newBuilder[String, Any]
      skipWs()
      while (!s.startsWith(">>", p)) {
        val k = name()
        skipWs()
        out += (k.v -> value())
        skipWs()
      }
      p += 2
      out.result()
    }

    def array(): Vector[Any] = {
      expect("[")
      val out = Vector.newBuilder[Any]
      skipWs()
      while (p < s.length && s.charAt(p) != ']') {
        out += value()
        skipWs()
      }
      expect("]")
      out.result()
    }

    /** One PDF value; `N G R` indirect references resolved by
      * lookahead after an integer (the standard two-token backtrack).
      */
    def value(): Any = {
      skipWs()
      require(p < s.length, "value past end")
      val c = s.charAt(p)
      if (s.startsWith("<<", p)) dict()
      else if (c == '<') hexString()
      else if (c == '(') literalString()
      else if (c == '[') array()
      else if (c == '/') name()
      else if (s.startsWith("true", p)) { p += 4; true }
      else if (s.startsWith("false", p)) { p += 5; false }
      else if (s.startsWith("null", p)) { p += 4; null }
      else {
        val n = number()
        n match {
          case num: Long =>
            val save = p
            skipWs()
            val genStart = p
            var ok = p < s.length && s.charAt(p).isDigit
            while (p < s.length && s.charAt(p).isDigit) p += 1
            ok = ok && p > genStart
            if (ok) {
              skipWs()
              if (p < s.length && s.charAt(p) == 'R' &&
                  (p + 1 >= s.length || isDelim(s.charAt(p + 1)))) {
                p += 1
                return PRef(num)
              }
            }
            p = save
            num
          case other => other
        }
      }
    }
  }

  // --- xref parsing ----------------------------------------------------------

  /** One xref slot: free, in-use at a byte offset, or resident in an
    * object stream (type-2 — counted, not resolvable by this walk).
    */
  private sealed trait Slot
  private case object FreeSlot extends Slot
  private final case class InUse(off: Long) extends Slot
  private case object InStm extends Slot

  private final case class XrefSection(
      slots: Map[Long, Slot],
      trailer: Map[String, Any],
      isStream: Boolean)

  /** PNG row predictors (RFC 2083 §6) over `columns`-wide rows — what
    * /DecodeParms /Predictor ≥ 10 prescribes for xref stream data (the
    * per-row filter byte chooses the actual filter).
    */
  private[ops] def pngUnpredict(data: Array[Byte], columns: Int): Array[Byte] = {
    require(columns > 0 && data.length % (columns + 1) == 0,
      s"predictor data ${data.length} not a multiple of row width ${columns + 1}")
    val rows = data.length / (columns + 1)
    val out = new Array[Byte](rows * columns)
    var r = 0
    while (r < rows) {
      val ft = data(r * (columns + 1)) & 0xff
      var i = 0
      while (i < columns) {
        val raw = data(r * (columns + 1) + 1 + i) & 0xff
        val left = if (i > 0) out(r * columns + i - 1) & 0xff else 0
        val up = if (r > 0) out((r - 1) * columns + i) & 0xff else 0
        val upLeft =
          if (r > 0 && i > 0) out((r - 1) * columns + i - 1) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val pp = left + up - upLeft
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - upLeft)
            raw + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else upLeft)
          case other =>
            throw new IllegalArgumentException(s"unknown PNG filter $other")
        }
        out(r * columns + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** zlib inflate (PDF FlateDecode is RFC 1950 — wrapped, unlike ZIP's
    * raw streams).
    */
  private def flateDecode(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        require(k > 0 || inf.finished(), "truncated flate stream")
        out.write(buf, 0, k)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** One xref section starting at `off`: classic table or xref stream. */
  private def parseXrefSection(lx: Lexer, off: Long): XrefSection = {
    require(off >= 0 && off < lx.s.length, s"xref offset $off out of range")
    lx.p = off.toInt
    lx.skipWs()
    if (lx.s.startsWith("xref", lx.p)) {
      lx.p += 4
      val slots = Map.newBuilder[Long, Slot]
      lx.skipWs()
      while (!lx.s.startsWith("trailer", lx.p)) {
        val start = lx.number().asInstanceOf[Long]
        lx.skipWs()
        val count = lx.number().asInstanceOf[Long]
        require(count >= 0 && count <= Int.MaxValue, "bad subsection count")
        lx.skipWs()
        var k = 0L
        while (k < count) {
          // 20-byte fixed entries: 10-digit offset, 5-digit gen, flag
          require(lx.p + 18 <= lx.s.length, "xref entry escapes payload")
          val eoff = lx.s.substring(lx.p, lx.p + 10).toLong
          val flag = lx.s.charAt(lx.p + 17)
          require(flag == 'n' || flag == 'f', s"bad xref flag '$flag'")
          slots += ((start + k) ->
            (if (flag == 'n') InUse(eoff) else FreeSlot))
          lx.p += 20
          k += 1
        }
        lx.skipWs()
      }
      lx.expect("trailer")
      lx.skipWs()
      XrefSection(slots.result(), lx.dict(), isStream = false)
    } else {
      // xref STREAM: "N G obj << /Type /XRef ... >> stream ... endstream"
      lx.number(); lx.skipWs(); lx.number(); lx.skipWs()
      lx.expect("obj")
      lx.skipWs()
      val d = lx.dict()
      require(d.get("Type").contains(PName("XRef")), "not an XRef stream")
      val len = d.get("Length") match {
        case Some(n: Long) => n
        case other => throw new IllegalArgumentException(s"bad /Length: $other")
      }
      lx.skipWs()
      lx.expect("stream")
      if (lx.s.startsWith("\r\n", lx.p)) lx.p += 2
      else if (lx.p < lx.s.length && lx.s.charAt(lx.p) == '\n') lx.p += 1
      require(lx.p + len <= lx.s.length, "xref stream escapes payload")
      val raw = new Array[Byte](len.toInt)
      var i = 0
      while (i < len) { raw(i) = lx.s.charAt(lx.p + i).toByte; i += 1 }
      val inflated = d.get("Filter") match {
        case Some(PName("FlateDecode")) => flateDecode(raw)
        case None => raw
        case other =>
          throw new IllegalArgumentException(s"unsupported filter $other")
      }
      val w = d.get("W") match {
        case Some(v: Vector[_]) => v.map {
          case n: Long => n.toInt
          case other =>
            throw new IllegalArgumentException(s"bad /W field: $other")
        }
        case other => throw new IllegalArgumentException(s"bad /W: $other")
      }
      require(w.length == 3 && w.forall(x => x >= 0 && x <= 8), s"bad /W $w")
      val width = w.sum
      require(width > 0, "zero-width xref entries")
      val data = d.get("DecodeParms") match {
        case Some(parms: Map[String, Any] @unchecked) =>
          parms.get("Predictor") match {
            case Some(p: Long) if p >= 10 =>
              val cols = parms.get("Columns") match {
                case Some(c: Long) => c.toInt
                case _ => 1
              }
              require(cols == width, s"predictor columns $cols != width $width")
              pngUnpredict(inflated, cols)
            case Some(1L) | None => inflated
            case other =>
              throw new IllegalArgumentException(s"unsupported predictor $other")
          }
        case _ => inflated
      }
      require(data.length % width == 0, "xref stream data misaligned")
      val size = d.get("Size") match {
        case Some(n: Long) => n
        case other => throw new IllegalArgumentException(s"bad /Size: $other")
      }
      val index: Vector[Long] = d.get("Index") match {
        case Some(v: Vector[_]) => v.map {
          case n: Long => n
          case other =>
            throw new IllegalArgumentException(s"bad /Index field: $other")
        }
        case None => Vector(0L, size)
        case other => throw new IllegalArgumentException(s"bad /Index: $other")
      }
      require(index.length % 2 == 0, "odd /Index")
      def field(row: Int, f: Int): Long = {
        val base = row * width + w.take(f).sum
        var v = 0L
        var i = 0
        while (i < w(f)) { v = (v << 8) | (data(base + i) & 0xffL); i += 1 }
        v
      }
      val slots = Map.newBuilder[Long, Slot]
      var row = 0
      index.grouped(2).foreach {
        case Vector(start, count) =>
          var k = 0L
          while (k < count) {
            require(row * width + width <= data.length, "xref rows escape data")
            val tpe = if (w(0) == 0) 1L else field(row, 0)
            slots += ((start + k) -> (tpe match {
              case 0 => FreeSlot
              case 1 => InUse(field(row, 1))
              case 2 => InStm // lives in an object stream
              case other =>
                throw new IllegalArgumentException(s"unknown xref type $other")
            }))
            row += 1
            k += 1
          }
        case other =>
          throw new IllegalArgumentException(s"odd /Index group $other")
      }
      XrefSection(slots.result(), d, isStream = true)
    }
  }

  /** Resolve the indirect object `num` through the merged xref map and
    * return its value (the body between `obj` and `endobj`/`stream`).
    */
  private def resolveObject(lx: Lexer,
      xref: Map[Long, Long], num: Long): Any = {
    val off = xref.getOrElse(num,
      throw new IllegalArgumentException(s"object $num not in xref"))
    require(off >= 0 && off < lx.s.length, s"object $num offset out of range")
    lx.p = off.toInt
    lx.skipWs()
    val got = lx.number().asInstanceOf[Long]
    require(got == num, s"xref points obj $num at obj $got")
    lx.skipWs(); lx.number(); lx.skipWs()
    lx.expect("obj")
    lx.value()
  }

  private def deref(lx: Lexer, xref: Map[Long, Long], v: Any): Any =
    v match {
      case PRef(n) => resolveObject(lx, xref, n)
      case other => other
    }

  /** Parse one PDF payload into its structural census. */
  def parsePdf(id: Long, bytes: Array[Byte]): PdfMeta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      require(s.startsWith("%PDF-"), "no PDF header")
      val hEnd0 = s.indexOf('\n')
      require(hEnd0 > 5, "unterminated header line")
      val version = s.substring(5, hEnd0).stripSuffix("\r").trim
      require(version.matches("\\d+\\.\\d+"), s"bad version '$version'")
      // startxref from the tail: the offset line before %%EOF
      val sx = s.lastIndexOf("startxref")
      require(sx >= 0, "no startxref")
      require(s.indexOf("%%EOF", sx) >= 0, "no %%EOF after startxref")
      val lx = new Lexer(s)
      lx.p = sx + 9
      lx.skipWs()
      var off = lx.number().asInstanceOf[Long]
      // follow the /Prev incremental-update chain, NEWEST section first
      // (so earlier sections never override a newer object's entry)
      var sections = 0
      var slots = Map.empty[Long, Slot]
      var trailer0: Map[String, Any] = null
      var encrypted = false
      var sizeTotal = 0L
      var streamSeen = false
      var tableSeen = false
      var go = true
      while (go) {
        require(sections < 64, "xref /Prev chain too deep")
        val sec = parseXrefSection(lx, off)
        sections += 1
        if (sec.isStream) streamSeen = true else tableSeen = true
        // newest-wins merge: object numbers already claimed by a newer
        // section (incl. freed ones) never get overridden by an older one
        slots ++= sec.slots.filterNot { case (k, _) => slots.contains(k) }
        if (trailer0 == null) {
          trailer0 = sec.trailer
          sizeTotal = sec.trailer.get("Size") match {
            case Some(n: Long) => n
            case other =>
              throw new IllegalArgumentException(s"bad trailer /Size: $other")
          }
        }
        if (sec.trailer.contains("Encrypt")) encrypted = true
        sec.trailer.get("Prev") match {
          case Some(n: Long) => off = n
          case _ => go = false
        }
      }
      val xref: Map[Long, Long] = slots.collect { case (k, InUse(o)) => k -> o }
      val nInUse: Long = slots.count {
        case (_, InUse(_)) | (_, InStm) => true
        case _ => false
      }.toLong
      val xrefType =
        if (streamSeen && tableSeen) "hybrid"
        else if (streamSeen) "stream" else "table"
      // page count EARNED through resolution: /Root -> /Pages -> /Count
      val root = trailer0.get("Root") match {
        case Some(PRef(n)) => resolveObject(lx, xref, n)
        case other => throw new IllegalArgumentException(s"bad /Root: $other")
      }
      val catalog = root.asInstanceOf[Map[String, Any]]
      require(catalog.get("Type").contains(PName("Catalog")), "Root not a Catalog")
      val pages = deref(lx, xref, catalog.getOrElse("Pages",
        throw new IllegalArgumentException("catalog has no /Pages")))
        .asInstanceOf[Map[String, Any]]
      require(pages.get("Type").contains(PName("Pages")), "/Pages not a Pages")
      val nPages = deref(lx, xref, pages.getOrElse("Count",
        throw new IllegalArgumentException("pages tree has no /Count"))) match {
        case n: Long => n
        case other => throw new IllegalArgumentException(s"bad /Count: $other")
      }
      // producer from /Info — null under /Encrypt (string values are
      // ciphertext under standard security handlers; echoing bytes
      // would be garbage-as-data, so the census degrades the FIELD)
      val producer =
        if (encrypted) null
        else trailer0.get("Info") match {
          case Some(PRef(n)) =>
            resolveObject(lx, xref, n) match {
              case info: Map[String, Any] @unchecked =>
                info.get("Producer") match {
                  case Some(p: String) => p
                  case _ => null
                }
              case _ => null
            }
          case _ => null
        }
      PdfMeta(id, parse_ok = true, version, xrefType, sections,
        sizeTotal, nInUse, nPages, encrypted, producer)
    } catch {
      case _: Exception => Failed.copy(media_id = id)
    }

  /** Structural census over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt payloads flagged.
    */
  def pdfMeta(media: DataFrame): Dataset[PdfMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parsePdf(id, bytes) })
  }

  // --- synthetic fixture -----------------------------------------------------

  /** Fixture parameter formulas shared with the multimodal_pdf oracle. */
  def fixturePages(id: Long): Int = 1 + (id % 7).toInt
  def fixtureEncrypted(id: Long): Boolean = id % 11 == 0
  def fixtureStreamXref(id: Long): Boolean = id % 2 == 1
  def fixtureIncremental(id: Long): Boolean = id % 2 == 0 && id % 13 == 0
  def fixtureVersion(id: Long): String = s"1.${4 + id % 4}"
  def fixtureProducer(id: Long): String =
    if (fixtureIncremental(id)) s"graft-pdf-upd-${id % 5}"
    else s"graft-pdf-${id % 5}"

  /** A deterministic, spec-complete PDF for media `id`:
    *  - catalog (obj 1), pages node (obj 2), `1 + id%7` page objects,
    *    an Info dict with the producer formula, a stub /Encrypt dict
    *    when `id%11 == 0`;
    *  - EVEN ids index with a classic xref table, ODD ids with an
    *    xref STREAM (FlateDecoded by the REAL JDK `Deflater` — the
    *    standing real-writer differential — PNG Up predictor when
    *    `id%3 == 0`);
    *  - even ids divisible by 13 carry one incremental update (a
    *    replacement Info object + second xref section chained via
    *    /Prev) so the newest-wins merge is exercised in the gate.
    */
  def syntheticPdf(id: Long): Array[Byte] = {
    val nPages = fixturePages(id)
    val enc = fixtureEncrypted(id)
    val stream = fixtureStreamXref(id)
    val incr = fixtureIncremental(id)
    val out = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit =
      out.write(t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.Map.empty[Int, Long]
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size().toLong
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    w(s"%PDF-${fixtureVersion(id)}\n")
    out.write(Array[Byte]('%', 0xe2.toByte, 0xe3.toByte, 0xcf.toByte,
      0xd3.toByte, '\n')) // binary-comment line real writers emit
    val firstPage = 3
    val infoNum = firstPage + nPages
    val encNum = if (enc) infoNum + 1 else -1
    val xrefNum = if (stream) infoNum + (if (enc) 2 else 1) else -1
    val maxNum = infoNum + (if (enc) 1 else 0) + (if (stream) 1 else 0)
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2) {
      val kids = (0 until nPages).map(k => s"${firstPage + k} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\n")
    }
    (0 until nPages).foreach { k =>
      obj(firstPage + k)(w(s"<< /Type /Page /Parent 2 0 R >>\n"))
    }
    obj(infoNum)(w(
      s"<< /Producer (graft-pdf-${id % 5}) /Title (doc-$id) >>\n"))
    if (enc) obj(encNum)(w(
      "<< /Filter /Standard /V 1 /R 2 /O <41> /U <42> /P -44 >>\n"))
    val size0 = maxNum + 1
    def trailerBody(info: Int, prev: Long, size: Int): String = {
      val p = if (prev >= 0) s" /Prev $prev" else ""
      val e = if (enc) s" /Encrypt $encNum 0 R" else ""
      s"/Size $size /Root 1 0 R /Info $info 0 R$e$p"
    }
    val xref0Off = out.size().toLong
    if (!stream) {
      // classic table: one 0..maxNum subsection
      w(s"xref\n0 $size0\n")
      w(f"${0}%010d ${65535}%05d f \n")
      (1 to maxNum).foreach(n => w(f"${offsets(n)}%010d ${0}%05d n \n"))
      w(s"trailer\n<< ${trailerBody(infoNum, -1L, size0)} >>\n")
    } else {
      // xref STREAM: W [1 2 1], entries for 0..xrefNum (itself included)
      val width = 4
      val rows = new Array[Byte]((maxNum + 1) * width)
      def row(n: Int, tpe: Int, off: Long): Unit = {
        rows(n * width) = tpe.toByte
        rows(n * width + 1) = ((off >> 8) & 0xff).toByte
        rows(n * width + 2) = (off & 0xff).toByte
        rows(n * width + 3) = 0
      }
      row(0, 0, 0L)
      (1 until xrefNum).foreach(n => row(n, 1, offsets(n)))
      row(xrefNum, 1, xref0Off)
      val predict = id % 3 == 0
      val encoded =
        if (!predict) rows
        else { // PNG Up predictor, the common real-writer choice
          val pe = new Array[Byte]((maxNum + 1) * (width + 1))
          var r = 0
          while (r <= maxNum) {
            pe(r * (width + 1)) = 2 // filter: Up
            var i = 0
            while (i < width) {
              val cur = rows(r * width + i) & 0xff
              val up = if (r > 0) rows((r - 1) * width + i) & 0xff else 0
              pe(r * (width + 1) + 1 + i) = ((cur - up) & 0xff).toByte
              i += 1
            }
            r += 1
          }
          pe
        }
      val defl = {
        val d = new java.util.zip.Deflater()
        try {
          d.setInput(encoded); d.finish()
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
          buf.toByteArray
        } finally d.end()
      }
      offsets(xrefNum) = out.size().toLong
      val parms =
        if (predict) s" /DecodeParms << /Predictor 12 /Columns $width >>"
        else ""
      w(s"$xrefNum 0 obj\n<< /Type /XRef /W [ 1 2 1 ] " +
        s"${trailerBody(infoNum, -1L, size0)} " +
        s"/Filter /FlateDecode$parms /Length ${defl.length} >>\nstream\n")
      out.write(defl)
      w("\nendstream\nendobj\n")
    }
    w(s"startxref\n$xref0Off\n%%EOF\n")
    if (incr) {
      // incremental update: a replacement Info object + a second xref
      // section whose trailer chains to the base via /Prev
      val updNum = maxNum + 1
      obj(updNum)(w(
        s"<< /Producer (graft-pdf-upd-${id % 5}) /Title (doc-$id-u) >>\n"))
      val xref1Off = out.size().toLong
      w(s"xref\n$updNum 1\n")
      w(f"${offsets(updNum)}%010d ${0}%05d n \n")
      w(s"trailer\n<< ${trailerBody(updNum, xref0Off, size0 + 1)} >>\n")
      w(s"startxref\n$xref1Off\n%%EOF\n")
    }
    out.toByteArray
  }

  def syntheticPdfTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticPdf(id))))
      .toDF("media_id", "payload")
  }
}
