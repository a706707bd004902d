package graft.ops

import graft.SparkSpec

/** Pins the ISO 32000 structural walk: fixture→parser field equality
  * across both xref topologies (classic table / FlateDecoded xref
  * stream ± PNG Up predictor), the incremental-update newest-wins
  * merge, the encrypted-producer degrade, and corrupt-input flagging.
  */
class PdfSpec extends SparkSpec {

  test("builder -> parser: every census field matches the formulas") {
    (0L until 120L).foreach { id =>
      val m = Pdf.parsePdf(id, Pdf.syntheticPdf(id))
      assert(m.parse_ok, s"id=$id")
      assert(m.version == Pdf.fixtureVersion(id), s"id=$id")
      assert(m.xref_type ==
        (if (Pdf.fixtureStreamXref(id)) "stream" else "table"), s"id=$id")
      val incr = if (Pdf.fixtureIncremental(id)) 1 else 0
      assert(m.n_xref_sections == 1 + incr, s"id=$id")
      val maxNum = 3 + Pdf.fixturePages(id) +
        (if (Pdf.fixtureEncrypted(id)) 1 else 0) +
        (if (Pdf.fixtureStreamXref(id)) 1 else 0)
      assert(m.size_total == maxNum + 1 + incr, s"id=$id")
      assert(m.n_in_use == maxNum + incr, s"id=$id")
      assert(m.n_pages == Pdf.fixturePages(id), s"id=$id")
      assert(m.encrypted == Pdf.fixtureEncrypted(id), s"id=$id")
      if (Pdf.fixtureEncrypted(id))
        assert(m.producer == null, s"id=$id: encrypted producer must be null")
      else
        assert(m.producer == Pdf.fixtureProducer(id), s"id=$id")
    }
  }

  test("incremental update: the NEWEST Info wins through the /Prev chain") {
    // id 26: even, 26%13==0 -> incremental; not encrypted (26%11!=0)
    val m = Pdf.parsePdf(26L, Pdf.syntheticPdf(26L))
    assert(m.parse_ok && m.n_xref_sections == 2)
    assert(m.producer == "graft-pdf-upd-1",
      "update's Info must override the base document's")
  }

  test("PNG Up predictor round-trips; all five filters decode") {
    // hand-rolled 3 rows x 4 cols through each filter type
    val plain = Array.tabulate(12)(i => ((i * 37 + 5) & 0xff).toByte)
    def rowBytes(r: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(plain, r * 4, r * 4 + 4)
    Seq(0, 1, 2, 3, 4).foreach { ft =>
      val enc = new java.io.ByteArrayOutputStream()
      (0 until 3).foreach { r =>
        enc.write(ft)
        val cur = rowBytes(r)
        val up = if (r > 0) rowBytes(r - 1) else new Array[Byte](4)
        (0 until 4).foreach { i =>
          val left = if (i > 0) cur(i - 1) & 0xff else 0
          val u = up(i) & 0xff
          val ul = if (r > 0 && i > 0) rowBytes(r - 1)(i - 1) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => u
            case 3 => (left + u) / 2
            case 4 =>
              val pp = left + u - ul
              val pa = math.abs(pp - left)
              val pb = math.abs(pp - u)
              val pc = math.abs(pp - ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) u else ul
          }
          enc.write(((cur(i) & 0xff) - pred) & 0xff)
        }
      }
      val got = Pdf.pngUnpredict(enc.toByteArray, 4)
      assert(got.sameElements(plain), s"filter $ft failed")
    }
  }

  test("corrupt / truncated payloads degrade to flagged rows, never throw") {
    assert(!Pdf.parsePdf(1L, null).parse_ok)
    assert(!Pdf.parsePdf(1L, Array.emptyByteArray).parse_ok)
    assert(!Pdf.parsePdf(1L, "%PDF-1.7 but nothing else".getBytes).parse_ok)
    val good = Pdf.syntheticPdf(7L)
    (1 until good.length by 7).foreach { cut =>
      assert(!Pdf.parsePdf(1L, java.util.Arrays.copyOf(good, cut)).parse_ok,
        s"cut=$cut")
    }
    // a startxref pointing into the void
    val s = new String(good, "ISO-8859-1")
    val bad = s.replaceAll("startxref\n\\d+", "startxref\n999999999")
      .getBytes("ISO-8859-1")
    assert(!Pdf.parsePdf(1L, bad).parse_ok)
    // seeded fuzz: arbitrary byte soup must flag, not throw
    (0 until 300).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      Pdf.parsePdf(seed.toLong, b)
      // adversarial: valid header + junk body
      val withHeader = ("%PDF-1.4\n" + new String(b, "ISO-8859-1"))
        .getBytes("ISO-8859-1")
      Pdf.parsePdf(seed.toLong, withHeader)
    }
  }

  test("literal strings: nesting, escapes and octal decode") {
    // exercised through a doctored Info producer
    val base = new String(Pdf.syntheticPdf(2L), "ISO-8859-1")
    // replace the producer with an escape-heavy literal of the SAME
    // byte length (offsets must stay valid): (graft-pdf-2) -> (a\)b\\c\101)
    assert("graft-pdf-2".length == "a\\)b\\\\c\\101".length)
    val doctored = base.replace("(graft-pdf-2)", "(a\\)b\\\\c\\101)")
    val m = Pdf.parsePdf(2L, doctored.getBytes("ISO-8859-1"))
    assert(m.parse_ok)
    assert(m.producer == "a)b\\cA", s"got '${m.producer}'")
  }

  test("pdfMeta: distributed parse over a payload table matches parsePdf") {
    import spark.implicits._
    val media = (0L until 30L).map(id => (id, Pdf.syntheticPdf(id)))
      .toDF("media_id", "payload")
    val got = Pdf.pdfMeta(media).collect().sortBy(_.media_id)
    val want = (0L until 30L).map(id => Pdf.parsePdf(id, Pdf.syntheticPdf(id)))
    assert(got.toSeq == want)
  }
}
