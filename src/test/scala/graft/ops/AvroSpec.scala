package graft.ops

import graft.SparkSpec

/** Pins the Avro OCF census on the generator formulas, the REAL
  * Apache Avro writer differential (the library on Spark's classpath
  * writes, this repo's walker parses), and the degrade contracts.
  */
class AvroSpec extends SparkSpec {

  private def expected(id: Long): (Int, Int, Int, Long, Long) = {
    val k = 2 + (id % 4).toInt
    val nb = 1 + (id % 4).toInt
    // avro.schema always; avro.codec only when a codec is set (the
    // reference DataFileWriter behavior); graft.tag on id%5=0
    val nMeta = 1 + (if (id % 3 != 1) 1 else 0) + (if (id % 5 == 0) 1 else 0)
    val nRows = (0 until nb).map(j => 2L + (id + j) % 5).sum
    val rowBytes = 2L * ((k + 1) / 2) + 4L * (k / 2)
    (k, nb, nMeta, nRows, nRows * rowBytes)
  }

  test("builder -> parser: every field matches the generator formulas") {
    (0L until 120L).foreach { id =>
      val m = Avro.parseAvro(id, Avro.syntheticAvro(id))
      val (k, nb, nMeta, nRows, inflated) = expected(id)
      assert(m.parse_ok, s"id=$id: $m")
      val wantCodec = (id % 3) match {
        case 0 => "deflate"; case 1 => "null"; case _ => "snappy"
      }
      assert(m.codec.contains(wantCodec), s"id=$id: $m")
      assert(m.schema_name.contains(s"Rec${id % 4}"), s"id=$id: $m")
      assert(m.n_fields == k, s"id=$id: $m")
      assert(m.n_meta == nMeta, s"id=$id: $m")
      assert(m.n_blocks == nb, s"id=$id: $m")
      assert(m.n_rows == nRows, s"id=$id: $m")
      assert(m.inflated_bytes == inflated,
        s"id=$id: got ${m.inflated_bytes}, want $inflated")
    }
  }

  test("REAL Apache Avro writer differential: library-written files census identically") {
    (0L until 60L).foreach { id =>
      val real = Avro.parseAvro(id, Avro.realAvro(id))
      val synth = Avro.parseAvro(id, Avro.syntheticAvro(id))
      assert(real.parse_ok, s"id=$id: $real")
      assert(real == synth,
        s"id=$id: real-writer census $real != synthetic census $synth")
    }
  }

  test("corrupt / truncated payloads degrade to flagged rows") {
    assert(!Avro.parseAvro(1L, null).parse_ok)
    assert(!Avro.parseAvro(1L, Array.emptyByteArray).parse_ok)
    assert(!Avro.parseAvro(1L, "PAR1not avro".getBytes).parse_ok)
    val g = Avro.syntheticAvro(4L) // null codec (4 % 3 = 1)
    // flip a byte inside the LAST sync marker: block sync mismatch
    val badSync = g.clone()
    badSync(badSync.length - 1) = (badSync(badSync.length - 1) ^ 0x55).toByte
    assert(!Avro.parseAvro(4L, badSync).parse_ok, "sync mismatch must degrade")
    // every prefix truncation must either flag or — at an exact block
    // boundary, which an EOF-terminated container cannot distinguish
    // from a shorter file — parse cleanly with FEWER blocks; it must
    // never throw and never report the full census
    val full = Avro.parseAvro(4L, g)
    (1 until g.length).foreach { cut =>
      val t = Avro.parseAvro(4L, java.util.Arrays.copyOf(g, cut))
      assert(!t.parse_ok || t.n_blocks < full.n_blocks, s"cut=$cut: $t")
    }
    // corrupt deflate stream: flip a payload byte in a deflate file
    val d = Avro.syntheticAvro(6L) // 6 % 3 = 0 -> deflate
    // header ends after metadata+sync; corrupt a byte comfortably inside
    // the first block payload (after its two varint headers)
    val mid = d.length / 2
    val badInf = d.clone(); badInf(mid) = (badInf(mid) ^ 0x7f).toByte
    assert(!Avro.parseAvro(6L, badInf).parse_ok ||
      Avro.parseAvro(6L, badInf).inflated_bytes !=
        Avro.parseAvro(6L, d).inflated_bytes,
      "a corrupt deflate stream must not produce the clean census")
  }

  test("snappy block CRC is really verified: flipped compressed bytes degrade") {
    val g = Avro.syntheticAvro(2L) // 2 % 3 = 2 -> snappy
    assert(Avro.parseAvro(2L, g).codec.contains("snappy"))
    // flip bytes at several offsets in the back half (inside snappy
    // payloads / their CRC trailers): every flip must degrade — either
    // snappy refuses the stream or the CRC-32 of the uncompressed data
    // mismatches; none may ship a clean census
    val clean = Avro.parseAvro(2L, g)
    Seq(g.length / 2, 2 * g.length / 3, g.length - 20).foreach { at =>
      val bad = g.clone(); bad(at) = (bad(at) ^ 0x40).toByte
      val m = Avro.parseAvro(2L, bad)
      assert(!m.parse_ok || m != clean, s"flip at $at shipped a clean census")
    }
  }

  test("unknown or unsupported codec degrades") {
    // corrupt id=6's codec string (deflate → same-length junk)
    val g = Avro.syntheticAvro(6L)
    val s = new String(g, "ISO-8859-1")
    val idx = s.indexOf("deflate", s.indexOf("avro.codec"))
    assert(idx > 0)
    val bad = g.clone()
    "deflatz".getBytes.copyToArray(bad, idx)
    assert(!Avro.parseAvro(6L, bad).parse_ok)
  }

  test("parseAvro never throws on arbitrary byte soup (seeded fuzz)") {
    (0 until 500).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val b = new Array[Byte](4 + rnd.nextInt(300))
      rnd.nextBytes(b)
      b(0) = 'O'; b(1) = 'b'; b(2) = 'j'; b(3) = 1
      Avro.parseAvro(seed.toLong, b)
    }
  }

  test("minimal JSON reader: escapes, nesting, strictness") {
    val v = Avro.parseJson(
      """{"a":[1,2,{"b":"x\ny A"}],"c":true,"d":null,"e":-1.5e2}""")
    val m = v.asInstanceOf[scala.collection.Map[String, Any]]
    assert(m("c") == true && m("d") == null && m("e") == -150.0)
    val l = m("a").asInstanceOf[List[Any]]
    assert(l.take(2) == List(1.0, 2.0))
    assert(l(2).asInstanceOf[scala.collection.Map[String, Any]]("b") == "x\ny A")
    intercept[Exception](Avro.parseJson("""{"a":1} junk"""))
    intercept[Exception](Avro.parseJson("""{"a":"""))
    intercept[Exception](Avro.parseJson("""{'a':1}"""))
  }

  test("avroMeta: distributed parse over a payload table matches parseAvro") {
    import spark.implicits._
    val media = (0L until 20L).map(id => (id, Avro.realAvro(id)))
      .toDF("media_id", "payload")
    val got = Avro.avroMeta(media).collect().sortBy(_.media_id)
    val want = (0L until 20L).map(id => Avro.parseAvro(id, Avro.realAvro(id)))
    assert(got.toSeq == want)
  }
}
