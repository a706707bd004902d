package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "abc"))
    .toDF("doc_id", "text")

  test("asMediaTable: payload is UTF-8 bytes, meta typed and deterministic") {
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName == "binary")
    val r = m.filter(col("media_id") === 1L).collect()(0)
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Long]("n_bytes") == 11L)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    assert(Seq("image/png", "audio/wav").contains(meta.getAs[String]("media_type")))
    assert(meta.getAs[Int]("width") >= 1 && meta.getAs[Int]("width") <= 1920)
  }

  test("sampleFrames: fan-out per stride, capped, deterministic, empty-safe") {
    val big = Seq((1L, "x" * 10000), (2L, "y"), (3L, "")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.asMediaTable(big, "doc_id", "text"), strideBytes = 4096, maxFrames = 8)
      .collect().groupBy(_.media_id)
    assert(frames(1L).length == 3, "10000 bytes / 4096 stride → 3 frames")
    assert(frames(1L).map(_.offset).sorted.toSeq == Seq(0L, 4096L, 8192L))
    assert(frames(2L).length == 1 && frames(3L).length == 1, "tiny/empty → 1 frame")
    val again = Multimodal.sampleFrames(
      Multimodal.asMediaTable(big, "doc_id", "text"), strideBytes = 4096, maxFrames = 8)
      .collect().groupBy(_.media_id)
    assert(frames(1L).map(_.frame_feature.toSeq).toSet ==
      again(1L).map(_.frame_feature.toSeq).toSet)
  }

  test("extractFeatures: deterministic stub features, fixed dim, empty payload safe") {
    val feats = Multimodal.extractFeatures(
      Multimodal.asMediaTable(docs, "doc_id", "text"), featureDim = 4)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).feature.length == 4)
    assert(feats(2L).n_bytes == 0L && feats(2L).byte_mean == 0.0)
    assert(feats(2L).feature.toSeq == Seq(0f, 0f, 0f, 0f))
    // "abc" = bytes 97,98,99 → mean 98; dim-strided: [97, 98, 99, 0]
    assert(feats(3L).byte_mean == 98.0)
    assert(feats(3L).feature.toSeq == Seq(97f, 98f, 99f, 0f))
    // determinism: run twice, same result
    val again = Multimodal.extractFeatures(
      Multimodal.asMediaTable(docs, "doc_id", "text"), featureDim = 4)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(again(1L) == feats(1L).feature.toSeq)
  }

  test("resizePayloads: identity at/below target, exact stride decimation above, empty-safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefgh"), // 8 bytes → target 4: indices 0,2,4,6 = a,c,e,g
      (2L, "ab"),       // below target: identity
      (3L, ""))         // empty: stays empty
      .toDF("doc_id", "text")
    val out = Multimodal.resizePayloads(
      Multimodal.asMediaTable(docs, "doc_id", "text"), targetBytes = 4)
      .collect().map(r => r.media_id -> r).toMap
    assert(new String(out(1L).resized, "UTF-8") == "aceg")
    assert(out(1L).n_bytes == 8L && out(1L).resized_n == 4L)
    assert(out(1L).resized_sum == "aceg".getBytes("UTF-8").map(_ & 0xff).sum.toLong)
    assert(new String(out(2L).resized, "UTF-8") == "ab" && out(2L).resized_n == 2L)
    assert(out(3L).resized_n == 0L && out(3L).resized_sum == 0L)
  }

  test("decodeImages: real ImageIO PNG round trip recovers exact pixels; corrupt degrades") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 12L).toDF("doc_id")
    val got = Multimodal.decodeImages(Multimodal.syntheticPngTable(ids, "doc_id"))
      .collect().map(d => d.media_id -> d).toMap
    ids.as[Long].collect().foreach { id =>
      val w = 4 + (id % 13).toInt
      val h = 4 + (id % 7).toInt
      val px = for { y <- 0 until h; x <- 0 until w }
        yield ((id * 31 + x * 7 + y * 13) % 256).toInt
      val d = got(id)
      assert(d.decoded && d.width == w && d.height == h, s"id=$id dims")
      assert(d.pixel_sum == px.map(_.toLong).sum, s"id=$id sum")
      assert(d.pixel_min == px.min && d.pixel_max == px.max, s"id=$id min/max")
      // PNG actually compressed something, i.e. a real encoder ran
      assert(d.n_bytes > 0 && d.n_bytes != w.toLong * h)
    }
    // corrupt payload: decoded=false zero-stat row, job survives
    val bad = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val b = Multimodal.decodeImages(bad).collect().head
    assert(!b.decoded && b.width == 0 && b.pixel_sum == 0L && b.n_bytes == 3L)
  }

  test("imageAHash: bits match the integer arithmetic; perturbed copy stays within Hamming 3") {
    import spark.implicits._
    val ids = Seq(2L, 7L, 11L).toDF("doc_id")
    val base = Multimodal.syntheticPngTable(ids, "doc_id")
    val got = Multimodal.imageAHash(base).collect().map(h => h.media_id -> h.ahash).toMap
    ids.as[Long].collect().foreach { id =>
      val w = 4 + (id % 13).toInt
      val h = 4 + (id % 7).toInt
      val v = for { y <- 0 until 8; x <- 0 until 8 }
        yield ((id * 31 + (x * w / 8) * 7 + (y * h / 8) * 13) % 256).toInt
      val s = v.map(_.toLong).sum
      val expected = v.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
        if (64L * p > s) acc | (1L << i) else acc
      }
      assert(got(id) == expected, s"id=$id: ${got(id)} != $expected")
    }
    // planted near-copy pairs within Hamming 3; no cross-image noise in
    // this tiny set
    val copies = Multimodal.syntheticPngTable(ids, "doc_id",
      perturb00 = true, idOffset = 1000L)
    val pairs = Multimodal.ahashNearDups(
      Multimodal.imageAHash(base.unionByName(copies)).toDF())
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((2L, 1002L), (7L, 1007L), (11L, 1011L)),
      s"pairs: $pairs")
    assert(pairs.forall(_._3 <= 3))
  }

  test("resizeImages: decode -> nearest-neighbor -> re-encode matches integer resample arithmetic") {
    import spark.implicits._
    val ids = Seq(3L, 10L).toDF("doc_id")
    val media = Multimodal.syntheticPngTable(ids, "doc_id")
    val got = Multimodal.decodeImages(Multimodal.resizeImages(media, 8, 6))
      .collect().map(d => d.media_id -> d).toMap
    ids.as[Long].collect().foreach { id =>
      val w = 4 + (id % 13).toInt
      val h = 4 + (id % 7).toInt
      val px = for { y <- 0 until 6; x <- 0 until 8 }
        yield ((id * 31 + (x * w / 8) * 7 + (y * h / 6) * 13) % 256).toLong
      val d = got(id)
      assert(d.decoded && d.width == 8 && d.height == 6, s"id=$id dims")
      assert(d.pixel_sum == px.sum, s"id=$id resized sum")
    }
  }

  test("imageDHash: gradient bits match arithmetic; brightness shift flips nothing") {
    import spark.implicits._
    val ids = Seq(2L, 7L, 11L).toDF("doc_id")
    val base = Multimodal.syntheticPngTable(ids, "doc_id")
    val got = Multimodal.imageDHash(base).collect().map(h => h.media_id -> h.dhash).toMap
    ids.as[Long].collect().foreach { id =>
      val w = 4 + (id % 13).toInt
      val h = 4 + (id % 7).toInt
      def v(x: Int, y: Int): Int =
        ((id * 31 + (x * w / 9) * 7 + (y * h / 8) * 13) % 256).toInt
      val expected = (for { y <- 0 until 8; x <- 0 until 8 } yield (x, y))
        .foldLeft(0L) { case (acc, (x, y)) =>
          if (v(x, y) < v(x + 1, y)) acc | (1L << (y * 8 + x)) else acc
        }
      assert(got(id) == expected, s"id=$id: ${got(id)} != $expected")
    }
    // brightness invariance: add a constant to EVERY pixel of a real
    // PNG — every gradient sign survives, so the dhash is bit-identical
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val shifted = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 9) {
      val p = (x * 17 + y * 29) % 200
      img.getRaster.setSample(x, y, 0, p)
      shifted.getRaster.setSample(x, y, 0, p + 55)
    }
    def png(i: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", bos)
      bos.toByteArray
    }
    val two = Seq((1L, png(img)), (2L, png(shifted))).toDF("media_id", "payload")
    val hs = Multimodal.imageDHash(two).collect().map(h => h.media_id -> h.dhash).toMap
    assert(hs(1L) == hs(2L), "uniform brightness shift must not flip any gradient bit")
  }

  test("decodeAudio: real WAV round trip recovers exact PCM samples; corrupt degrades") {
    val ids = Seq(0L, 1L, 2L, 7L, 30L).toDF("doc_id") // 30 -> corrupt (mod 10)
    val media = Multimodal.syntheticWavTable(ids, "doc_id", corruptMod = 10L)
    val got = Multimodal.decodeAudio(media).collect()
      .map(d => d.media_id -> d).toMap
    for (id <- Seq(1L, 2L, 7L)) {
      val n = 50 + (id % 101).toInt
      val ch = 1 + (id % 2).toInt
      val rate = (id % 3) match { case 0 => 8000; case 1 => 11025; case _ => 16000 }
      val samples = for { i <- 0 until n; c <- 0 until ch }
        yield (((id * 31 + i * 7919 + c * 131) % 65536L) - 32768L).toInt
      val d = got(id)
      assert(d.decoded && d.channels == ch && d.sample_rate == rate &&
        d.bits == 16 && d.n_frames == n.toLong, s"meta for $id: $d")
      assert(d.n_bytes == 44L + n * ch * 2, s"canonical RIFF size for $id: $d")
      assert(d.duration_us == n.toLong * 1000000L / rate, s"duration for $id: $d")
      assert(d.sample_sum == samples.map(_.toLong).sum &&
        d.sample_sqsum == samples.map(v => v.toLong * v).sum &&
        d.sample_min == samples.min && d.sample_max == samples.max,
        s"moments for $id: $d")
    }
    // corrupt payloads (0 and 30) degrade, never throw
    for (id <- Seq(0L, 30L)) {
      val d = got(id)
      assert(!d.decoded && d.n_bytes == 8L && d.n_frames == 0L &&
        d.sample_sum == 0L, s"corrupt row for $id: $d")
    }
  }

  test("resampleAudio: decode -> nearest-neighbor frames -> re-encode matches integer arithmetic") {
    // id=5: 55 frames @ 16000 Hz stereo -> 8000 Hz keeps floor(55/2)=27 frames
    val media = Multimodal.syntheticWavTable(Seq(5L).toDF("doc_id"), "doc_id")
    val out = Multimodal.decodeAudio(Multimodal.resampleAudio(media, 8000))
      .collect().head
    val srcN = 55
    val dstN = srcN * 8000 / 16000
    assert(out.decoded && out.sample_rate == 8000 && out.channels == 2 &&
      out.n_frames == dstN.toLong, s"resampled meta: $out")
    val expected = for { i <- 0 until dstN; c <- 0 until 2 } yield {
      val si = i * srcN / dstN
      (((5L * 31 + si * 7919 + c * 131) % 65536L) - 32768L).toInt
    }
    assert(out.sample_sum == expected.map(_.toLong).sum &&
      out.sample_min == expected.min && out.sample_max == expected.max,
      s"resampled moments: $out")
    // corrupt payloads drop (audit with decodeAudio first)
    val corrupt = Seq((9L, "NOTAWAVE".getBytes("US-ASCII")))
      .toDF("media_id", "payload")
    assert(Multimodal.resampleAudio(corrupt, 8000).count() == 0L)
  }

  test("sampleVideoFrames: real container scan + per-frame decode; stride skips; corrupt frame degrades") {
    import spark.implicits._
    val ids = Seq(1L, 6L, 11L).toDF("doc_id") // 3, 4, 5 frames
    val media = Multimodal.syntheticFrameStreamTable(ids, "doc_id")
    val all = Multimodal.sampleVideoFrames(media, stride = 1).collect()
      .groupBy(_.media_id)
    assert(all(1L).length == 3 && all(6L).length == 4 && all(11L).length == 5,
      "every container frame found at stride 1")
    for (id <- Seq(1L, 6L, 11L); fr <- all(id)) {
      val w = 4 + (id % 13).toInt
      val h = 4 + (id % 7).toInt
      val seed = id * 1000 + fr.frame_idx
      val expected = (for { y <- 0 until h; x <- 0 until w }
        yield (seed * 31 + x * 7 + y * 13) % 256).sum
      assert(fr.decoded && fr.width == w && fr.height == h &&
        fr.pixel_sum == expected, s"id=$id frame=${fr.frame_idx}: $fr")
    }
    // stride 2: indices 0 and 2 only (sampling never decodes skipped frames)
    val sampled = Multimodal.sampleVideoFrames(media, stride = 2).collect()
      .filter(_.media_id == 6L).map(_.frame_idx).sorted.toSeq
    assert(sampled == Seq(0, 2), sampled.toString)
    // a corrupt middle frame (signature + garbage) degrades to a flagged
    // row; its neighbors still decode
    val good = Multimodal.syntheticFrameStream(1L)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val corrupt = good ++ sig ++ Array[Byte](1, 2, 3) ++
      Multimodal.syntheticPng(9L, 5, 5)
    val rows = Multimodal.sampleVideoFrames(
      Seq((7L, corrupt)).toDF("media_id", "payload"), stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(rows.length == 5 && rows.count(!_.decoded) == 1 &&
      !rows(3).decoded && rows(4).decoded, rows.mkString("; "))
    // empty payload: no signatures, no rows
    assert(Multimodal.sampleVideoFrames(
      Seq((8L, Array.emptyByteArray)).toDF("media_id", "payload")).count() == 0L)
  }

  test("audioEnergyHash: bits match the window-energy arithmetic; volume scaling flips nothing") {
    val ids = Seq(1L, 2L, 6L).toDF("doc_id")
    val media = Multimodal.syntheticWavTable(ids, "doc_id")
    val got = Multimodal.audioEnergyHash(media).collect()
      .map(h => h.media_id -> h.ehash).toMap
    for (id <- Seq(1L, 2L, 6L)) {
      val n = 50 + (id % 101).toInt
      val ch = 1 + (id % 2).toInt
      val e = new Array[Long](65)
      for (i <- 0 until n; c <- 0 until ch) {
        val v = ((id * 31 + i * 7919 + c * 131) % 65536L) - 32768L
        e((i * 65 / n).toInt) += v * v
      }
      val expected = (0 until 64).foldLeft(0L) { (acc, w) =>
        if (e(w) < e(w + 1)) acc | (1L << w) else acc
      }
      assert(got(id) == expected, s"id=$id")
    }
    // the perturbed near-copy flips at most bit 0 (sample 0 lives in
    // window 0, whose energy feeds only the w=0 comparison)
    val copy = Multimodal.syntheticWavTable(Seq(6L).toDF("doc_id"), "doc_id",
      perturb0 = true, idOffset = 100L)
    val ch = Multimodal.audioEnergyHash(copy).collect().head.ehash
    assert(java.lang.Long.bitCount(got(6L) ^ ch) <= 1,
      s"perturbed copy drifted: ${got(6L)} vs $ch")
    // volume invariance: halve every sample of a REAL wav — all window
    // energies scale by 1/4, every gradient sign survives, hash identical
    val pcm = new Array[Byte](130 * 2)
    val half = new Array[Byte](130 * 2)
    for (i <- 0 until 130) {
      val v = (((i * 1997 + 11) % 65536) - 32768).toShort
      val h = (v / 2).toShort
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      half(2 * i) = (h & 0xff).toByte; half(2 * i + 1) = ((h >> 8) & 0xff).toByte
    }
    def wav(data: Array[Byte]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 130L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val two = Seq((1L, wav(pcm)), (2L, wav(half))).toDF("media_id", "payload")
    val hs = Multimodal.audioEnergyHash(two).collect()
      .map(h => h.media_id -> h.ehash).toMap
    assert(hs(1L) == hs(2L),
      "uniform volume scaling must not flip any energy-gradient bit")
  }

  test("audioWindows: per-window exact moments tile the full sample stream") {
    val media = Multimodal.syntheticWavTable(Seq(3L).toDF("doc_id"), "doc_id")
    // id=3: 53 frames, 2 channels -> windows of 20 frames: 20/20/13
    val ws = Multimodal.audioWindows(media, windowFrames = 20)
      .collect().sortBy(_.window_idx)
    assert(ws.map(w => (w.window_idx, w.n_samples)).toSeq ==
      Seq((0, 40L), (1, 40L), (2, 26L)), ws.toSeq.toString)
    def sample(i: Int, c: Int): Long =
      ((3L * 31 + i * 7919 + c * 131) % 65536L) - 32768L
    for (w <- ws) {
      val range = (w.window_idx * 20) until math.min((w.window_idx + 1) * 20, 53)
      val vs = for { i <- range; c <- 0 until 2 } yield sample(i, c)
      assert(w.sample_sum == vs.sum && w.sample_sqsum == vs.map(v => v * v).sum,
        s"window ${w.window_idx}: $w")
    }
    // windows reconstruct the whole-payload moments exactly
    val whole = Multimodal.decodeAudio(media).collect().head
    assert(ws.map(_.sample_sum).sum == whole.sample_sum &&
      ws.map(_.sample_sqsum).sum == whole.sample_sqsum,
      "window tiling must cover every sample exactly once")
  }

  test("syntheticJpeg: uniform-gray JPEG roundtrip is bit-exact at every gray level") {
    // the invariant the MJPEG oracle rests on: quality-1.0 grayscale
    // JPEG of a uniform image decodes to exactly that gray everywhere
    // (DC quantizer 1, zero AC, no chroma) — including partial-block
    // dimensions (5x7 forces edge padding)
    for (g <- 0 to 255) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticJpeg(5, 7, g)))
      val r = img.getRaster
      val vals = for { y <- 0 until 7; x <- 0 until 5 } yield r.getSample(x, y, 0)
      assert(vals.forall(_ == g), s"gray $g decoded as ${vals.distinct}")
    }
  }

  test("sampleMjpegFrames: SOI-marker container scan + real lossy-codec decode") {
    import spark.implicits._
    val ids = Seq(1L, 6L, 11L, 255L).toDF("doc_id")
    val media = Multimodal.syntheticMjpegTable(ids, "doc_id")
    val all = Multimodal.sampleMjpegFrames(media, stride = 1).collect()
      .groupBy(_.media_id)
    for (id <- Seq(1L, 6L, 11L, 255L)) {
      val n = 2 + (id % 4).toInt
      assert(all(id).length == n,
        s"id=$id: SOI scan must find all $n frames, got ${all(id).length} " +
          "(a false SOI inside entropy-coded data would split a frame)")
      for (fr <- all(id)) {
        val w = 4 + (id % 13).toInt
        val h = 4 + (id % 7).toInt
        val g = (id * 31 + fr.frame_idx * 17) % 256
        assert(fr.decoded && fr.width == w && fr.height == h &&
          fr.pixel_sum == w.toLong * h * g, s"id=$id frame=${fr.frame_idx}: $fr")
      }
    }
    // stride sampling skips without decoding, same as the PNG tier
    val sampled = Multimodal.sampleMjpegFrames(media, stride = 2).collect()
      .filter(_.media_id == 6L).map(_.frame_idx).sorted.toSeq
    assert(sampled == Seq(0, 2), sampled.toString)
    // a corrupt trailing frame (bare SOI + garbage — undecodable, unlike
    // mere truncation, which JPEG readers partially decode) degrades to
    // a flagged row; the real frames before it still decode
    val good = Multimodal.syntheticMjpegStream(6L)
    val soiGarbage = Array(0xff, 0xd8, 0xff, 0x00, 0x01, 0x02).map(_.toByte)
    val rows = Multimodal.sampleMjpegFrames(
      Seq((6L, good ++ soiGarbage)).toDF("media_id", "payload"), stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(rows.length == 5 && !rows.last.decoded && rows.init.forall(_.decoded),
      rows.mkString("; "))
  }
}
