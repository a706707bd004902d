package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** JPEG structural census — the marker-segment walk of the ITU-T T.81
  * stream ([[Exif]] reuses this marker grammar to FIND its APP1; this
  * op censuses the whole container; [[Multimodal]] owns the decode
  * path). Segments are `0xFF marker [u16-BE length payload]`;
  * standalone markers (SOI, EOI, RSTn, TEM) carry no length; entropy
  * data after each SOS runs to the next real marker with `0xFF00`
  * byte-stuffing and RSTn restarts skipped. Frame geometry comes from
  * the SOFn header (precision, height, width, component count);
  * `progressive` = SOF2-family. Entropy bytes are counted, never
  * decoded — curation filters (dimensions, components, progressive,
  * EXIF/JFIF presence) run at marker-walk cost.
  *
  * Bad SOI, an escaping segment length, a truncated stream, zero
  * dimensions, a second SOF, or a missing EOI degrade to
  * `parse_ok = false` rows.
  */
object Jpeg {

  final case class JpegMeta(
      media_id: Long, parse_ok: Boolean,
      width: Int, height: Int, precision: Int, n_components: Int,
      progressive: Int, n_segments: Int, n_app: Int,
      has_jfif: Int, has_exif: Int, entropy_bytes: Long)

  private def failed(id: Long) =
    JpegMeta(id, parse_ok = false, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0L)

  def parseJpeg(id: Long, bytes: Array[Byte]): JpegMeta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 4 && (b(0) & 0xff) == 0xff &&
        (b(1) & 0xff) == 0xd8, "bad SOI")
      var p = 2
      var w = 0; var h = 0; var prec = 0; var comps = 0
      var progressive = 0; var sawSof = false
      var nSeg = 1 // SOI
      var nApp = 0; var jfif = 0; var exif = 0
      var entropy = 0L
      var done = false
      while (!done) {
        require(p + 2 <= b.length, "truncated at marker")
        require((b(p) & 0xff) == 0xff, "marker misalignment")
        var m = b(p + 1) & 0xff
        while (m == 0xff) { p += 1; require(p + 2 <= b.length, "fill overrun"); m = b(p + 1) & 0xff }
        require(m != 0x00, "stuffed byte outside entropy data")
        nSeg += 1
        if (m == 0xd9) { p += 2; done = true } // EOI
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          p += 2 // TEM / stray RSTn: standalone
        } else {
          require(p + 4 <= b.length, "truncated segment header")
          val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
          require(len >= 2 && p + 2 + len <= b.length, "segment escapes payload")
          val o = p + 4 // payload start
          val plen = len - 2
          if (m >= 0xe0 && m <= 0xef) { // APPn
            nApp += 1
            if (m == 0xe0 && plen >= 5 &&
              new String(b, o, 4, "US-ASCII") == "JFIF" && b(o + 4) == 0)
              jfif = 1
            if (m == 0xe1 && plen >= 6 &&
              new String(b, o, 4, "US-ASCII") == "Exif" &&
              b(o + 4) == 0 && b(o + 5) == 0)
              exif = 1
          } else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
            m != 0xcc) { // SOFn
            require(!sawSof, "second SOF frame header")
            sawSof = true
            require(plen >= 6, "SOF too short")
            prec = b(o) & 0xff
            h = ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
            w = ((b(o + 3) & 0xff) << 8) | (b(o + 4) & 0xff)
            comps = b(o + 5) & 0xff
            require(w > 0 && h > 0 && comps > 0, "empty frame")
            require(plen >= 6 + 3 * comps, "SOF component table escapes")
            if (m == 0xc2 || m == 0xc6 || m == 0xca || m == 0xce)
              progressive = 1
          }
          p += 2 + len
          if (m == 0xda) { // SOS: skip entropy-coded data
            require(sawSof, "SOS before SOF")
            var scanning = true
            while (scanning) {
              require(p < b.length, "entropy data truncated (no EOI)")
              if ((b(p) & 0xff) == 0xff && p + 1 < b.length) {
                val n = b(p + 1) & 0xff
                if (n == 0x00 || (n >= 0xd0 && n <= 0xd7)) {
                  entropy += 2; p += 2 // stuffing / restart
                } else if (n == 0xff) { entropy += 1; p += 1 } // fill
                else scanning = false // a real marker: outer loop handles
              } else {
                entropy += 1; p += 1
              }
            }
          }
        }
      }
      require(sawSof, "no SOF frame header")
      require(p == b.length, "junk after EOI")
      JpegMeta(id, parse_ok = true, w, h, prec, comps, progressive,
        nSeg, nApp, jfif, exif, entropy)
    } catch {
      case _: Exception => failed(id)
    }

  /** Structural census over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt payloads flagged.
    */
  def jpegMeta(media: DataFrame): Dataset[JpegMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseJpeg(id, bytes) })
  }

  // --- fixture: the REAL JDK ImageIO JPEG writer ----------------------------

  /** Deterministic JPEG for media `id`, encoded by the REAL built-in
    * ImageIO writer: `24 + id%19` × `10 + id%11` pixels, grayscale
    * (1 component) on id%3=0 else RGB (3 components); ids with id%4=0
    * additionally get a REAL APP1 Exif segment spliced after SOI (the
    * [[Exif.syntheticTiff]] IFD tree — where cameras put it). The
    * oracle pins the deterministic frame-level fields; the writer's
    * own segment layout (DQT/DHT split, entropy size) is spec-pinned.
    */
  def syntheticJpegFile(id: Long): Array[Byte] = {
    val w = 24 + (id % 19).toInt
    val h = 10 + (id % 11).toInt
    val typ =
      if (id % 3 == 0) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, typ)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (0xff << 24) | (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos),
      "no JDK JPEG writer available")
    val plain = bos.toByteArray
    if (id % 4 == 0) Exif.spliceApp1(plain, Exif.syntheticTiff(id))
    else plain
  }

  def syntheticJpegTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticJpegFile(id))))
      .toDF("media_id", "payload")
  }
}
