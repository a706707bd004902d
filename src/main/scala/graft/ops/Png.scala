package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PNG structural census — the image member of the container-walk
  * family ([[Exif]] covers TIFF/JPEG-APP1; [[Multimodal]] owns the
  * DECODE path). A PNG (public ISO/W3C spec) is the 8-byte signature
  * followed by chunks: u32-BE length, 4-byte type, payload, u32-BE
  * CRC-32 over type+payload. This walk reads structure only — IDAT
  * payloads are never inflated, so curation filters (dimensions, color
  * type, interlace, palette size) run at metadata cost on any corpus —
  * but every chunk's CRC IS verified (JDK `CRC32`, a real integrity
  * check): a single flipped payload bit anywhere in the file degrades
  * the row rather than shipping a plausible census.
  *
  * Census: IHDR fields (width/height/bit depth/color type/interlace),
  * chunk count, IDAT chunk count and byte total, palette entry count,
  * alpha presence (color types 4/6 or a tRNS chunk), and tEXt pair
  * count. Bad signature, a non-IHDR first chunk, an out-of-bounds
  * length, a CRC mismatch, junk after IEND, or a missing IEND degrade
  * to `parse_ok = false`.
  */
object Png {

  final case class PngMeta(
      media_id: Long, parse_ok: Boolean,
      width: Int, height: Int, bit_depth: Int, color_type: Int,
      interlace: Int, n_chunks: Int, n_idat: Int, idat_bytes: Long,
      palette_entries: Int, has_alpha: Int, n_text: Int)

  private def failed(id: Long) =
    PngMeta(id, parse_ok = false, 0, 0, 0, 0, 0, 0, 0, 0L, 0, 0, 0)

  private val Signature =
    Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  def parsePng(id: Long, bytes: Array[Byte]): PngMeta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 8 + 12 + 13 + 12, "too short")
      Signature.zipWithIndex.foreach { case (v, i) =>
        require((b(i) & 0xff) == v, "bad signature")
      }
      var p = 8
      def u32(q: Int): Long = ((b(q) & 0xffL) << 24) | ((b(q + 1) & 0xffL) << 16) |
        ((b(q + 2) & 0xffL) << 8) | (b(q + 3) & 0xffL)
      var w = 0; var h = 0; var depth = 0; var ct = 0; var inter = 0
      var nChunks = 0; var nIdat = 0; var idatBytes = 0L
      var palette = 0; var trns = false; var nText = 0
      var sawEnd = false
      while (!sawEnd) {
        require(p + 12 <= b.length, "truncated chunk header")
        val len = u32(p)
        require(len >= 0 && p + 12 + len <= b.length, "chunk escapes payload")
        val typ = new String(b, p + 4, 4, "US-ASCII")
        // REAL integrity check: CRC-32 over type+payload must match
        val crc = new java.util.zip.CRC32
        crc.update(b, p + 4, 4 + len.toInt)
        require(crc.getValue == u32(p + 8 + len.toInt), s"CRC mismatch in $typ")
        if (nChunks == 0) {
          require(typ == "IHDR" && len == 13, "first chunk not IHDR")
          val o = p + 8
          w = u32(o).toInt; h = u32(o + 4).toInt
          require(w > 0 && h > 0, "non-positive dimensions")
          depth = b(o + 8) & 0xff; ct = b(o + 9) & 0xff
          require((b(o + 10) & 0xff) == 0 && (b(o + 11) & 0xff) == 0,
            "unknown compression/filter method")
          inter = b(o + 12) & 0xff
          require(inter <= 1, "unknown interlace method")
        } else typ match {
          case "IDAT" => nIdat += 1; idatBytes += len
          case "PLTE" =>
            require(len % 3 == 0, "PLTE not a multiple of 3")
            palette = (len / 3).toInt
          case "tRNS" => trns = true
          case "tEXt" => nText += 1
          case "IEND" =>
            require(len == 0, "IEND with payload")
            sawEnd = true
          case _ => ()
        }
        nChunks += 1
        p += 12 + len.toInt
      }
      require(p == b.length, "junk after IEND")
      require(nIdat > 0, "no IDAT")
      val alpha = if (ct == 4 || ct == 6 || trns) 1 else 0
      PngMeta(id, parse_ok = true, w, h, depth, ct, inter, nChunks,
        nIdat, idatBytes, palette, alpha, nText)
    } catch {
      case _: Exception => failed(id)
    }

  /** Structural census over a binary payload table — one narrow
    * `mapPartitions` pass, one row per media, corrupt payloads flagged.
    */
  def pngMeta(media: DataFrame): Dataset[PngMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parsePng(id, bytes) })
  }

  // --- fixture: the REAL JDK ImageIO PNG writer -----------------------------

  /** Deterministic PNG for media `id`, encoded by the REAL built-in
    * ImageIO writer (the second implementation of the gate's
    * differential; DuckDB replays the deterministic IHDR-level
    * formulas): `16 + id%17` × `9 + id%13` pixels, image type cycling
    * gray (color type 0) / RGB (2) / RGBA (6) by id%3, pixel values a
    * pure function of (id, x, y). IDAT sizing/count is the WRITER's
    * choice (deflate output) — the census still walks and
    * CRC-verifies every chunk, but only the deterministic fields are
    * oracle-pinned; the spec pins the writer-dependent invariants.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 17).toInt
    val h = 9 + (id % 13).toInt
    val typ = (id % 3) match {
      case 0 => java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      case 1 => java.awt.image.BufferedImage.TYPE_INT_RGB
      case _ => java.awt.image.BufferedImage.TYPE_4BYTE_ABGR
    }
    val img = new java.awt.image.BufferedImage(w, h, typ)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val rgb = (0xff << 24) | (v << 16) | (((v * 3) % 256) << 8) |
          ((v * 5) % 256)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "no JDK PNG writer available")
    bos.toByteArray
  }

  def syntheticPngTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(s"`$idCol`").cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticPng(id))))
      .toDF("media_id", "payload")
  }
}
