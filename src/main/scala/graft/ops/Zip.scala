package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ZIP central-directory census + member extraction — the archive tier
  * of the document family. Real lakes hold documents as ZIP containers
  * (docx, epub, jar-packaged corpora), and the curation-relevant
  * surface is the central directory: entry census, methods,
  * uncompressed volume, member names — plus the ability to pull ONE
  * member out (the `word/document.xml` / `mimetype` access pattern)
  * without streaming the whole archive. Implemented from the public
  * APPNOTE layout: End-Of-Central-Directory record found by signature
  * scan from the tail (comments allowed), central file headers walked
  * by their fixed offsets, each extracted member located through its
  * LOCAL header (whose name/extra lengths legitimately differ from the
  * central ones), STORED members copied and DEFLATED members inflated
  * through `java.util.zip.Inflater` (nowrap — raw deflate per spec),
  * and every extraction CRC-32-verified against the central directory
  * before it is returned.
  *
  * The fixture twist: payloads are written by `java.util.zip.
  * ZipOutputStream` — the REAL third-party writer — so the walk is a
  * standing differential against the JDK's implementation, not against
  * a sibling builder. Corrupt payloads (bad signatures, truncation,
  * CRC mismatch, bogus offsets) degrade to `parse_ok = false` rows.
  *
  * Scale shape: one narrow `mapPartitions` pass; census cost is linear
  * in ENTRY count (member data is only touched for the two extracted
  * members).
  */
object Zip {

  final case class ZipMeta(
      media_id: Long, parse_ok: Boolean,
      n_entries: Int, n_stored: Int, n_deflated: Int,
      total_uncompressed: Long, first_name: String,
      member0_text: String, member1_text: String)

  private val Failed =
    ZipMeta(0L, parse_ok = false, 0, 0, 0, 0L, "", "", "")

  private def u16(b: Array[Byte], off: Int): Int = {
    if (off < 0 || off + 2 > b.length)
      throw new IllegalArgumentException("zip overrun")
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], off: Int): Long = {
    if (off < 0 || off + 4 > b.length)
      throw new IllegalArgumentException("zip overrun")
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  }
  private def u64(b: Array[Byte], off: Int): Long = {
    if (off < 0 || off + 8 > b.length)
      throw new IllegalArgumentException("zip overrun")
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    require(v >= 0, "zip64 value exceeds signed 64-bit range")
    v
  }

  private final case class Entry(
      name: String, method: Int, crc: Long,
      csize: Long, usize: Long, localOff: Long)

  /** EOCD (PK\5\6) by reverse signature scan over the legal tail
    * window (record + max 64 KiB comment), then the central directory
    * walk (PK\1\2 per entry).
    */
  private def centralDirectory(b: Array[Byte]): Seq[Entry] = {
    val from = math.max(0, b.length - 22 - 65535)
    var eocd = -1
    var i = b.length - 22
    while (i >= from && eocd < 0) {
      if (b(i) == 0x50 && b(i + 1) == 0x4b && b(i + 2) == 0x05 && b(i + 3) == 0x06)
        eocd = i
      i -= 1
    }
    require(eocd >= 0, "no EOCD record")
    var n: Long = u16(b, eocd + 10).toLong
    require(n == u16(b, eocd + 8), "multi-disk archives unsupported")
    var cdSize = u32(b, eocd + 12)
    var cdOff = u32(b, eocd + 16)
    // ZIP64 (APPNOTE §4.5): sentinel counts/offsets in the classic EOCD
    // defer to the zip64 EOCD record, located through the 20-byte
    // locator (PK\6\7) that sits immediately before the classic EOCD.
    // Count-only zip64 (≥65535 entries, the JDK-writer shape) and
    // offset/size zip64 both route through here.
    if (n == 0xffffL || cdSize == 0xffffffffL || cdOff == 0xffffffffL) {
      val loc = eocd - 20
      require(loc >= 0 && u32(b, loc) == 0x07064b50L,
        "zip64 sentinel without EOCD locator")
      require(u32(b, loc + 4) == 0L && u32(b, loc + 16) == 1L,
        "multi-disk zip64 unsupported")
      val z = u64(b, loc + 8)
      require(z <= loc - 56, "zip64 EOCD escapes locator")
      val zi = z.toInt
      require(u32(b, zi) == 0x06064b50L, "bad zip64 EOCD signature")
      require(u32(b, zi + 16) == 0L && u32(b, zi + 20) == 0L,
        "multi-disk zip64 unsupported")
      require(u64(b, zi + 24) == u64(b, zi + 32),
        "multi-disk zip64 unsupported")
      n = u64(b, zi + 32)
      cdSize = u64(b, zi + 40)
      cdOff = u64(b, zi + 48)
      require(cdOff + cdSize <= z, "central directory escapes zip64 EOCD")
    } else
      require(cdOff + cdSize <= eocd, "central directory escapes EOCD")
    // Payloads arrive as Array[Byte] (< 2 GiB), so resolved offsets fit
    // Int; zip64 archives BEYOND that are out of contract by the
    // binary-column data model, not the parser.
    require(cdOff + cdSize <= b.length && n <= Int.MaxValue,
      "archive exceeds in-memory payload bounds")
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var p = cdOff.toInt
    var k = 0L
    while (k < n) {
      require(u32(b, p) == 0x02014b50L, "bad central header signature")
      val gpFlag = u16(b, p + 8)
      val method = u16(b, p + 10)
      val crc = u32(b, p + 16)
      var csize = u32(b, p + 20)
      var usize = u32(b, p + 24)
      val nameLen = u16(b, p + 28)
      val extraLen = u16(b, p + 30)
      val commentLen = u16(b, p + 32)
      var localOff = u32(b, p + 42)
      require(p + 46 + nameLen + extraLen <= b.length, "name escapes payload")
      // Per-entry zip64 (APPNOTE §4.5.3): 0xFFFFFFFF size/offset fields
      // defer to the 0x0001 extra field, whose 64-bit values appear in
      // fixed order but ONLY for the fields that carry the sentinel.
      if (csize == 0xffffffffL || usize == 0xffffffffL ||
          localOff == 0xffffffffL) {
        var q = p + 46 + nameLen
        val qEnd = q + extraLen
        var found = false
        while (q + 4 <= qEnd && !found) {
          val hid = u16(b, q)
          val hsz = u16(b, q + 2)
          require(q + 4 + hsz <= qEnd, "extra field escapes header")
          if (hid == 0x0001) {
            var r = q + 4
            if (usize == 0xffffffffL) { usize = u64(b, r); r += 8 }
            if (csize == 0xffffffffL) { csize = u64(b, r); r += 8 }
            if (localOff == 0xffffffffL) { localOff = u64(b, r); r += 8 }
            require(r <= q + 4 + hsz, "zip64 extra field too short")
            found = true
          } else q += 4 + hsz
        }
        require(found, "zip64 sentinel without 0x0001 extra field")
      }
      // APPNOTE §4.4.4 bit 11 (EFS): names are UTF-8 only when set;
      // the spec default is CP437 (r18 ADVICE — decoding everything as
      // UTF-8 gave mojibake with parse_ok=true on real non-EFS
      // archives). ASCII is identical in both, so fixtures written by
      // ZipOutputStream (which sets EFS) and hand-rolled ASCII names
      // are unaffected.
      val name = new String(b, p + 46, nameLen,
        if ((gpFlag & 0x0800) != 0) java.nio.charset.StandardCharsets.UTF_8
        else java.nio.charset.Charset.forName("IBM437"))
      out += Entry(name, method, crc, csize, usize, localOff)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    require(p == (cdOff + cdSize).toInt, "central directory size mismatch")
    out.toSeq
  }

  /** Extract one member through its LOCAL header, inflating DEFLATED
    * data (raw), and CRC-32-verify against the central record.
    */
  private def extract(b: Array[Byte], e: Entry): Array[Byte] = {
    val p = e.localOff.toInt
    require(u32(b, p) == 0x04034b50L, "bad local header signature")
    val nameLen = u16(b, p + 26)
    val extraLen = u16(b, p + 28)
    val dataOff = p + 30 + nameLen + extraLen
    require(e.csize <= Int.MaxValue && dataOff + e.csize <= b.length,
      "member data escapes payload")
    val raw = java.util.Arrays.copyOfRange(b, dataOff, dataOff + e.csize.toInt)
    val data = e.method match {
      case 0 => // STORED
        require(e.csize == e.usize, "stored sizes disagree")
        raw
      case 8 => // DEFLATED (raw stream per APPNOTE)
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(raw)
          require(e.usize <= Int.MaxValue, "member too large")
          val out = new Array[Byte](e.usize.toInt)
          var got = 0
          while (got < out.length && !inf.finished()) {
            val k = inf.inflate(out, got, out.length - got)
            require(k > 0 || inf.finished(), "truncated deflate stream")
            got += k
          }
          require(got == out.length, "inflated size mismatch")
          out
        } finally inf.end()
      case m => throw new IllegalArgumentException(s"unsupported method $m")
    }
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    require(crc.getValue == e.crc, "CRC mismatch")
    data
  }

  /** Parse one ZIP payload: census + the first two members extracted
    * and CRC-verified.
    */
  def parseZip(id: Long, bytes: Array[Byte]): ZipMeta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val cd = centralDirectory(b)
      require(cd.nonEmpty, "empty archive")
      val m0 = new String(extract(b, cd.head), "UTF-8")
      val m1 =
        if (cd.length >= 2) new String(extract(b, cd(1)), "UTF-8") else ""
      ZipMeta(id, parse_ok = true,
        n_entries = cd.length,
        n_stored = cd.count(_.method == 0),
        n_deflated = cd.count(_.method == 8),
        total_uncompressed = cd.map(_.usize).sum,
        first_name = cd.head.name,
        member0_text = m0, member1_text = m1)
    } catch {
      case _: Exception => Failed.copy(media_id = id)
    }

  /** Archive census + member extraction over a binary payload table —
    * one narrow `mapPartitions` pass, corrupt payloads flagged.
    */
  def zipMeta(media: DataFrame): Dataset[ZipMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseZip(id, bytes) })
  }

  // --- synthetic fixture (the REAL JDK writer) ------------------------------

  /** Member-text formulas shared with the archive_census oracle. */
  def fixtureText(id: Long, k: Int): String =
    s"m$id-e$k:" + "x" * (5 + ((id + k) % 20).toInt)

  /** Entry count that forces the JDK writer into zip64: at ≥ 0xFFFF
    * entries `ZipOutputStream` saturates the classic EOCD counts to the
    * 0xFFFF sentinel and appends the zip64 EOCD record + locator, so
    * 65536 is the smallest count where a non-zip64 walk is actually
    * WRONG (65535 coincides with the sentinel value).
    */
  val Zip64Entries: Int = 65536

  /** A REAL `ZipOutputStream` archive for media `id`: `2 + id%5`
    * entries named `doc-<k>.txt`; entry 0 is STORED (size/CRC
    * pre-declared, as the JDK requires), the rest DEFLATED at the
    * default level. The parser's walk is therefore a differential
    * against the JDK's writer, not a sibling builder.
    */
  def syntheticZip(id: Long): Array[Byte] =
    syntheticZip(id, 2 + (id % 5).toInt)

  def syntheticZip(id: Long, n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    try {
      (0 until n).foreach { k =>
        val data = fixtureText(id, k).getBytes("UTF-8")
        val e = new java.util.zip.ZipEntry(s"doc-$k.txt")
        if (k == 0) {
          z.setMethod(java.util.zip.ZipOutputStream.STORED)
          e.setMethod(java.util.zip.ZipEntry.STORED)
          e.setSize(data.length.toLong)
          e.setCompressedSize(data.length.toLong)
          val crc = new java.util.zip.CRC32()
          crc.update(data)
          e.setCrc(crc.getValue)
        } else {
          z.setMethod(java.util.zip.ZipOutputStream.DEFLATED)
          e.setMethod(java.util.zip.ZipEntry.DEFLATED)
        }
        z.putNextEntry(e)
        z.write(data)
        z.closeEntry()
      }
    } finally z.close()
    bos.toByteArray
  }

  /** Fixture table: one JDK-written archive per id, with the MINIMUM id
    * promoted to a forced-zip64 archive ([[Zip64Entries]] members) so
    * the oracle gate exercises the zip64 EOCD path against the real
    * writer every run. The min is a driver-side scalar off an
    * already-tiny id projection — one cheap pre-pass, same pattern as
    * the corpus-digest fixture markers.
    */
  /** The one [[Zip64Entries]]-member archive is ~65k `ZipOutputStream`
    * entry writes — fixture SCAFFOLDING, not census work — and its
    * bytes are a pure function of the id, so build it once per
    * (JVM, id) instead of once per run: the gate's measured work stays
    * the real 65k-entry walk, not the writer re-encoding the same
    * archive every bench pass (r19: archive_census 0.38 → 1.31 s was
    * exactly this rebuild tax).
    */
  private val zip64Cache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

  def syntheticZipTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(s"`$idCol`").cast("long").as("media_id")).as[Long]
    val zip64Id = ids.agg(min(col("media_id"))).head().getLong(0)
    ids.mapPartitions(it => it.map { id =>
      val bytes =
        if (id == zip64Id)
          zip64Cache.computeIfAbsent(id, syntheticZip(_, Zip64Entries))
        else syntheticZip(id, 2 + (id % 5).toInt)
      (id, bytes)
    }).toDF("media_id", "payload")
  }
}
