package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Parquet FOOTER census — the lake format itself joins the
  * container-metadata family ([[Zip]]/[[Pdf]]/[[Mp4]]/...): a
  * dependency-free walk of the file tail per the public parquet-format
  * spec (`PAR1` magic at both ends, little-endian u32 footer length,
  * FileMetaData serialized with the Thrift COMPACT protocol — varint /
  * zigzag field headers, THRIFT-COMPACT-PROTOCOL.md). The walker reads
  * ONLY the footer bytes: page data is never touched, so cost is
  * footer-size-linear (KBs), not data-linear — the property that makes
  * a lake-wide layout audit (row-group sizing, codec drift, writer
  * provenance, kv-metadata hygiene) a metadata-only scan at 100 TB.
  *
  * Census per file: format version, row count, row-group count, leaf
  * column count, writer string, total compressed/uncompressed chunk
  * bytes, the distinct codec and encoding sets, and the kv-metadata
  * pair count. Deliberately NOT a reimplementation of a reader — no
  * page decoding, no statistics interpretation — the analog of
  * [[Pdf]]'s object census, not of Spark's vectorized scan.
  *
  * Differential gate (`lake_footer_census`): the fixture files are
  * written by Spark's OWN writer (parquet-mr) at several codecs and a
  * forced multi-row-group layout, the engine parses the raw footer
  * bytes with this walker, and the DuckDB oracle replays the same
  * census from the same staged files through its independent C++
  * parquet reader (`parquet_file_metadata`/`parquet_metadata`/
  * `parquet_kv_metadata`/`parquet_schema`) — three independent parquet
  * implementations must agree field-for-field. Truncation, bad magic,
  * an encrypted footer (`PARE`), or corrupt thrift degrade to
  * `parse_ok = false` rows, never a throw and never a
  * wrong-but-plausible row.
  */
object ParquetFooter {

  final case class FooterMeta(
      file: String, parse_ok: Boolean,
      version: Int, num_rows: Long, n_row_groups: Int, n_columns: Int,
      created_by: Option[String],
      total_compressed: Long, total_uncompressed: Long,
      codecs: Option[String], encodings: Option[String], n_kv: Int)

  private def failed(file: String) =
    FooterMeta(file, parse_ok = false, 0, 0L, 0, 0, None, 0L, 0L, None, None, 0)

  // enum names per parquet.thrift (public) — the same strings DuckDB
  // prints, so the differential compares names, not ordinals
  private val CodecNames = Array("UNCOMPRESSED", "SNAPPY", "GZIP", "LZO",
    "BROTLI", "LZ4", "ZSTD", "LZ4_RAW")
  private val EncodingNames = Map(
    0 -> "PLAIN", 2 -> "PLAIN_DICTIONARY", 3 -> "RLE", 4 -> "BIT_PACKED",
    5 -> "DELTA_BINARY_PACKED", 6 -> "DELTA_LENGTH_BYTE_ARRAY",
    7 -> "DELTA_BYTE_ARRAY", 8 -> "RLE_DICTIONARY", 9 -> "BYTE_STREAM_SPLIT")

  /** Thrift compact-protocol cursor over `b[start, end)`. Every read
    * bounds-checks against `end` so corrupt lengths degrade (the caller
    * catches), never over-read.
    */
  private final class Cursor(b: Array[Byte], var p: Int, end: Int) {
    def u8(): Int = {
      require(p < end, "thrift: past end"); val v = b(p) & 0xff; p += 1; v
    }
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        val x = u8()
        v |= (x & 0x7fL) << shift
        shift += 7
        require(shift <= 70, "thrift: varint too long")
        (x & 0x80) != 0
      }) ()
      v
    }
    def zigzag(): Long = { val n = varint(); (n >>> 1) ^ -(n & 1) }
    def string(): String = {
      val len = varint()
      require(len >= 0 && p + len <= end, "thrift: string escapes footer")
      val s = new String(b, p, len.toInt, "UTF-8"); p += len.toInt; s
    }
    def skipBytes(n: Long): Unit = {
      require(n >= 0 && p + n <= end, "thrift: skip escapes footer")
      p += n.toInt
    }
    /** Skip one value of compact type `typ` (list/struct recurse). */
    def skip(typ: Int): Unit = typ match {
      case 1 | 2 => () // bool encoded in the field-header type nibble
      case 3 => skipBytes(1) // i8
      case 4 | 5 | 6 => zigzag(): Unit // i16/i32/i64
      case 7 => skipBytes(8) // double
      case 8 => skipBytes(varint()) // binary/string
      case 9 | 10 => // list/set
        val (n, et) = listHeader()
        var i = 0L
        // bool LIST elements occupy one byte each (unlike field bools)
        while (i < n) { if (et == 1 || et == 2) skipBytes(1) else skip(et); i += 1 }
      case 11 => // map
        val n = varint()
        if (n > 0) {
          val kv = u8(); val kt = (kv >>> 4) & 0xf; val vt = kv & 0xf
          var i = 0L
          while (i < n) { skip(kt); skip(vt); i += 1 }
        }
      case 12 => skipStruct()
      case other => throw new IllegalArgumentException(s"thrift: bad type $other")
    }
    def listHeader(): (Long, Int) = {
      val h = u8()
      val et = h & 0xf
      val short = (h >>> 4) & 0xf
      (if (short == 0xf) varint() else short.toLong, et)
    }
    def skipStruct(): Unit = walkStruct((_, typ) => skip(typ))
    /** Iterate one struct's fields; `f(fieldId, compactType)` must
      * consume the field's value (bools: nothing to consume).
      */
    def walkStruct(f: (Int, Int) => Unit): Unit = {
      var lastId = 0
      var done = false
      while (!done) {
        val h = u8()
        if (h == 0) done = true
        else {
          val typ = h & 0xf
          val delta = (h >>> 4) & 0xf
          val id = if (delta == 0) zigzag().toInt else lastId + delta
          lastId = id
          f(id, typ)
        }
      }
    }
  }

  /** Parse the footer of one parquet file's raw bytes. */
  def parseFooter(file: String, bytes: Array[Byte]): FooterMeta =
    try {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val n = b.length
      require(n >= 12, "too short for a parquet file")
      require(b(0) == 'P' && b(1) == 'A' && b(2) == 'R' && b(3) == '1',
        "bad leading magic")
      // tail magic: PAR1 = plaintext footer; PARE = encrypted (degrade)
      require(b(n - 4) == 'P' && b(n - 3) == 'A' && b(n - 2) == 'R' &&
        b(n - 1) == '1', "bad/encrypted tail magic")
      val flen = ((b(n - 8) & 0xff)) | ((b(n - 7) & 0xff) << 8) |
        ((b(n - 6) & 0xff) << 16) | ((b(n - 5) & 0xff) << 24)
      require(flen > 0 && flen <= n - 12, "footer length escapes file")
      walkFileMetaData(file, b, n - 8 - flen, n - 8)
    } catch {
      case _: Exception => failed(file)
    }

  /** Parse from a ranged TAIL slice — the 100 TB path: the caller read
    * only the last `tail.length` bytes of a `fileLen`-byte object (plus
    * a 4-byte head probe for the leading magic), so a lake-wide footer
    * audit moves KBs per file, not the file. Degrades exactly like
    * [[parseFooter]]; additionally degrades when the footer is larger
    * than the slice (the caller re-reads with the exact size — see
    * [[tailCensus]]).
    */
  def parseFooterTail(file: String, tail: Array[Byte], fileLen: Long,
      headMagicOk: Boolean): FooterMeta =
    try {
      val b = if (tail == null) Array.emptyByteArray else tail
      val m = b.length
      require(headMagicOk, "bad leading magic")
      require(fileLen >= 12 && m >= 12 && m <= fileLen, "too short")
      require(b(m - 4) == 'P' && b(m - 3) == 'A' && b(m - 2) == 'R' &&
        b(m - 1) == '1', "bad/encrypted tail magic")
      val flen = ((b(m - 8) & 0xff)) | ((b(m - 7) & 0xff) << 8) |
        ((b(m - 6) & 0xff) << 16) | ((b(m - 5) & 0xff) << 24)
      require(flen > 0 && flen <= fileLen - 12, "footer length escapes file")
      require(flen <= m - 8, "footer larger than the ranged slice")
      walkFileMetaData(file, b, m - 8 - flen, m - 8)
    } catch {
      case _: Exception => failed(file)
    }

  /** How many tail bytes a full footer parse needs (so a too-small
    * first ranged read can be retried with the exact size).
    */
  def footerSpan(tail: Array[Byte]): Option[Long] = {
    val m = if (tail == null) 0 else tail.length
    if (m < 8) None
    else {
      val b = tail
      val flen = ((b(m - 8) & 0xffL)) | ((b(m - 7) & 0xffL) << 8) |
        ((b(m - 6) & 0xffL) << 16) | ((b(m - 5) & 0xffL) << 24)
      Some(flen + 8L)
    }
  }

  private def walkFileMetaData(file: String, b: Array[Byte],
      start: Int, end: Int): FooterMeta = {
      val c = new Cursor(b, start, end)

      var version = 0
      var numRows = 0L
      var nRowGroups = 0
      var nLeaves = 0
      var createdBy: Option[String] = None
      var totalComp = 0L
      var totalUncomp = 0L
      var nKv = 0
      val codecs = scala.collection.mutable.SortedSet.empty[String]
      val encodings = scala.collection.mutable.SortedSet.empty[String]

      def parseColumnMeta(): Unit = c.walkStruct {
        case (2, 9) => // encodings: list<Encoding i32>
          val (k, et) = c.listHeader()
          var i = 0L
          while (i < k) {
            val e = c.zigzag().toInt
            encodings += EncodingNames.getOrElse(e, s"ENCODING_$e")
            require(et == 5, "encodings: not i32"); i += 1
          }
        case (4, 5) => // codec enum
          val cd = c.zigzag().toInt
          codecs += (if (cd >= 0 && cd < CodecNames.length) CodecNames(cd)
            else s"CODEC_$cd")
        case (6, 6) => totalUncomp += c.zigzag()
        case (7, 6) => totalComp += c.zigzag()
        case (_, t) => c.skip(t)
      }
      def parseColumnChunk(): Unit = c.walkStruct {
        case (3, 12) => parseColumnMeta()
        case (_, t) => c.skip(t)
      }
      def parseRowGroup(): Unit = c.walkStruct {
        case (1, 9) => // columns: list<ColumnChunk>
          val (k, _) = c.listHeader()
          var i = 0L; while (i < k) { parseColumnChunk(); i += 1 }
        case (_, t) => c.skip(t)
      }
      def parseSchemaElement(isRoot: Boolean): Unit = {
        var children = 0
        c.walkStruct {
          case (5, 5) => children = c.zigzag().toInt
          case (_, t) => c.skip(t)
        }
        if (!isRoot && children == 0) nLeaves += 1
      }

      c.walkStruct {
        case (1, 5) => version = c.zigzag().toInt
        case (2, 9) => // schema: flattened depth-first element list
          val (k, _) = c.listHeader()
          var i = 0L; while (i < k) { parseSchemaElement(i == 0L); i += 1 }
        case (3, 6) => numRows = c.zigzag()
        case (4, 9) => // row_groups
          val (k, _) = c.listHeader()
          nRowGroups = k.toInt
          var i = 0L; while (i < k) { parseRowGroup(); i += 1 }
        case (5, 9) => // key_value_metadata
          val (k, _) = c.listHeader()
          nKv = k.toInt
          var i = 0L; while (i < k) { c.skipStruct(); i += 1 }
        case (6, 8) => createdBy = Some(c.string())
        case (_, t) => c.skip(t)
      }
      FooterMeta(file, parse_ok = true, version, numRows, nRowGroups,
        nLeaves, createdBy, totalComp, totalUncomp,
        if (codecs.isEmpty) None else Some(codecs.mkString(",")),
        if (encodings.isEmpty) None else Some(encodings.mkString(",")),
        nKv)
  }

  /** Footer census over a (file, payload) table — one narrow
    * `mapPartitions` pass, one row per file, corrupt footers flagged.
    * For full-payload inputs (e.g. `binaryFile` content); at lake
    * scale prefer [[tailCensus]], which never moves page data.
    */
  def footerCensus(files: DataFrame): Dataset[FooterMeta] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("file").cast("string"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (f, b) => parseFooter(f, b) })
  }

  /** The LAKE-SCALE census path: list the directory (the `binaryFile`
    * source with the content column PRUNED — a metadata-only scan),
    * then per file issue a positioned read of the last `tailBytes`
    * bytes plus a 4-byte head-magic probe, and walk the footer from
    * the slice. Data pages never cross the wire: a 100 TB lake audit
    * moves ~64 KB per object instead of the object. Footers larger
    * than the first slice get ONE exact-size re-read (footerSpan from
    * the already-read length field), so the pass stays two preads
    * worst-case. Results are identical to [[footerCensus]] over full
    * payloads — the `lake_footer_tail` gate pins that equivalence
    * against the same DuckDB oracle.
    */
  def tailCensus(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: String = "*.parquet", tailBytes: Int = 65536): Dataset[FooterMeta] = {
    import spark.implicits._
    require(tailBytes >= 12, s"tailBytes too small: $tailBytes")
    val listing = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path").cast("string"), col("length").cast("long"))
      .as[(String, Long)]
    listing.mapPartitions { it =>
      // one Configuration per partition; FileSystem instances are
      // cached per scheme by Hadoop itself
      val conf = new org.apache.hadoop.conf.Configuration()
      it.map { case (uri, len) =>
        val file = {
          val slash = uri.lastIndexOf('/')
          val base = if (slash >= 0) uri.substring(slash + 1) else uri
          if (base.endsWith(".parquet")) base.dropRight(".parquet".length)
          else base
        }
        try {
          val path = new org.apache.hadoop.fs.Path(new java.net.URI(uri))
          val fs = path.getFileSystem(conf)
          def pread(pos: Long, n: Int): Array[Byte] = {
            val out = new Array[Byte](n)
            val in = fs.open(path)
            try { in.readFully(pos, out, 0, n) } finally in.close()
            out
          }
          val headOk = len >= 12 && {
            val h = pread(0L, 4)
            h(0) == 'P' && h(1) == 'A' && h(2) == 'R' && h(3) == '1'
          }
          val firstN = math.min(tailBytes.toLong, len).toInt
          var tail = if (len >= 12) pread(len - firstN, firstN)
            else Array.emptyByteArray
          // footer bigger than the slice: one exact-size re-read
          footerSpan(tail).foreach { span =>
            if (span > tail.length && span <= len - 4)
              tail = pread(len - span, span.toInt)
          }
          parseFooterTail(file, tail, len, headOk)
        } catch {
          case _: Exception => failed(file)
        }
      }
    }
  }
}
