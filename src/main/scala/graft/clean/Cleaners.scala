package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conditional-repair / row-filter / dedup operators
  * (SURVEY.md §2.6 R1, §2.7 C1–C6, §2.9 D1).
  *
  * Every operator is a narrow (shuffle-free) `DataFrame => DataFrame`
  * transformation except [[dedupKeepFirst]], which needs one hash shuffle on
  * the dedup key — at 100 TB that is the minimum possible data movement for
  * exact dedup, and AQE coalesces the post-shuffle partitions.
  */
object Cleaners {

  /** Backtick-quoted column ref: table columns keep the reference's dotted
    * names (e.g. `resource.period.start`), which a bare `col()` would
    * misresolve as a struct-field path.
    */
  private def qcol(name: String): Column = col(s"`$name`")

  /** C1 — keep a date-ish string only when null or valid (datetime OR bare
    * date, `data_quality_checker.py:173-180`); invalid values become null.
    * `when` with no `otherwise` yields null, matching the reference.
    */
  def nullifyInvalidDates(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, when(qcol(c).isNull || Validators.isValidDateOrDatetime(qcol(c)), qcol(c)))
    }

  /** C2 — nullify phone strings failing all four accepted shapes
    * (`data_quality_checker.py:182-185`).
    */
  def nullifyInvalidPhone(df: DataFrame, c: String): DataFrame =
    if (!df.columns.contains(c)) df
    else df.withColumn(c, when(qcol(c).isNull || Validators.isValidPhone(qcol(c)), qcol(c)))

  /** C3 — nullify out-of-range numerics (`data_quality_checker.py:219-228`).
    * Generic over any (column, lo, hi) triple; lat/lon are the two
    * reference instances.
    */
  def nullifyOutOfRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    if (!df.columns.contains(c)) df
    else df.withColumn(c, when(qcol(c).between(lo, hi), qcol(c)))

  /** C4 — swap inverted (start, end) pairs where both are non-null and
    * start > end (`data_quality_checker.py:197-211`). Comparison is the
    * column's natural ordering — for the reference's ISO strings that is the
    * same lexicographic compare pandas used. `least`/`greatest` express the
    * swap branch-free and stay inside whole-stage codegen.
    */
  def swapInvertedPair(df: DataFrame, startCol: String, endCol: String): DataFrame = {
    val s = qcol(startCol); val e = qcol(endCol)
    val bothSet = s.isNotNull && e.isNotNull
    // single withColumns: both expressions must see the ORIGINAL columns —
    // sequential withColumn would feed the already-replaced start into the
    // end computation and collapse the pair to (min, min).
    df.withColumns(Map(
      startCol -> when(bothSet, least(s, e)).otherwise(s),
      endCol -> when(bothSet, greatest(s, e)).otherwise(e)))
  }

  /** C5 — backfill a boolean from a sibling integer: if `intCol` is set and
    * `boolCol` is null, set the boolean true (`data_quality_checker.py:250-261`).
    */
  def backfillBooleanFromInt(df: DataFrame, intCol: String, boolCol: String): DataFrame =
    df.withColumn(
      boolCol,
      when(qcol(intCol).isNotNull && qcol(boolCol).isNull, lit(true)).otherwise(qcol(boolCol)))

  /** P1 — drop columns by name list, ignoring absentees
    * (`json_pipeline.py:481-506` fixed per-table drop lists).
    */
  def dropColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** P2 — drop columns whose name matches a predicate (the reference's
    * case-insensitive "contains photo" drop, `json_pipeline.py:164`).
    */
  def dropColumnsWhere(df: DataFrame, p: String => Boolean): DataFrame =
    df.drop(df.columns.toIndexedSeq.filter(p): _*)

  /** P3 — materialize a missing column as typed nulls
    * (`json_pipeline.py:165-184`); no-op when present.
    */
  def ensureColumn(df: DataFrame, c: String, dataType: String): DataFrame =
    if (df.columns.contains(c)) df
    else df.withColumn(c, lit(null).cast(dataType))

  /** C6 — fill nulls with a constant (`data_quality_checker.py:264-270`).
    * `coalesce` instead of `na.fill`: the na functions resolve dotted
    * column names (`resource.id`) as struct paths and fail on the
    * reference's literal dotted columns.
    */
  def fillNull(df: DataFrame, c: String, value: Any): DataFrame =
    if (!df.columns.contains(c)) df
    else df.withColumn(c, coalesce(qcol(c), lit(value)))

  /** R1 — drop rows where any of the key columns is null
    * (`data_quality_checker.py:244,282,294,306,318`). Plain filter, not
    * `na.drop`, for the same dotted-name reason as [[fillNull]].
    */
  def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    keys.filter(df.columns.contains) match {
      case Nil => df
      case ks => df.filter(ks.map(qcol(_).isNotNull).reduce(_ && _))
    }

  /** D1 — deterministic keep-first dedup. The reference's
    * `drop_duplicates(keep='first')` (`data_quality_checker.py:344`) keeps
    * the first row in *file order*; under Spark parallelism "first" is
    * undefined, so the engine makes the tiebreak explicit: keep the row with
    * the smallest `orderBy` tuple within each key group.
    *
    * One shuffle on `keys`; the window + filter pipeline stays in a single
    * stage after the exchange. At scale prefer this over
    * `dropDuplicates(keys)` whenever downstream results are hash-compared.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(qcol): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Deterministic keyed pseudonymization: each listed column's value is
    * replaced by `md5(salt ‖ value)` — the release-pipeline step that
    * strips identifying keys (patient ids, customer keys, user handles)
    * while PRESERVING JOINS: the same (salt, value) maps to the same
    * token in every table, so FK relationships survey-wide survive
    * tokenization, while without the salt the mapping is not enumerable
    * from the released data. Nulls stay null (absence is not an
    * identity). This is pseudonymization, not anonymization — the salt
    * holder can re-link, and k-anonymity/l-diversity of the REMAINING
    * columns still needs auditing ([[graft.ops.Profiling.kAnonymity]]).
    * Values are canonicalized through `cast(string)` before hashing, so
    * numerically-equal keys of different widths (int 42, bigint 42)
    * tokenize identically.
    *
    * Scale shape: a narrow codegen'd projection — shuffle-free; joins
    * on the token behave exactly like joins on the raw key (same
    * distinctness, same skew).
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "at least one column to pseudonymize")
    require(salt.nonEmpty, "empty salt defeats the purpose")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(qcol(c).isNotNull,
          md5(concat(lit(salt), qcol(c).cast("string")))))
    }
  }

  /** Per-entity deterministic date shifting — the HIPAA-era
    * de-identification companion to [[pseudonymize]]: every timestamp
    * belonging to one key moves by the SAME pseudo-random number of
    * days in `[−maxShiftDays, +maxShiftDays]`, so within-entity
    * intervals (length of stay, dose gaps, readmission windows — the
    * whole [[graft.ops.Intervals]] family) are EXACTLY preserved while
    * absolute calendar positions are destroyed. The shift derives from
    * the salted 60-bit Feistel mix ([[graft.ops.Curation.mix60]] —
    * non-linear, so key residue structure does not leak into shifts,
    * and bit-for-bit replayable by any ANSI-SQL engine via
    * [[graft.ops.Curation.bucketSqlCte]]'s arithmetic):
    * {{{ shift_days = mix60(key, salt) % (2·maxShiftDays + 1) − maxShiftDays }}}
    * Shifted columns by type: epoch-µs LongType adds
    * `shift_days·86_400_000_000` (integral — no float epoch math),
    * DateType shifts by days, TimestampType by whole days via interval
    * arithmetic (UTC sessions — the engine's contract — make this DST
    * free). Null timestamps stay null; null keys get NO shift columns
    * nulled — the row keeps its raw timestamps, so callers must drop
    * or quarantine keyless rows BEFORE release (a silent 0-shift would
    * masquerade as de-identified).
    *
    * Scale shape: a narrow codegen'd projection — shuffle-free.
    */
  def dateShiftDeid(df: DataFrame, keyCol: String, tsCols: Seq[String],
      maxShiftDays: Int = 30,
      salt: Long = graft.ops.Curation.DateShiftSalt): DataFrame = {
    require(tsCols.nonEmpty, "at least one timestamp column to shift")
    require(maxShiftDays >= 1, s"maxShiftDays must be positive: $maxShiftDays")
    // fail FAST on a missing column: silently skipping a typo'd name
    // would ship raw, unshifted timestamps out of a de-identification
    // step — a privacy incident, not a usability nit
    val missing = tsCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"dateShiftDeid: columns not in frame: ${missing.mkString(", ")} — " +
        "refusing to emit partially de-identified output")
    val span = 2L * maxShiftDays + 1L
    val shift = pmod(graft.ops.Curation.mix60(qcol(keyCol), salt), lit(span)) -
      lit(maxShiftDays.toLong)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    tsCols.foldLeft(df) { (d, c) =>
      val shifted = types(c) match {
        case org.apache.spark.sql.types.DateType =>
          date_add(qcol(c), shift.cast("int"))
        case org.apache.spark.sql.types.TimestampType =>
          timestamp_micros(unix_micros(qcol(c)) + shift * lit(86400000000L))
        case _ => qcol(c) + shift * lit(86400000000L)
      }
      d.withColumn(c, when(qcol(keyCol).isNotNull, shifted).otherwise(qcol(c)))
    }
  }
}
