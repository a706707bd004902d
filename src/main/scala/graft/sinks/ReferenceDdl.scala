package graft.sinks

/** The reference's typed warehouse DDL (`json_pipeline.py:743-850`),
  * encoded as per-table `createTableColumnTypes` inputs so every JDBC
  * load gets the reference's column types without re-deriving them.
  *
  * Encoding notes:
  *   - Postgres `TEXT` is unbounded; `createTableColumnTypes` strings must
  *     parse as Spark SQL types and unconstrained strings default to
  *     engine-specific blobs (Derby: CLOB — non-comparable), so TEXT maps
  *     to a bounded VARCHAR. Free-text columns (joined activity lists,
  *     full_address, reason_display — which exceed 255 chars on realistic
  *     Synthea-style data) get VARCHAR(4096); id/reference columns
  *     (`urn:uuid:…`, ≤ ~64 chars by construction) stay VARCHAR(255) so
  *     primary/unique index keys remain small on engines with index-key
  *     size limits (Derby). The 4096 cap is still a documented deviation
  *     from unbounded TEXT: a pathological multi-KB field would fail the
  *     load here where Postgres would accept it.
  *   - The reference's type quirks are kept verbatim: `patient` stores
  *     `resource_birthDate` as `DATE` but `resource_deceasedDateTime` as
  *     TEXT (`json_pipeline.py:748,751`), and `immunization.resource_date`
  *     is `DATE` (`:824`) even though the source values are full
  *     datetimes — Postgres coerces on insert; stricter engines need a
  *     cast before load.
  *   - `patient_id` is the `patient` PRIMARY KEY (`json_pipeline.py:750`).
  *     Spark's JDBC writer cannot emit constraints, so the key set rides
  *     separately in [[primaryKeys]], applied post-load by
  *     [[Sinks.applyPrimaryKeys]] (`ALTER TABLE … ADD PRIMARY KEY`).
  */
object ReferenceDdl {

  /** Id/reference columns: URN-sized, index-key-friendly. */
  private val Id = "VARCHAR(255)"
  /** Unbounded-TEXT equivalents (free text, codes, display strings). */
  private val Text = "VARCHAR(4096)"

  /** (column, Spark-SQL type) pairs in the reference's CREATE TABLE order. */
  val columns: Map[String, Seq[(String, String)]] = Map(
    "patient" -> Seq(
      "fullUrl" -> Id,
      "resource_id" -> Id,
      "resource_gender" -> Text,
      "resource_birthDate" -> "DATE",
      "resource_multipleBirthBoolean" -> "BOOLEAN",
      "patient_id" -> Id,
      "resource_deceasedDateTime" -> Text,
      "resource_multipleBirthInteger" -> "INT",
      "latitude" -> "FLOAT",
      "longitude" -> "FLOAT",
      "full_address" -> Text,
      "contact_number" -> Text,
      "first_name" -> Text,
      "last_name" -> Text,
      "full_name" -> Text,
      "race" -> Text,
      "race_code" -> Text,
      "ethnicity" -> Text,
      "ethnicity_code" -> Text,
      "birthplace" -> Text,
      "maritalStatus" -> Text),
    "careplan" -> Seq(
      "resource_status" -> Text,
      "resource_subject_reference" -> Id,
      "resource_context_reference" -> Id,
      "resource_period_start" -> Text,
      "patient_id" -> Id,
      "resource_period_end" -> Text,
      "careplan_name" -> Text,
      "careplan_code" -> Text,
      "careplan_activity" -> Text,
      "careplan_activity_code" -> Text),
    "condition" -> Seq(
      "fullUrl" -> Id,
      "resource_id" -> Id,
      "resource_clinicalStatus" -> Text,
      "resource_verificationStatus" -> Text,
      "resource_subject_reference" -> Id,
      "resource_context_reference" -> Id,
      "resource_onsetDateTime" -> Text,
      "patient_id" -> Id,
      "resource_abatementDateTime" -> Text,
      "condition_display" -> Text,
      "condition_code" -> Text),
    "encounter" -> Seq(
      "fullUrl" -> Id,
      "resource_id" -> Id,
      "resource_status" -> Text,
      "resource_class_code" -> Text,
      "resource_patient_reference" -> Id,
      "resource_period_start" -> Text,
      "resource_period_end" -> Text,
      "patient_id" -> Id,
      "encounter_type_code" -> Text,
      "encounter_text" -> Text,
      "reason_code" -> Text,
      "reason_display" -> Text),
    "immunization" -> Seq(
      "resource_status" -> Text,
      "resource_date" -> "DATE",
      "resource_patient_reference" -> Id,
      "resource_wasNotGiven" -> "BOOLEAN",
      "resource_primarySource" -> "BOOLEAN",
      "resource_encounter_reference" -> Id,
      "patient_id" -> Id,
      "vaccine_type" -> Text,
      "vaccine_code" -> Text),
    "observation" -> Seq(
      "fullUrl" -> Id,
      "resource_id" -> Id,
      "resource_status" -> Text,
      "resource_subject_reference" -> Id,
      "resource_encounter_reference" -> Id,
      "resource_effectiveDateTime" -> Text,
      "resource_valueQuantity_value" -> "FLOAT",
      "resource_valueQuantity_unit" -> Text,
      "patient_id" -> Id,
      "observation_type" -> Text,
      "observation_code" -> Text))

  /** Per-table `createTableColumnTypes` strings for [[Sinks.writeJdbc]]. */
  val columnTypes: Map[String, String] =
    columns.map { case (t, cs) => t -> cs.map { case (c, ty) => s"$c $ty" }.mkString(", ") }

  /** Declared key constraints (`json_pipeline.py:750`) — applied post-load
    * via [[Sinks.applyPrimaryKeys]] on engines supporting
    * `ALTER TABLE … ADD PRIMARY KEY`.
    */
  val primaryKeys: Map[String, Seq[String]] = Map("patient" -> Seq("patient_id"))

  /** Cast a table's DATE-declared columns from their cleaned string form
    * to real dates before a JDBC load. The reference's Postgres coerced
    * strings at insert time (including full datetimes into
    * `immunization.resource_date`); Spark's JDBC writer binds parameters
    * by DataFrame type, so the coercion must happen in the plan. The
    * 10-char prefix reproduces Postgres's truncating ISO parse and stays
    * ANSI-safe (cleaned values are either valid ISO or already null).
    */
  def coerceDates(name: String, underscoredDf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, substring, to_date}
    columns.getOrElse(name, Nil).collect { case (c, "DATE") => c }
      .foldLeft(underscoredDf)((d, c) => d.withColumn(c, to_date(substring(col(s"`$c`"), 1, 10))))
  }
}
