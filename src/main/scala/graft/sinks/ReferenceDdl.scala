package graft.sinks

/** The reference's typed warehouse DDL (`json_pipeline.py:743-850`),
  * encoded as per-table `createTableColumnTypes` inputs so every JDBC
  * load gets the reference's column types without re-deriving them.
  *
  * Encoding notes:
  *   - Postgres `TEXT` → `VARCHAR(255)`: `createTableColumnTypes` strings
  *     must parse as Spark SQL types, and unconstrained strings default to
  *     engine-specific blobs (Derby: CLOB — non-comparable) — VARCHAR is
  *     the portable equivalent.
  *   - The reference's type quirks are kept verbatim: `patient` stores
  *     `resource_birthDate` as `DATE` but `resource_deceasedDateTime` as
  *     TEXT (`json_pipeline.py:748,751`), and `immunization.resource_date`
  *     is `DATE` (`:824`) even though the source values are full
  *     datetimes — Postgres coerces on insert; stricter engines need a
  *     cast before load.
  *   - `patient_id` is the `patient` PRIMARY KEY (`json_pipeline.py:750`).
  *     Spark's JDBC writer cannot emit constraints, so the key set rides
  *     separately in [[primaryKeys]] for callers to apply post-load
  *     (`ALTER TABLE … ADD PRIMARY KEY`).
  */
object ReferenceDdl {

  /** (column, Spark-SQL type) pairs in the reference's CREATE TABLE order. */
  val columns: Map[String, Seq[(String, String)]] = Map(
    "patient" -> Seq(
      "fullUrl" -> "VARCHAR(255)",
      "resource_id" -> "VARCHAR(255)",
      "resource_gender" -> "VARCHAR(255)",
      "resource_birthDate" -> "DATE",
      "resource_multipleBirthBoolean" -> "BOOLEAN",
      "patient_id" -> "VARCHAR(255)",
      "resource_deceasedDateTime" -> "VARCHAR(255)",
      "resource_multipleBirthInteger" -> "INT",
      "latitude" -> "FLOAT",
      "longitude" -> "FLOAT",
      "full_address" -> "VARCHAR(255)",
      "contact_number" -> "VARCHAR(255)",
      "first_name" -> "VARCHAR(255)",
      "last_name" -> "VARCHAR(255)",
      "full_name" -> "VARCHAR(255)",
      "race" -> "VARCHAR(255)",
      "race_code" -> "VARCHAR(255)",
      "ethnicity" -> "VARCHAR(255)",
      "ethnicity_code" -> "VARCHAR(255)",
      "birthplace" -> "VARCHAR(255)",
      "maritalStatus" -> "VARCHAR(255)"),
    "careplan" -> Seq(
      "resource_status" -> "VARCHAR(255)",
      "resource_subject_reference" -> "VARCHAR(255)",
      "resource_context_reference" -> "VARCHAR(255)",
      "resource_period_start" -> "VARCHAR(255)",
      "patient_id" -> "VARCHAR(255)",
      "resource_period_end" -> "VARCHAR(255)",
      "careplan_name" -> "VARCHAR(255)",
      "careplan_code" -> "VARCHAR(255)",
      "careplan_activity" -> "VARCHAR(255)",
      "careplan_activity_code" -> "VARCHAR(255)"),
    "condition" -> Seq(
      "fullUrl" -> "VARCHAR(255)",
      "resource_id" -> "VARCHAR(255)",
      "resource_clinicalStatus" -> "VARCHAR(255)",
      "resource_verificationStatus" -> "VARCHAR(255)",
      "resource_subject_reference" -> "VARCHAR(255)",
      "resource_context_reference" -> "VARCHAR(255)",
      "resource_onsetDateTime" -> "VARCHAR(255)",
      "patient_id" -> "VARCHAR(255)",
      "resource_abatementDateTime" -> "VARCHAR(255)",
      "condition_display" -> "VARCHAR(255)",
      "condition_code" -> "VARCHAR(255)"),
    "encounter" -> Seq(
      "fullUrl" -> "VARCHAR(255)",
      "resource_id" -> "VARCHAR(255)",
      "resource_status" -> "VARCHAR(255)",
      "resource_class_code" -> "VARCHAR(255)",
      "resource_patient_reference" -> "VARCHAR(255)",
      "resource_period_start" -> "VARCHAR(255)",
      "resource_period_end" -> "VARCHAR(255)",
      "patient_id" -> "VARCHAR(255)",
      "encounter_type_code" -> "VARCHAR(255)",
      "encounter_text" -> "VARCHAR(255)",
      "reason_code" -> "VARCHAR(255)",
      "reason_display" -> "VARCHAR(255)"),
    "immunization" -> Seq(
      "resource_status" -> "VARCHAR(255)",
      "resource_date" -> "DATE",
      "resource_patient_reference" -> "VARCHAR(255)",
      "resource_wasNotGiven" -> "BOOLEAN",
      "resource_primarySource" -> "BOOLEAN",
      "resource_encounter_reference" -> "VARCHAR(255)",
      "patient_id" -> "VARCHAR(255)",
      "vaccine_type" -> "VARCHAR(255)",
      "vaccine_code" -> "VARCHAR(255)"),
    "observation" -> Seq(
      "fullUrl" -> "VARCHAR(255)",
      "resource_id" -> "VARCHAR(255)",
      "resource_status" -> "VARCHAR(255)",
      "resource_subject_reference" -> "VARCHAR(255)",
      "resource_encounter_reference" -> "VARCHAR(255)",
      "resource_effectiveDateTime" -> "VARCHAR(255)",
      "resource_valueQuantity_value" -> "FLOAT",
      "resource_valueQuantity_unit" -> "VARCHAR(255)",
      "patient_id" -> "VARCHAR(255)",
      "observation_type" -> "VARCHAR(255)",
      "observation_code" -> "VARCHAR(255)"))

  /** Per-table `createTableColumnTypes` strings for [[Sinks.writeJdbc]]. */
  val columnTypes: Map[String, String] =
    columns.map { case (t, cs) => t -> cs.map { case (c, ty) => s"$c $ty" }.mkString(", ") }

  /** Declared key constraints (`json_pipeline.py:750`) — applied post-load
    * by callers whose engine supports `ALTER TABLE … ADD PRIMARY KEY`.
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
