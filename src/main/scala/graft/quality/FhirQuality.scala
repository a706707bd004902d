package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.clean.Validators

/** The reference's fixed per-table quality-check battery (G5,
  * `data_quality_checker.py:105-163`): 20 checks across the six tables,
  * with the reference's exact composition and error-type strings —
  * condition 4, encounter 3, careplan 3 (note: bare-DATE validation for
  * careplan periods where encounter demands full datetimes,
  * `data_quality_checker.py:129-131` vs `:121-123`), patient 7,
  * observation 2, immunization 1.
  *
  * Run pre-clean ("initial") and post-clean ("final") like the reference's
  * Airflow tasks (`json_pipeline.py:516-529`, `:702-722`). Each check is a
  * one-row aggregate; the whole battery is one job of tiny single-pass
  * scans (the reference iterates every row in Python per check). Result
  * rows keep battery order.
  */
object FhirQuality {

  import QualityChecker._

  private def col_(name: String) = col(s"`$name`")

  /** All 20 checks over the six extracted tables (keys: patient,
    * encounter, condition, observation, immunization, careplan). Tables
    * absent from the map are skipped, like the reference's name dispatch.
    */
  def runQualityChecks(tables: Map[String, DataFrame]): DataFrame = {
    def checks(name: String, df: DataFrame): Seq[DataFrame] = name match {
      case "condition" => Seq(
        invalidCount(df, col_("resource.onsetDateTime"),
          Validators.isValidDatetime(col_("resource.onsetDateTime")),
          "Invalid OnsetDateTime Format", "condition_df"),
        invalidCount(df, col_("resource.abatementDateTime"),
          Validators.isValidDatetime(col_("resource.abatementDateTime")),
          "Invalid AbatementDateTime Format", "condition_df"),
        duplicateMembership(df, Seq("fullUrl", "resource.id"),
          "Duplicate Check", "condition_df"),
        logicalOrderViolations(df, col_("resource.onsetDateTime"),
          col_("resource.abatementDateTime"),
          "Logical Date Compliance", "condition_df"))
      case "encounter" => Seq(
        invalidCount(df, col_("resource.period.start"),
          Validators.isValidDatetime(col_("resource.period.start")),
          "Invalid Period Start Format", "encounter_df"),
        invalidCount(df, col_("resource.period.end"),
          Validators.isValidDatetime(col_("resource.period.end")),
          "Invalid Period End Format", "encounter_df"),
        duplicateMembership(df, Seq("resource.id"),
          "Duplicate Resource.ID", "encounter_df"))
      case "careplan" => Seq(
        invalidCount(df, col_("resource.period.start"),
          Validators.isValidDate(col_("resource.period.start")),
          "Invalid Period Start Format", "careplan_df"),
        invalidCount(df, col_("resource.period.end"),
          Validators.isValidDate(col_("resource.period.end")),
          "Invalid Period End Format", "careplan_df"),
        logicalOrderViolations(df, col_("resource.period.start"),
          col_("resource.period.end"),
          "Logical Date Compliance", "careplan_df"))
      case "patient" => Seq(
        invalidCount(df, col_("resource.birthDate"),
          Validators.isValidDate(col_("resource.birthDate")),
          "BirthDate Errors", "patient_df"),
        invalidCount(df, col_("resource.deceasedDateTime"),
          Validators.isValidDatetime(col_("resource.deceasedDateTime")),
          "DeceasedDateTime Errors", "patient_df"),
        invalidCount(df, col_("contact_number"),
          Validators.isValidPhone(col_("contact_number")),
          "Contact Number Errors", "patient_df"),
        invalidCount(df, col_("latitude"),
          Validators.isValidLatitude(col_("latitude")),
          "Latitude Errors", "patient_df"),
        invalidCount(df, col_("longitude"),
          Validators.isValidLongitude(col_("longitude")),
          "Longitude Errors", "patient_df"),
        logicalOrderViolations(df, col_("resource.birthDate"),
          col_("resource.deceasedDateTime"),
          "Birthdate vs DeceasedDateTime Logical Compliance", "patient_df"),
        duplicateMembership(df, Seq("resource.id"),
          "Duplicate Resource.ID", "patient_df"))
      case "observation" => Seq(
        invalidCount(df, col_("resource.effectiveDateTime"),
          Validators.isValidDatetime(col_("resource.effectiveDateTime")),
          "Invalid EffectiveDateTime Format", "observation_df"),
        duplicateMembership(df, Seq("resource.id"),
          "Duplicate Resource.ID", "observation_df"))
      case "immunization" => Seq(
        invalidCount(df, col_("resource.date"),
          Validators.isValidDatetime(col_("resource.date")),
          "Invalid Resource.Date Format", "immunization_df"))
      case _ => Nil
    }
    // reference dispatch order = the order dfs are passed (json_pipeline
    // wires condition..immunization); keep battery order explicit
    val ordered = Seq("condition", "encounter", "careplan", "patient",
      "observation", "immunization")
      .flatMap(n => tables.get(n).toSeq.flatMap(df => checks(n, df)))
    ordered.zipWithIndex
      .map { case (d, i) => d.withColumn("__ord", lit(i)) }
      .reduce(_.unionByName(_))
      .orderBy("__ord")
      .drop("__ord")
  }
}
