package graft.fhir

import org.apache.spark.sql.types._

/** Explicit schemas for FHIR Bundle ingest.
  *
  * The reference infers schema per file (`json_pipeline.py:104`); at scale
  * inference means an extra pass over 100 TB of JSON, so the engine pins
  * one `StructType` covering every field the pipeline reads (the union of
  * per-resource fields in FIXTURES.md §1). Schema'd reads also give the
  * reference's missing-column tolerance for free: absent fields arrive as
  * nulls (`json_pipeline.py:165-184` materialized them manually).
  */
object Schemas {

  private val codingArr = ArrayType(StructType(Seq(
    StructField("display", StringType),
    StructField("code", StringType))))

  /** One `resource` struct as the union of all six resource types' fields —
    * mirroring how the reference flattens everything into one wide frame
    * before routing by resourceType (`json_pipeline.py:60-94`).
    */
  val resourceType: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    // Patient
    StructField("gender", StringType),
    StructField("birthDate", StringType),
    StructField("deceasedDateTime", StringType),
    StructField("multipleBirthBoolean", BooleanType),
    StructField("multipleBirthInteger", IntegerType),
    StructField("address", ArrayType(StructType(Seq(
      StructField("line", ArrayType(StringType)),
      StructField("city", StringType),
      StructField("state", StringType),
      StructField("postalCode", StringType),
      StructField("extension", ArrayType(StructType(Seq(
        StructField("extension", ArrayType(StructType(Seq(
          StructField("url", StringType),
          StructField("valueDecimal", DoubleType))))))))))))),
    StructField("telecom", ArrayType(StructType(Seq(
      StructField("system", StringType),
      StructField("value", StringType))))),
    StructField("name", ArrayType(StructType(Seq(
      StructField("given", ArrayType(StringType)),
      StructField("family", StringType))))),
    StructField("extension", ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("valueCodeableConcept", StructType(Seq(
        StructField("coding", codingArr)))),
      StructField("valueAddress", StructType(Seq(
        StructField("city", StringType),
        StructField("state", StringType)))))))),
    StructField("maritalStatus", StructType(Seq(
      StructField("coding", ArrayType(StructType(Seq(
        StructField("code", StringType)))))))),
    // Encounter
    StructField("status", StringType),
    StructField("class", StructType(Seq(StructField("code", StringType)))),
    StructField("patient", StructType(Seq(StructField("reference", StringType)))),
    StructField("period", StructType(Seq(
      StructField("start", StringType),
      StructField("end", StringType)))),
    StructField("type", ArrayType(StructType(Seq(
      StructField("coding", ArrayType(StructType(Seq(StructField("code", StringType))))),
      StructField("text", StringType))))),
    StructField("reason", StructType(Seq(StructField("coding", codingArr)))),
    // Condition / Observation shared
    StructField("clinicalStatus", StringType),
    StructField("verificationStatus", StringType),
    StructField("subject", StructType(Seq(StructField("reference", StringType)))),
    StructField("context", StructType(Seq(StructField("reference", StringType)))),
    StructField("onsetDateTime", StringType),
    StructField("abatementDateTime", StringType),
    StructField("code", StructType(Seq(StructField("coding", codingArr)))),
    // Observation
    StructField("encounter", StructType(Seq(StructField("reference", StringType)))),
    StructField("effectiveDateTime", StringType),
    StructField("valueQuantity", StructType(Seq(
      StructField("value", DoubleType),
      StructField("unit", StringType)))),
    // Immunization
    StructField("date", StringType),
    StructField("wasNotGiven", BooleanType),
    StructField("primarySource", BooleanType),
    StructField("vaccineCode", StructType(Seq(StructField("coding", codingArr)))),
    // CarePlan
    StructField("category", ArrayType(StructType(Seq(
      StructField("coding", codingArr))))),
    StructField("activity", ArrayType(StructType(Seq(
      StructField("detail", StructType(Seq(
        StructField("code", StructType(Seq(StructField("coding", codingArr)))))))))))))

  /** Top-level Bundle: `{resourceType, type, entry: [{fullUrl, resource}]}`
    * (FIXTURES.md §1; `json_pipeline.py:100-118`).
    */
  val bundleSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("type", StringType),
    StructField("entry", ArrayType(StructType(Seq(
      StructField("fullUrl", StringType),
      StructField("resource", resourceType)))))))

  /** The six routed tables, in FK-load order (`json_pipeline.py:909-926`). */
  val tableNames: Seq[String] =
    Seq("patient", "encounter", "condition", "observation", "immunization", "careplan")
}
