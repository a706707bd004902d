package graft.fhir

import graft.SparkSpec
import java.nio.file.Files

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("runToDir: full pipeline writes 6 tables + 2 quality summaries; cleaning visible in QC delta") {
    val in = Files.createTempDirectory("pipe_in")
    Files.writeString(in.resolve("b1.json"), FhirFixtures.bundle1)
    Files.writeString(in.resolve("b2.json"), FhirFixtures.bundle2)
    val out = Files.createTempDirectory("pipe_out")

    val r = Pipeline.runToDir(spark, in.toString, out.toString)

    Seq("patient", "encounter", "condition", "observation", "immunization",
      "careplan", "initial_quality", "final_quality")
      .foreach(t => assert(Files.exists(out.resolve(t)), s"missing $t"))

    def q(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
      df.as[(String, String, Long, Double)].collect()
        .map(x => (x._1, x._2) -> x._3).toMap

    val before = q(r.initialQuality)
    val after = q(r.finalQuality)
    assert(before.size == 20 && after.size == 20)
    // cleaning effects: patient dup rows removed, invalid phone nullified
    assert(before(("patient_df", "Duplicate Resource.ID")) == 2L)
    assert(after(("patient_df", "Duplicate Resource.ID")) == 0L)
    assert(before(("patient_df", "Contact Number Errors")) == 1L)
    assert(after(("patient_df", "Contact Number Errors")) == 0L)
    assert(before(("patient_df", "Latitude Errors")) == 1L)
    assert(after(("patient_df", "Latitude Errors")) == 0L)
    // C1 nullifies invalid abatement → final format check clean
    assert(before(("condition_df", "Invalid AbatementDateTime Format")) == 1L)
    assert(after(("condition_df", "Invalid AbatementDateTime Format")) == 0L)
    // careplan period swap fixes the logical violation
    assert(before(("careplan_df", "Logical Date Compliance")) == 1L)
    assert(after(("careplan_df", "Logical Date Compliance")) == 0L)

    val patientCsv = spark.read.option("header", true)
      .csv(out.resolve("patient").toString)
    assert(patientCsv.count() == 2)
    assert(patientCsv.columns.contains("resource_birthDate"))
  }
}
