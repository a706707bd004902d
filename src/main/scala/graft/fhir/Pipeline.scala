package graft.fhir

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.quality.FhirQuality
import graft.sinks.Sinks

/** End-to-end FHIR pipeline — the engine's equivalent of the reference's
  * whole program (`json_pipeline.py` Entry A + the Airflow DAG's intended
  * semantics, SURVEY.md §3): ingest → per-resource extraction → initial
  * quality check → per-table cleaning → final quality check → sinks.
  *
  * The reference runs 19 Airflow tasks that each re-execute the import-time
  * pipeline (SURVEY.md §3.2); here the whole flow is six lazy DataFrame
  * lineages off ONE cached entry scan — the fan-out parallelism the DAG
  * simulated with tasks is inherent in Spark partitions, and the two QC
  * checkpoints are just two more (tiny) jobs over the same cached scan.
  */
object Pipeline {

  final case class Result(
      tables: Map[String, DataFrame],
      initialQuality: DataFrame,
      finalQuality: DataFrame)

  /** Run ingest → extract → QC → clean → QC. Lazy apart from the QC
    * summaries themselves (callers sink `tables` however they want).
    */
  def run(spark: SparkSession, inputDir: String): Result = {
    val entries = BundleReader.normalizedEntries(spark, inputDir).cache()
    val raw = Extractors.allTables(entries)
    val initialQ = FhirQuality.runQualityChecks(raw)
    val cleaned = Cleaning.all(raw)
    val finalQ = FhirQuality.runQualityChecks(cleaned)
    Result(cleaned, initialQ, finalQ)
  }

  /** Run + write every table as CSV (`json_pipeline.py:1058-1076`) or
    * parquet under `outDir/<table>`, with the two quality summaries at
    * `outDir/initial_quality` / `outDir/final_quality`.
    */
  def runToDir(spark: SparkSession, inputDir: String, outDir: String,
      format: String = "csv"): Result = {
    val r = run(spark, inputDir)
    r.tables.foreach { case (name, df) =>
      val out = Sinks.underscored(df)
      if (format == "parquet") Sinks.writeParquet(out, s"$outDir/$name")
      else Sinks.writeCsv(out, s"$outDir/$name")
    }
    Sinks.writeCsv(r.initialQuality, s"$outDir/initial_quality")
    Sinks.writeCsv(r.finalQuality, s"$outDir/final_quality")
    r
  }
}
