package graft.fhir

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum}

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

  /** G6 — the reference's per-table cleaning accounting
    * (`json_pipeline.py:536-559` before/after prints;
    * `data_quality_checker.py:326-331` removed/filled/updated stats),
    * collected with `observe` metrics ON the cleaning plan itself: three
    * tiny aggregate taps ride the existing lineage, so the numbers cost
    * ZERO extra scans — they materialize when the table does.
    *
    * [[summary]] BLOCKS until an action has run over the corresponding
    * table (e.g. a sink write, a count, the quality summary) — call it
    * after materialization, as [[Pipeline.runToDir]] does.
    */
  final case class TableAccounting(
      table: String,
      before: Observation,
      postDrop: Option[Observation],
      after: Observation) {

    private def metric(o: Observation, key: String): Long =
      o.get.get(key).flatMap(Option(_)) match {
        case Some(n: Number) => n.longValue()
        case _ => 0L
      }

    /** rows_before/after, removal split (null-key drop vs dedup), and for
      * patient the reference's filled/updated counters.
      */
    def summary: Map[String, Long] = {
      val b = metric(before, "rows")
      val a = metric(after, "rows")
      val base = Map(
        "rows_before" -> b, "rows_after" -> a, "rows_removed" -> (b - a))
      postDrop match {
        case None => base
        case Some(p) =>
          val pd = metric(p, "rows")
          val extras = p.get.keySet.collect {
            case k @ ("filled_values" | "updated_booleans") => k -> metric(p, k)
          }
          base ++ Map(
            "rows_removed_null_keys" -> (b - pd),
            "rows_removed_dedup" -> (pd - a)) ++ extras
      }
    }
  }

  final case class Result(
      tables: Map[String, DataFrame],
      initialQuality: DataFrame,
      finalQuality: DataFrame,
      accounting: Map[String, TableAccounting])

  /** Run ingest → extract → QC → clean → QC. Lazy apart from the QC
    * summaries themselves (callers sink `tables` however they want; the
    * per-table [[TableAccounting]] metrics complete as tables
    * materialize).
    */
  def run(spark: SparkSession, inputDir: String): Result = {
    val entries = BundleReader.normalizedEntries(spark, inputDir).cache()
    val raw = Extractors.allTables(entries)
    val initialQ = FhirQuality.runQualityChecks(raw)

    // --- G6 instrumentation: observe nodes along the cleaning lineage ---
    val beforeObs = raw.keys.map(n => n -> Observation()).toMap
    val observedRaw = raw.map { case (n, df) =>
      n -> df.observe(beforeObs(n), count(lit(1)).as("rows"))
    }
    val postDropObs = mutable.Map.empty[String, Observation]
    def tapFor(table: String): Cleaning.Tap = { (point, df) =>
      if (point != "post_drop") df
      else {
        val o = Observation()
        postDropObs(table) = o
        if (table == "patient")
          // the reference's counters snapshot exactly here, post-dropna
          // pre-fill (`data_quality_checker.py:246-268`): booleans updated
          // where the integer is present and the boolean missing; integer
          // nulls then filled with 0
          df.observe(o,
            count(lit(1)).as("rows"),
            sum((col("`resource.multipleBirthInteger`").isNotNull &&
              col("`resource.multipleBirthBoolean`").isNull).cast("long"))
              .as("updated_booleans"),
            sum(col("`resource.multipleBirthInteger`").isNull.cast("long"))
              .as("filled_values"))
        else df.observe(o, count(lit(1)).as("rows"))
      }
    }
    val cleanedBare = Cleaning.allTapped(observedRaw, tapFor)
    val afterObs = cleanedBare.keys.map(n => n -> Observation()).toMap
    val cleaned = cleanedBare.map { case (n, df) =>
      n -> df.observe(afterObs(n), count(lit(1)).as("rows"))
    }
    val accounting = cleaned.keys.map { n =>
      n -> TableAccounting(n, beforeObs(n), postDropObs.get(n), afterObs(n))
    }.toMap

    val finalQ = FhirQuality.runQualityChecks(cleaned)
    Result(cleaned, initialQ, finalQ, accounting)
  }

  /** Run + write every table as CSV (`json_pipeline.py:1058-1076`) or
    * parquet under `outDir/<table>`, with the two quality summaries at
    * `outDir/initial_quality` / `outDir/final_quality`, then print the
    * reference-style per-table accounting report ("Before cleaning: …
    * rows", removed/filled/updated — `json_pipeline.py:536-559`). The
    * writes ARE the materializing actions, so the report costs nothing.
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
    Sinks.LoadOrder.foreach { name =>
      r.accounting.get(name).foreach { acc =>
        val s = acc.summary
        println(s"[$name] " + s.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(" "))
      }
    }
    r
  }
}
