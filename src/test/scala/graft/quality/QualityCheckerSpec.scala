package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** G1–G5 profiling aggregates (SURVEY.md §2.8), hand-computed oracles. */
class QualityCheckerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("a")), (Some(2L), None), (None, None), (Some(4L), Some("b")))
    .toDF("id", "s")

  test("G1 missingProfile: null counts + pct, sorted worst-first") {
    val rows = QualityChecker.missingProfile(df)
      .as[(String, Long, Double)].collect().toSeq
    assert(rows == Seq(("s", 2L, 50.0), ("id", 1L, 25.0)))
  }

  test("G2 invalidCount: non-null failing predicate only") {
    val row = QualityChecker.invalidCount(
      df, col("s"), col("s") === "a", "bad_s", "t")
      .as[(String, String, Long, Double)].collect().head
    // nulls don't count as invalid: only "b" fails
    assert(row == ("t", "bad_s", 1L, 25.0))
  }

  test("G3 logicalOrderViolations: both set and start > end") {
    val d2 = Seq(
      (Some("2012-02-01"), Some("2012-01-01")),  // violation
      (Some("2012-01-01"), Some("2012-02-01")),
      (None, Some("2012-01-01")))
      .toDF("s", "e")
    val row = QualityChecker.logicalOrderViolations(
      d2, col("s"), col("e"), "inverted", "t")
      .as[(String, String, Long, Double)].collect().head
    assert(row == ("t", "inverted", 1L, 33.33))
  }

  test("G4 duplicateMembership: pandas keep=False semantics (group of 2 counts 2)") {
    val d2 = Seq((1, "x"), (1, "x"), (2, "x"), (3, "y"), (3, "y"), (3, "y"))
      .toDF("a", "b")
    val row = QualityChecker.duplicateMembership(d2, Seq("a", "b"), "dups", "t")
      .as[(String, String, Long, Double)].collect().head
    // groups: (1,x)->2 rows, (3,y)->3 rows => 5 of 6
    assert(row == ("t", "dups", 5L, 83.33))
  }

  test("G4 zero duplicates → 0, not null") {
    val d2 = Seq((1, "x"), (2, "y")).toDF("a", "b")
    val row = QualityChecker.duplicateMembership(d2, Seq("a", "b"), "dups", "t")
      .as[(String, String, Long, Double)].collect().head
    assert(row._3 == 0L && row._4 == 0.0)
  }

  test("G5 checkSuite: union ordered by (table, error_type)") {
    val out = QualityChecker.checkSuite(Seq(
      QualityChecker.invalidCount(df, col("s"), col("s") === "a", "z_check", "t"),
      QualityChecker.invalidCount(df, col("id"), col("id") > 0, "a_check", "t")))
      .select("error_type").as[String].collect().toSeq
    assert(out == Seq("a_check", "z_check"))
  }

  test("G6 observe: row count visible after action") {
    val obs = new org.apache.spark.sql.Observation("rows_obs")
    val observed = df.observe(obs, count(lit(1)).as("rows"))
    observed.collect()
    assert(obs.get("rows") == 4L)
  }

  test("cardinalityProfile: exact distinct/non-null per column, nulls excluded") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(2L), None), (None, Some("b"))
    ).toDF("k", "s")
    val out = QualityChecker.cardinalityProfile(df, Seq("k", "s"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("k", 2L, 3L), ("s", 2L, 3L)))
  }

  test("sketchCardinality: HLL estimate within the lgK=12 2.5-sigma bound (4%)") {
    import spark.implicits._
    val df = spark.range(100000).selectExpr("id", "CAST(id % 1000 AS STRING) AS s")
    val est = QualityChecker.sketchCardinality(df, Seq("id", "s"))
      .as[(String, Double)].collect().toMap
    // lgK=12 → RSE ≈ 1.04/√4096 ≈ 1.6%; 2.5σ ≈ 4% (measured 2.9% here)
    assert(math.abs(est("id") - 100000.0) / 100000.0 < 0.04, est("id"))
    assert(math.abs(est("s") - 1000.0) / 1000.0 < 0.04, est("s"))
  }

  test("sketchCardinality: sketches merge map-side — no raw-key exchange in the plan") {
    val df = SparkSpec.spark.range(10000).toDF("id")
    val plan = QualityChecker.sketchCardinality(df, Seq("id"))
      .queryExecution.executedPlan.toString
    // partial_hll_sketch_agg before the exchange = map-side combine
    assert(plan.contains("partial_hll_sketch_agg") || plan.contains("partial hll"), plan)
  }
}
