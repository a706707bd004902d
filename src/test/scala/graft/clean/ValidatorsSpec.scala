package graft.clean

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** X5/X6 validator semantics pinned against the reference's regexes
  * (`data_quality_checker.py:48-79`).
  */
class ValidatorsSpec extends SparkSpec {

  private def evalBool(value: String, mk: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Option[Boolean] = {
    import spark.implicits._
    Seq(Option(value)).toDF("v")
      .select(mk(col("v")).as("r"))
      .collect()(0).getAs[Any]("r") match {
      case null => None
      case b: Boolean => Some(b)
    }
  }

  test("datetime: accepts ISO with offset, rejects bare date / zulu / garbage") {
    assert(evalBool("2012-03-04T05:06:07+00:00", Validators.isValidDatetime).contains(true))
    assert(evalBool("2012-03-04T05:06:07-05:00", Validators.isValidDatetime).contains(true))
    assert(evalBool("2012-03-04", Validators.isValidDatetime).contains(false))
    assert(evalBool("2012-03-04T05:06:07Z", Validators.isValidDatetime).contains(false))
    assert(evalBool("2012-03-04T05:06:07", Validators.isValidDatetime).contains(false))
    assert(evalBool("not a date", Validators.isValidDatetime).contains(false))
  }

  test("date: accepts YYYY-MM-DD only") {
    assert(evalBool("1999-12-31", Validators.isValidDate).contains(true))
    assert(evalBool("1999-12-31T00:00:00+00:00", Validators.isValidDate).contains(false))
    assert(evalBool("99-12-31", Validators.isValidDate).contains(false))
  }

  test("dateOrDatetime is the union") {
    assert(evalBool("1999-12-31", Validators.isValidDateOrDatetime).contains(true))
    assert(evalBool("2012-03-04T05:06:07+00:00", Validators.isValidDateOrDatetime).contains(true))
    assert(evalBool("2012/03/04", Validators.isValidDateOrDatetime).contains(false))
  }

  test("phone: the four accepted shapes, with and without extension") {
    val valid = Seq(
      "(555) 123-4567", "(555)123-4567", "555-123-4567",
      "555.123.4567", "1-555-123-4567", "555-123-4567 x89")
    val invalid = Seq("5551234567", "555 123 4567", "(555) 123-456", "555-123-4567x89", "+1 555 123 4567")
    valid.foreach(p => assert(evalBool(p, Validators.isValidPhone).contains(true), p))
    invalid.foreach(p => assert(evalBool(p, Validators.isValidPhone).contains(false), p))
  }

  test("property: generated valid datetimes always pass, mutations fail") {
    import spark.implicits._
    val gen = for {
      y <- Gen.choose(1900, 2099); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
      sign <- Gen.oneOf("+", "-"); oh <- Gen.choose(0, 12)
    } yield f"$y%04d-$mo%02d-$d%02dT$h%02d:$mi%02d:$s%02d$sign$oh%02d:00"
    val samples = Gen.listOfN(50, gen).sample.get
    val df = samples.toDF("v")
      .select(Validators.isValidDatetime(col("v")).as("ok"),
        Validators.isValidDatetime(concat(col("v"), lit("x"))).as("mutated"))
    val rows = df.collect()
    assert(rows.forall(_.getBoolean(0)))
    assert(rows.forall(!_.getBoolean(1)))
  }

  test("lat/lon ranges inclusive at bounds") {
    import spark.implicits._
    val df = Seq(-90.0, 90.0, 90.0001, -180.0, 180.0, 180.5).toDF("v")
      .select(col("v"), Validators.isValidLatitude(col("v")).as("lat"),
        Validators.isValidLongitude(col("v")).as("lon"))
      .collect()
    assert(df.map(r => (r.getDouble(0), r.getBoolean(1), r.getBoolean(2))).toSeq == Seq(
      (-90.0, true, true), (90.0, true, true), (90.0001, false, true),
      (-180.0, false, true), (180.0, false, true), (180.5, false, false)))
  }
}
