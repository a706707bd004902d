package graft.clean

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C1–C6 / R1 / D1 semantics (SURVEY.md §2.6–§2.7, §2.9). */
class CleanersSpec extends SparkSpec {
  import spark.implicits._

  test("C1 nullifyInvalidDates: invalid → null, valid datetime and bare date survive") {
    val df = Seq(
      ("2012-03-04T05:06:07+00:00"), ("2012-03-04"), ("03/04/2012"), (null: String))
      .toDF("resource.birthDate")
    val out = Cleaners.nullifyInvalidDates(df, Seq("resource.birthDate"))
      .select(col("`resource.birthDate`")).as[Option[String]].collect().toSeq
    assert(out == Seq(
      Some("2012-03-04T05:06:07+00:00"), Some("2012-03-04"), None, None))
  }

  test("C1 skips columns absent from the frame") {
    val df = Seq(1, 2).toDF("x")
    assert(Cleaners.nullifyInvalidDates(df, Seq("nope")).columns.toSeq == Seq("x"))
  }

  test("C2 nullifyInvalidPhone") {
    val df = Seq("555-123-4567", "bogus", null).toDF("contact_number")
    val out = Cleaners.nullifyInvalidPhone(df, "contact_number")
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("555-123-4567"), None, None))
  }

  test("C3 nullifyOutOfRange keeps bounds, nulls outside") {
    val df = Seq(-90.0, 0.0, 90.0, 90.5).toDF("latitude")
    val out = Cleaners.nullifyOutOfRange(df, "latitude", -90, 90)
      .as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(-90.0), Some(0.0), Some(90.0), None))
  }

  test("C4 swapInvertedPair: swaps only when both set and start > end; idempotent") {
    val df = Seq(
      ("2012-01-02", "2012-01-01"),        // inverted → swap
      ("2012-01-01", "2012-01-02"),        // ordered → keep
      ("2012-01-02", null),                // one null → untouched
      (null, "2012-01-01"))
      .toDF("s", "e")
    val once = Cleaners.swapInvertedPair(df, "s", "e")
    val got = once.as[(Option[String], Option[String])].collect().toSeq
    assert(got == Seq(
      (Some("2012-01-01"), Some("2012-01-02")),
      (Some("2012-01-01"), Some("2012-01-02")),
      (Some("2012-01-02"), None),
      (None, Some("2012-01-01"))))
    val twice = Cleaners.swapInvertedPair(once, "s", "e")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(twice == got, "fix(fix(df)) == fix(df)")
  }

  test("C5 backfillBooleanFromInt: int set + bool null → true") {
    val df = Seq(
      (Some(2), None: Option[Boolean]),
      (Some(2), Some(false)),
      (None: Option[Int], None: Option[Boolean]))
      .toDF("i", "b")
    val out = Cleaners.backfillBooleanFromInt(df, "i", "b")
      .select("b").as[Option[Boolean]].collect().toSeq
    assert(out == Seq(Some(true), Some(false), None))
  }

  test("C6 fillNull + R1 dropNullKeys") {
    val df = Seq(
      (Some(1L), Some(1.0)), (Some(2L), None), (None, Some(3.0)))
      .toDF("k", "v")
    val out = Cleaners.fillNull(Cleaners.dropNullKeys(df, Seq("k")), "v", 0.0)
      .as[(Long, Double)].collect().toSeq.sorted
    assert(out == Seq((1L, 1.0), (2L, 0.0)))
  }

  test("P1-P3 projection helpers: drop list / drop pattern / ensure column") {
    val df = Seq((1, "x", "p")).toDF("keep", "photo_url", "other")
    assert(Cleaners.dropColumns(df, Seq("other", "absent")).columns.toSeq == Seq("keep", "photo_url"))
    assert(Cleaners.dropColumnsWhere(df, _.toLowerCase.contains("photo")).columns.toSeq == Seq("keep", "other"))
    val ensured = Cleaners.ensureColumn(df, "added", "double")
    assert(ensured.schema("added").dataType.typeName == "double")
    assert(Cleaners.ensureColumn(df, "keep", "string").columns.length == 3, "no-op when present")
  }

  test("D1 dedupKeepFirst: keeps smallest tiebreak per key; key-distinct after") {
    val df = Seq(
      (1L, "a", 30), (1L, "a", 10), (1L, "a", 20), (2L, "a", 5), (1L, "b", 1))
      .toDF("k1", "k2", "ord")
    val out = Cleaners.dedupKeepFirst(df, Seq("k1", "k2"), Seq(col("ord")))
      .as[(Long, String, Int)].collect().toSeq.sorted
    assert(out == Seq((1L, "a", 10), (1L, "b", 1), (2L, "a", 5)))
  }

  test("pseudonymize: deterministic, join-preserving, salt-sensitive, null-preserving") {
    val a = Seq((Some(42L), "x"), (Some(7L), "y"), (None, "z")).toDF("k", "p")
    val b = Seq(Tuple1(42L), Tuple1(42L), Tuple1(7L)).toDF("k")
    val ta = Cleaners.pseudonymize(a, Seq("k"), "s1")
    val tb = Cleaners.pseudonymize(b, Seq("k"), "s1")
    // raw keys are gone, tokens are md5-hex
    val toks = ta.select("k").as[Option[String]].collect().toSeq
    assert(toks.flatten.forall(_.matches("[0-9a-f]{32}")), toks.toString)
    assert(toks.contains(None), "null stays null")
    // the FK join survives tokenization with raw-key multiplicity
    val joined = ta.join(tb, Seq("k")).count()
    assert(joined == 3L, s"42 twice + 7 once: $joined")
    // a different salt yields disjoint tokens (no cross-release linkage)
    val other = Cleaners.pseudonymize(a, Seq("k"), "s2")
      .select("k").as[Option[String]].collect().flatten.toSet
    assert(other.intersect(toks.flatten.toSet).isEmpty)
  }

  test("dateShiftDeid: per-key constant bounded shift preserves intervals; null key unshifted") {
    val day = 86400000000L
    val df = Seq(
      (Some(42L), 100L * day, 103L * day),
      (Some(42L), 110L * day, 110L * day),
      (Some(7L), 100L * day, 100L * day),
      (None, 100L * day, 100L * day))
      .toDF("k", "t1", "t2")
    val out = Cleaners.dateShiftDeid(df, "k", Seq("t1", "t2"),
      maxShiftDays = 30)
      .as[(Option[Long], Long, Long)].collect().toSeq
    val by42 = out.filter(_._1.contains(42L))
    // identify rows by their (preserved) intra-row gap: 3d vs 0d
    val shifts42 = by42.map(r =>
      (r._2 - (if (r._3 - r._2 == 3L * day) 100L * day else 110L * day)) / day)
      .distinct
    assert(shifts42.size == 1, s"one shift per key: $shifts42")
    assert(math.abs(shifts42.head) <= 30, shifts42.toString)
    // intra-key interval preserved exactly
    val first42 = by42.find(r => r._3 - r._2 == 3L * day)
    assert(first42.isDefined, by42.toString)
    // whole-day shifts only
    assert(out.filter(_._1.isDefined).forall(r => r._2 % day == 0L))
    // a different key shifts differently (Feistel mixes 7 vs 42)
    val s7 = out.filter(_._1.contains(7L)).map(r => (r._2 - 100L * day) / day)
    assert(s7.nonEmpty && s7.head != shifts42.head)
    // null key: row left untouched for the caller to quarantine
    assert(out.exists(r => r._1.isEmpty && r._2 == 100L * day))
    // DateType and TimestampType shift by the same day count
    import org.apache.spark.sql.functions.{lit => flit, to_date, to_timestamp}
    val dt = Seq((42L, "2020-06-15")).toDF("k", "d")
      .select(col("k"), to_date(col("d")).as("d"),
        to_timestamp(flit("2020-06-15 10:30:00")).as("ts"))
    val sh = Cleaners.dateShiftDeid(dt, "k", Seq("d", "ts"), 30)
      .selectExpr("datediff(d, DATE'2020-06-15')",
        "CAST((unix_micros(ts) - unix_micros(TIMESTAMP'2020-06-15 10:30:00')) DIV 86400000000 AS INT)")
      .as[(Int, Int)].collect()(0)
    assert(sh._1 == sh._2 && sh._1 == shifts42.head.toInt, sh.toString)
  }

  test("dateShiftDeid: typo'd column fails fast — never silently ships raw timestamps") {
    val df = Seq((42L, 100L)).toDF("k", "t1")
    val err = intercept[IllegalArgumentException] {
      Cleaners.dateShiftDeid(df, "k", Seq("t1", "t1_typo"), 30)
    }
    assert(err.getMessage.contains("t1_typo"), err.getMessage)
    assert(err.getMessage.contains("de-identified"), err.getMessage)
  }
}
