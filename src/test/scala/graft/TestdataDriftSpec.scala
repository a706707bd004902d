package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regeneration tripwire for /root/testdata (round-7 postmortem: the
  * driver rewrote `events.ts` from TIMESTAMP(NANOS) to TIMESTAMP_MICROS
  * and the then-hardcoded epoch-nanos schema silently read µs as ns —
  * every gap/bucket/window became 1000× off and 10 gates went red with
  * no test noticing). This suite would have caught it: it reads every
  * testdata table through the SAME entry points the registry queries use
  * and asserts VALUE-level sanity, not just schema shape — a unit bug
  * shows up as a wildly wrong time span, not a type error.
  */
class TestdataDriftSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def have = new java.io.File(sfDir).isDirectory

  private val usPerDay = 24L * 3600L * 1000000L
  private val epoch2000Us = 946684800000000L // 2000-01-01T00:00:00Z
  private val epoch2100Us = 4102444800000000L

  test("events.ts resolves to plausible epoch-µs whatever the parquet type") {
    assume(have, s"$sfDir not present")
    val ev = SparkEntry.events(spark, sfDir)
    assert(ev.schema("ts").dataType == LongType, "canonical ts must be LongType epoch-µs")
    val r = ev.agg(
      min(col("ts")).as("lo"), max(col("ts")).as("hi"),
      count(lit(1)).as("n")).collect().head
    val (lo, hi, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0, "events is empty")
    // a µs-read-as-ns bug lands lo/hi around 1970-01-20 (≈1.7e15 ns is
    // misread as 1.7e12 µs); a ns-read-as-µs bug lands past year 50000
    assert(lo >= epoch2000Us && hi < epoch2100Us,
      s"events.ts out of [2000, 2100) as epoch-µs: lo=$lo hi=$hi — unit drift?")
    // the generator writes a multi-day window; a span collapsed to
    // minutes (µs÷1000) or inflated to decades (ns×1000) is the bug
    val spanDays = (hi - lo).toDouble / usPerDay
    assert(spanDays >= 1.0 && spanDays <= 400.0,
      s"events span $spanDays days — expected ~30; ts unit drifted?")
  }

  test("eventsTsType: non-NANOS failures propagate instead of poisoning the cache") {
    // a missing file (mid-regeneration window) must NOT silently resolve
    // to the forced-Long nanos read — that would misread the regenerated
    // TIMESTAMP_MICROS file 1000x off for the rest of the JVM
    val bogus = "/nonexistent/graft_drift_dir"
    intercept[Throwable] { SparkEntry.eventsTsType(spark, bogus) }
    // still throws on retry: the failure was not cached
    intercept[Throwable] { SparkEntry.eventsTsType(spark, bogus) }
  }

  test("normalizeEventTs dispatches on the stored type (µs timestamp vs raw ns long)") {
    import spark.implicits._
    val usVal = 1700000000000000L // 2023-11-14T22:13:20Z in µs
    val asTs = Seq(Tuple1(usVal)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(SparkEntry.normalizeEventTs(asTs).select("ts").as[Long].head() == usVal)
    val asNs = Seq(Tuple1(usVal * 1000L)).toDF("ts")
    assert(SparkEntry.normalizeEventTs(asNs).select("ts").as[Long].head() == usVal)
  }

  test("normalizeEventTs: a raw int64 outside epoch-ns magnitude fails fast, not 1000x off") {
    import spark.implicits._
    // if a regeneration ships raw epoch-µs int64 (what the ns DIV 1000
    // would silently corrupt), the plan-embedded guard must raise
    val asRawUs = Seq(Tuple1(1700000000000000L)).toDF("ts") // µs magnitude, LongType
    val e = intercept[Exception] {
      SparkEntry.normalizeEventTs(asRawUs).select("ts").as[Long].head()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("\n")
    assert(msgs.contains("epoch-nanos range"), s"unexpected failure: $msgs")
    // nulls pass through; in-range ns still divides
    val mixed = Seq(Option(1700000000000000000L), None).toDF("ts")
    val out = SparkEntry.normalizeEventTs(mixed).select("ts").as[Option[Long]].collect().toSet
    assert(out == Set(Some(1700000000000000L), None))
  }

  test("documents: text/doc_id populated, n_chars consistent with text") {
    assume(have, s"$sfDir not present")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    for (c <- Seq("doc_id", "text", "lang", "source", "n_chars"))
      assert(d.columns.contains(c), s"documents lost column $c")
    val r = d.agg(
      count(lit(1)).as("n"),
      count(col("text")).as("n_text"),
      countDistinct(col("doc_id")).as("n_ids"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)).as("bad_len"))
      .collect().head
    assert(r.getLong(0) > 0, "documents is empty")
    assert(r.getLong(1) == r.getLong(0), "null text rows appeared")
    assert(r.getLong(2) == r.getLong(0), "doc_id stopped being unique")
    assert(r.getLong(3) == 0L, "n_chars no longer equals length(text)")
  }

  test("embeddings: fixed-dim non-null float vectors") {
    assume(have, s"$sfDir not present")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dims = e.select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.length == 1 && dims.head > 0,
      s"embedding dim drifted (distinct sizes: ${dims.toSeq})")
    val nulls = e.filter(col("embedding").isNull ||
      exists(col("embedding"), v => v.isNull)).count()
    assert(nulls == 0L, s"$nulls embeddings rows carry null vectors/elements")
  }

  test("forced streaming schemas still match the files (docsSchema, eventsReadSchema)") {
    assume(have, s"$sfDir not present")
    // the streaming file source REQUIRES a user-supplied schema; these
    // constants must track the generator's output or stream gates read
    // garbage without erroring
    val docsInferred = spark.read.parquet(s"$sfDir/documents.parquet").schema
    for (f <- SparkEntry.docsSchema.fields) {
      val actual = docsInferred.find(_.name == f.name)
      assert(actual.isDefined, s"documents lost column ${f.name}")
      assert(actual.get.dataType == f.dataType,
        s"documents.${f.name} drifted: forced ${f.dataType}, file has ${actual.get.dataType}")
    }
    val evForced = SparkEntry.eventsReadSchema(spark, sfDir)
    val evRead = spark.read.schema(evForced).parquet(s"$sfDir/events.parquet")
    assert(evRead.limit(1).count() == 1L,
      "events unreadable under the resolved forced schema")
  }

  test("lineitem/orders: key columns survive with plausible domains") {
    assume(have, s"$sfDir not present")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    assert(l.count() > 0 && o.count() > 0)
    val rf = l.select("l_returnflag").distinct().collect().map(_.getString(0)).toSet
    assert(rf.nonEmpty && rf.subsetOf(Set("A", "N", "R")),
      s"l_returnflag domain drifted: $rf")
    val odt = o.schema("o_orderdate").dataType
    assert(odt == DateType || odt == TimestampType || odt == TimestampNTZType,
      s"o_orderdate became $odt")
  }
}
