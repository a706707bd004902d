package graft.ops

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // buckets of width 10: user 1 hits buckets 0,0,2 (gap at 1); user 2
  // hits bucket 5 only; user 3 has only a null ts (excluded entirely)
  private lazy val events = Seq(
    (1L, Option(3L)), (1L, Option(7L)), (1L, Option(25L)),
    (2L, Option(51L)),
    (3L, Option.empty[Long]))
    .toDF("user_id", "ts")

  test("denseCounts zero-fills interior gaps per key, spans never cross keys") {
    val out = TimeSeries.denseCounts(events, "user_id", "ts", 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 2L), (1L, 1L, 0L), (1L, 2L, 1L),
      (2L, 5L, 1L)))
  }

  test("denseCounts floor-buckets negative timestamps (no double-width bucket 0)") {
    val neg = Seq((1L, Option(-5L)), (1L, Option(5L))).toDF("user_id", "ts")
    val out = TimeSeries.denseCounts(neg, "user_id", "ts", 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, -1L, 1L), (1L, 0L, 1L)),
      "ts=-5 belongs to bucket -1 under floor division, not a merged bucket 0")
  }

  test("denseCounts fails fast with a named key when a span exceeds maxBucketsPerKey") {
    val wild = Seq((7L, Option(0L)), (7L, Option(1000L))).toDF("user_id", "ts")
    val e = intercept[Exception] {
      TimeSeries.denseCounts(wild, "user_id", "ts", 1L, maxBucketsPerKey = 100L)
        .count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${messages(t.getCause)}"
    assert(messages(e).contains("maxBucketsPerKey"), messages(e))
  }

  test("randomized: denseCounts ≡ naive grid on 30 seeded event sets (incl. negative ts)") {
    (1 to 30).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val evs = Seq.fill(300)(
        (rnd.nextInt(8).toLong, rnd.nextInt(400).toLong - 200L)) // ts ∈ [-200, 200)
      val width = 1 + rnd.nextInt(20)
      val out = TimeSeries.denseCounts(
        evs.toDF("k", "ts"), "k", "ts", width.toLong)
        .as[(Long, Long, Long)].collect().toSet

      val expected = evs.groupBy(_._1).flatMap { case (k, rows) =>
        val buckets = rows.map(r => Math.floorDiv(r._2, width.toLong))
        (buckets.min to buckets.max).map(b =>
          (k, b, buckets.count(_ == b).toLong))
      }.toSet
      assert(out == expected, s"seed=$seed width=$width")
    }
  }

  test("denseCountsWithStaleness flags gaps and carries the last active bucket") {
    val out = TimeSeries
      .denseCountsWithStaleness(events, "user_id", "ts", 10L)
      .select("user_id", "bucket", "is_gap", "last_active_bucket")
      .as[(Long, Long, Boolean, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, false, 0L), (1L, 1L, true, 0L), (1L, 2L, false, 2L),
      (2L, 5L, false, 5L)))
  }
}
