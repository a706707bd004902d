package graft.ops

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // key, start, end — two keys exercising overlap, touch, gap, nesting,
  // and a zero-length interval
  private def iv = Seq(
    (1L, 0L, 10L),   // island 1 …
    (1L, 5L, 12L),   //   overlaps
    (1L, 12L, 15L),  //   touches (merges: s <= running max end)
    (1L, 20L, 25L),  // island 2 (gap)
    (1L, 21L, 22L),  //   nested
    (2L, 3L, 3L),    // zero-length
    (2L, 4L, 8L)
  ).toDF("k", "s", "e")

  test("mergeIntervals coalesces overlap/touch, splits on gaps") {
    val out = Intervals.mergeIntervals(iv, "k", "s", "e")
      .orderBy("k", "island")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 0L, 15L, 3L),
      (1L, 2L, 20L, 25L, 2L),
      (2L, 1L, 3L, 3L, 1L),
      (2L, 2L, 4L, 8L, 1L)))
  }

  test("intervalCensus: half-open peak, earliest peak instant, zero-length never counts") {
    val out = Intervals.intervalCensus(iv, "k", "s", "e")
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    // key 1: [0,10)+[5,12) overlap on [5,10) → peak 2, first at t=5
    //   ([12,15) starts exactly as [5,12) ends — no triple)
    //   [20,25)+[21,22) also reach 2, but t=5 is earlier
    // key 2: [3,3) is empty (its -1 sorts before its +1) → peak 1 at t=4
    assert(out == Seq((1L, 2L, 5L), (2L, 1L, 4L)))
  }

  test("coverageRatio clips islands to the anchored window, exact basis points") {
    // key 1, window [0, 18): island [0,15) → 15 covered; [20,25) outside
    // key 2, window [3, 21): [3,3) empty, [4,8) → 4 covered
    val out = Intervals.coverageRatio(iv, "k", "s", "e", windowLen = 18L)
      .orderBy("k").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 15L, 2L, 15L * 10000L / 18L),
      (2L, 3L, 4L, 2L, 4L * 10000L / 18L)))
  }

  test("merge is a pure function of the input multiset (shuffled input, same islands)") {
    val shuffled = iv.orderBy(org.apache.spark.sql.functions.rand(7))
    val a = Intervals.mergeIntervals(iv, "k", "s", "e").orderBy("k", "island").collect().toSeq
    val b = Intervals.mergeIntervals(shuffled, "k", "s", "e").orderBy("k", "island").collect().toSeq
    assert(a == b)
  }
}
