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

  test("gap-tolerant merge coalesces episodes; mend stays the true reach") {
    // key 1: gap between [0,15) and [20,25) is 5 → one episode at gap=5,
    // two at gap=4; merged end is 25 (true reach), not 25+gap
    val g5 = Intervals.mergeIntervals(iv, "k", "s", "e", gap = 5L)
      .filter($"k" === 1L).orderBy("island")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(g5 == Seq((1L, 1L, 0L, 25L, 5L)))
    val g4 = Intervals.mergeIntervals(iv, "k", "s", "e", gap = 4L)
      .filter($"k" === 1L).orderBy("island")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(g4 == Seq((1L, 1L, 0L, 15L, 3L), (1L, 2L, 20L, 25L, 2L)))
  }

  test("readmissions: index cases, within-threshold counts, trailing episode never indexed") {
    // key 1 episodes [0,15),[20,25): gap 5; key 2 [3,3),[4,8): gap 1
    val w5 = Intervals.readmissions(iv, "k", "s", "e", within = 5L)
      .orderBy("k").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(w5 == Seq((1L, 2L, 1L, 1L, 5L), (2L, 2L, 1L, 1L, 1L)))
    val w4 = Intervals.readmissions(iv, "k", "s", "e", within = 4L)
      .orderBy("k").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(w4 == Seq((1L, 2L, 1L, 0L, 5L), (2L, 2L, 1L, 1L, 1L)))
  }

  test("incidenceRate: merged person-time, half-open event membership, exposed-cohort spine") {
    val ev = Seq(
      (1L, 0L),  // at island start → in
      (1L, 15L), // at island end → out (half-open)
      (1L, 17L), // in the gap → out
      (1L, 20L), // in
      (1L, 24L), // in
      (2L, 3L),  // zero-length island covers nothing → out
      (2L, 5L),  // in [4,8)
      (9L, 1L)   // no exposure for key 9 → dropped entirely
    ).toDF("k", "t")
    val out = Intervals.incidenceRate(iv, ev, "k", "s", "e", "k", "t")
      .orderBy("k").as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 20L, 2L, 5L, 3L, 3L * 1000L / 20L),
      (2L, 4L, 2L, 2L, 1L, 1L * 1000L / 4L)))
  }

  test("concurrentPairs: per-class merge, half-open overlap, key-equi pairing only") {
    val rx = Seq(
      // key 1: A = [0,10) ∪ [12,20); B = [5,13); C = [25,30)
      (1L, "A", 0L, 10L), (1L, "A", 12L, 20L),
      (1L, "B", 5L, 13L), (1L, "C", 25L, 30L),
      // key 2: duplicated/overlapping A rows merge to [0,5); B = [4,6)
      (2L, "A", 0L, 5L), (2L, "A", 2L, 5L), (2L, "B", 4L, 6L),
      // key 3: touching only — NOT co-exposure (half-open)
      (3L, "A", 0L, 2L), (3L, "B", 2L, 4L)
    ).toDF("k", "cl", "s", "e")
    val out = Intervals.concurrentPairs(rx, "k", "cl", "s", "e")
      .orderBy("class_a", "class_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // (A,B): key1 [0,10)∩[5,13)=5 and [12,20)∩[5,13)=1; key2 [0,5)∩[4,6)=1
    assert(out == Seq(("A", "B", 2L, 3L, 7L)))
    // same-class spans never pair; cross-key spans never pair
    val solo = Seq((1L, "A", 0L, 9L), (2L, "B", 0L, 9L))
      .toDF("k", "cl", "s", "e")
    assert(Intervals.concurrentPairs(solo, "k", "cl", "s", "e").count() == 0L)
    // island-count guard fails fast on a degenerate key
    val hot = (0L until 50L).map(i => (1L, s"c$i", i * 10L, i * 10L + 5L))
      .toDF("k", "cl", "s", "e")
    val err = intercept[Exception] {
      Intervals.concurrentPairs(hot, "k", "cl", "s", "e",
        maxIslandsPerKey = 10L).count()
    }
    assert(err.getMessage.contains("maxIslandsPerKey"), err.getMessage)
  }
}
