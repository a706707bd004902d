package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(5L, 10L, 15L, 20L, 25L, 100L).toDF("ts")
  private lazy val intervals = Seq(
    (1L, 0L, 10L),    // catches 5, 10 (inclusive ends)
    (2L, 12L, 22L),   // catches 15, 20
    (3L, 30L, 40L),   // catches nothing
    (4L, 8L, 16L))    // overlaps interval 1: 10, 15
    .toDF("interval_id", "start_ts", "end_ts")

  test("intervalJoin: matches the naive non-equi join exactly, at several bin widths") {
    val expected = points.join(intervals,
        col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .select("interval_id", "ts").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.intervalJoin(points, "ts", intervals, "start_ts", "end_ts", w)
        .select("interval_id", "ts").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"binWidth=$w produced duplicate matches")
      assert(got.toSet == expected, s"binWidth=$w diverged")
    }
  }

  test("intervalOverlapJoin: matches naive overlap join with NO duplicate pairs, several widths") {
    val lhs = Seq((10L, 0L, 10L), (11L, 5L, 25L), (12L, 30L, 31L))
      .toDF("l_id", "l_start", "l_end")
    val rhs = Seq((20L, 8L, 40L), (21L, 26L, 29L), (22L, 50L, 60L))
      .toDF("r_id", "r_start", "r_end")
    val expected = lhs.join(rhs,
        col("l_start") <= col("r_end") && col("r_start") <= col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 4L, 10L, 100L)) {
      val got = RangeJoin.intervalOverlapJoin(
          lhs, "l_start", "l_end", rhs, "r_start", "r_end", w)
        .select("l_id", "r_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"binWidth=$w emitted duplicate pairs")
      assert(got.toSet == expected, s"binWidth=$w diverged: ${got.toSet} vs $expected")
    }
  }

  test("randomized: 200 seeded points × 60 intervals match the naive join at odd bin widths") {
    val rnd = new scala.util.Random(7)
    val ps = (0 until 200).map(i => (i.toLong, rnd.nextLong(1000L))).toDF("p_id", "ts")
    val is = (0 until 60).map { i =>
      val s = rnd.nextLong(950L)
      (1000L + i, s, s + rnd.nextLong(120L))
    }.toDF("i_id", "s", "e")
    val expected = ps.join(is, col("ts") >= col("s") && col("ts") <= col("e"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 13L, 64L, 1000L)) {
      val got = RangeJoin.intervalJoin(ps, "ts", is, "s", "e", w)
        .select("p_id", "i_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size && got.toSet == expected, s"binWidth=$w diverged")
    }
  }

  test("intervalJoin plans as an equi-join on bins, never a nested loop") {
    val joined = RangeJoin.intervalJoin(points, "ts", intervals, "start_ts", "end_ts", 10L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degraded to a nested loop:\n$plan")
  }
}
