package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    ("A", 10L, 1), ("A", 20L, 2), ("A", 25L, 3), ("B", 5L, 4), ("C", 7L, 5))
    .toDF("sym", "t", "trade_id")
  private lazy val quotes = Seq(
    ("A", 8L, 100.0), ("A", 20L, 101.0), ("A", 22L, 102.0), ("B", 9L, 50.0))
    .toDF("sym", "qt", "px")

  test("asof: latest quote at or before each trade; no-match → null; key without quotes → null") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select("sym", "t", "trade_id", "px")
      .as[(String, Long, Int, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out == Seq(
      ("A", 10L, 1, Some(100.0)),   // quote@8
      ("A", 20L, 2, Some(101.0)),   // tie: quote@20 included (<=)
      ("A", 25L, 3, Some(102.0)),   // quote@22
      ("B", 5L, 4, None),           // first quote is later
      ("C", 7L, 5, None)))          // no quotes for key
  }

  test("left row count preserved; payload collision rejected") {
    assert(AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px")).count()
      == trades.count())
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, quotes.withColumnRenamed("px", "t"),
        Seq("sym"), "t", "qt", Seq("t"))
    }
  }
}
