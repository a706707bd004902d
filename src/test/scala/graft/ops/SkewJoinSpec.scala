package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals plain join (skewed key included)") {
    val big = ((1 to 500).map(i => (1L, i.toLong)) ++ Seq((2L, 501L), (3L, 502L)))
      .toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched")).toDF("k", "label")
    val salted = SkewJoin.saltedJoin(big, small, "k", "row_id", salt = 8)
      .select("k", "row_id", "label")
    val plain = big.join(small, Seq("k")).select("k", "row_id", "label")
    assert(salted.count() == 501)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedCount equals plain groupBy count") {
    val df = ((1 to 300).map(_ => (1L, util.Random.nextLong())) :+ ((2L, 1L)))
      .map { case (k, r) => (k, r) }.toDF("k", "r")
    val out = SkewJoin.saltedCount(df, "k", "r", salt = 8)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 300L, 2L -> 1L))
  }
}
