package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Prefix.exclusiveSums]] — the distributed two-phase prefix sum the
  * rank-statistics family rides since r20 (replacing single-partition
  * `Window.orderBy` prefixes). The reference fold below IS the old
  * single-window form, so every property here pins "restructure changed
  * the plan, not one emitted value".
  */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      rows: Seq[(Long, Long, Long)], desc: Boolean): Map[Long, (Long, Long)] = {
    val sorted = if (desc) rows.sortBy(-_._1) else rows.sortBy(_._1)
    var c1 = 0L; var c2 = 0L
    sorted.map { case (k, v1, v2) =>
      val out = k -> (c1, c2); c1 += v1; c2 += v2; out
    }.toMap
  }

  private val rows: Seq[(Long, Long, Long)] =
    (1L to 997L).map(i => (i * 7 % 2048, i % 13, (i * i) % 101))
      .groupBy(_._1).map { case (k, g) =>
        (k, g.map(_._2).sum, g.map(_._3).sum)
      }.toSeq

  test("ascending exclusive sums match the single-window fold") {
    val df = rows.toDF("k", "v1", "v2")
    val got = Prefix.exclusiveSums(df, Seq(col("k")),
        Seq("c1" -> col("v1"), "c2" -> col("v2")))
      .select("k", "c1", "c2").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === reference(rows, desc = false))
    graft.CachedFrames.releaseAll()
  }

  test("descending exclusive sums match the single-window fold") {
    val df = rows.toDF("k", "v1", "v2")
    val got = Prefix.exclusiveSums(df, Seq(col("k").desc),
        Seq("c1" -> col("v1"), "c2" -> col("v2")))
      .select("k", "c1", "c2").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === reference(rows, desc = true))
    graft.CachedFrames.releaseAll()
  }

  test("results are independent of the input partitioning") {
    val base = rows.toDF("k", "v1", "v2")
    val expected = Prefix.exclusiveSums(base.repartition(1), Seq(col("k")),
        Seq("c" -> col("v1"))).select("k", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CachedFrames.releaseAll()
    Seq(3, 7).foreach { n =>
      val got = Prefix.exclusiveSums(base.repartition(n), Seq(col("k")),
          Seq("c" -> col("v1"))).select("k", "c").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"diverged at input partitions=$n")
      graft.CachedFrames.releaseAll()
    }
  }

  test("no unpartitioned window over the data relation (plan audit)") {
    val df = rows.toDF("k", "v1", "v2")
    val plan = Prefix.exclusiveSums(df, Seq(col("k")), Seq("c" -> col("v1")))
      .queryExecution.optimizedPlan
    // every Window over the DATA relation must carry a partitionSpec; the
    // only unpartitioned window allowed is the per-partition-totals one,
    // whose input is an Aggregate over spark_partition_id
    val offending = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty &&
            !w.child.exists {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
                a.groupingExpressions.exists(_.references.exists(
                  _.name == "__pid"))
              case _ => false
            } => w
    }
    assert(offending.isEmpty,
      s"unpartitioned data-relation window in:\n$plan")
    graft.CachedFrames.releaseAll()
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(Long, Long, Long)].toDF("k", "v1", "v2")
    assert(Prefix.exclusiveSums(df, Seq(col("k")),
      Seq("c" -> col("v1"))).count() === 0L)
    graft.CachedFrames.releaseAll()
  }
}
