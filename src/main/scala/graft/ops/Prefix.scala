package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums over a TOTAL order — the shared two-phase
  * pattern behind [[Curation]]'s exclusivePrefixSum and [[Profiling]]'s
  * ksDrift, extracted for the rank-statistics family (r19 verdict: their
  * cumulative windows ran `Window.orderBy(...)` with NO partitionBy — a
  * single-partition sort over the distinct-value relation. That relation
  * is domain-bounded for fixed-range scores, but KEY-sized for per-entity
  * totals (cost_concentration's cent totals) and range-sized for
  * open-ended value columns — a genuine single-task scale-killer at
  * 100 TB).
  *
  * Phase 1 range-partitions on the order and cumsums WITHIN each
  * partition in parallel; phase 2 takes an exclusive prefix over the
  * per-partition totals (≤ #shuffle-partitions rows — that tiny window is
  * the only single-task step, the same bounded exception as ksDrift's
  * offsets frame) and broadcast-joins it back. Results depend on the
  * total order alone, never on where the range sampler lands a boundary:
  * every emitted sum is the same exact int64 fold the single-window form
  * computed, so oracle hashes are unchanged by construction.
  *
  * The ranged frame persists past the call (the cumsum branch and the
  * totals branch both read it; an unpersisted lineage would re-shuffle
  * AND re-sample the range bounds per branch, silently corrupting
  * offsets if the two partitionings diverged) — the standard
  * [[graft.CachedFrames]] release contract.
  */
private[graft] object Prefix {

  /** `df` plus one column per `(outName, value)` entry: the EXCLUSIVE
    * prefix sum of `value` (an int64 expression) over all rows strictly
    * preceding under `orderCols` (0 when none precede). `orderCols` must
    * be a total order — unique per row, e.g. the key of a groupBy that
    * produced `df`; pass `col(...).desc` entries for descending prefixes.
    */
  def exclusiveSums(
      df: DataFrame, orderCols: Seq[Column],
      values: Seq[(String, Column)]): DataFrame = {
    require(values.nonEmpty, "exclusiveSums: no value columns")
    val vcols = values.zipWithIndex.map { case ((out, v), i) =>
      (out, s"__pv$i", v)
    }
    // cache the input relation BEFORE the range exchange: range
    // partitioning executes its child once more for boundary sampling,
    // and without this cache that second execution re-runs the caller's
    // whole upstream aggregation (measured: the sampling pass, not the
    // exchange, was the dominant cost of the r20 restructure)
    val projected = graft.CachedFrames.cached(
      vcols.foldLeft(df) { case (d, (_, tmp, v)) =>
        d.withColumn(tmp, v)
      })
    // no explicit partition count: AQE stays free to coalesce the range
    // exchange when the relation is small (REPARTITION_BY_COL origin)
    val ranged = projected
      .repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.CachedFrames.cached)
    val wIn = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = vcols.foldLeft(ranged) { case (d, (_, tmp, _)) =>
      d.withColumn(s"__in$tmp",
        coalesce(sum(col(tmp)).over(wIn), lit(0L)))
    }
    val totalAggs = vcols.map { case (_, tmp, _) =>
      sum(col(tmp)).as(s"__t$tmp")
    }
    // the ONLY unpartitioned window: ≤ #shuffle-partitions rows
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = vcols.foldLeft(
      ranged.groupBy(col("__pid")).agg(totalAggs.head, totalAggs.tail: _*)
    ) { case (d, (_, tmp, _)) =>
      d.withColumn(s"__o$tmp",
        coalesce(sum(col(s"__t$tmp")).over(wOff), lit(0L)))
    }.select(col("__pid") +: vcols.map { case (_, tmp, _) => col(s"__o$tmp") }: _*)
    val joined = within.join(broadcast(offsets), Seq("__pid"))
    val withOuts = vcols.foldLeft(joined) { case (d, (out, tmp, _)) =>
      d.withColumn(out, col(s"__o$tmp") + col(s"__in$tmp"))
    }
    withOuts.drop(
      "__pid" +: vcols.flatMap { case (_, tmp, _) =>
        Seq(tmp, s"__in$tmp", s"__o$tmp")
      }: _*)
  }
}
