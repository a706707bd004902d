package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed integer intervals (gaps-and-islands,
  * concurrency census, window-coverage ratio). The classic EHR /
  * release-analytics family: merged medication-coverage spans,
  * concurrent-encounter bed census, proportion-of-days-covered
  * adherence — all expressed on an integer grid (epoch days / µs) so
  * every output is exact int64 and replayable bit-for-bit by any SQL
  * engine (the same contract as the survival battery; cf. the
  * reference's encounter-span handling, json_pipeline.py:214-260,
  * which rowizes encounters but leaves span algebra to the warehouse).
  *
  * Interval convention: rows are `[start, end)` half-open on the grid;
  * [[mergeIntervals]] coalesces rows whose spans overlap OR touch
  * (`next.start <= running_max_end`), which preserves the half-open
  * union measure, so downstream coverage sums need no gap correction.
  *
  * Scale shape (all three ops): ONE shuffle on the key; the island /
  * census logic is a window sort within each key's partition, never a
  * self-join — n intervals cost O(n log n) per key, not O(n²). Skewed
  * keys (one patient with millions of spans) serialize that key's sort
  * into one task; the lever is the same as every keyed window here:
  * pre-aggregate identical (key,start,end) rows before calling.
  */
object Intervals {

  private def base(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    require(Set(keyCol, startCol, endCol).size == 3,
      s"key/start/end must be distinct: $keyCol,$startCol,$endCol")
    val k = col(s"`$keyCol`")
    val s0 = col(s"`$startCol`").cast("long")
    val e0 = col(s"`$endCol`").cast("long")
    df.filter(k.isNotNull && s0.isNotNull && e0.isNotNull && e0 >= s0)
      .select(k.as("__ik"), s0.as("__is"), e0.as("__ie"))
  }

  /** Gaps-and-islands merge: one row per key × maximal run of
    * overlapping-or-touching intervals, with `island` a 1-based dense
    * rank in start order, `mstart`/`mend` the merged span and
    * `n_merged` the source-row count. Deterministic under ties: the
    * island partition of the input is order-independent (equal
    * (start,end) rows are interchangeable), so the output set is a
    * pure function of the input multiset.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col("__ik")).orderBy(col("__is"), col("__ie"))
    base(df, keyCol, startCol, endCol)
      // running max end over STRICTLY preceding rows: null on the
      // key's first row, else the farthest reach of earlier intervals
      .withColumn("__pmax",
        max(col("__ie")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__is") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__ik").as(keyCol), col("island"))
      .agg(
        min(col("__is")).as("mstart"),
        max(col("__ie")).as("mend"),
        count(lit(1)).as("n_merged"))
  }

  /** Sweep-line concurrency census: per key, the peak number of
    * simultaneously-open `[start, end)` intervals and the earliest
    * grid instant at which that peak is first reached. Ends sort
    * before starts at equal instants (half-open: an interval ending
    * at t does not overlap one starting at t), so zero-length rows
    * never count. Peak and peak_t are tie-order invariant: runs of
    * equal (t, delta) rows produce the same running-sum multiset at
    * the same t regardless of their physical order.
    */
  def intervalCensus(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val b = base(df, keyCol, startCol, endCol)
    val deltas = b.select(col("__ik"), col("__is").as("__t"), lit(1L).as("__d"))
      .union(b.select(col("__ik"), col("__ie").as("__t"), lit(-1L).as("__d")))
    val w = Window.partitionBy(col("__ik")).orderBy(col("__t"), col("__d"))
    deltas
      .withColumn("__run",
        sum(col("__d")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__mx", max(col("__run")).over(Window.partitionBy(col("__ik"))))
      .groupBy(col("__ik").as(keyCol))
      .agg(
        max(col("__run")).as("peak"),
        min(when(col("__run") === col("__mx"), col("__t"))).as("peak_t"))
  }

  /** Window-coverage ratio (the PDC adherence shape): per key, anchor
    * an observation window `[min_start, min_start + windowLen)`, sum
    * the half-open overlap of the MERGED islands with that window, and
    * report the ratio in exact fixed-point (`covered·scale DIV
    * windowLen` — integer floor division, so e.g. scale=10000 gives
    * basis points with no float fold anywhere).
    */
  def coverageRatio(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, windowLen: Long, scale: Long = 10000L): DataFrame = {
    require(windowLen > 0, s"windowLen must be positive: $windowLen")
    require(scale > 0, s"scale must be positive: $scale")
    val wk = Window.partitionBy(col(s"`$keyCol`"))
    mergeIntervals(df, keyCol, startCol, endCol)
      .withColumn("__ws", min(col("mstart")).over(wk))
      .withColumn("__cov",
        greatest(lit(0L),
          least(col("mend"), col("__ws") + lit(windowLen)) -
            greatest(col("mstart"), col("__ws"))))
      .groupBy(col(s"`$keyCol`"))
      .agg(
        min(col("__ws")).as("win_start"),
        sum(col("__cov")).as("covered"),
        count(lit(1)).as("n_islands"))
      .withColumn("ratio_scaled",
        expr(s"covered * ${scale}L DIV ${windowLen}L"))
  }
}
