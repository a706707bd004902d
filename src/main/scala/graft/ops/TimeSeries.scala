package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series utilities: sparse event streams → dense per-key grids.
  * Everything is integral bucket arithmetic (int64 DIV) — no timestamp
  * types cross an engine boundary, so results are exactly reproducible.
  */
object TimeSeries {

  /** Dense per-key bucket counts: one row per (key, bucket) for EVERY
    * bucket in [min observed, max observed] of that key, with
    * `n_events = 0` where nothing happened — the gap-fill step charts
    * and window models need before a sparse stream is usable.
    * `tsCol` must be an integral epoch column; `bucket = ts DIV width`
    * (integral division — float bucketing drifts near 2^53).
    *
    * Scale shape: one groupBy down to (key, bucket) partial counts —
    * map-side combine absorbs the raw event volume — then an
    * `explode(sequence)` executor-side fan-out of each key's span and a
    * left join back on (key, bucket). Grid size is Σ per-key spans, not
    * keys × global span: a key active for an hour never fans out to the
    * corpus's full history. Null keys/timestamps are excluded (they
    * have no place on a grid).
    */
  def denseCounts(
      df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val counts = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol),
        expr(s"`$tsCol` DIV $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_events"))
    val grid = counts
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .withColumn("bucket", explode(sequence(col("__lo"), col("__hi"))))
      .drop("__lo", "__hi")
    grid.join(counts, Seq(keyCol, "bucket"), "left")
      .na.fill(0L, Seq("n_events"))
  }

  /** [[denseCounts]] plus a gap flag and a carried-forward "last active
    * bucket" per row — the usual inputs to staleness/liveness features.
    */
  def denseCountsWithStaleness(
      df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    denseCounts(df, keyCol, tsCol, bucketWidth)
      .withColumn("is_gap", (col("n_events") === 0L))
      .withColumn("last_active_bucket",
        max(when(col("n_events") > 0L, col("bucket"))).over(w))
  }
}
