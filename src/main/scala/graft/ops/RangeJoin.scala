package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match point rows to interval rows with
  * `start ≤ ts ≤ end` — the other temporal-join shape (beside
  * [[AsofJoin]]) that Spark's built-in operators don't execute well: a
  * raw non-equi join plans as BroadcastNestedLoop (O(|points|·|intervals|)
  * compared pairs, broadcast-limited), which dies at scale.
  *
  * Strategy: quantize time into bins of `binWidth`. Each point maps to ONE
  * bin; each interval explodes to its covered bins (⌈len/binWidth⌉ + 1
  * rows — bounded when intervals are bounded). The join becomes a plain
  * equi-join on the bin key, the exact `BETWEEN` predicate filters within
  * the bin-matched pairs, and every (point, interval) match appears exactly
  * once because the point's single bin intersects each interval's bin
  * range at most once. Shuffles are hash-partitioned on bin keys.
  *
  * Scale levers: `binWidth` trades interval fan-out (len/binWidth rows per
  * interval) against bin-collision volume (points per bin × intervals
  * covering the bin); set it near the median interval length. Hot bins
  * (bursty time ranges) are ordinary join skew — AQE splits them.
  */
object RangeJoin {

  /** All (point, interval) matches. `ts`, `start`, `end` must be the same
    * integral unit (e.g. epoch micros). Output: point columns + interval
    * columns (caller guarantees disjoint names).
    */
  def intervalJoin(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin", floor(col(tsCol) / binWidth))
    val i = intervals
      .withColumn("__bin",
        explode(sequence(
          floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(i, Seq("__bin"))
      .filter(col(tsCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** Interval × interval overlap join: all (left, right) pairs with
    * `lStart ≤ rEnd AND rStart ≤ lEnd`. Both sides explode to covered
    * bins and equi-join; overlapping pairs share SEVERAL bins, so instead
    * of a `distinct` shuffle over the matches, each pair is kept only in
    * its FIRST shared bin — `bin == max(⌊lStart/w⌋, ⌊rStart/w⌋)`, the
    * standard dedup predicate: the first bin two overlapping intervals
    * share is the later of their start bins, so exactly one exploded
    * match survives per pair, for free.
    */
  def intervalOverlapJoin(
      left: DataFrame, lStartCol: String, lEndCol: String,
      right: DataFrame, rStartCol: String, rEndCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(floor(col(s) / binWidth), floor(col(e) / binWidth))))
    binned(left, lStartCol, lEndCol).join(binned(right, rStartCol, rEndCol), Seq("__bin"))
      .filter(
        col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol) &&
          col("__bin") === greatest(
            floor(col(lStartCol) / binWidth), floor(col(rStartCol) / binWidth)))
      .drop("__bin")
  }
}
