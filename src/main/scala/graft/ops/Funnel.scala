package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-step ordered funnel analysis: for each key, the earliest time each
  * successive step completes, where step i must occur STRICTLY after
  * step i−1's completion time and within `window` of it (step 0 is the
  * key's earliest occurrence of the first step type). Rows keep partial
  * funnels — a key that never converts past step i carries nulls from
  * `t{i+1}` on — so per-step conversion counts are one aggregation away.
  */
object Funnel {

  /** One row per key with completion-time columns `t0 … t{k−1}` (same
    * integral unit as `tsCol`; later steps nullable).
    *
    * Scale shape: k−1 equi-joins on the key (the time-window predicate
    * rides the join as a post-condition, so every join is hash/sort-merge,
    * never a nested loop), each followed by a groupBy taking the earliest
    * qualifying time. Each step's event slice is filtered BEFORE its
    * join — the funnel never shuffles the full event stream twice. Null
    * keys/timestamps are excluded.
    */
  def funnelSteps(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], window: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps: $steps")
    require(window > 0, s"window must be positive: $window")
    val key = col(s"`$keyCol`")
    val ts = col(s"`$tsCol`")
    val typ = col(s"`$typeCol`")
    def slice(stepType: String): DataFrame =
      df.filter(typ === stepType && key.isNotNull && ts.isNotNull)
    val base = slice(steps.head)
      .groupBy(key.as(keyCol))
      .agg(min(ts).as("t0"))
    steps.tail.zipWithIndex.foldLeft(base) { case (acc, (stepType, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val evs = slice(stepType).select(key.as("__k"), ts.as("__ts"))
      val carried = acc.columns.toIndexedSeq
      acc.join(evs,
          acc(keyCol) === col("__k") &&
            col("__ts") > acc(prev) && col("__ts") <= acc(prev) + window,
          "left")
        .groupBy(carried.map(c => acc(c)): _*)
        .agg(min(col("__ts")).as(cur))
    }
  }

  /** [[funnelSteps]] folded to the usual report: one row per step with
    * the count of keys that reached it.
    */
  def funnelCounts(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], window: Long): DataFrame = {
    val wide = funnelSteps(df, keyCol, tsCol, typeCol, steps, window)
    val aggs = steps.indices.map(i => count(col(s"t$i")).as(s"n_step$i"))
    wide.agg(aggs.head, aggs.tail: _*)
  }
}
