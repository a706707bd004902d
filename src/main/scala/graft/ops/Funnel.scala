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
    * Scale shape: the source is filtered ONCE to the step types (with
    * the type filter pushed to the scan) and persisted — each step then
    * joins its slice of that cached frame, so a k-step funnel costs one
    * source scan, not k. Every join is an equi-join on the key with the
    * time-window predicate riding as a post-condition (hash/sort-merge,
    * never a nested loop), followed by a groupBy taking the earliest
    * qualifying time. Null keys/timestamps are excluded.
    */
  def funnelSteps(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], window: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps: $steps")
    require(window > 0, s"window must be positive: $window")
    val reserved = steps.indices.map(i => s"t$i").toSet ++
      Set("__k", "__ts", "__fk", "__fts", "__ftp")
    require(!reserved(keyCol),
      s"keyCol '$keyCol' collides with generated/internal funnel columns")
    val key = col(s"`$keyCol`")
    val ts = col(s"`$tsCol`")
    val typ = col(s"`$typeCol`")
    // one scan for the whole funnel (library caching contract): every
    // step slices this cached, type-pruned frame instead of re-reading
    // the source k times
    val sliced = df
      .filter(typ.isin(steps: _*) && key.isNotNull && ts.isNotNull)
      .select(key.as("__fk"), ts.as("__fts"), typ.as("__ftp"))
      .transform(graft.CachedFrames.cached)
    def slice(stepType: String): DataFrame =
      sliced.filter(col("__ftp") === stepType)
    val base = slice(steps.head)
      .groupBy(col("__fk").as(keyCol))
      .agg(min(col("__fts")).as("t0"))
    steps.tail.zipWithIndex.foldLeft(base) { case (acc, (stepType, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val evs = slice(stepType).select(col("__fk").as("__k"), col("__fts").as("__ts"))
      val carried = acc.columns.toIndexedSeq
      acc.join(evs,
          acc(s"`$keyCol`") === col("__k") &&
            col("__ts") > acc(prev) && col("__ts") <= acc(prev) + window,
          "left")
        .groupBy(carried.map(c => acc(s"`$c`")): _*)
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
