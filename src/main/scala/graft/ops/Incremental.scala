package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators: keep corpus-scale aggregates and
  * snapshots current from deltas instead of full recomputes — at 100 TB
  * the difference between a nightly stats job that reads a day and one
  * that reads the lake.
  */
object Incremental {

  /** Mergeable per-group profile: count, sum, min, max of `valueCol` per
    * `groupCols`. Every aggregate is DECOMPOSABLE (merge = sum/sum/min/
    * max of partials), so profiles of disjoint slices combine into the
    * full-corpus profile via [[mergeProfiles]] with no rescan — and,
    * because count/min/max and DECIMAL/int64 sums are exact and
    * order-independent, the merged result is bit-identical to a direct
    * aggregation (the `incremental_agg` gate proves it against a
    * full-recompute oracle). Averages/variance stay DERIVED downstream
    * (sum/n) — storing them would break mergeability.
    */
  def groupProfile(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupProfile needs at least one group column")
    df.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(s"`$valueCol`")).as("sum_value"),
        min(col(s"`$valueCol`")).as("min_value"),
        max(col(s"`$valueCol`")).as("max_value"))
  }

  /** Merge two [[groupProfile]] frames (e.g. yesterday's profile + the
    * delta slice's profile) into the profile of the union. One shuffle
    * over the profile rows (groups-sized, not data-sized).
    */
  def mergeProfiles(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_value")).as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** Mergeable per-group DISTINCT-count sketches (Apache DataSketches
    * HLL via Spark's `hll_sketch_agg`) — the piece exact profiles can't
    * give you: `countDistinct` partials don't merge (distinct of a union
    * ≠ sum of distincts), so an incremental pipeline either reships full
    * key sets or sketches. An HLL register array is a few KB per group
    * whatever the cardinality, its union is register-wise max (exact,
    * order-independent — merged slices give the SAME sketch state as a
    * direct pass), and the estimate is deterministic for deterministic
    * input sets. Default `lgK = 14` → ~0.8% standard relative error;
    * raise it for tighter bounds at 4 KB × 2^Δ per group.
    *
    * Contract mirror of [[groupProfile]]/[[mergeProfiles]]: sketch the
    * slices, [[mergeDistinctSketches]] them group-wise, read estimates
    * with [[estimateDistinct]] — no rescan of history, ever.
    */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 14): DataFrame = {
    require(groupCols.nonEmpty, "distinctSketch needs at least one group column")
    df.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(hll_sketch_agg(col(s"`$valueCol`"), lit(lgK)).as("distinct_sketch"))
  }

  /** Merge two [[distinctSketch]] frames into the sketch of the union —
    * groups-sized shuffle, register-wise-max union semantics.
    */
  def mergeDistinctSketches(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(hll_union_agg(col("distinct_sketch"), lit(true)).as("distinct_sketch"))

  /** Read the distinct-count estimate off a sketch frame. */
  def estimateDistinct(df: DataFrame): DataFrame =
    df.withColumn("n_distinct_est", hll_sketch_estimate(col("distinct_sketch")))

  /** CDC upsert (last-write-wins apply): the new state of `base` after
    * applying `delta` keyed by `keyCols` — delta rows replace same-key
    * base rows, brand-new keys append, untouched base rows pass through.
    * The standard snapshot-maintenance merge of an incremental lake
    * (MERGE INTO semantics, expressed as delta ∪ (base ⟵anti-join⟶
    * delta) — one shuffled anti-join on the key, no full rewrite logic).
    * Delta must be key-unique (enforce upstream with dedupKeepFirst);
    * null-keyed rows are passed through from base and rejected from
    * delta (no identity → nothing to replace).
    */
  def applyUpsert(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "applyUpsert needs at least one key column")
    val keyNotNull = keyCols.map(c => col(s"`$c`").isNotNull).reduce(_ && _)
    val anyKeyNull = keyCols.map(c => col(s"`$c`").isNull).reduce(_ || _)
    delta.filter(keyNotNull)
      .unionByName(
        base.filter(anyKeyNull).unionByName(
          base.filter(keyNotNull)
            .join(delta.filter(keyNotNull), keyCols, "left_anti")))
  }
}
