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
    *
    * `gap` > 0 turns the merge EPISODE-grained (episodes-of-care
    * construction): intervals whose gap to the running island reach is
    * ≤ `gap` still coalesce — e.g. encounters under a week apart form
    * one care episode. `mend` stays the true covered reach (no gap
    * padding), so coverage sums remain exact.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, gap: Long = 0L): DataFrame = {
    require(gap >= 0, s"gap must be non-negative: $gap")
    val w = Window.partitionBy(col("__ik")).orderBy(col("__is"), col("__ie"))
    base(df, keyCol, startCol, endCol)
      // running max end over STRICTLY preceding rows: null on the
      // key's first row, else the farthest reach of earlier intervals
      .withColumn("__pmax",
        max(col("__ie")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__is") > col("__pmax") + lit(gap), 1L)
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

  /** Readmission profile over merged episodes — the 30-day-readmission
    * shape: intervals are first coalesced into episodes
    * ([[mergeIntervals]] with `gap` — transfers/continuations under
    * `gap` apart are ONE stay, the standard index-admission rule), then
    * each episode with a successor is an INDEX case, readmitted iff
    * `next_start − end ≤ within`. Per key: episode count, index count,
    * readmission count and the minimum gap between consecutive
    * episodes (all exact int64; a trailing episode with no successor
    * is never an index case — it is still at risk, the standard
    * right-edge convention).
    *
    * Scale shape: the merge's one key shuffle, then a lead() window
    * over the (already episode-grained, hence small) island rows in
    * the SAME partitioning — Spark reuses the exchange; no second
    * shuffle, no self-join.
    */
  def readmissions(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, within: Long, gap: Long = 0L): DataFrame = {
    require(within >= 0, s"within must be non-negative: $within")
    val w = Window.partitionBy(col(s"`$keyCol`")).orderBy(col("island"))
    mergeIntervals(df, keyCol, startCol, endCol, gap)
      .withColumn("__nxt", lead(col("mstart"), 1).over(w))
      .groupBy(col(s"`$keyCol`"))
      .agg(
        count(lit(1)).as("n_episodes"),
        sum(when(col("__nxt").isNotNull, 1L).otherwise(0L)).as("n_index"),
        sum(when(col("__nxt").isNotNull &&
          col("__nxt") - col("mend") <= within, 1L).otherwise(0L))
          .as("n_readmit"),
        min(col("__nxt") - col("mend")).as("min_gap"))
  }

  /** Incidence rate over exposure person-time — events per unit of
    * covered time, the epidemiological denominator done right: the
    * denominator is the MERGED exposure coverage (double-counting
    * overlapping spans inflates person-time and deflates the rate),
    * and an event counts toward the numerator only if it falls inside
    * a covered `[mstart, mend)` span. Coverage membership is decided
    * by the same sweep-line as [[intervalCensus]] — island ends sort
    * before island starts before events at equal instants, so an event
    * AT an island start is in, AT an island end is out (half-open),
    * with no interval×event join anywhere. Output per key: exact
    * `person_time`, `n_islands`, `n_events` (all of the key's events),
    * `n_in_exposure`, and `rate_scaled = n_in_exposure·scale DIV
    * person_time` (events per `scale` time units, exact floor
    * division; null for zero person-time). Keys with events but no
    * exposure are OUT by definition — the rate is a statement about
    * the exposed cohort.
    *
    * Scale shape: one key shuffle for the merge, one for the
    * delta∪event sweep, one broadcast-class join of two per-key 1-row
    * aggregates. Never an equi-join of events onto islands (that
    * duplicates each event by its key's island count).
    */
  def incidenceRate(intervals: DataFrame, events: DataFrame,
      keyCol: String, startCol: String, endCol: String,
      eventKeyCol: String, eventTimeCol: String,
      scale: Long = 1000L): DataFrame = {
    require(scale > 0, s"scale must be positive: $scale")
    val isl = mergeIntervals(intervals, keyCol, startCol, endCol)
    val personTime = isl.groupBy(col(s"`$keyCol`").as("__ik"))
      .agg(sum(col("mend") - col("mstart")).as("person_time"),
        count(lit(1)).as("n_islands"))
    val ek = col(s"`$eventKeyCol`")
    val et = col(s"`$eventTimeCol`").cast("long")
    // ord 0: island end (coverage drops BEFORE an event at mend),
    // ord 1: island start (coverage holds FOR an event at mstart),
    // ord 2: the event itself
    val deltas =
      isl.select(col(s"`$keyCol`").as("__ik"), col("mend").as("__t"),
          lit(0).as("__o"), lit(-1L).as("__d"))
        .union(isl.select(col(s"`$keyCol`").as("__ik"),
          col("mstart").as("__t"), lit(1).as("__o"), lit(1L).as("__d")))
        .union(events.filter(ek.isNotNull && et.isNotNull)
          .select(ek.as("__ik"), et.as("__t"), lit(2).as("__o"),
            lit(0L).as("__d")))
    val w = Window.partitionBy(col("__ik")).orderBy(col("__t"), col("__o"))
    val counts = deltas
      .withColumn("__run",
        sum(col("__d")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("__o") === 2)
      .groupBy(col("__ik"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__run") > 0L, 1L).otherwise(0L)).as("n_in_exposure"))
    personTime.join(counts, Seq("__ik"), "left")
      .select(
        col("__ik").as(keyCol),
        col("person_time"), col("n_islands"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_in_exposure"), lit(0L)).as("n_in_exposure"))
      .withColumn("rate_scaled",
        when(col("person_time") > 0L,
          expr(s"n_in_exposure * ${scale}L DIV person_time")))
  }

  /** Concurrent-class overlap pairs — the drug–drug-interaction /
    * co-exposure shape: for every unordered pair of DISTINCT classes
    * (med classes, device types) co-active on the same key, the exact
    * co-exposure mass. Each (key, class)'s spans are first coalesced
    * (the [[mergeIntervals]] island pass — duplicated or split
    * prescriptions must not double-count co-exposure), then islands of
    * different classes meet in a KEY-EQUI self-join restricted to
    * `class_a < class_b`, overlap measured half-open:
    * {{{ ov = min(e_a, e_b) − max(s_a, s_b)   // counted iff > 0 }}}
    * Output per (class_a, class_b): `n_keys` (distinct keys with any
    * positive overlap), `n_overlaps` (island pairs), `overlap_total`
    * (exact summed grid units). Touching islands ([1,2) vs [2,3)) do
    * NOT overlap — half-open is preserved end-to-end.
    *
    * Scale shape: one key shuffle for the island pass; the self-join
    * is keyed on the SAME key (no cross-key pairs ever form), so its
    * fanout per key is `islands_A·islands_B` per class pair — bounded
    * by per-entity class diversity, not corpus size. The island frame
    * is persisted (r20): it feeds both join sides, and unpersisted the
    * whole distinct + two-window + aggregate subtree executed once per
    * side (the in-row `transform`-pairs alternative measured SLOWER —
    * higher-order-function lambdas evaluate interpreted, and this
    * pair space is pairs-volume-bound, not shuffle-bound).
    * `maxIslandsPerKey` fails fast (plan-embedded raise_error, the
    * cooccurrenceLift pattern) when one key's island count says the
    * fanout would degenerate (a sentinel id absorbing a feed).
    */
  def concurrentPairs(df: DataFrame, keyCol: String, classCol: String,
      startCol: String, endCol: String,
      maxIslandsPerKey: Long = 10000L): DataFrame = {
    require(maxIslandsPerKey > 0,
      s"maxIslandsPerKey must be positive: $maxIslandsPerKey")
    val k = col(s"`$keyCol`")
    val c = col(s"`$classCol`").cast("string")
    val s0 = col(s"`$startCol`").cast("long")
    val e0 = col(s"`$endCol`").cast("long")
    // distinct FIRST: duplicate (key, class, s, e) spans are redundant
    // for co-exposure, and removing them makes the island window's
    // (start, end) order TOTAL per partition — without this, engines
    // that sort each window function independently (DuckDB) can give
    // the two ROWS-framed passes inconsistent tie orders and split one
    // island in two. Also the usual pre-aggregation win: duplicates
    // never reach the window sort.
    val rows = df
      .filter(k.isNotNull && c.isNotNull && s0.isNotNull && e0.isNotNull &&
        e0 >= s0)
      .select(k.as("__ik"), c.as("__cl"), s0.as("__is"), e0.as("__ie"))
      .distinct()
    val w = Window.partitionBy(col("__ik"), col("__cl"))
      .orderBy(col("__is"), col("__ie"))
    val islands = rows
      .withColumn("__pmax",
        max(col("__ie")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__is") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__isl",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__ik"), col("__cl"), col("__isl"))
      .agg(min(col("__is")).as("__s"), max(col("__ie")).as("__e"))
      .withColumn("__nk",
        count(lit(1)).over(Window.partitionBy(col("__ik"))))
      .withColumn("__ik",
        when(col("__nk") > maxIslandsPerKey,
          raise_error(concat(
            lit("concurrentPairs: key "), col("__ik").cast("string"),
            lit(" has "), col("__nk").cast("string"),
            lit(s" islands > maxIslandsPerKey=$maxIslandsPerKey — " +
              "degenerate entity?"))))
          .otherwise(col("__ik")))
      .drop("__nk")
      // persisted (r20): feeds both self-join sides — see the scaladoc
      .transform(graft.CachedFrames.cached)
    val a = islands.select(col("__ik"), col("__cl").as("class_a"),
      col("__s").as("__sa"), col("__e").as("__ea"))
    val b = islands.select(col("__ik"), col("__cl").as("class_b"),
      col("__s").as("__sb"), col("__e").as("__eb"))
    a.join(b, Seq("__ik"))
      .filter(col("class_a") < col("class_b"))
      .withColumn("__ov",
        least(col("__ea"), col("__eb")) - greatest(col("__sa"), col("__sb")))
      .filter(col("__ov") > 0L)
      .groupBy(col("class_a"), col("class_b"))
      .agg(
        countDistinct(col("__ik")).as("n_keys"),
        count(lit(1)).as("n_overlaps"),
        sum(col("__ov")).as("overlap_total"))
  }
}
