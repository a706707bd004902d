package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series utilities: sparse event streams → dense per-key grids.
  * Everything is integral bucket arithmetic (int64 DIV) — no timestamp
  * types cross an engine boundary, so results are exactly reproducible.
  */
object TimeSeries {

  /** The (key, bucket) floor-division bucket expression shared by every
    * resampler: exact int64, no double round-trip.
    */
  private def bucketExpr(tsCol: String, bucketWidth: Long) =
    expr(s"(`$tsCol` - pmod(`$tsCol`, ${bucketWidth}L)) DIV ${bucketWidth}L")

  /** Per-key total span (whole-partition min/max windows over the
    * COMPACT observed-bucket rows — rides the by-key exchange the
    * ordered windows already need). Feeds [[gapRunColumn]]'s fail-fast.
    */
  private def spanColumn(keyCol: String): Column = {
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$keyCol`"))
    max(col("bucket")).over(wAll) - min(col("bucket")).over(wAll) + lit(1L)
  }

  /** Each observed bucket's half-open gap run [bucket, __next) as an
    * `explode(sequence)`, wrapped in the per-key total-span fail-fast —
    * the same trigger condition (key span > cap) and message as the
    * historical two-aggregation shape. (A window function cannot live
    * inside a generator, so the span arrives as the materialized
    * `__span` column.)
    */
  private def gapRunColumn(keyCol: String, maxBucketsPerKey: Long): Column =
    explode(when(col("__span") > maxBucketsPerKey,
      raise_error(concat(
        lit(s"denseCounts: key "), col(s"`$keyCol`").cast("string"),
        lit(s" spans "), col("__span").cast("string"),
        lit(s" buckets > maxBucketsPerKey=$maxBucketsPerKey — corrupt/sentinel timestamp?"))))
      .otherwise(sequence(col("bucket"),
        coalesce(col("__next") - lit(1L), col("bucket")))))

  /** Dense per-key bucket counts: one row per (key, bucket) for EVERY
    * bucket in [min observed, max observed] of that key, with
    * `n_events = 0` where nothing happened — the gap-fill step charts
    * and window models need before a sparse stream is usable.
    * `tsCol` must be an integral epoch column; `bucket` is FLOOR
    * division (`(ts − pmod(ts, w)) DIV w` — exact int64, no double
    * round-trip): truncating DIV would give a double-width bucket 0
    * straddling the epoch and mis-bucket any negative/sentinel
    * timestamp relative to a floor-division oracle.
    *
    * Scale shape (r19 optimization round — guide §2.4 shuffle removal):
    * one groupBy down to (key, bucket) partial counts — map-side combine
    * absorbs the raw event volume — then gap-fill with NO second
    * aggregation and NO join-back: one window pass over the compact
    * observed-bucket rows (`lead` finds each bucket's next observed
    * bucket) and an `explode(sequence)` emits the half-open gap run
    * [bucket, next) per row. The historical shape (groupBy(key) min/max
    * → explode → left join back on (key, bucket)) cost two extra
    * Exchanges plus a grid-sized sort-merge join; this one reaches the
    * same grid with a single by-key exchange of compact rows (measured
    * on the sf0.1 events gates: see OPTIMIZATION_r19.md). Grid size is
    * still Σ per-key spans, not keys × global span. Null
    * keys/timestamps are excluded (they have no place on a grid). A
    * single corrupt timestamp (epoch-0 sentinel next to 2026 data)
    * would explode one key's span into a multi-GB row or hit Spark's
    * sequence cap with a cryptic error — `maxBucketsPerKey` fails fast
    * and names the key instead (same per-key total-span trigger as
    * always, from whole-partition min/max windows riding the same
    * exchange).
    */
  def denseCounts(
      df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long, maxBucketsPerKey: Long = 10000000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxBucketsPerKey > 0, s"maxBucketsPerKey must be positive: $maxBucketsPerKey")
    val key = col(s"`$keyCol`")
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("bucket"))
    df.filter(key.isNotNull && col(s"`$tsCol`").isNotNull)
      .groupBy(key.as(keyCol), bucketExpr(tsCol, bucketWidth).as("bucket"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("__next", lead(col("bucket"), 1).over(wk))
      .withColumn("__span", spanColumn(keyCol))
      .withColumn("__g", gapRunColumn(keyCol, maxBucketsPerKey))
      .select(col(s"`$keyCol`"), col("__g").as("bucket"),
        when(col("__g") === col("bucket"), col("n_events"))
          .otherwise(lit(0L)).as("n_events"))
  }

  /** Dense per-key grid with the VALUE carried forward — LOCF
    * (last-observation-carried-forward) resampling, the canonical EHR
    * vital-signs shape ("the patient's last known heart rate in every
    * hour"): [[denseCounts]]'s guarded dense grid, plus per bucket the
    * last non-null observation (latest `(tsCol, tiebreak)` wins —
    * supply a unique tiebreak or equal-timestamp picks are
    * nondeterministic) carried across gap buckets. Output per
    * (key, bucket): `n_events`, `value` (null until the key's first
    * observation), `is_observed` (this bucket has ≥1 non-null
    * observation). Null observations are not observations: they neither
    * set `value` nor `is_observed`, and the carry skips them.
    *
    * Scale shape (r19 optimization round — guide §2.4): the per-bucket
    * struct-max rides the SAME single (key, bucket) aggregation as the
    * count (map-side combined — the raw event volume never reaches the
    * shuffle), and the carry window runs over the COMPACT observed
    * rows BEFORE the gap-run explode, so the dense grid is produced in
    * its final form with no join and no grid-sized window buffer. The
    * historical shape (denseCounts grid + a second groupBy + a
    * (key, bucket) join + a grid-length running window) cost three
    * more Exchanges and two grid-sized sorts for the identical output.
    * maxBucketsPerKey fail-fast inherited.
    */
  def resampleLocf(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketWidth: Long, tiebreak: Seq[Column],
      maxBucketsPerKey: Long = 10000000L): DataFrame = {
    require(tiebreak.nonEmpty,
      "tiebreak columns required: equal-timestamp observations would " +
        "otherwise resolve nondeterministically")
    val key = col(s"`$keyCol`")
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("bucket"))
    val wRun = wk
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.filter(key.isNotNull && col(s"`$tsCol`").isNotNull)
      .groupBy(key.as(keyCol), bucketExpr(tsCol, bucketWidth).as("bucket"))
      // struct max: field-wise (ts, tiebreak..., value) ordering picks the
      // bucket's latest NON-NULL observation (null values are not
      // observations — max ignores the null struct) in one map-side-
      // combinable aggregate — no per-bucket row_number shuffle
      .agg(count(lit(1)).as("n_events"),
        max(when(col(s"`$valueCol`").isNotNull,
          struct(col(s"`$tsCol`") +: tiebreak :+ col(s"`$valueCol`").as("__v"): _*)))
          .as("__last"))
      .select(col(s"`$keyCol`"), col("bucket"), col("n_events"),
        col("__last.__v").as("__bv"))
      .withColumn("__next", lead(col("bucket"), 1).over(wk))
      // carried value per observed bucket: every gap bucket up to the
      // next observation inherits it unchanged (there is nothing in
      // between to reset it)
      .withColumn("__carry", last(col("__bv"), ignoreNulls = true).over(wRun))
      .withColumn("__span", spanColumn(keyCol))
      .withColumn("__g", gapRunColumn(keyCol, maxBucketsPerKey))
      .select(col(s"`$keyCol`"), col("__g").as("bucket"),
        when(col("__g") === col("bucket"), col("n_events"))
          .otherwise(lit(0L)).as("n_events"),
        (col("__g") === col("bucket") && col("__bv").isNotNull).as("is_observed"),
        col("__carry").as("value"))
  }

  /** Dense per-key grid with LINEAR interpolation between observations —
    * the value-resampling companion to [[resampleLocf]] (EHR vitals:
    * "estimate the patient's heart rate at every hour boundary, blending
    * the surrounding readings"). Per (key, bucket):
    *  - an OBSERVED bucket (≥1 non-null observation) keeps its last
    *    observation's value (latest `(tsCol, tiebreak)` wins — same
    *    deterministic anchor as LOCF);
    *  - a gap bucket BETWEEN two observations gets the straight-line
    *    blend of the previous/next observations evaluated at the bucket
    *    START time `bucket * bucketWidth`:
    *    `v_p + (v_n − v_p) · (t_b − t_p) / (t_n − t_p)`;
    *  - buckets before the key's first / after its last observation stay
    *    null (no extrapolation — an estimate with one anchor is a guess,
    *    and LOCF already covers the carry-forward contract).
    *
    * Scale shape (r19 optimization round — guide §2.4): identical to
    * [[resampleLocf]] plus ONE more window pass over the compact
    * observed rows (the next-anchor carry) — raw events still never
    * reach a shuffle (per-bucket struct-max rides the single
    * map-side-combined aggregation), both anchors are resolved BEFORE
    * the gap-run explode (they are constant across a gap run), and the
    * blend is pure double arithmetic inside whole-stage codegen over
    * the emitted grid. No joins, no grid-sized window buffers; grid
    * fail-fast bounded by `maxBucketsPerKey`.
    */
  def resampleInterp(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketWidth: Long, tiebreak: Seq[Column],
      maxBucketsPerKey: Long = 10000000L): DataFrame = {
    require(tiebreak.nonEmpty,
      "tiebreak columns required: equal-timestamp observations would " +
        "otherwise resolve nondeterministically")
    val key = col(s"`$keyCol`")
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("bucket"))
    val wPrev = wk
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // next-observation carry as a RUNNING frame over the REVERSED bucket
    // order: a [current, unboundedFollowing] frame looks symmetric but
    // Spark's UnboundedFollowingWindowFunctionFrame re-aggregates the
    // frame from scratch per row — O(buckets²) per key (measured 17×
    // slower in the historical grid shape). Descending order + the
    // incremental [unboundedPreceding, -1] frame is the O(n) form; the
    // -1 bound excludes the current row, so an observed-but-all-null
    // bucket blends toward the anchor strictly AFTER it — exactly what
    // the whole-grid carry resolved to (its own anchor is null there).
    val wNext = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val anchor = when(col("__bv").isNotNull, struct(col("__ot"), col("__bv")))
    val p = col("__p"); val n = col("__n")
    df.filter(key.isNotNull && col(s"`$tsCol`").isNotNull)
      .groupBy(key.as(keyCol), bucketExpr(tsCol, bucketWidth).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col(s"`$valueCol`").isNotNull,
          struct(col(s"`$tsCol`").as("__ot") +: tiebreak :+
            col(s"`$valueCol`").as("__v"): _*))).as("__last"))
      .select(col(s"`$keyCol`"), col("bucket"), col("n_events"),
        col("__last.__ot").as("__ot"), col("__last.__v").as("__bv"))
      .withColumn("__next", lead(col("bucket"), 1).over(wk))
      .withColumn("__p", last(anchor, ignoreNulls = true).over(wPrev))
      // strictly-after anchor: correct for every row that CONSULTS it —
      // gap rows (their in-between anchors don't exist) and observed-but-
      // all-null buckets (their own anchor is null, so "nearest ≥ here"
      // IS "nearest after here"); observed non-null buckets never read it
      .withColumn("__n", last(anchor, ignoreNulls = true).over(wNext))
      .withColumn("__span", spanColumn(keyCol))
      .withColumn("__g", gapRunColumn(keyCol, maxBucketsPerKey))
      .select(col(s"`$keyCol`"), col("__g").as("bucket"),
        when(col("__g") === col("bucket"), col("n_events"))
          .otherwise(lit(0L)).as("n_events"),
        (col("__g") === col("bucket") && col("__bv").isNotNull).as("is_observed"),
        when(col("__g") === col("bucket") && col("__bv").isNotNull, col("__bv"))
          .otherwise(when(p.isNotNull && n.isNotNull,
            p.getField("__bv") +
              (n.getField("__bv") - p.getField("__bv")) *
                ((col("__g") * lit(bucketWidth) - p.getField("__ot")).cast("double") /
                  (n.getField("__ot") - p.getField("__ot")).cast("double"))))
          .as("value"))
  }

  /** [[denseCounts]] plus a gap flag and a carried-forward "last active
    * bucket" per row — the usual inputs to staleness/liveness features.
    */
  def denseCountsWithStaleness(
      df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long, maxBucketsPerKey: Long = 10000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$keyCol`")).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    denseCounts(df, keyCol, tsCol, bucketWidth, maxBucketsPerKey)
      .withColumn("is_gap", (col("n_events") === 0L))
      .withColumn("last_active_bucket",
        max(when(col("n_events") > 0L, col("bucket"))).over(w))
  }

  /** SCD Type-2 historization: collapse a per-key change log into
    * validity intervals — one row per (key, attribute-state) RUN, with
    * `valid_from` (first order value of the run), `valid_to` (start of
    * the next run, null while current) and an `is_current` flag. The
    * standard dimension-table materialization every warehouse keeps for
    * "what did this row look like on date X" queries; half-open
    * intervals `[valid_from, valid_to)` chain with no gaps or overlaps
    * by construction.
    *
    * Change detection is null-safe (`<=>` per attribute) and the FIRST
    * row of every key always opens a run. `orderCols` must totally order
    * rows within a key (include a unique tiebreaker — equal-timestamp
    * updates would otherwise make run boundaries nondeterministic).
    *
    * Scale shape: both windows (change-flag lag and valid_to lead) share
    * one partitioning over `keyCols` — a single hash shuffle, one sort,
    * two window passes over it; nothing global, nothing driver-side.
    * Skewed keys are bounded by per-key history length, not corpus size.
    */
  def scd2(df: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    require(orderCols.nonEmpty, "scd2 needs at least one order column")
    val key = keyCols.map(c => col(s"`$c`"))
    val ord = orderCols.map(c => col(s"`$c`"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key: _*).orderBy(ord: _*)
    val changed = attrCols
      .map(a => !(col(s"`$a`") <=> lag(col(s"`$a`"), 1).over(w)))
      .reduce(_ || _) || col("__rn") === 1L
    // __rn carries the ORIGINAL within-key order through the run filter,
    // so the valid_to lead chains runs exactly as the change log ordered
    // them (re-sorting kept rows by valid_from alone would be ambiguous
    // under equal timestamps)
    val runs = df
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .select((keyCols ++ attrCols).map(c => col(s"`$c`"))
        :+ ord.head.as("valid_from") :+ col("__rn"): _*)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(key: _*).orderBy(col("__rn"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .withColumn("version", row_number().over(wRun).cast("long"))
      .drop("__rn")
  }

  /** Latest-value pivot: the long (entity, attribute, ts, value) shape
    * folded into one wide row per entity with each attribute's most
    * recent value — the "current vitals" table every EHR feature store
    * materializes (patient × {HbA1c, SBP, BMI…} from the observation
    * stream), and the feature-vector shape model training joins
    * against. Attributes are an EXPLICIT list: the output schema must
    * be data-independent (a schema that grows when a new attribute
    * appears upstream breaks every downstream consumer), and the list
    * keeps Spark's pivot from running its distinct-scan job.
    *
    * Latest = max (ts, tiebreak) struct per (entity, attribute) — one
    * map-side-combinable aggregate, no window sort over the raw
    * stream; `tiebreakCol` (a unique event id) makes equal-timestamp
    * winners deterministic. Entities appear if they have ANY listed
    * attribute; unobserved attributes are null.
    */
  def pivotLatest(
      df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
      valueCol: String, attrs: Seq[String], tiebreakCol: String): DataFrame = {
    require(attrs.nonEmpty, "attrs must list at least one attribute")
    val k = col(s"`$keyCol`")
    val a = col(s"`$attrCol`")
    val ts = col(s"`$tsCol`")
    val pivoted = df
      .filter(k.isNotNull && ts.isNotNull && a.isin(attrs.map(x => x: Any): _*))
      .groupBy(k.as(keyCol))
      .pivot(attrCol, attrs)
      .agg(max(struct(ts, col(s"`$tiebreakCol`"),
        col(s"`$valueCol`").as("__v"))))
    attrs.foldLeft(pivoted) { (acc, at) =>
      acc.withColumn(s"${at}_value", col(s"`$at`").getField("__v"))
        .drop(at)
    }
  }

  /** Cohort retention matrix: users bucketed by their FIRST-seen period
    * (the cohort), then counted in every later period they were active
    * in — the (cohort, offset) triangle behind every retention chart,
    * and, read clinically, treatment-cohort follow-up attendance. All
    * arithmetic is int64 (the [[denseCounts]] floor-division bucket),
    * plus one rounded division for the retention rate against the
    * cohort's offset-0 size (offset 0 contains every cohort member by
    * construction, so the denominator is never missing).
    *
    * Scale shape: activity dedups to distinct (key, bucket) first —
    * one shuffle by (key, bucket) — then the per-key first bucket is a
    * map-side-combinable min re-using the key grouping, a
    * co-partitioned join back, and a groupBy over (cohort, offset)
    * whose cardinality is the triangle size (periods²/2), not the
    * event count. The rate lookup is a window over the tiny triangle,
    * partitioned by cohort.
    */
  def cohortRetention(
      df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val k = col(s"`$keyCol`")
    val ts = col(s"`$tsCol`")
    val kb = df.filter(k.isNotNull && ts.isNotNull)
      .select(k.as("__k"),
        expr(s"(`$tsCol` - pmod(`$tsCol`, ${bucketWidth}L)) DIV ${bucketWidth}L")
          .as("__bucket"))
      .distinct()
      .transform(graft.CachedFrames.cached)
    val cohorts = kb.groupBy(col("__k")).agg(min(col("__bucket")).as("cohort"))
    val active = kb.join(cohorts, Seq("__k"))
      .groupBy(col("cohort"), (col("__bucket") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
    val wCohort = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort"))
    active
      .withColumn("n_cohort",
        max(when(col("offset") === 0L, col("n_active"))).over(wCohort))
      .select(col("cohort"), col("offset"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort").cast("double"), 6)
          .as("retention"))
  }

  /** First-order transition matrix over per-key event sequences: for
    * every ordered pair of consecutive event types within a key, the
    * corpus-wide count and exact conditional probability
    * `p(to | from) = n(from→to) / n(from→·)` — the Markov chain of
    * behavior (product funnels read it as "what users do next"; care
    * pathways read it as encounter-type sequences). The text-side twin
    * is [[TextStats.ngramNextTable]]; here the sequence axis is
    * (key, time) and EVERY transition row is emitted, not just the
    * argmax. `tiebreakCol` (unique event id) makes equal-timestamp
    * ordering deterministic — unlike [[gapProfile]]'s gaps, the
    * transition MULTISET does change under tie reordering, so the
    * tiebreak is load-bearing here. Counts are int64-exact with one
    * rounded division.
    *
    * Scale shape: one exchange by key + in-partition sort for the lag,
    * then a map-side-combined groupBy over the (from, to) vocabulary
    * (types², not events) and one window by `from_type` over that tiny
    * frame for the denominator.
    */
  def transitionMatrix(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      tiebreakCol: String): DataFrame = {
    val k = col(s"`$keyCol`")
    val ts = col(s"`$tsCol`")
    val tp = col(s"`$typeCol`")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(k).orderBy(ts, col(s"`$tiebreakCol`"))
    val pairs = df.filter(k.isNotNull && ts.isNotNull && tp.isNotNull)
      .withColumn("__to", lead(tp, 1).over(w))
      // a null-typed event BREAKS the chain (filtered above), it does
      // not splice its neighbors together — lead() sees only kept rows,
      // which is the splice; acceptable for type-gap data, documented
      .filter(col("__to").isNotNull)
      .groupBy(tp.as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    pairs
      .withColumn("n_from", sum(col("n")).over(wFrom))
      .withColumn("p", round(col("n").cast("double") /
        col("n_from").cast("double"), 6))
  }

  /** Per-key inter-event gap profile: count, min, max, and exact
    * discrete median of the consecutive-timestamp differences — the
    * cadence fingerprint that separates heartbeat-regular feeds from
    * bursty humans (and the input to choosing [[denseCounts]] /
    * [[resampleLocf]] bucket widths: a grid finer than the median gap
    * is mostly fill). Keys with fewer than two timestamped events have
    * no gaps and are excluded.
    *
    * Everything is int64: `tsCol` must be the canonical integral epoch
    * column, and the median is the DISCRETE lower-middle order statistic
    * (rank `(n+1) DIV 2` of the sorted gaps) — an interpolated median
    * would average two int64s into an engine-noise double for nothing.
    * The gap MULTISET is tie-order-invariant (any ordering of equal
    * timestamps yields the same sorted sequence, hence the same
    * consecutive differences), so no tiebreak column is needed for
    * correctness.
    *
    * Scale shape: one shuffle by key feeding both window passes (lag by
    * ts, then rank by gap — same partitioning, two in-partition sorts)
    * and the final map-side-combinable groupBy(key). Per-key data never
    * leaves its partition after the first exchange; no global sort, no
    * percentile sketch.
    */
  def gapProfile(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val k = col(s"`$keyCol`")
    val ts = col(s"`$tsCol`")
    val wLag = org.apache.spark.sql.expressions.Window
      .partitionBy(k).orderBy(ts)
    val gaps = df.filter(k.isNotNull && ts.isNotNull)
      .withColumn("__gap", ts - lag(ts, 1).over(wLag))
      .filter(col("__gap").isNotNull)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(k).orderBy(col("__gap"))
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(k)
    gaps
      .withColumn("__rn", row_number().over(wRank).cast("long"))
      .withColumn("__n", count(lit(1)).over(wKey))
      .groupBy(k.as(keyCol))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("__gap")).as("min_gap"),
        max(col("__gap")).as("max_gap"),
        max(when(col("__rn") === expr("(__n + 1) DIV 2"), col("__gap")))
          .as("med_gap"))
  }

  /** Per-key autocorrelation of the event-count series at lags
    * `1..maxLag` — "is this feed periodic / self-similar at bucket
    * grain?" (daily-rhythm detection, feed-health monitoring). Counts
    * land on [[denseCounts]]'s GUARDED dense grid (missing buckets are
    * real zeros — skipping them would silently correlate non-adjacent
    * periods), then each lag's pairs `(x_t, x_{t+lag})` meet in one
    * (key, bucket)-equi join and Pearson runs on exact integer
    * moments:
    * {{{ r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²)) }}}
    * — sums in decimal(38,0) (counts² · buckets outgrow int64 on hot
    * feeds), ONE division + sqrt, null when either side of a lag's
    * pair set has zero variance. Output per (key, lag): `n_pairs`, `r`.
    *
    * Scale shape: the grid inherits [[denseCounts]]'s one key shuffle +
    * per-key fail-fast; the lag explode inflates the grid ×maxLag
    * BEFORE a (key, bucket)-keyed self-join (bucket-domain-sized per
    * key, never subject-cardinality); one map-side-combined groupBy
    * finishes.
    */
  /** Exponentially-weighted trailing mean (EWMA, decay ½ per bucket)
    * over the bucketed value series — EXACT, unlike every float-folded
    * EWMA: weights are powers of two truncated at `lags`, values are
    * grid-snapped cents, so the weighted numerator is a pure int64 sum
    * and each output row spends ONE division:
    * {{{ v_b     = Σ round(value·scale)           // per present bucket
    *     num_t   = Σ_{j<lags, t−j present} v_{t−j}·2^(lags−1−j)
    *     den_t   = Σ_{j<lags, t−j present} 2^(lags−1−j)
    *     ewma_t  = num_t / (den_t·scale)          // ONE division }}}
    * Gaps carry no phantom zeros — absent buckets drop out of BOTH
    * sums (renormalized truncation, the standard `adjust=True` pandas
    * semantics restricted to present observations). Null and NaN
    * values are excluded as malformed. Output one row per
    * OBSERVED (key, bucket): (key, bucket, n_lags, num, den, ewma).
    * Exactness bound: `|v_b|·2^lags·lags < 9.2e18` — cents per bucket
    * below ~4.5e15/2^lags.
    *
    * Scale shape: one map-side-combined groupBy to (key, bucket)
    * cells; the lag fan-out is a ×lags explode BEFORE a second
    * (key, bucket)-keyed combine; the present-bucket restriction is a
    * (key, bucket) equi-semi-join. Nothing row-sized after the first
    * aggregate; no windows, so no per-key serialization at all.
    */
  def ewmaSmooth(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketWidth: Long, lags: Int = 8,
      scale: Long = 100L): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be positive: $bucketWidth")
    require(lags >= 1 && lags <= 62, s"lags must be in [1, 62]: $lags")
    require(scale >= 1, s"scale must be positive: $scale")
    val k = col(s"`$keyCol`")
    val perB = df
      .filter(k.isNotNull && col(s"`$tsCol`").isNotNull &&
        col(s"`$valueCol`").isNotNull &&
        // NaN is malformed input, same policy as aucScore/quantileNormalize:
        // round(NaN·scale).cast(long) grids to 0 cents under non-ANSI casts,
        // silently corrupting the bucket sum
        !isnan(col(s"`$valueCol`").cast("double")))
      .select(k.as("key"),
        expr(s"`$tsCol` DIV ${bucketWidth}L").as("bucket"),
        round(col(s"`$valueCol`") * lit(scale.toDouble), 0).cast("long")
          .as("__v"))
      .groupBy(col("key"), col("bucket"))
      .agg(sum(col("__v")).as("__v"))
    val fan = perB
      .select(col("key"), col("bucket"), col("__v"),
        explode(sequence(lit(0), lit(lags - 1))).as("__j"))
      .select(col("key"), (col("bucket") + col("__j")).as("bucket"),
        expr(s"__v * shiftleft(1L, ${lags - 1} - __j)").as("__wv"),
        expr(s"shiftleft(1L, ${lags - 1} - __j)").as("__w"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("n_lags"), sum(col("__wv")).as("num"),
        sum(col("__w")).as("den"))
    // only OBSERVED buckets emit (the fan-out also lands on the silent
    // span after each observation; those targets are smoothing nothing)
    fan.join(perB.select(col("key"), col("bucket")), Seq("key", "bucket"))
      .select(col("key"), col("bucket"), col("n_lags"), col("num"),
        col("den"),
        round(col("num").cast("double") /
          (col("den").cast("double") * lit(scale.toDouble)), 6).as("ewma"))
  }

  def autocorrelation(df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long, maxLag: Int = 7,
      maxBucketsPerKey: Long = 10000000L): DataFrame = {
    require(maxLag >= 1, s"maxLag must be positive: $maxLag")
    val dense = denseCounts(df, keyCol, tsCol, bucketWidth, maxBucketsPerKey)
    val x = dense.select(col(s"`$keyCol`"), col("bucket"),
      col("n_events").as("__x"))
      .withColumn("lag", explode(sequence(lit(1L), lit(maxLag.toLong))))
      .withColumn("__tb", col("bucket") + col("lag"))
    val y = dense.select(col(s"`$keyCol`"), col("bucket").as("__tb"),
      col("n_events").as("__y"))
    x.join(y, Seq(keyCol, "__tb"))
      .groupBy(col(s"`$keyCol`"), col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("__x").cast("decimal(38,0)")).as("__sx"),
        sum(col("__y").cast("decimal(38,0)")).as("__sy"),
        sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__sxx"),
        sum(col("__y").cast("decimal(38,0)") * col("__y")).as("__syy"),
        sum(col("__x").cast("decimal(38,0)") * col("__y")).as("__sxy"))
      .select(col(s"`$keyCol`"), col("lag"), col("n_pairs"),
        when(col("n_pairs") > 1L, {
          val n = col("n_pairs").cast("decimal(38,0)")
          val num = (n * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double")
          val dx = (n * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double")
          val dy = (n * col("__syy") - col("__sy") * col("__sy"))
            .cast("double")
          when(dx > 0d && dy > 0d, round(num / sqrt(dx * dy), 6))
        }).as("r"))
  }

  /** CUSUM changepoint scan per key — "WHEN did this feed's rate
    * change?": over the [[denseCounts]] grid, the classic cumulative-
    * sum deviation from a constant-rate fit, exactly in integers. With
    * `n` buckets, total mass `T`, 1-based index `k` and prefix `P_k`:
    * {{{ stat_k = |n·P_k − k·T|      // exact (decimal(38,0) product)
    *     cusum  = stat_max / (n·T)   // ONE division, ∈ [0,1] }}}
    * The argmax bucket is the estimated changepoint (the level shift's
    * last pre-break bucket under the standard CUSUM argument); ties
    * break to the EARLIEST bucket, deterministically. `stat_num` emits
    * int64 under `n·T < 9.2e18` (1e7 buckets × 9e11 events — beyond
    * any real feed; the internal math is decimal regardless). `cusum`
    * null when T = 0 (an all-empty grid has no rate to break).
    *
    * Scale shape: the grid's one key shuffle; prefix + argmax are
    * windows over the SAME key partitioning (exchange reuse, no
    * self-join); one map-side-combined groupBy(key) finishes.
    */
  def cusumChangepoint(df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long,
      maxBucketsPerKey: Long = 10000000L): DataFrame = {
    val dense = denseCounts(df, keyCol, tsCol, bucketWidth, maxBucketsPerKey)
    val k = col(s"`$keyCol`")
    val Window = org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(k).orderBy(col("bucket"))
    val wKey = Window.partitionBy(k)
    dense
      .withColumn("__k", row_number().over(wOrd).cast("long"))
      .withColumn("__p",
        sum(col("n_events")).over(wOrd.rowsBetween(
          Window.unboundedPreceding, 0)))
      .withColumn("__n", count(lit(1)).over(wKey))
      .withColumn("__t", sum(col("n_events")).over(wKey))
      .withColumn("__stat",
        abs((col("__n").cast("decimal(38,0)") * col("__p") -
          col("__k").cast("decimal(38,0)") * col("__t"))))
      .withColumn("__best",
        max(struct(col("__stat"), (-col("bucket")).as("__nb"))).over(wKey))
      .filter(col("__stat") === col("__best.__stat") &&
        -col("bucket") === col("__best.__nb"))
      .select(
        k.as(keyCol),
        col("__n").as("n_buckets"),
        col("__t").as("total"),
        col("bucket").as("cp_bucket"),
        col("__k").as("cp_index"),
        col("__stat").cast("long").as("stat_num"),
        when(col("__t") > 0L,
          round(col("__stat").cast("double") /
            (col("__n").cast("double") * col("__t").cast("double")), 6))
          .as("cusum"))
  }

  /** Fixed-point scale of [[kaplanMeier]]'s survival estimate: 1e12, so
    * S=1 is exactly 10^12 and the per-step multiply `s·(n−d)` stays
    * inside int64 for any stratum with `n_at_risk < 9.2e6` (rescale S
    * down one decade per extra decade of cohort size at 100 TB).
    */
  val SurvivalScale = 1000000000000L

  /** Kaplan–Meier survival estimator per stratum — THE classic EHR
    * time-to-event analysis (time from diagnosis to outcome with
    * censored patients), in the engine's exact-arithmetic identity:
    * {{{ S(t_i) = Π_{j ≤ i} (n_j − d_j) / n_j }}}
    * computed as an int64 fixed-point recurrence
    * `s_i = (s_{i−1} · (n_i − d_i)) DIV n_i` (scale [[SurvivalScale]])
    * — a float cumulative product would be an order-dependent fold
    * whose windowed replay differs across engines (segment-tree vs
    * sequential summation); the integer recurrence is bit-exact on
    * both, so a DuckDB recursive CTE replays the whole curve. Input:
    * one row per subject with a duration and an observed/censored
    * flag; censored subjects leave the risk set at their duration
    * without an event (the standard right-censoring treatment — they
    * contribute a time point row with `d_events` possibly 0 and a
    * factor of 1).
    *
    * Output: one row per (stratum, distinct duration): `n_at_risk`
    * (subjects with duration ≥ t), `d_events`, `survival_fp` (the
    * fixed-point S(t)) and `survival` (S(t) as a rounded double for
    * reading — derived from the SAME int64 by one division, so it
    * cannot drift).
    *
    * Scale shape: subject rows collapse to per-(stratum, duration)
    * counts map-side; the risk set is a PARTITIONED running window
    * over those distinct-duration rows (bounded by distinct durations,
    * not subjects); the sequential product folds per stratum over the
    * same bounded rows in one `flatMapGroups` task per stratum — the
    * one genuinely order-dependent recurrence in the operator, run on
    * the smallest possible relation. Strata are cohort-grained by
    * design (the [[Curation.rankBuckets]] contract).
    */
  /** Fixed-point scale for [[logRank]]'s expectation/variance terms. */
  val LogRankScale = 1000000000L

  /** Two-group log-rank test (Mantel–Cox) — "do these two survival
    * curves differ?", the hypothesis test that accompanies
    * [[kaplanMeier]] in every EHR time-to-event study. At each pooled
    * event time: observed group-one events `d1`, expectation
    * `E1 = d·n1/n` under the null (events distribute by risk-set
    * share), hypergeometric variance
    * `V = d·n1·(n−n1)·(n−d) / (n²·(n−1))`; the statistic is
    * `χ² = (ΣO1 − ΣE1)² / ΣV` (1 df). Everything up to the FINAL
    * division is exact: E1 and V are int64 fixed-point (scale
    * [[LogRankScale]]; V's 5-factor numerator runs in decimal(38,0) —
    * the [[graft.ops.GraphOps.pageRank]] precedent — because it
    * overflows int64 past ~3e3 at-risk), and their SUMS are
    * order-independent integer folds, so both engines reach χ² from
    * the same two integers with one double division each.
    *
    * Output: ONE row — (n_event_times, o1, e1_fp, v_fp, chi2); χ²
    * null when ΣV = 0 (a degenerate single-arm comparison has no
    * sampling variance to test against).
    *
    * Scale shape: subject rows collapse map-side to distinct-duration
    * counts; the at-risk prefix is a window over those bounded rows
    * (unpartitioned BY DESIGN — its input is the distinct pooled event
    * times, not subjects; stratified variants partition it); the
    * result is a 1-row aggregate with the totals frame broadcast.
    */
  def logRank(
      df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String, groupOne: String): DataFrame = {
    val g = col(s"`$groupCol`").cast("string")
    val base = df
      .filter(g.isNotNull && col(s"`$durationCol`").isNotNull &&
        col(s"`$observedCol`").isNotNull)
      .select(g.as("__g"),
        col(s"`$durationCol`").cast("long").as("__t"),
        col(s"`$observedCol`").cast("long").as("__obs"))
    val perT = base.groupBy(col("__t"))
      .agg(count(lit(1)).as("__m"),
        sum(col("__obs")).as("__d"),
        sum(when(col("__g") === groupOne, 1L).otherwise(0L)).as("__m1"),
        sum(when(col("__g") === groupOne, col("__obs")).otherwise(0L)).as("__d1"))
    val totals = base.agg(count(lit(1)).as("__n"),
      sum(when(col("__g") === groupOne, 1L).otherwise(0L)).as("__n1"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .orderBy(col("__t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val S = LogRankScale
    val atRisk = perT.crossJoin(broadcast(totals))
      .withColumn("__na", col("__n") - coalesce(sum(col("__m")).over(wPrev), lit(0L)))
      .withColumn("__n1a", col("__n1") - coalesce(sum(col("__m1")).over(wPrev), lit(0L)))
      .filter(col("__d") >= 1L)
      .withColumn("__e1",
        expr(s"(__d * __n1a * ${S}L) DIV __na"))
      .withColumn("__v",
        when(col("__na") <= 1L, lit(0L)).otherwise(
          expr(("CAST((CAST(__d AS DECIMAL(38,0)) * __n1a * (__na - __n1a)" +
            s" * (__na - __d) * ${S}L)" +
            " DIV (CAST(__na AS DECIMAL(38,0)) * __na * (__na - 1)) AS LONG)"))))
    atRisk.agg(
        count(lit(1)).as("n_event_times"),
        sum(col("__d1")).as("o1"),
        sum(col("__e1")).as("e1_fp"),
        sum(col("__v")).as("v_fp"))
      .withColumn("chi2", {
        // explicit square, not pow(x, 2): libm pow may differ across
        // engines at the last ulp; x·x is one IEEE multiply on both
        val diff = col("o1").cast("double") * S - col("e1_fp").cast("double")
        when(col("v_fp") > 0L,
          round(diff * diff / (lit(S.toDouble) * col("v_fp").cast("double")), 6))
      })
  }

  /** Competing-risks cumulative incidence (the one-sample
    * Aalen–Johansen estimator) per stratum: when two event types
    * compete (relapse vs death, purchase vs churn), 1−KM of either
    * cause alone OVERSTATES its risk — the correct cause-k incidence
    * at t is
    * {{{ CIF_k(t) = Σ_{tᵢ ≤ t} S(tᵢ₋₁) · d_{k,i} / nᵢ }}}
    * with S the ALL-cause survival. Same exactness contract as
    * [[kaplanMeier]]: S is the int64 fixed-point recurrence, each
    * increment is `(s_prev · d_k) DIV n` and the CIFs are integer
    * running sums — a DuckDB recursive CTE replays all three
    * accumulators bit-exactly. Subjects whose cause is neither
    * `causeA` nor `causeB` (null included) are right-censored.
    *
    * Output: one row per (stratum, distinct duration) with the risk
    * set, both cause event counts, both fixed-point CIFs and their
    * rounded-double readings. CIF_A + CIF_B + S ≤ SCALE (mass
    * conservation, modulo per-step floors).
    *
    * Scale shape: identical to [[kaplanMeier]] — map-side collapse to
    * distinct-duration rows, partitioned risk-set window, per-stratum
    * fold over the bounded rows.
    */
  def cumulativeIncidence(
      df: DataFrame, groupCol: String, durationCol: String,
      causeCol: String, causeA: String, causeB: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(causeA != causeB, "causes must differ")
    val g = col(s"`$groupCol`")
    val perT = df
      .filter(g.isNotNull && col(s"`$durationCol`").isNotNull)
      .select(g.cast("string").as("__g"),
        col(s"`$durationCol`").cast("long").as("duration"),
        col(s"`$causeCol`").cast("string").as("__c"))
      .groupBy(col("__g"), col("duration"))
      .agg(count(lit(1)).as("__m"),
        sum(when(col("__c") === causeA, 1L).otherwise(0L)).as("d_a"),
        sum(when(col("__c") === causeB, 1L).otherwise(0L)).as("d_b"))
    val totals = perT.groupBy(col("__g").as("__tg"))
      .agg(sum(col("__m")).as("__n"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("duration"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perT.join(totals, col("__g") === col("__tg")).drop("__tg")
      .withColumn("n_at_risk",
        col("__n") - coalesce(sum(col("__m")).over(wPrev), lit(0L)))
      .select(col("__g"), col("duration"), col("n_at_risk"),
        col("d_a"), col("d_b"))
      .as[(String, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (grp, rows) =>
        var s = SurvivalScale
        var cifA = 0L
        var cifB = 0L
        rows.toIndexedSeq.sortBy(_._2).iterator.map {
          case (_, t, n, da, db) =>
            cifA += s * da / n
            cifB += s * db / n
            s = s * (n - da - db) / n
            (grp, t, n, da, db, cifA, cifB)
        }
      }
      .toDF("__g", "duration", "n_at_risk", "d_a", "d_b",
        "cif_a_fp", "cif_b_fp")
      .withColumn("cif_a",
        round(col("cif_a_fp").cast("double") / SurvivalScale.toDouble, 6))
      .withColumn("cif_b",
        round(col("cif_b_fp").cast("double") / SurvivalScale.toDouble, 6))
      .withColumnRenamed("__g", groupCol)
  }

  /** Restricted mean survival time (RMST) per stratum — the area under
    * the [[kaplanMeier]] step curve up to horizon `tau`, the
    * model-free "average event-free time in the first τ hours" effect
    * measure clinicians quote when hazards aren't proportional. FULLY
    * exact: the curve is already int64 fixed-point, the step widths
    * are int64 durations, so the area is an integer sum —
    * {{{ rmst_fp = min(t₁,τ)·SCALE + Σ_{tᵢ<τ} sᵢ·(min(tᵢ₊₁,τ) − tᵢ) }}}
    * (the leading S=1 segment plus one rectangle per step; the last
    * step extends to τ). `rmst` = the same integer over SCALE, as a
    * rounded double in duration units. Bound: SCALE·τ per segment —
    * keep τ below ~9e6 duration units at the default scale.
    *
    * Scale shape: [[kaplanMeier]]'s profile plus one partitioned lead
    * window and a strata-sized aggregate.
    */
  def restrictedMeanSurvival(
      df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String, tau: Long): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    val km = kaplanMeier(df, groupCol, durationCol, observedCol)
    val wLead = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$groupCol`")).orderBy(col("duration"))
    km.withColumn("__nx",
        least(coalesce(lead(col("duration"), 1).over(wLead), lit(tau)), lit(tau)))
      .groupBy(col(s"`$groupCol`"))
      .agg(min(col("duration")).as("__tmin"),
        sum(when(col("duration") < tau,
          col("survival_fp") * (col("__nx") - col("duration")))
          .otherwise(0L)).as("__segs"))
      .select(col(s"`$groupCol`"),
        (least(col("__tmin"), lit(tau)) * SurvivalScale + col("__segs"))
          .as("rmst_fp"))
      .withColumn("rmst",
        round(col("rmst_fp").cast("double") / SurvivalScale.toDouble, 6))
  }

  def kaplanMeier(
      df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = col(s"`$groupCol`")
    val perT = df
      .filter(g.isNotNull && col(s"`$durationCol`").isNotNull &&
        col(s"`$observedCol`").isNotNull)
      .select(g.cast("string").as("__g"),
        col(s"`$durationCol`").cast("long").as("duration"),
        col(s"`$observedCol`").cast("long").as("__obs"))
      .groupBy(col("__g"), col("duration"))
      .agg(count(lit(1)).as("__m"), sum(col("__obs")).as("d_events"))
    val totals = perT.groupBy(col("__g").as("__tg"))
      .agg(sum(col("__m")).as("__n"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("duration"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perT.join(totals, col("__g") === col("__tg")).drop("__tg")
      .withColumn("n_at_risk",
        col("__n") - coalesce(sum(col("__m")).over(wPrev), lit(0L)))
      .select(col("__g"), col("duration"), col("n_at_risk"), col("d_events"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (grp, rows) =>
        var s = SurvivalScale
        rows.toIndexedSeq.sortBy(_._2).iterator.map {
          case (_, t, n, d) =>
            s = s * (n - d) / n // exact int64: s ≤ 1e12, n−d < 9.2e6
            (grp, t, n, d, s)
        }
      }
      .toDF("__g", "duration", "n_at_risk", "d_events", "survival_fp")
      .withColumn("survival",
        round(col("survival_fp").cast("double") / SurvivalScale.toDouble, 6))
      .withColumnRenamed("__g", groupCol)
  }

  /** Nelson–Aalen cumulative hazard per stratum — the ADDITIVE
    * companion to [[kaplanMeier]] (H(t) = Σ_{t_i ≤ t} d_i/n_i):
    * preferred when hazards are the modelling target (piecewise-
    * exponential fits, hazard-ratio eyeballing) and, being a plain
    * prefix sum, needs NO per-stratum fold — each step's increment is
    * an independent exact floor term:
    * {{{ inc_fp    = d·S DIV n_at_risk      // exact, ≤ S per step
    *     cumhaz_fp = Σ_{t' ≤ t} inc_fp      // exact int64 prefix
    *     cumhaz    = cumhaz_fp / S          // ONE division }}}
    * with S = [[SurvivalScale]]; per-step floor ≤ 1/S, and the prefix
    * sum replays as a window cumsum in any SQL engine (no recursion —
    * the reason this op has a simpler oracle than the KM product).
    * Risk sets and event counts use the same distinct-duration
    * machinery as [[kaplanMeier]]; output rows only at EVENT times
    * (d > 0), right-censoring handled by the shrinking risk set.
    * Exactness bound: `d·S < 9.2e18` per step inside decimal(38,0);
    * the emitted cumhaz_fp is int64 under `H·S < 9.2e18` — H < 9.2e6
    * cumulative hazard units, far past any survivable cohort.
    *
    * Scale shape: one (stratum, duration) groupBy, a stratum-keyed
    * totals join, and two windows in the SAME stratum partitioning
    * (exchange reuse) — bounded by distinct durations, never subjects.
    */
  def nelsonAalen(
      df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String): DataFrame = {
    val g = col(s"`$groupCol`")
    val perT = df
      .filter(g.isNotNull && col(s"`$durationCol`").isNotNull &&
        col(s"`$observedCol`").isNotNull)
      .select(g.cast("string").as("__g"),
        col(s"`$durationCol`").cast("long").as("duration"),
        col(s"`$observedCol`").cast("long").as("__obs"))
      .groupBy(col("__g"), col("duration"))
      .agg(count(lit(1)).as("__m"), sum(col("__obs")).as("d_events"))
    val totals = perT.groupBy(col("__g").as("__tg"))
      .agg(sum(col("__m")).as("__n"))
    val Window = org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy(col("__g")).orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("__g")).orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, 0)
    perT.join(totals, col("__g") === col("__tg")).drop("__tg")
      .withColumn("n_at_risk",
        col("__n") - coalesce(sum(col("__m")).over(wPrev), lit(0L)))
      .withColumn("__inc",
        expr(s"CAST(CAST(d_events AS DECIMAL(38,0)) * ${SurvivalScale}L " +
          "DIV n_at_risk AS LONG)"))
      .withColumn("cumhaz_fp", sum(col("__inc")).over(wCum))
      .filter(col("d_events") > 0L)
      .select(
        col("__g").as(groupCol), col("duration"), col("n_at_risk"),
        col("d_events"), col("cumhaz_fp"),
        round(col("cumhaz_fp").cast("double") / lit(SurvivalScale.toDouble), 6)
          .as("cumhaz"))
  }

  /** Actuarial life table per stratum — the interval-grouped survival
    * estimator (the demographer's form of [[kaplanMeier]]): durations
    * land in fixed-width intervals and each interval's conditional
    * death probability uses the standard actuarial half-censoring
    * adjustment (subjects censored WITHIN an interval count as exposed
    * for half of it):
    * {{{ q_i   = d_i / (n_i − c_i/2) = 2·d_i / (2·n_i − c_i)
    *     q_fp  = 2·d_i·S DIV (2·n_i − c_i)        // exact, ≤ S
    *     S_i   = S_{i−1}·(S − q_fp_i) DIV S       // exact product fold }}}
    * with S = [[SurvivalScale]]; the fold runs in BigInt (the product
    * is ~1e24, past int64 — the oracle's HUGEINT twin) and re-floors to
    * int64 each step. Only OCCUPIED intervals emit (an empty interval
    * has q = 0 and changes nothing). d = 0 intervals emit q_fp = 0
    * exactly — no division fires. Output per (stratum, interval):
    * (stratum, interval, t_start, n_enter, d_events, c_censored,
    * q_fp, survival_fp, survival).
    *
    * Scale shape: [[kaplanMeier]]'s exact machinery one level coarser —
    * the distinct-INTERVAL relation is smaller than the distinct-
    * duration one by construction, so every bound there holds with
    * more margin; the per-stratum fold serializes over occupied
    * intervals only.
    */
  def lifeTable(
      df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String, intervalWidth: Long): DataFrame = {
    require(intervalWidth >= 1, s"intervalWidth must be positive: $intervalWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val g = col(s"`$groupCol`")
    val perI = df
      .filter(g.isNotNull && col(s"`$durationCol`").isNotNull &&
        col(s"`$observedCol`").isNotNull)
      .select(g.cast("string").as("__g"),
        expr(s"CAST(`$durationCol` AS LONG) DIV ${intervalWidth}L")
          .as("interval"),
        col(s"`$observedCol`").cast("long").as("__obs"))
      .groupBy(col("__g"), col("interval"))
      .agg(count(lit(1)).as("__m"), sum(col("__obs")).as("d_events"))
    val totals = perI.groupBy(col("__g").as("__tg"))
      .agg(sum(col("__m")).as("__n"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("interval"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val S = SurvivalScale
    perI.join(totals, col("__g") === col("__tg")).drop("__tg")
      .withColumn("n_enter",
        col("__n") - coalesce(sum(col("__m")).over(wPrev), lit(0L)))
      .select(col("__g"), col("interval"), col("n_enter"),
        col("d_events"), (col("__m") - col("d_events")).as("c_censored"))
      .as[(String, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (grp, rows) =>
        var s = S
        rows.toIndexedSeq.sortBy(_._2).iterator.map {
          case (_, iv, n, d, c) =>
            val q = if (d == 0L) 0L
              else (BigInt(d) * 2 * S / (2 * n - c)).toLong
            s = (BigInt(s) * (S - q) / S).toLong
            (grp, iv, n, d, c, q, s)
        }
      }
      .toDF("__g", "interval", "n_enter", "d_events", "c_censored",
        "q_fp", "survival_fp")
      .withColumn("t_start", col("interval") * lit(intervalWidth))
      .withColumn("survival",
        round(col("survival_fp").cast("double") / S.toDouble, 6))
      .select(col("__g").as(groupCol), col("interval"), col("t_start"),
        col("n_enter"), col("d_events"), col("c_censored"), col("q_fp"),
        col("survival_fp"), col("survival"))
  }

  /** Survival quantiles per stratum — the headline numbers a clinician
    * reads off a [[kaplanMeier]] curve: median survival time and the
    * 25th/75th-percentile times, plus stratum size and event total.
    * The p-quantile is the standard step-curve reading `min{ t :
    * S(t) ≤ 1−p }` — q25 at S ≤ 0.75, median at S ≤ 0.5, q75 at
    * S ≤ 0.25 — null when the curve never falls that far (heavily
    * censored strata have no defined median; that NULL is the correct
    * clinical answer, not a missing value). Thresholds compare the
    * EXACT fixed-point `survival_fp` against exact int64 constants
    * ([[SurvivalScale]] is divisible by 4), so the quantile durations
    * inherit the KM recurrence's bit-exactness — no float S crosses a
    * boundary differently per engine.
    *
    * Scale shape: [[kaplanMeier]]'s cost plus one groupBy over the
    * distinct-duration curve rows (bounded by distinct durations, not
    * subjects). `n_subjects` is the risk set at the earliest duration
    * — max over the stratum, since risk sets only shrink.
    */
  def survivalQuantiles(
      df: DataFrame, groupCol: String, durationCol: String,
      observedCol: String): DataFrame = {
    val S = SurvivalScale
    kaplanMeier(df, groupCol, durationCol, observedCol)
      .groupBy(col(s"`$groupCol`"))
      .agg(
        max(col("n_at_risk")).as("n_subjects"),
        sum(col("d_events")).as("n_events"),
        min(when(col("survival_fp") <= lit(S / 4L * 3L), col("duration")))
          .as("q25"),
        min(when(col("survival_fp") <= lit(S / 2L), col("duration")))
          .as("median"),
        min(when(col("survival_fp") <= lit(S / 4L), col("duration")))
          .as("q75"))
  }
}
