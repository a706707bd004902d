package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation statistics over scored/labelled frames — the
  * readouts a team runs after [[graft.ops.TextStats.classifierScore]]
  * (or any risk model) produces a score column: discrimination (ROC
  * AUC via exact midranks), calibration (fixed-width reliability
  * bins), inter-rater agreement (Cohen's κ) and rank correlation
  * (Spearman ρ on exact midranks).
  *
  * Every operator follows the engine's exact fixed-point contract
  * (the [[graft.ops.Profiling.rankSumTest]] family): values snap to an
  * integer grid first, every rank/count/marginal component is exact
  * int64 (or decimal(38,0) where squares of rank sums outgrow int64),
  * and each "real" statistic spends ONE correctly-rounded IEEE
  * division (+ sqrt where defined) before a final round(6) — so two
  * engines replaying the same definition agree bit-for-bit, unlike
  * aggregation-order-dependent float folds.
  */
object ModelEval {

  /** ROC AUC (c-statistic) from a score column and a {0,1} label — the
    * probability a random positive outranks a random negative, with
    * ties counted half. Computed exactly through the Mann–Whitney
    * identity on DOUBLED midranks (the [[Profiling.rankSumTest]]
    * machinery — a tie run of `t` equal scores after `c` smaller ones
    * has doubled midrank `2c + t + 1`, int64-exact for any tie width):
    * {{{ u_x2 = Σ_pos rank_x2 − n_pos·(n_pos+1)   // = 2·U, exact
    *     auc  = u_x2 / (2·n_pos·n_neg)            // ONE division
    *     gini = u_x2 / (n_pos·n_neg) − 1          // = 2·auc − 1 }}}
    * Scores snap to the grid `round(score·scale)` first so ties are a
    * property of the DATA, not of float representation. Output: ONE
    * row — (n_pos, n_neg, u_x2, auc, gini); auc/gini null when either
    * class is empty (no ranking task exists). Exactness bound: ranks
    * are ≤ 2n, so `u_x2 ≤ 2n²` stays inside int64 to n ≈ 2.1e9 rows.
    *
    * Scale shape: rows collapse map-side to one row per DISTINCT grid
    * score (count + positive count); the rank prefix is a window over
    * that distinct-score relation (bounded by the score domain, not
    * subjects — the [[Profiling.rankSumTest]] argument); the result is
    * a 1-row aggregate.
    */
  def aucScore(
      df: DataFrame, labelCol: String, scoreCol: String,
      scale: Long = 100L): DataFrame = {
    require(scale >= 1, s"scale must be positive: $scale")
    val y = col(s"`$labelCol`").cast("long")
    val s = col(s"`$scoreCol`")
    val xd = round(s * lit(scale.toDouble), 0).cast("long")
    val perV = df.filter(y.isin(0L, 1L) && s.isNotNull)
      .select(y.as("__y"), xd.as("__x"))
      .groupBy(col("__x"))
      .agg(count(lit(1)).as("__t"),
        sum(col("__y")).as("__t1"))
    val wPrev = Window.orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perV
      .withColumn("__c", coalesce(sum(col("__t")).over(wPrev), lit(0L)))
      .withColumn("__r1x2",
        col("__t1") * (lit(2L) * col("__c") + col("__t") + lit(1L)))
      .agg(
        sum(col("__t1")).as("n_pos"),
        (sum(col("__t")) - sum(col("__t1"))).as("n_neg"),
        sum(col("__r1x2")).as("__r1x2s"))
      .withColumn("u_x2", col("__r1x2s") - col("n_pos") * (col("n_pos") + 1L))
      .select(
        col("n_pos"), col("n_neg"), col("u_x2"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(col("u_x2").cast("double") /
            (lit(2d) * col("n_pos").cast("double") *
              col("n_neg").cast("double")), 6)).as("auc"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(col("u_x2").cast("double") /
            (col("n_pos").cast("double") * col("n_neg").cast("double")) -
            lit(1d), 6)).as("gini"))
  }

  /** Calibration reliability bins — "when the model says 0.7, does the
    * event happen 70% of the time?". Scores in [0, 1] land in `nBins`
    * FIXED-WIDTH bins (`least(floor(score·nBins), nBins−1)` — fixed
    * edges, not quantiles, so two snapshots' bins are comparable and
    * the bin id needs no global sort); out-of-[0,1] scores and
    * non-{0,1} labels are excluded as malformed. Per bin:
    * {{{ n, n_pos                                    // exact int64
    *     sum_score_fp = Σ round(score·scale)         // exact int64
    *     obs_rate  = n_pos / n                       // ONE division
    *     pred_rate = sum_score_fp / (n·scale)        // ONE division
    *     gap       = obs_rate − pred_rate            // on the rounded pair }}}
    * `gap` subtracts the two ALREADY-round(6) doubles and rounds again
    * — a deterministic double chain both engines replay identically
    * (no raw float fold is ever compared). Exactness bound:
    * `n·scale < 9.2e18` per bin.
    *
    * Scale shape: one map-side-combined groupBy onto ≤ `nBins` rows.
    */
  def calibrationBins(
      df: DataFrame, labelCol: String, scoreCol: String,
      nBins: Int = 10, scale: Long = 1000000L): DataFrame = {
    require(nBins >= 1, s"nBins must be positive: $nBins")
    require(scale >= 1, s"scale must be positive: $scale")
    val y = col(s"`$labelCol`").cast("long")
    val s = col(s"`$scoreCol`")
    val bin = least(floor(s * lit(nBins.toDouble)).cast("long"),
      lit(nBins.toLong - 1L))
    df.filter(y.isin(0L, 1L) && s.isNotNull && s >= 0d && s <= 1d)
      .groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(y).as("n_pos"),
        sum(round(s * lit(scale.toDouble), 0).cast("long")).as("sum_score_fp"))
      .withColumn("obs_rate",
        round(col("n_pos").cast("double") / col("n").cast("double"), 6))
      .withColumn("pred_rate",
        round(col("sum_score_fp").cast("double") /
          (col("n").cast("double") * lit(scale.toDouble)), 6))
      .withColumn("gap", round(col("obs_rate") - col("pred_rate"), 6))
  }

  /** Cohen's κ — chance-corrected agreement between two categorical
    * label columns (two annotators, a model vs a gold set, two dedup
    * policies): with `n` the co-labelled rows, `n_agree` the diagonal
    * and `pe_num = Σ_k rowmarg_k · colmarg_k` the chance-agreement
    * numerator (all exact int64),
    * {{{ κ = (n·n_agree − pe_num) / (n² − pe_num)   // ONE division }}}
    * null when the chance term saturates (`n² = pe_num` — both raters
    * constant; agreement carries no information). `po`/`pe` are the
    * same exact integers spent through one division each. Exactness
    * bound: `n² < 9.2e18` → n ≈ 3e9 co-labelled rows.
    *
    * Scale shape: rows collapse map-side to the (a, b) confusion
    * relation (category² cells at most); marginals re-aggregate those
    * cells; the marginal-product join is category-sized per side. No
    * subject-cardinality window or join anywhere.
    */
  def kappaAgreement(
      df: DataFrame, rater1Col: String, rater2Col: String): DataFrame = {
    val a = col(s"`$rater1Col`").cast("string")
    val b = col(s"`$rater2Col`").cast("string")
    val obs = df.filter(a.isNotNull && b.isNotNull)
      .select(a.as("__a"), b.as("__b"))
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__o"))
    val rt = obs.groupBy(col("__a").as("__k")).agg(sum(col("__o")).as("__ra"))
    val ct = obs.groupBy(col("__b").as("__k")).agg(sum(col("__o")).as("__cb"))
    // categories present on only one side contribute zero product mass
    val peNum = rt.join(ct, Seq("__k"))
      .agg(coalesce(sum(col("__ra") * col("__cb")), lit(0L)).as("pe_num"))
    obs.agg(
      sum(col("__o")).as("n"),
      sum(when(col("__a") === col("__b"), col("__o")).otherwise(0L))
        .as("n_agree"))
      .crossJoin(broadcast(peNum))
      .select(
        col("n"), col("n_agree"), col("pe_num"),
        when(col("n") > 0L,
          round(col("n_agree").cast("double") / col("n").cast("double"), 6))
          .as("po"),
        when(col("n") > 0L,
          round(col("pe_num").cast("double") /
            (col("n").cast("double") * col("n").cast("double")), 6)).as("pe"),
        when(col("n") * col("n") - col("pe_num") =!= 0L,
          round((col("n") * col("n_agree") - col("pe_num")).cast("double") /
            (col("n") * col("n") - col("pe_num")).cast("double"), 6))
          .as("kappa"))
  }

  /** Spearman rank correlation — monotone association between two
    * value columns (a quality score vs human ratings, length vs
    * perplexity), robust to any monotone transform. Both columns snap
    * to fixed-point grids, each gets an exact DOUBLED midrank (the
    * [[aucScore]] tie machinery, per axis), and ρ is Pearson on those
    * integer ranks:
    * {{{ num  = n·Σrxry − Σrx·Σry
    *     den² = (n·Σrx² − (Σrx)²) · (n·Σry² − (Σry)²)
    *     ρ    = num / sqrt(den²)       // ONE division + sqrt }}}
    * The five rank sums run in decimal(38,0) (doubled ranks reach 2n,
    * so Σrxry reaches 4n³ and the cross products 4n⁴ — int64 dies at
    * ~40k rows; decimal(38,0) holds to n ≈ 1e9, the
    * [[Profiling.kruskalWallis]] precedent). Output: ONE row —
    * (n, tie_x, tie_y, rho); ρ null when either axis is a single tie
    * run (zero rank variance). tie sums stay int64 (the
    * [[Profiling.rankSumTest]] bound applies per axis).
    *
    * Scale shape: each axis's midrank is a window over its
    * DISTINCT-value relation (value-domain-sized), joined back to rows
    * on the grid value — two hash joins keyed on a value, no
    * subject-cardinality window; then one map-side-combined 1-row
    * aggregate.
    */
  def spearmanCorr(
      df: DataFrame, xCol: String, yCol: String,
      scaleX: Long = 100L, scaleY: Long = 100L): DataFrame = {
    require(scaleX >= 1 && scaleY >= 1,
      s"scales must be positive: $scaleX, $scaleY")
    val vx = col(s"`$xCol`")
    val vy = col(s"`$yCol`")
    val rows = df.filter(vx.isNotNull && vy.isNotNull)
      .select(
        round(vx * lit(scaleX.toDouble), 0).cast("long").as("__x"),
        round(vy * lit(scaleY.toDouble), 0).cast("long").as("__y"))
    def ranks(keyCol: String): DataFrame = {
      val wPrev = Window.orderBy(col(keyCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      rows.groupBy(col(keyCol)).agg(count(lit(1)).as("__t"))
        .withColumn("__c", coalesce(sum(col("__t")).over(wPrev), lit(0L)))
        .select(col(keyCol),
          (lit(2L) * col("__c") + col("__t") + lit(1L)).as(s"${keyCol}r"),
          (col("__t") * col("__t") * col("__t") - col("__t"))
            .as(s"${keyCol}tie"))
    }
    val rx = ranks("__x")
    val ry = ranks("__y")
    val tieX = rx.agg(sum(col("__xtie")).as("tie_x"))
    val tieY = ry.agg(sum(col("__ytie")).as("tie_y"))
    rows
      .join(rx.drop("__xtie"), Seq("__x"))
      .join(ry.drop("__ytie"), Seq("__y"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__xr").cast("decimal(38,0)")).as("__sx"),
        sum(col("__yr").cast("decimal(38,0)")).as("__sy"),
        sum(col("__xr").cast("decimal(38,0)") * col("__xr")).as("__sxx"),
        sum(col("__yr").cast("decimal(38,0)") * col("__yr")).as("__syy"),
        sum(col("__xr").cast("decimal(38,0)") * col("__yr")).as("__sxy"))
      .crossJoin(broadcast(tieX))
      .crossJoin(broadcast(tieY))
      .select(
        col("n"), col("tie_x"), col("tie_y"),
        when(col("n") > 1L, {
          val n = col("n").cast("decimal(38,0)")
          val num = (n * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double")
          val dx = (n * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double")
          val dy = (n * col("__syy") - col("__sy") * col("__sy"))
            .cast("double")
          when(dx > 0d && dy > 0d, round(num / sqrt(dx * dy), 6))
        }).as("rho"))
  }
}
