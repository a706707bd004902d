package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter 1969) — "are these two
  * rows the same real-world entity?" across tables with no shared key:
  * the master-patient-index / registry-reconciliation shape, and the
  * statistically principled big sibling of [[FuzzyJoin]]'s
  * edit-distance matching (cf. the reference's FK-parity derivation,
  * json_pipeline.py:335-380, which links bundles only by exact ids —
  * linkage is what a user needs when ids DON'T line up).
  *
  * The engine takes per-field (m, u) probabilities — m = P(field
  * agrees | same entity), u = P(field agrees | different entities) —
  * and converts them DRIVER-SIDE to integer fixed-point log2-odds
  * weights ([[agreeWeight]]/[[disagreeWeight]]): the per-pair score is
  * then a SUM OF INTEGER LITERALS selected by agreement bits, exact
  * int64, no float fold — any SQL engine replays it bit-for-bit from
  * the same constants. Classification follows the classic two
  * thresholds: `match` at/above upper, `nonmatch` at/below lower,
  * `review` between.
  *
  * Scale shape: candidate generation is a BLOCKED equi-join (never a
  * cross join) — at 100 TB the block key is the partitioner and the
  * pair volume is Σ_b |A_b|·|B_b|, governed by block granularity; a
  * plan-embedded raise_error fails fast when one block's pair count
  * exceeds `maxPairsPerBlock` (the cooccurrenceLift guard pattern —
  * a sentinel block value would otherwise fan out quadratically).
  * [[uProfile]] estimates u from the data with one value-histogram
  * pass per field (map-side combined; no pairs are ever formed).
  */
object Linkage {

  /** Fixed-point agreement weight `round(log2(m/u)·scale)` — computed
    * once, driver-side, from IEEE doubles; the RESULT is an integer
    * literal, so plans and oracles built from the same (m, u, scale)
    * agree exactly regardless of engine libm.
    */
  def agreeWeight(m: Double, u: Double, scale: Long): Long = {
    require(m > 0 && m <= 1 && u > 0 && u < 1, s"bad m/u: $m, $u")
    math.round(math.log(m / u) / math.log(2d) * scale)
  }

  /** Fixed-point disagreement weight `round(log2((1−m)/(1−u))·scale)`
    * (negative for informative fields). m = 1 (a field that NEVER
    * disagrees on true matches) gets the conventional hard floor
    * −64·scale rather than −∞.
    */
  def disagreeWeight(m: Double, u: Double, scale: Long): Long = {
    require(m > 0 && m <= 1 && u > 0 && u < 1, s"bad m/u: $m, $u")
    if (m >= 1d) -64L * scale
    else math.round(math.log((1d - m) / (1d - u)) / math.log(2d) * scale)
  }

  /** A comparison field: left/right column names plus the conditional
    * agreement probabilities. `m` = P(agree | match), `u` =
    * P(agree | non-match) — take `u` from [[uProfile]] when unknown.
    */
  final case class LinkField(leftCol: String, rightCol: String,
      m: Double, u: Double)

  /** Blocked Fellegi–Sunter linkage. Output: one row per candidate
    * pair — `idA`/`idB` (caller-named), `agree_<rightCol>` per field
    * (1 agree / 0 disagree / null when either side is null — missing
    * data carries NO weight, the standard F-S convention), exact
    * int64 `score_fp`, and `link_class` ∈ match/review/nonmatch by the
    * fixed-point thresholds `round(upper·scale)` / `round(lower·scale)`
    * (log2-odds units). Field values compare after `cast(string)`
    * canonicalization (the [[graft.clean.Cleaners.pseudonymize]]
    * width argument).
    *
    * The blocked join means pairs in DIFFERENT blocks are never
    * scored — recall is a property of the blocking scheme (pass
    * multiple block keys by calling twice and unioning distinct pairs;
    * each pass stays an equi-join).
    */
  def probabilisticLinkage(
      left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockLeft: String, blockRight: String,
      fields: Seq[LinkField],
      upper: Double, lower: Double,
      scale: Long = 1000L,
      maxPairsPerBlock: Long = 100000000L): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field")
    // agreement bits are named agree_<rightCol>: two fields comparing
    // different left columns against the SAME right column would
    // collide (ambiguous reference or a silently wrong score sum) —
    // refuse up front
    val dupRight = fields.groupBy(_.rightCol).collect {
      case (c, fs) if fs.size > 1 => c
    }
    require(dupRight.isEmpty,
      s"probabilisticLinkage: duplicate rightCol in fields: " +
        s"${dupRight.mkString(", ")} — agree_<rightCol> bit names must " +
        "be distinct (alias the right-side columns apart)")
    require(upper >= lower, s"upper < lower: $upper, $lower")
    require(scale >= 1, s"scale must be positive: $scale")
    require(maxPairsPerBlock >= 1,
      s"maxPairsPerBlock must be positive: $maxPairsPerBlock")
    val lBlock = col(s"`$blockLeft`")
    val rBlock = col(s"`$blockRight`")
    val l = left.filter(lBlock.isNotNull && col(s"`$leftId`").isNotNull)
      .select((Seq(col(s"`$leftId`"), lBlock.as("__blk")) ++
        fields.map(f => col(s"`${f.leftCol}`").cast("string")
          .as(s"__l_${f.leftCol}"))): _*)
    val r = right.filter(rBlock.isNotNull && col(s"`$rightId`").isNotNull)
      .select((Seq(col(s"`$rightId`"), rBlock.as("__blk")) ++
        fields.map(f => col(s"`${f.rightCol}`").cast("string")
          .as(s"__r_${f.rightCol}"))): _*)
    // per-block pair-volume guard: tiny per-side histograms meet in a
    // block-keyed join whose OUTPUT KEY carries the raise_error — the
    // pair join below joins ON that key, so no amount of column
    // pruning can elide the check, and a degenerate block kills the
    // stage before the pair join fans out
    val lCnt = l.groupBy(col("__blk")).agg(count(lit(1)).as("__nl"))
    val rCnt = r.groupBy(col("__blk")).agg(count(lit(1)).as("__nr"))
    val boom = raise_error(concat(
      lit("probabilisticLinkage: block "), col("__blk").cast("string"),
      lit(" forms "), (col("__nl") * col("__nr")).cast("string"),
      lit(s" pairs > maxPairsPerBlock=$maxPairsPerBlock — " +
        "coarse blocking key?"))).cast(l.schema("__blk").dataType)
    val guard = lCnt.join(rCnt, Seq("__blk"))
      .select(
        when(col("__nl") * col("__nr") > maxPairsPerBlock, boom)
          .otherwise(col("__blk")).as("__blk"))
    val bits = fields.map { f =>
      val a = col(s"__l_${f.leftCol}")
      val b = col(s"__r_${f.rightCol}")
      when(a.isNotNull && b.isNotNull,
        when(a === b, 1L).otherwise(0L)).as(s"agree_${f.rightCol}")
    }
    val score = fields.map { f =>
      val bit = col(s"agree_${f.rightCol}")
      when(bit === 1L, lit(agreeWeight(f.m, f.u, scale)))
        .when(bit === 0L, lit(disagreeWeight(f.m, f.u, scale)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val upFp = math.round(upper * scale)
    val loFp = math.round(lower * scale)
    l.join(guard, Seq("__blk"))
      .join(r, Seq("__blk"))
      .select((Seq(col(s"`$leftId`"), col(s"`$rightId`")) ++ bits): _*)
      .withColumn("score_fp", score)
      .withColumn("link_class",
        when(col("score_fp") >= upFp, "match")
          .when(col("score_fp") <= loFp, "nonmatch")
          .otherwise("review"))
  }

  /** Chance-agreement (u) profile — for each field, the probability
    * two RANDOM DISTINCT rows agree on it: `u = Σ_v n_v·(n_v−1) /
    * (N·(N−1))` over the field's value histogram (nulls excluded from
    * both numerator and N — a null never "agrees"). Exact fixed point:
    * {{{ u_fp = Σ_v n_v·(n_v−1)·scale DIV (N·(N−1))   // one floor
    *     u    = u_num / (N·(N−1))                     // ONE division }}}
    * Output one row per field: (field, n, n_distinct, u_num, u_fp, u).
    * This is the number to feed [[LinkField.u]] when no labelled pairs
    * exist. Exactness bound: `n_v²·scale < 9.2e18` per value
    * (decimal(38,0) internally; the emitted u_num caps at N²).
    *
    * Scale shape: one map-side-combined value histogram per field
    * (fields are enumerated driver-side — the loop is over the SCHEMA,
    * not the data), each collapsing to one row; no joins, no pairs.
    */
  def uProfile(df: DataFrame, fields: Seq[String],
      scale: Long = 1000000L): DataFrame = {
    require(fields.nonEmpty, "at least one field")
    require(scale >= 1, s"scale must be positive: $scale")
    fields.map { f =>
      val v = col(s"`$f`").cast("string")
      df.filter(v.isNotNull)
        .groupBy(v.as("__v"))
        .agg(count(lit(1)).as("__nv"))
        .agg(
          sum(col("__nv")).as("n"),
          count(lit(1)).as("n_distinct"),
          sum(col("__nv").cast("decimal(38,0)") * (col("__nv") - 1L))
            .cast("long").as("u_num"))
        .select(
          lit(f).as("field"), col("n"), col("n_distinct"), col("u_num"),
          when(col("n") > 1L,
            expr(s"CAST(CAST(u_num AS DECIMAL(38,0)) * ${scale}L DIV " +
              "(CAST(n AS DECIMAL(38,0)) * (n - 1)) AS LONG)")).as("u_fp"),
          when(col("n") > 1L,
            round(col("u_num").cast("double") /
              (col("n").cast("double") * (col("n") - 1L).cast("double")), 6))
            .as("u"))
    }.reduce(_.unionByName(_))
  }
}
