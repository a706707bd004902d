package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * train/val/test splits, stratified sampling, epoch-mixture replication,
  * per-group token-budget selection and quality cuts, sliding-window
  * document chunking, sequence packing, deterministic corpus shuffling,
  * and blocklist filtering.
  *
  * The reference pipeline (Vanessaaaaa0202/EHR_Data_PipeLine) has no
  * curation surface — its only selection ops are null-drop and
  * keep-first dedup (`data_quality_checker.py:244,340-352`); these
  * operators are part of the mandated LLM-data-pipeline extension
  * (SURVEY.md §2.11).
  *
  * Design for 100 TB:
  *   - Every membership decision (split / sample) hashes a NUMERIC id with
  *     the Knuth multiplicative hash — plain int64 arithmetic, so the
  *     assignment is reproducible across engines and runs and stable under
  *     repartitioning. `randomSplit`/`sample` are NOT: they seed per
  *     partition, so adding one input file reshuffles every assignment —
  *     unacceptable when the split membership must be durable across
  *     pipeline re-runs.
  *   - Split and sample are narrow (no shuffle): they filter/annotate
  *     in place and preserve the upstream partitioning.
  *   - `tokenBudget`/`topFractionByGroup` shuffle once on the group key;
  *     a group's rows serialize through one window task, so groups are
  *     expected to be "source"-grained (thousands of rows), not
  *     corpus-grained. For a single giant group, cap rows first
  *     (e.g. topk by priority) or raise the budget granularity.
  *   - `packSequences`/`shuffleOrder` need a global total order — they
  *     use a distributed two-phase prefix sum whose only single-task step
  *     is over O(partitions) rows, never the data.
  *   - `chunkDocuments`/`epochMixture` fan out executor-side via
  *     `explode(sequence)` — never a driver loop; output rows inherit the
  *     input partitioning.
  */
object Curation {

  /** Buckets per whole: per-myriad (1/10000) gives 0.01% granularity. */
  val Myriad = 10000L

  /** Deterministic pseudo-uniform bucket in [0, 10000) from a
    * non-negative numeric id: Knuth multiplicative hash
    * `((id mod 2^31) * 2654435761) mod 10000`. The `mod 2^31` guard
    * keeps the product within int64 for every long id. Requires
    * non-negative ids (negative ids would diverge between `pmod` and
    * ANSI-SQL `%` semantics).
    */
  def hashBucket(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L), lit(Myriad))

  /** Deterministic train/val/test assignment: adds a `split` column.
    * `trainPerMyriad`/`valPerMyriad` are shares out of 10000 (e.g.
    * 8000/1000 → 80% train, 10% val, 10% test). A row's split depends
    * only on its id — re-running over a grown corpus never reassigns an
    * existing row.
    */
  def hashSplit(
      df: DataFrame, idCol: String,
      trainPerMyriad: Int, valPerMyriad: Int): DataFrame = {
    require(trainPerMyriad >= 0 && valPerMyriad >= 0
      && trainPerMyriad + valPerMyriad <= Myriad,
      s"shares out of range: train=$trainPerMyriad val=$valPerMyriad")
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPerMyriad, lit("train"))
        .when(b < trainPerMyriad + valPerMyriad, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic stratified sample: keeps `ratesPerMyriad(stratum)` /
    * 10000 of each stratum (default rate for unlisted strata). The kept
    * set is a strict subset of any higher-rate kept set for the same ids
    * (nested samples — raising a rate only ADDS rows).
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      ratesPerMyriad: Map[String, Int],
      defaultPerMyriad: Int = 0): DataFrame = {
    require((defaultPerMyriad +: ratesPerMyriad.values.toSeq)
      .forall(r => r >= 0 && r <= Myriad), s"rates out of range: $ratesPerMyriad")
    val rate = ratesPerMyriad.foldLeft(lit(defaultPerMyriad)) {
      case (acc, (stratum, r)) => when(col(strataCol) === lit(stratum), lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate)
  }

  /** Greedy per-group token-budget selection: within each `groupCol`
    * partition, rows are taken in (`priority` desc, `idCol` asc) order
    * while the running token total stays ≤ `budget`; adds `cum_tokens`.
    * Strict budget: a row whose tokens alone exceed the remaining budget
    * is dropped (and so is everything after it in that group).
    */
  def tokenBudget(
      df: DataFrame, groupCol: String, tokenCol: String,
      priority: Column, idCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"negative budget: $budget")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(priority.desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokenCol).cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Sliding-window character chunking: one output row per (doc, chunk),
    * chunk starts at offsets 0, stride, 2·stride, … < length(text), each
    * chunk `chunkSize` characters (the last one shorter). Chunk count =
    * ceil(len / stride); null/empty docs yield no rows. Adds `chunk_id`
    * (0-based) and `chunk_text`; overlap = chunkSize − stride when
    * chunkSize > stride.
    */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, s"chunkSize=$chunkSize stride=$stride")
    val tc = s"`$textCol`"
    df.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      // integral DIV: float ceil drifts for lengths near 2^53 and
      // engines disagree on rounding — (len + stride - 1) DIV stride.
      .withColumn("chunk_id",
        explode(sequence(lit(0), expr(s"(length($tc) + ${stride - 1}) DIV $stride").cast("int") - 1)))
      .withColumn("chunk_text",
        expr(s"substring($tc, chunk_id * $stride + 1, $chunkSize)"))
  }

  /** Keep the top `keepPerMyriad`/10000 fraction of every group by
    * `score` (desc, `idCol` as the deterministic tiebreak) — the
    * "top-20%-quality per language" curation cut. Rank-based, so the cut
    * is exact: ceil(fraction × group size) rows per group, regardless of
    * score distribution (a value threshold would wobble with the corpus
    * mix). One shuffle on the group key; a group's rows rank through one
    * window task, so groups are expected source/language-grained.
    */
  def topFractionByGroup(
      df: DataFrame, groupCol: String, score: Column, idCol: String,
      keepPerMyriad: Long): DataFrame = {
    require(keepPerMyriad >= 0 && keepPerMyriad <= Myriad,
      s"keepPerMyriad out of range: $keepPerMyriad")
    val rankW = Window.partitionBy(col(groupCol)).orderBy(score.desc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__rank").cast("long") <=
        expr(s"(__n * $keepPerMyriad + ${Myriad - 1}) DIV $Myriad"))
      .drop("__rank", "__n")
  }

  /** Sequence packing: assign every document a global token offset in the
    * id-ordered concatenated token stream, and the training-sequence id it
    * starts in (`seq_id = start_offset DIV capacity`). This is the layout
    * step that turns a curated corpus into fixed-length training
    * sequences; `spans_boundary` marks docs crossing a sequence edge.
    *
    * The naive form is a GLOBAL cumulative sum — a single-partition window
    * that serializes the whole corpus through one task. This
    * implementation is the distributed two-phase prefix sum:
    *   1. range-partition by id (deterministic bounds), cumsum WITHIN each
    *      partition in parallel;
    *   2. per-partition token totals (one tiny row per partition) get an
    *      exclusive prefix on the driver-side-small frame, broadcast back.
    * Output values are partitioning-independent: the offset is defined by
    * the total order on `idCol` alone (ids must be unique).
    */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String,
      capacity: Long, numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity=$capacity")
    exclusivePrefixSum(df, Seq(col(idCol)), col(tokenCol).cast("long"),
        numPartitions, "start_offset")
      .withColumn("seq_id", expr(s"start_offset DIV $capacity"))
      .withColumn("seq_pos", pmod(col("start_offset"), lit(capacity)))
      .withColumn("spans_boundary",
        expr(s"(start_offset + `$tokenCol` - 1) DIV $capacity") > col("seq_id"))
  }

  /** Distributed exclusive prefix sum of `value` over the total order
    * `orderCols` (must be a key — unique): adds `outCol` = sum of `value`
    * over all strictly-preceding rows. Two phases: range-partition on the
    * order, cumsum within each partition in parallel, then an exclusive
    * prefix over the per-partition totals (O(partitions) rows — that tiny
    * window is the only single-task step) broadcast back. Output values
    * depend on the total order alone, not the partitioning.
    */
  private def exclusivePrefixSum(
      df: DataFrame, orderCols: Seq[Column], value: Column,
      numPartitions: Int, outCol: String): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // persist the ranged frame: BOTH the cumsum branch and the totals
    // branch read it, and without the cache each branch re-scans and
    // re-range-shuffles the input (verified in the physical plan) — 2×
    // cost AND each branch would derive `__pid` from an independent
    // range-sampling pass, silently corrupting offsets if the two
    // partitionings ever diverged. Same documented caching contract as
    // the near-dup family (Dedup.scala): callers batch-running many ops
    // should `spark.catalog.clearCache()` between them.
    val ranged = df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__val", value)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withinW = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = ranged.withColumn("__cum_in", sum(col("__val")).over(withinW))
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col("__val")).as("__ptotal"))
      .withColumn("__poffset",
        coalesce(
          sum(col("__ptotal")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__poffset"))
    within.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__poffset") + col("__cum_in") - col("__val"))
      .drop("__pid", "__cum_in", "__poffset", "__val")
  }

  /** Epoch-mixture replication: repeat each row `weights(stratum)` times
    * (fractional part resolved deterministically per id — a weight of 2.3
    * gives every row 2 copies and 30% of rows a third). The standard
    * pretraining mixture step: upsample high-quality sources, downsample
    * (weight < 1) the rest. Adds `copy_id` (0-based). Fan-out is
    * executor-side `explode(sequence)`; weight 0 / unlisted strata drop.
    */
  def epochMixture(
      df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1000), s"weights out of range: $weights")
    val wholes = weights.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(col(strataCol) === lit(s), lit(math.floor(w).toLong)).otherwise(acc)
    }
    val fracPerMyriad = weights.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(col(strataCol) === lit(s),
        lit(math.round((w - math.floor(w)) * Myriad))).otherwise(acc)
    }
    df.withColumn("__copies",
        wholes + when(hashBucket(col(idCol)) < fracPerMyriad, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Deterministic corpus shuffle: a stable pseudo-random total order
    * (hash bucket, then id as tiebreak) with the global position exposed
    * as `shuffle_rank`. Reproducible across runs/engines — the property a
    * training-order shuffle needs that `orderBy(rand())` lacks. The rank
    * is a count prefix-sum over (bucket, id) via [[exclusivePrefixSum]],
    * so no single-task global window.
    */
  def shuffleOrder(df: DataFrame, idCol: String): DataFrame =
    exclusivePrefixSum(
      df.withColumn("__bucket", hashBucket(col(idCol))),
      Seq(col("__bucket"), col(idCol)), lit(1L),
      numPartitions = 0, outCol = "shuffle_rank")
      .drop("__bucket")

  /** Remove rows whose `keyCol` appears in `blocklist` (left anti-join) —
    * the "known-bad ids" corpus filter (contaminated docs, opt-outs,
    * flagged PII). Blocklists are usually tiny next to the corpus →
    * broadcast by default; disable for a corpus-scale blocklist and let
    * sort-merge/AQE handle it.
    */
  def blocklistFilter(
      df: DataFrame, blocklist: DataFrame, keyCol: String,
      broadcastBlocklist: Boolean = true): DataFrame = {
    val keys = blocklist.select(col(keyCol)).distinct()
    df.join(if (broadcastBlocklist) broadcast(keys) else keys, Seq(keyCol), "left_anti")
  }

  /** Keep only rows whose `keyCol` appears in `allowlist` (left semi-join)
    * — the dual of [[blocklistFilter]].
    */
  def allowlistFilter(
      df: DataFrame, allowlist: DataFrame, keyCol: String,
      broadcastAllowlist: Boolean = true): DataFrame = {
    val keys = allowlist.select(col(keyCol)).distinct()
    df.join(if (broadcastAllowlist) broadcast(keys) else keys, Seq(keyCol), "left_semi")
  }
}
