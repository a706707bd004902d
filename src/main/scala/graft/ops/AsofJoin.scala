package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, attach the payload of
  * the latest right row with `rightTime <= leftTime` on the same key
  * ([[asofJoin]]), the earliest right row with `rightTime >= leftTime`
  * ([[asofJoinForward]]), or the closest in either direction
  * ([[asofJoinNearest]]) — the full pandas `merge_asof` direction
  * surface, each with an optional staleness `tolerance`.
  *
  * Spark has no native ASOF JOIN; the naive formulation (range join +
  * per-left-row max) explodes to |L|×|R| per key. This implementation is
  * the scalable union-and-carry form: tag both sides, union, one
  * shuffle on the key, then ordered window passes carry the nearest
  * right payload into each left row — O((|L|+|R|) log) per key, no pair
  * materialization, AQE-friendly. `nearest` runs BOTH frames over the
  * same sort (one exchange, one sort, two window passes).
  *
  * Semantics: inclusive (`<=` / `>=`); ties on time resolve to the right
  * row, and `nearest`'s equidistant ties resolve to the PRIOR row.
  * `tolerance` (in the time column's own units — µs for the canonical
  * event reads; requires a numeric time column) null-outs matches
  * farther than the bound, bounding staleness the way
  * `merge_asof(tolerance=...)` does. If the right side can hold multiple
  * rows per (key, time), pre-dedup it (e.g.
  * [[graft.clean.Cleaners.dedupKeepFirst]]) — the window would otherwise
  * pick the physically-nearest one nondeterministically.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    if (broadcastEligible(right, rightTime, payload))
      broadcastDirected(left, right, keys, leftTime, rightTime, payload,
        backward = true, tolerance)
    else directed(left, right, keys, leftTime, rightTime, payload, backward = true, tolerance)

  /** Forward as-of: for each left row, the payload of the EARLIEST right
    * row with `rightTime >= leftTime` — "the next reading after this
    * event" (label attribution, next-maintenance lookup, forward fills).
    */
  def asofJoinForward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    if (broadcastEligible(right, rightTime, payload))
      broadcastDirected(left, right, keys, leftTime, rightTime, payload,
        backward = false, tolerance)
    else directed(left, right, keys, leftTime, rightTime, payload, backward = false, tolerance)

  /** Whether the right side is estimated under the session's
    * autoBroadcastJoinThreshold — the same size heuristic Spark's own
    * join planner uses, so "dimension-sized" means the same thing here
    * as everywhere else in the session. Threshold -1 disables the
    * broadcast path entirely (and with it this extra optimize pass).
    */
  private def broadcastable(right: DataFrame): Boolean = {
    val thr = right.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    thr > 0 && right.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
  }

  /** The broadcast path sorts (rightTime, payload…) structs, so every
    * payload type must be ORDERABLE (maps are not). The union path never
    * orders payloads — auto-routing must not turn a working call into an
    * AnalysisException just because the dim shrank, so non-orderable
    * payloads stay on the union path (a direct asofJoinBroadcast call
    * still surfaces the analysis error, documented there).
    */
  private def broadcastEligible(right: DataFrame, rightTime: String,
      payload: Seq[String]): Boolean =
    broadcastable(right) && {
      val fields = right.schema
      (rightTime +: payload).forall(c =>
        fields.find(_.name == c).forall(f =>
          org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType)))
    }

  /** Broadcast-dim as-of: when the right side is dimension-sized (the
    * `pit_lookup` shape — an SCD2 history vs an event stream), the union
    * path's full `|L|+|R|` key shuffle is pure waste: the LEFT side only
    * needed the exchange to meet its dim rows. Here the dim collapses to
    * one SORTED history array per key (one dim-sized shuffle), broadcast
    * hash-joins onto the left — the event stream never shuffles or
    * sorts — and the pick is an array scan + `try_element_at` inside
    * whole-stage codegen. Per left row that is O(|history|) work against
    * a local array; histories are short by the broadcast-small
    * precondition, and no window/sort state exists at all.
    *
    * Auto-selected by [[asofJoin]]/[[asofJoinForward]] via the session's
    * autoBroadcastJoinThreshold; call directly to force the choice when
    * the stats estimate is wrong in either direction. Same semantics and
    * tie/tolerance contract as the union path (pre-dedup the right side
    * on (key, time)).
    */
  def asofJoinBroadcast(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Long] = None, backward: Boolean = true): DataFrame =
    broadcastDirected(left, right, keys, leftTime, rightTime, payload, backward, tolerance)

  private def broadcastDirected(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      backward: Boolean, tolerance: Option[Long]): DataFrame = {
    val (joined, leftCols) = broadcastHist(left, right, keys, rightTime, payload)
    val lt = col(s"`$leftTime`")
    val elig = filter(col("__hist"), x =>
      (if (backward) x.getField("__rt") <= lt else x.getField("__rt") >= lt) &&
        tolerance.map { t =>
          if (backward) lt - x.getField("__rt") <= t else x.getField("__rt") - lt <= t
        }.getOrElse(lit(true)))
    // ascending sort ⇒ backward wants the LAST eligible, forward the FIRST
    val pick = try_element_at(elig, lit(if (backward) -1 else 1))
    joined.select(leftCols.map(c => col(s"`$c`")) ++
      payload.map(c => pick.getField(c).as(c)): _*)
  }

  /** Nearest-direction twin of [[asofJoinBroadcast]]: both directional
    * picks come from the SAME broadcast array (no second exchange or
    * sort anywhere), equidistant resolves to the prior row — identical
    * contract to [[asofJoinNearest]].
    */
  def asofJoinBroadcastNearest(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val (joined, leftCols) = broadcastHist(left, right, keys, rightTime, payload)
    val lt = col(s"`$leftTime`")
    def bounded(d: Column): Column = tolerance.map(t => d <= t).getOrElse(lit(true))
    val b = try_element_at(
      filter(col("__hist"), x => x.getField("__rt") <= lt &&
        bounded(lt - x.getField("__rt"))), lit(-1))
    val f = try_element_at(
      filter(col("__hist"), x => x.getField("__rt") >= lt &&
        bounded(x.getField("__rt") - lt)), lit(1))
    val pick = when(b.isNotNull &&
        (f.isNull || lt - b.getField("__rt") <= f.getField("__rt") - lt), b)
      .otherwise(f)
    joined.select(leftCols.map(c => col(s"`$c`")) ++
      payload.map(c => pick.getField(c).as(c)): _*)
  }

  /** Shared broadcast prologue: per-key sorted history array (struct
    * leads with `__rt`, so the sort is by time then payload — the same
    * deterministic greatest-tuple tie rule the union path's pre-dedup
    * contract assumes) broadcast-joined onto the untouched left.
    */
  private def broadcastHist(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      rightTime: String, payload: Seq[String]): (DataFrame, Seq[String]) = {
    require(payload.nonEmpty, "payload columns required")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload ${payload.intersect(leftCols)} collide with left columns")
    require(!leftCols.contains("__hist") && !payload.contains("__rt"),
      "left/payload columns collide with asofJoinBroadcast working columns")
    val hist = right
      .filter((keys.map(col(_).isNotNull) :+ col(s"`$rightTime`").isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(
        struct(col(s"`$rightTime`").as("__rt") +: payload.map(c => col(s"`$c`")): _*)))
        .as("__hist"))
    (left.join(broadcast(hist), keys, "left"), leftCols)
  }

  /** Nearest as-of: whichever of the prior / next right rows is closer
    * in time (equidistant → prior). One shuffle + sort; both direction
    * frames ride the same ordered partition.
    */
  def asofJoinNearest(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    if (broadcastEligible(right, rightTime, payload))
      return asofJoinBroadcastNearest(left, right, keys, leftTime, rightTime, payload, tolerance)
    val (unioned, leftCols) =
      tagAndUnion(left, right, keys, leftTime, rightTime, payload, lTag = 1, rTag = 0)
    val ordered = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
    // right (0) sorts before left (1) at equal time: the backward frame
    // sees the equal-time right at distance 0, which nearest prefers
    // anyway — the forward frame deliberately starts after it (under the
    // REVERSED ordering below, the equal-time right sorts after the left
    // row and falls outside the running frame — same exclusion).
    // Both directions use incremental [unboundedPreceding, current]
    // frames: a [current, unboundedFollowing] frame re-aggregates from
    // scratch per row in Spark (O(rows²) per key) — the reversed-order
    // running frame is the O(n) form, costing one extra sort over the
    // exchange both windows already share.
    // desc_nulls_first (not plain desc): a NULL left time must see an
    // EMPTY frame and get a null payload — the same "no match" answer
    // the ascending backward frame (nulls first) and the broadcast
    // path's null-propagating filter already give. Plain desc sorts
    // nulls last, where the running frame would span every right row
    // and hand the null-time row the key's earliest payload.
    val orderedRev = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc_nulls_first, col("__tag").desc_nulls_first)
    val b = last(col("__pay"), ignoreNulls = true)
      .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val f = last(col("__pay"), ignoreNulls = true)
      .over(orderedRev.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val db = col("__t") - col("__b").getField("__rt")
    val df = col("__f").getField("__rt") - col("__t")
    val bOk = col("__b").isNotNull && tolerance.map(t => db <= t).getOrElse(lit(true))
    val fOk = col("__f").isNotNull && tolerance.map(t => df <= t).getOrElse(lit(true))
    unioned
      .withColumn("__b", b)
      .withColumn("__f", f)
      .filter(col("__tag") === 1)
      .withColumn("__pick",
        when(bOk && (!fOk || db <= df), col("__b"))
          .when(fOk, col("__f")))
      .select(leftCols.map(c => col(s"`$c`")) ++
        payload.map(c => col("__pick").getField(c).as(c)): _*)
  }

  private def directed(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      backward: Boolean, tolerance: Option[Long]): DataFrame = {
    // Tag choice IS the inclusive-tie rule: ordering is (__t, __tag), and
    // the side sorting first at equal time must be the one the frame
    // still covers. Backward (asc order, [unboundedPreceding, current] +
    // last): right (0) sorts before left (1), so an equal-time right row
    // is inside the frame. Forward: same property mirrored under the
    // REVERSED ordering — (__t desc, __tag desc) puts the equal-time
    // right (1) before the left (0), inside the running frame. Both
    // directions therefore use the incremental [unboundedPreceding,
    // current] frame; a [current, unboundedFollowing] frame would
    // re-aggregate from scratch per row (O(rows²) per key in Spark's
    // UnboundedFollowingWindowFunctionFrame).
    val (lTag, rTag) = if (backward) (1, 0) else (0, 1)
    val (unioned, leftCols) =
      tagAndUnion(left, right, keys, leftTime, rightTime, payload, lTag, rTag)
    // forward uses desc_nulls_first so a NULL left time sees an empty
    // frame (null payload) — consistent with backward's nulls-first
    // ascending order and with the broadcast path (see asofJoinNearest)
    val ordered =
      if (backward)
        Window.partitionBy(keys.map(col): _*).orderBy(col("__t"), col("__tag"))
      else
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t").desc_nulls_first, col("__tag").desc_nulls_first)
    val (w, pick) =
      (ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow),
        last(col("__pay"), ignoreNulls = true))
    val dist =
      if (backward) col("__t") - col("__pay").getField("__rt")
      else col("__pay").getField("__rt") - col("__t")
    val withPick = unioned
      .withColumn("__pay", pick.over(w))
      .filter(col("__tag") === lTag)
    val bounded = tolerance match {
      case Some(t) => withPick.withColumn("__pay", when(dist <= t, col("__pay")))
      case None    => withPick
    }
    bounded.select(leftCols.map(c => col(s"`$c`")) ++
      payload.map(c => col("__pay").getField(c).as(c)): _*)
  }

  /** Shared tag-and-union prologue. The right payload travels as ONE
    * struct per right row — the ignoreNulls pick must skip left rows but
    * NOT right rows whose payload value is null, and with several
    * payload columns carried independently one output row could mix
    * values from different right rows. The struct leads with `__rt` (the
    * matched right time) so tolerance/nearest can measure distance to
    * the PICKED row, not the current one. Null keys / null timestamps on
    * the right are filtered: they can never match under join-equality
    * semantics, but unfiltered they WOULD (nulls-first ordering sorts a
    * null-time right row before everything; partitionBy groups null
    * keys).
    */
  private def tagAndUnion(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      lTag: Int, rTag: Int): (DataFrame, Seq[String]) = {
    require(payload.nonEmpty, "payload columns required")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload ${payload.intersect(leftCols)} collide with left columns")
    require(!payload.contains("__rt"),
      "payload column __rt collides with asofJoin working columns")
    val reserved = Seq("__t", "__tag", "__pay", "__b", "__f", "__pick")
      .filter(leftCols.contains)
    require(reserved.isEmpty,
      s"left columns $reserved collide with asofJoin working columns")
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(lTag))
    val rTagged = right
      .filter((keys.map(col(_).isNotNull) :+ col(rightTime).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) :+ col(rightTime).as("__t") :+ lit(rTag).as("__tag") :+
          struct(col(rightTime).as("__rt") +: payload.map(col): _*).as("__pay"): _*)
    (lTagged.unionByName(rTagged, allowMissingColumns = true), leftCols)
  }
}
