package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, attach the payload of
  * the latest right row with `rightTime <= leftTime` on the same key
  * ([[asofJoin]]), or the earliest right row with `rightTime >= leftTime`
  * ([[asofJoinForward]] — pandas `merge_asof(direction='forward')`).
  *
  * Spark has no native ASOF JOIN; the naive formulation (range join +
  * per-left-row max) explodes to |L|×|R| per key. This implementation is
  * the scalable union-and-carry form: tag both sides, union, one
  * shuffle on the key, then a single ordered window pass carries the
  * nearest right payload into each left row —
  * O((|L|+|R|) log) per key, no pair materialization, AQE-friendly.
  *
  * Semantics: inclusive (`<=` / `>=`); ties on time resolve to the right
  * row (the tag ordering places the right row inside the window frame at
  * equal time, in both directions). If the right side can hold multiple
  * rows per (key, time), pre-dedup it (e.g.
  * [[graft.clean.Cleaners.dedupKeepFirst]]) — the window would otherwise
  * pick the physically-nearest one nondeterministically.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame =
    directed(left, right, keys, leftTime, rightTime, payload, backward = true)

  /** Forward as-of: for each left row, the payload of the EARLIEST right
    * row with `rightTime >= leftTime` — "the next reading after this
    * event" (label attribution, next-maintenance lookup, forward fills).
    */
  def asofJoinForward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame =
    directed(left, right, keys, leftTime, rightTime, payload, backward = false)

  private def directed(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      backward: Boolean): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload ${payload.intersect(leftCols)} collide with left columns")
    val reserved = Seq("__t", "__tag", "__pay").filter(leftCols.contains)
    require(reserved.isEmpty,
      s"left columns $reserved collide with asofJoin working columns")

    // Tag choice IS the inclusive-tie rule: ordering is (__t, __tag), and
    // the side sorting first at equal time must be the one the frame
    // still covers. Backward ([unboundedPreceding, current] + last):
    // right (0) sorts before left (1), so an equal-time right row is
    // inside the frame. Forward ([current, unboundedFollowing] + first):
    // left (0) sorts before right (1), same property mirrored.
    val (lTag, rTag) = if (backward) (1, 0) else (0, 1)
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(lTag))
    // payload travels as ONE struct per right row: the ignoreNulls pick
    // must skip left rows but NOT right rows whose payload value is null —
    // and with several payload columns carried independently, one output
    // row could otherwise mix values from different right rows.
    // Null keys / null timestamps on the right can never match any left
    // row under join-equality (= ASOF) semantics — and unfiltered they
    // WOULD match: nulls-first ordering sorts a null-time right row before
    // everything, and partitionBy groups null keys together.
    val rTagged = right
      .filter((keys.map(col(_).isNotNull) :+ col(rightTime).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) :+ col(rightTime).as("__t") :+ lit(rTag).as("__tag") :+
          struct(payload.map(col): _*).as("__pay"): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val ordered = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
    val (w, pick) =
      if (backward)
        (ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__pay"), ignoreNulls = true))
      else
        (ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__pay"), ignoreNulls = true))
    unioned
      .withColumn("__pay", pick.over(w))
      .filter(col("__tag") === lTag)
      .select(leftCols.map(c => col(s"`$c`")) ++
        payload.map(c => col("__pay").getField(c).as(c)): _*)
  }
}
