package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, attach the payload of
  * the latest right row with `rightTime <= leftTime` on the same key.
  *
  * Spark has no native ASOF JOIN; the naive formulation (range join +
  * per-left-row max) explodes to |L|×|R| per key. This implementation is
  * the scalable union-and-carry-forward form: tag both sides, union, one
  * shuffle on the key, then a single ordered window pass carries the most
  * recent right payload forward into each left row —
  * O((|L|+|R|) log) per key, no pair materialization, AQE-friendly.
  *
  * Semantics: inclusive (`<=`); ties on time resolve to the right row
  * (right sorts before left at equal time). If the right side can hold
  * multiple rows per (key, time), pre-dedup it (e.g.
  * [[graft.clean.Cleaners.dedupKeepFirst]]) — the window would otherwise
  * pick the physically-last one nondeterministically.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload ${payload.intersect(leftCols)} collide with left columns")
    val reserved = Seq("__t", "__tag", "__pay").filter(leftCols.contains)
    require(reserved.isEmpty,
      s"left columns $reserved collide with asofJoin working columns")

    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    // payload travels as ONE struct per right row: `last(ignoreNulls)` must
    // skip left rows but NOT right rows whose payload value is null — and
    // with several payload columns carried independently, one output row
    // could otherwise mix values from different right rows.
    // Null keys / null timestamps on the right can never match any left
    // row under join-equality (= ASOF) semantics — and unfiltered they
    // WOULD match: nulls-first ordering sorts a null-time right row before
    // everything, and partitionBy groups null keys together.
    val rTagged = right
      .filter((keys.map(col(_).isNotNull) :+ col(rightTime).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__tag") :+
          struct(payload.map(col): _*).as("__pay"): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"`$c`")) ++
        payload.map(c => col("__pay").getField(c).as(c)): _*)
  }
}
