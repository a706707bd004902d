package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: salted join and two-phase aggregation.
  *
  * AQE's skew-join handling (on by default) splits oversized partitions at
  * runtime and is the first line of defense; these operators are the
  * deliberate form for *known* pathological keys — e.g. a null-heavy FK or
  * a single user with 10⁹ events — where pre-salting avoids even building
  * the skewed partition.
  */
object SkewJoin {

  /** Inner equi-join where `big` is heavily skewed on `key`: the big side
    * scatters each row into one of `salt` sub-keys (deterministically, by
    * hashing a unique column so results are reproducible), and the small
    * side replicates `salt` ways. The shuffle then spreads each hot key
    * over `salt` reducers. Replication cost: |small| × salt — keep the
    * salt modest (8–64) and the small side genuinely small.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      scatterBy: String, salt: Int = 16): DataFrame = {
    val b = big.withColumn("__salt", pmod(xxhash64(col(scatterBy)), lit(salt)).cast("int"))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Spark's
    * hash-aggregate already does map-side partial combine, which handles
    * most skew; this explicit form also splits the REDUCE side of a hot
    * key across `salt` tasks — for when one key's partials alone exceed a
    * single reducer.
    */
  def saltedCount(df: DataFrame, key: String, scatterBy: String, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(scatterBy)), lit(salt)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
