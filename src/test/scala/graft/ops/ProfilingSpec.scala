package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: boundaries land as documented; under/overflow catch everything") {
    // [0, 10) in 5 bins of width 2: lo edge inclusive, hi edge overflow
    val vs = Seq(-0.1, 0.0, 1.99, 2.0, 9.99, 10.0, 42.0, Double.NaN)
      .map(Tuple1(_)).toDF("v")
    val out = Profiling.histogram(vs.filter(!isnan(col("v"))), "v", 0.0, 10.0, 5)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(-1L -> 1L, 0L -> 2L, 1L -> 1L, 4L -> 1L, 5L -> 2L), s"got $out")
    // nulls are excluded, not binned
    val withNull = Seq(Some(1.0), None).map(Tuple1(_)).toDF("v")
    assert(Profiling.histogram(withNull, "v", 0.0, 10.0, 5)
      .agg(sum("n")).as[Long].head == 1L)
  }

  test("psi: identical snapshots score exactly zero; a shifted snapshot alarms") {
    val base = (1 to 500).map(i => Tuple1((i % 100).toDouble)).toDF("v")
    val same = Profiling.psi(base, base, "v", 0.0, 100.0, 10)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(same.size == 12) // 10 bins + under/overflow, every bin present
    assert(same.forall(r => r._4 == 0.0), s"identical → zero terms: $same")
    val shifted = base.withColumn("v", col("v") * 1.5 + 10)
    val drift = Profiling.psi(base, shifted, "v", 0.0, 100.0, 10)
      .agg(sum("psi_term")).as[Double].head
    assert(drift > 0.1, s"shift must alarm, got $drift")
  }
}
