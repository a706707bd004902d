package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("mergeProfiles(random split) ≡ direct groupProfile, bit-identical, on 10 seeds") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 200).map(_ =>
        (s"g${rnd.nextInt(4)}", rnd.nextInt(1000).toLong - 500L))
      val df = rows.toDF("g", "v")
      val mask = rows.map(_ => rnd.nextBoolean())
      val a = rows.zip(mask).filter(_._2).map(_._1).toDF("g", "v")
      val b = rows.zip(mask).filterNot(_._2).map(_._1).toDF("g", "v")
      val direct = Incremental.groupProfile(df, Seq("g"), "v")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val merged = Incremental.mergeProfiles(
        Incremental.groupProfile(a, Seq("g"), "v"),
        Incremental.groupProfile(b, Seq("g"), "v"), Seq("g"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(merged == direct, s"seed $seed")
    }
  }

  test("mergeProfiles: a group present in only one slice survives intact") {
    val a = Incremental.groupProfile(Seq(("x", 1L), ("x", 5L)).toDF("g", "v"), Seq("g"), "v")
    val b = Incremental.groupProfile(Seq(("y", 7L)).toDF("g", "v"), Seq("g"), "v")
    val m = Incremental.mergeProfiles(a, b, Seq("g"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(m == Set(("x", 2L, 6L, 1L, 5L), ("y", 1L, 7L, 7L, 7L)))
  }

  test("distinctSketch: merged-slice estimate ≡ direct estimate; error inside the HLL bound") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 5000).map(_ => (s"g${rnd.nextInt(3)}", rnd.nextInt(2000).toLong))
      val df = rows.toDF("g", "v")
      val mask = rows.map(_ => rnd.nextBoolean())
      val a = rows.zip(mask).filter(_._2).map(_._1).toDF("g", "v")
      val b = rows.zip(mask).filterNot(_._2).map(_._1).toDF("g", "v")
      val direct = Incremental.estimateDistinct(
        Incremental.distinctSketch(df, Seq("g"), "v"))
        .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
      val merged = Incremental.estimateDistinct(
        Incremental.mergeDistinctSketches(
          Incremental.distinctSketch(a, Seq("g"), "v"),
          Incremental.distinctSketch(b, Seq("g"), "v"), Seq("g")))
        .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
      assert(merged == direct,
        s"seed $seed: register-max union must equal the direct sketch")
      val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
        .as[(String, Long)].collect().toMap
      for ((g, n) <- exact) {
        val err = math.abs(direct(g).toDouble - n) / n
        assert(err <= 0.03, s"seed $seed group $g: estimate ${direct(g)} vs $n (err $err)")
      }
    }
  }

  test("applyUpsert: updates replace, inserts append, untouched and null-keyed base pass through") {
    val base = Seq(
      (java.lang.Long.valueOf(1L), "a"), (java.lang.Long.valueOf(2L), "b"),
      (null.asInstanceOf[java.lang.Long], "orphan")).toDF("k", "v")
    val delta = Seq(
      (java.lang.Long.valueOf(2L), "B2"), (java.lang.Long.valueOf(9L), "new"),
      (null.asInstanceOf[java.lang.Long], "dropped")).toDF("k", "v")
    val out = Incremental.applyUpsert(base, delta, Seq("k"))
      .as[(Option[Long], String)].collect().toSeq
    assert(out.toSet == Set(
      (Some(1L), "a"), (Some(2L), "B2"), (Some(9L), "new"), (None, "orphan")))
    assert(out.size == 4, s"no duplicate rows: $out")
  }
}
