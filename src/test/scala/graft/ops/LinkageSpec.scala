package graft.ops

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("weights: driver-side fixed-point log2 odds; m=1 disagreement floor") {
    assert(Linkage.agreeWeight(0.5, 0.25, 1000L) == 1000L) // log2(2) = 1
    assert(Linkage.disagreeWeight(0.5, 0.25, 1000L) == -585L) // log2(2/3)
    assert(Linkage.agreeWeight(0.95, 0.001, 1000L) == 9892L)
    assert(Linkage.disagreeWeight(1.0, 0.5, 1000L) == -64000L)
    intercept[IllegalArgumentException] {
      Linkage.agreeWeight(0.5, 0.0, 1000L)
    }
  }

  test("probabilisticLinkage: blocked pairs, literal-sum scores, null fields carry no weight") {
    val left = Seq(
      (1L, 10L, "ann", "rome"),
      (2L, 10L, "bob", null.asInstanceOf[String]),
      (3L, 20L, "cat", "oslo")
    ).toDF("ida", "blk", "name", "city")
    val right = Seq(
      (101L, 10L, "ann", "rome"),
      (102L, 10L, "ann", "bern"),
      (103L, 30L, "cat", "oslo")
    ).toDF("idb", "blk", "name", "city")
    val fields = Seq(
      Linkage.LinkField("name", "name", 0.5, 0.25), // +1000 / −585
      Linkage.LinkField("city", "city", 0.5, 0.25))
    val out = Linkage.probabilisticLinkage(left, right, "ida", "idb",
      "blk", "blk", fields, upper = 1.5, lower = -0.5, scale = 1000L)
      .orderBy("ida", "idb").collect()
    // block 10: 2 left × 2 right; block 20/30 never meet
    assert(out.length == 4)
    val r11 = out(0) // ann/rome vs ann/rome: +1000 +1000 = 2000 → match
    assert(r11.getAs[Long]("score_fp") == 2000L &&
      r11.getAs[String]("link_class") == "match")
    val r12 = out(1) // ann/rome vs ann/bern: +1000 −585 → review
    assert(r12.getAs[Long]("score_fp") == 415L &&
      r12.getAs[String]("link_class") == "review")
    val r21 = out(2) // bob/null vs ann/rome: −585 + 0 → nonmatch
    assert(r21.getAs[Long]("score_fp") == -585L &&
      r21.getAs[String]("link_class") == "nonmatch")
    assert(r21.isNullAt(r21.fieldIndex("agree_city")), "null field → null bit")
    val r22 = out(3) // bob/null vs ann/bern: −585 + 0 → nonmatch
    assert(r22.getAs[Long]("score_fp") == -585L)
    // per-block pair guard fails fast
    val err = intercept[Exception] {
      Linkage.probabilisticLinkage(left, right, "ida", "idb",
        "blk", "blk", fields, 1.5, -0.5, 1000L,
        maxPairsPerBlock = 3L).count()
    }
    assert(err.getMessage.contains("maxPairsPerBlock"), err.getMessage)
    // duplicate rightCol would collide the agree_<rightCol> bit names
    // (ambiguous reference or silently doubled score) — fail fast
    val dup = intercept[IllegalArgumentException] {
      Linkage.probabilisticLinkage(left, right, "ida", "idb",
        "blk", "blk",
        Seq(Linkage.LinkField("name", "city", 0.5, 0.25),
          Linkage.LinkField("city", "city", 0.5, 0.25)),
        1.5, -0.5, 1000L)
    }
    assert(dup.getMessage.contains("duplicate rightCol"), dup.getMessage)
  }

  test("uProfile: exact chance-agreement histogram; nulls out of both sides") {
    val df = Seq(
      Some("a"), Some("a"), Some("b"), None
    ).map(Tuple1(_)).toDF("f1")
      .withColumn("f2", org.apache.spark.sql.functions.lit("const"))
    val out = Linkage.uProfile(df, Seq("f1", "f2")).orderBy("field").collect()
    val f1 = out(0)
    assert(f1.getAs[Long]("n") == 3L && f1.getAs[Long]("n_distinct") == 2L)
    assert(f1.getAs[Long]("u_num") == 2L) // a: 2·1; b: 0
    assert(f1.getAs[Long]("u_fp") == 333333L)
    assert(f1.getAs[Double]("u") == 0.333333)
    val f2 = out(1) // constant column: u = 1 (always agrees by chance)
    assert(f2.getAs[Long]("n") == 4L && f2.getAs[Long]("u_num") == 12L)
    assert(f2.getAs[Double]("u") == 1.0)
  }
}
