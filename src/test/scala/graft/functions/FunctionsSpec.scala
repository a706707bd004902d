package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native-expression column API: results match the kernels, SQL
  * registration works, and projections stay inside whole-stage codegen.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "tiny"),
    (4L, null.asInstanceOf[String]))
    .toDF("doc_id", "text")

  test("column API matches kernel results, null-safe") {
    val rows = docs.select(
      col("doc_id"),
      simhash64(col("text")).as("sh"),
      rolling_fingerprint(col("text")).as("rf"),
      content_fingerprint(col("text"), 3).as("cf"),
      shingle_hash_set(col("text"), 3).as("set"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("sh") ==
      TextKernels.simhash64("the quick brown fox jumps over the lazy dog").longValue())
    assert(rows(1L).getAs[Long]("sh") == rows(2L).getAs[Long]("sh"))
    assert(rows(1L).getAs[Long]("rf") ==
      TextKernels.rollingFingerprint("the quick brown fox jumps over the lazy dog").longValue())
    assert(rows(3L).getAs[scala.collection.Seq[Long]]("set").isEmpty, "short doc → empty set")
    assert(rows(4L).isNullAt(1) && rows(4L).isNullAt(2), "null text → null outputs")
  }

  test("minhash_signature: null for empty set, k values otherwise") {
    val r = docs.select(
      col("doc_id"),
      minhash_signature(shingle_hash_set(col("text"), 3), 16).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(r(1L).getAs[scala.collection.Seq[Long]]("sig").length == 16)
    assert(r(3L).isNullAt(1), "too-short doc → null signature")
    assert(r(1L).getAs[scala.collection.Seq[Long]]("sig") ==
      r(2L).getAs[scala.collection.Seq[Long]]("sig"))
  }

  test("jaccard_sorted on identical and disjoint sets") {
    val out = docs.filter(col("text").isNotNull)
      .select(shingle_hash_set(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
      .as("l").crossJoin(docs.filter(col("doc_id") === 1L)
        .select(shingle_hash_set(col("text"), 3).as("s")).as("r"))
      .select(jaccard_sorted(col("l.s"), col("r.s")).as("j"))
      .as[Double].collect().toSeq.sorted
    assert(out == Seq(1.0, 1.0))
  }

  test("SQL registration: functions callable from spark.sql") {
    registerSql(spark)
    docs.filter(col("text").isNotNull).createOrReplaceTempView("fdocs")
    val r = spark.sql(
      """SELECT doc_id, graft_simhash64(text) AS sh,
        |  graft_jaccard_sorted(graft_shingle_hash_set(text, 3),
        |                       graft_shingle_hash_set(text, 3)) AS j
        |FROM fdocs WHERE doc_id = 1""".stripMargin).collect()(0)
    assert(r.getAs[Long]("sh") ==
      TextKernels.simhash64("the quick brown fox jumps over the lazy dog").longValue())
    assert(r.getAs[Double]("j") == 1.0)
  }

  test("GraftExtensions injects all functions without error") {
    // extensions bind at session build; here we apply to a fresh
    // SparkSessionExtensions and confirm every builder registers
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("minhash_union SQL aggregate via registerSql") {
    registerSql(spark)
    docs.filter(col("text").isNotNull).createOrReplaceTempView("fdocs2")
    val sig = spark.sql(
      """SELECT graft_minhash_union(
        |  graft_minhash_signature(graft_shingle_hash_set(text, 3), 16), 16) AS s
        |FROM fdocs2""".stripMargin).collect()(0)
    assert(sig.getAs[scala.collection.Seq[Long]]("s").length == 16)
  }

  test("round-3 kernels callable from spark.sql: text_metrics, lang_id, bpe, lsh_keys") {
    registerSql(spark)
    docs.filter(col("text").isNotNull).createOrReplaceTempView("fdocs3")
    val r = spark.sql(
      """SELECT doc_id,
        |  graft_text_metrics(text).n_tokens AS ntok,
        |  graft_lang_id(text) AS lang,
        |  graft_bpe_token_count(text) AS bpe,
        |  graft_lsh_keys(array(CAST(1.0 AS DOUBLE), CAST(-0.5 AS DOUBLE)), 2, 4, 2) AS keys
        |FROM fdocs3 WHERE doc_id = 1""".stripMargin).collect()(0)
    assert(r.getAs[Long]("ntok") == 9L)
    assert(r.getAs[String]("lang") == "en")
    assert(r.getAs[Long]("bpe") == 9L)
    assert(r.getAs[scala.collection.Seq[Long]]("keys").length == 2)
  }

  test("quantize_int8: dequantization error ≤ scale/2, extremes hit ±127, zero vector safe") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f)),              // zero vector → scale 0, zero code
      (3L, Array(-3.0f, 3.0f, 1.5f)))
      .toDF("id", "v")
    val rows = vecs.select(col("id"), quantize_int8(col("v")).as("qz"))
      .select(col("id"), col("qz.scale"), col("qz.q")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Byte](2))).toMap
    val (s1, q1) = rows(1L)
    assert(q1.head == 127 && s1 == 1.0 / 127.0)
    // reconstruction error bound: |v - q*scale| <= scale/2 per element
    Seq(1.0f, -0.5f, 0.25f, 0.0f).zip(q1).foreach { case (v, q) =>
      assert(math.abs(v - q * s1) <= s1 / 2 + 1e-12, s"err too large for $v -> $q")
    }
    val (s2, q2) = rows(2L)
    assert(s2 == 0.0 && q2.forall(_ == 0))
    val (_, q3) = rows(3L)
    assert(q3.min == -127 && q3.max == 127)
  }

  test("projection with custom expressions stays in whole-stage codegen") {
    // a real file source (local relations constant-fold before planning)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(simhash64(col("text")), rolling_fingerprint(col("text")),
        minhash_signature(shingle_hash_set(col("text"), 3), 8),
        text_metrics(col("text")), graft.functions.lang_id(col("text")),
        bpe_token_count(col("text")), bpe_merge_count(col("text")),
        clean_whitespace(col("text")), compression_ratio(col("text")))
    val plan = real.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen'd project, got:\n$plan")
    assert(real.count() > 0)
  }
}
