package graft

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SyntaxSpec extends SparkSpec {
  import spark.implicits._
  import graft.syntax._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (3L, "short"),
    (4L, "mail me at a@b.co today"))
    .toDF("doc_id", "text")

  test("fluent chain delegates to the library operators") {
    val deduped = docs.dedupExact("text", "doc_id")
    assert(deduped.count() == 3, "exact dup dropped")
    val scrubbed = docs.scrubPii("text")
      .filter($"doc_id" === 4L).select("text").as[String].head()
    assert(scrubbed == "mail me at <EMAIL> today")
    val langs = docs.withLangId("text").select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(langs(1L) == "en" && langs(3L) == "und")
    val profile = docs.missingProfile().count()
    assert(profile == 2L, "one row per column")
    val metrics = docs.withQualityMetrics("text")
    assert(metrics.columns.contains("quality_score") && metrics.columns.contains("doc_id"))
    val clusters = docs.nearDupClusters("text", "doc_id", threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(clusters(2L) == 1L && clusters(3L) == 3L)
  }

  test("fluent survival/privacy surface delegates to the library operators") {
    val subjects = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 0L))
      .toDF("c", "duration", "observed")
    val km = subjects.kaplanMeier("c", "duration", "observed")
    assert(km.columns.contains("survival_fp") && km.count() == 3)
    val rmst = subjects.restrictedMeanSurvival("c", "duration", "observed", tau = 3L)
    assert(rmst.count() == 1 && rmst.columns.contains("rmst_fp"))
    val qi = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("g", "s")
    assert(qi.kAnonymity(Seq("g"), 2L).columns.contains("at_risk"))
    assert(qi.lDiversity(Seq("g"), "s", 2L).columns.contains("diversity"))
    val tok = qi.pseudonymize(Seq("g"), "salt")
      .select("g").as[String].collect()
    assert(tok.forall(_.matches("[0-9a-f]{32}")))
    assert(qi.shuffleSkewProfile("g", 4).columns.contains("load_ratio"))
    val buckets = Seq(("g", 1L, 3.0), ("g", 2L, 2.0), ("g", 3L, 1.0))
      .toDF("grp", "id", "score")
      .rankBuckets("grp", col("score"), "id", buckets = 3)
    assert(buckets.columns.contains("bucket"))
  }

  test("fluent curation chain delegates end-to-end") {
    val split = docs.hashSplit("doc_id", 8000, 1000)
    assert(split.columns.contains("split") && split.count() == 4)
    val block = Seq(4L).toDF("doc_id")
    val curated = docs
      .withoutBlocklisted(block, "doc_id")
      .withColumn("grp", lit("all"))
      .withColumn("n_tokens", (length($"text") / lit(5)).cast("long"))
      .tokenBudget("grp", "n_tokens", $"n_tokens", "doc_id", budget = 1000L)
    assert(curated.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    val chunks = docs.chunkDocuments("text", 16, 16)
    assert(chunks.filter($"doc_id" === 3L).count() == 1)
    val packed = docs.withColumn("n_tokens", lit(10L))
      .packSequences("doc_id", "n_tokens", capacity = 16L)
    assert(packed.select("start_offset").as[Long].collect().sorted.toSeq
      == Seq(0L, 10L, 20L, 30L))
    val shuffled = docs.shuffleOrder("doc_id")
    assert(shuffled.select("shuffle_rank").as[Long].collect().sorted.toSeq
      == Seq(0L, 1L, 2L, 3L))
    val mixed = docs.epochMixture("doc_id", "text", Map.empty)
    assert(mixed.isEmpty) // no weights → everything drops
  }

  test("round-4 wrappers delegate: flagSeenIn / exactContaminationAgainst / groupQuota / cosineClusters") {
    val history = Seq("the quick brown fox jumps over the lazy dog near the river bank")
      .toDF("text")
    val seen = docs.flagSeenIn(history, "text")
      .select("doc_id", "in_history").as[(Long, Boolean)].collect().toMap
    assert(seen(1L) && seen(2L) && !seen(3L) && !seen(4L))
    val overlap = docs.exactContaminationAgainst(history, "text", "doc_id", n = 3)
      .filter($"doc_id" === 1L).select("hit_frac").as[Double].head()
    assert(overlap == 1.0)
    val capped = docs.withColumn("src", lit("s")).groupQuota("src", "doc_id", 2)
    assert(capped.count() == 2)
    val vecs = Seq((0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val cl = vecs.cosineClusters("vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toMap
    assert(cl == Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
  }

  test("round-5 wrappers delegate: nfcNormalize / canonicalizeUrls / domainProfile") {
    val nfc = Seq("café").toDF("text").nfcNormalize("text")
      .as[String].head()
    assert(nfc == "café")
    val urls = Seq("HTTPS://A.COM:443/x?utm_source=1&b=2#f").toDF("url")
    assert(urls.canonicalizeUrls("url").as[String].head() == "https://a.com/x?b=2")
    val prof = Seq("https://www.a.com/1", "https://a.com/2").toDF("url")
      .domainProfile("url").as[(String, Long, Long)].collect().toSeq
    assert(prof == Seq(("a.com", 2L, 2L)))
  }

  test("round-8 wrapper delegates: bigramFamiliarity") {
    val out = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
      .bigramFamiliarity("doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(out.keySet == Set(1L, 2L))
  }

  test("round-8 wrappers delegate: asofJoin family") {
    val trades = Seq(("A", 10L, 1)).toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 8L, 100.0), ("A", 13L, 101.0)).toDF("sym", "qt", "px")
    def px(d: org.apache.spark.sql.DataFrame): Option[Double] =
      d.select("px").as[Option[Double]].head()
    assert(px(trades.asofJoin(quotes, Seq("sym"), "t", "qt", Seq("px"))) == Some(100.0))
    assert(px(trades.asofJoinForward(quotes, Seq("sym"), "t", "qt", Seq("px"))) == Some(101.0))
    assert(px(trades.asofJoinNearest(quotes, Seq("sym"), "t", "qt", Seq("px"))) == Some(100.0))
  }
}
