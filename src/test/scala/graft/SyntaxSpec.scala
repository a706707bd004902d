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
}
