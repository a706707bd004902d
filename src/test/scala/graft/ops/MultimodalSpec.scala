package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "abc"))
    .toDF("doc_id", "text")

  test("asMediaTable: payload is UTF-8 bytes, meta typed and deterministic") {
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName == "binary")
    val r = m.filter(col("media_id") === 1L).collect()(0)
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Long]("n_bytes") == 11L)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    assert(Seq("image/png", "audio/wav").contains(meta.getAs[String]("media_type")))
    assert(meta.getAs[Int]("width") >= 1 && meta.getAs[Int]("width") <= 1920)
  }

  test("extractFeatures: deterministic stub features, fixed dim, empty payload safe") {
    val feats = Multimodal.extractFeatures(
      Multimodal.asMediaTable(docs, "doc_id", "text"), featureDim = 4)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).feature.length == 4)
    assert(feats(2L).n_bytes == 0L && feats(2L).byte_mean == 0.0)
    assert(feats(2L).feature.toSeq == Seq(0f, 0f, 0f, 0f))
    // "abc" = bytes 97,98,99 → mean 98; dim-strided: [97, 98, 99, 0]
    assert(feats(3L).byte_mean == 98.0)
    assert(feats(3L).feature.toSeq == Seq(97f, 98f, 99f, 0f))
    // determinism: run twice, same result
    val again = Multimodal.extractFeatures(
      Multimodal.asMediaTable(docs, "doc_id", "text"), featureDim = 4)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(again(1L) == feats(1L).feature.toSeq)
  }
}
