package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Dev utility: scaling behavior of the near-dup/similarity operators.
  *
  * Replicates the documents/embeddings corpora k× (with id offsets, plus a
  * content perturbation so replicas aren't trivial exact dups) and times
  * each operator at 1× and k× — the ratio exposes any superlinear
  * candidate-explosion long before a real 100 TB run would.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def replicate(times: Int): DataFrame = {
      val n = 1000000L
      (0 until times).map { i =>
        docs.select(
          (col("doc_id") + lit(i * n)).as("doc_id"),
          // perturb replicas so they're near-dups, not byte-dups
          (if (i == 0) col("text")
           else concat(col("text"), lit(s" replica$i"))).as("text"))
      }.reduce(_.unionByName(_))
    }

    def time(name: String, df: => DataFrame): Double = {
      // isolate measurements: the dedup ops persist their kernel-pass
      // frames (deliberately, see Dedup scaladoc); letting those
      // accumulate across probes causes eviction thrash that measured 3×
      // worse than any op in isolation
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s ${sec}%7.2f s  rows=$rows")
      sec
    }

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq(1, k).foreach { times =>
      val d = replicate(times)
      println(s"--- corpus ${times}x (${d.count()} docs) ---")
      time(s"minhashNearDups", Dedup.minhashNearDups(d, "text", "doc_id"))
      time(s"ngramJaccardPairs", Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.8))
      time(s"simhashNearDups", Dedup.simhashNearDups(d, "text", "doc_id"))
      time(s"nearDupFilter", Dedup.nearDupFilter(d, "text", "doc_id"))
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"--- embeddings (${emb.count()} vecs) ---")
    time("cosineNearDupPairs", Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.9))
    time("lshTopK(all-as-queries)", Similarity.lshTopK(
      emb, "vec_id", "embedding", emb, "vec_id", "embedding", dim = 64, k = 10))
    spark.stop()
  }
}
