package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: exact brute-force cosine top-k — a broadcast of the (small)
  * query set against the corpus, so the corpus is scanned once, never
  * shuffled. Scale path: random-hyperplane LSH bucketing — candidates share
  * a bucket key, turning the n×m cross product into a bucket-local join.
  * All arithmetic is double-precision (float inputs are upcast) so results
  * are deterministic and oracle-comparable.
  */
object Similarity {

  /** Dot product of two equal-length array columns, in sequential double
    * precision — a native codegen'd expression
    * ([[graft.functions.expressions.VecDot]]); the HOF formulation
    * (`aggregate(zip_with(...))`) is interpreted per element.
    */
  def dot(a: Column, b: Column): Column = graft.functions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [−1, 1]; null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn)
  }

  /** Exact top-k nearest neighbors for each query vector.
    *
    * `queries` (small: user queries, centroids, probe sets) is broadcast;
    * the corpus streams through map-side, computing cosine per
    * (query, item) pair, then a single shuffle on query id ranks the top-k.
    * Ranking uses the ROUNDED similarity (6 dp) with the item id as a
    * tiebreak, so results are stable across engines and runs.
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv")))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val joined = c.join(q,
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val scored = joined.select(
      col("query_id"), col("neighbor_id"),
      round(cosine(col("__qv"), col("__cv")), 6).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine_sim"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  // --- random-hyperplane LSH (the 100 TB path) -------------------------------

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * SplitMix64 mapped to [−1, 1]. Computed driver-side into literal
    * arrays — no RNG state, no per-row regeneration; executors see plain
    * constants in the plan.
    */
  private def planeComponent(plane: Int, d: Int): Double =
    java.lang.Math.floorMod(
      graft.functions.TextKernels.mix64(plane * graft.functions.TextKernels.Gamma + d),
      2000001L).toDouble / 1000000.0 - 1.0

  /** LSH bucket signature: one sign bit per hyperplane, packed into a long.
    * Vectors with high cosine land in the same bucket with probability
    * (1 − θ/π) per plane. Each projection is one codegen'd [[dot]] against
    * a constant plane array.
    */
  def hyperplaneBucket(vec: Column, dim: Int, numPlanes: Int = 12): Column = {
    val bits = (0 until numPlanes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d))): _*)
      when(dot(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate NN via LSH bucketing: corpus and queries are both
    * bucketed; candidates are bucket-mates; exact cosine ranks within
    * the candidate set. One shuffle on bucket id (instead of a full
    * cross product); recall tunes with `numPlanes` (fewer planes = bigger
    * buckets = higher recall, more compute).
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      dim: Int, k: Int, numPlanes: Int = 12): DataFrame = {
    val c = corpus.select(
      col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
      hyperplaneBucket(col(corpusVec), dim, numPlanes).as("__bucket"))
    val q = queries.select(
      col(queryId).as("query_id"), col(queryVec).as("__qv"),
      hyperplaneBucket(col(queryVec), dim, numPlanes).as("__bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine_sim"), asc("neighbor_id"))
    c.join(q, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(cosine(col("__qv"), col("__cv")), 6).as("cosine_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine ≥ threshold.
    *
    * Exact all-pairs is inherently O(n²) in similarity computations, so the
    * kernel matters: one side is broadcast as a plain float-array matrix
    * and each partition of the other side runs a tight dot-product loop —
    * the declarative form (pair join + `zip_with`/`aggregate` cosine) is
    * interpreted per element and ~100× slower. The per-pair math matches
    * the HOF/oracle formulation exactly: sequential double-precision dot
    * and norms, rounded half-even to 6 dp.
    *
    * Scale contract: the broadcast side must fit in executor memory
    * (~2 GB ≈ 8M 64-dim float vectors); beyond that, route through
    * [[hyperplaneBucket]] / [[lshTopK]] (approximate) or shard the
    * broadcast side and union the outputs (exact, n/shard passes).
    */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val side = vecs.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(side)
    vecs.mapPartitions { it =>
      val corpus = bc.value
      it.flatMap { case (ida, va) =>
        val normA = {
          var s = 0.0; var i = 0
          while (i < va.length) { s += va(i) * va(i); i += 1 }
          math.sqrt(s)
        }
        // corpus is sorted by id: binary-search the first id > ida and
        // only scan the upper triangle
        var lo = 0; var hi = corpus.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (corpus(mid)._1 <= ida) lo = mid + 1 else hi = mid
        }
        (lo until corpus.length).iterator.flatMap { j =>
          val (idb, vb) = corpus(j)
          var dot = 0.0; var nb = 0.0; var i = 0
          while (i < va.length) { dot += va(i) * vb(i); nb += vb(i) * vb(i); i += 1 }
          val denom = normA * math.sqrt(nb)
          if (denom > 0) {
            // half-up for non-negatives, matching SQL round() semantics
            val x = dot / denom * 1e6
            val sim = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)) / 1e6
            if (sim >= threshold) Iterator.single((ida, idb, sim)) else Iterator.empty
          } else Iterator.empty
        }
      }
    }.toDF("id_a", "id_b", "cosine_sim")
  }
}
