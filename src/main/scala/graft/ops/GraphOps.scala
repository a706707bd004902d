package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph centrality over derived relation graphs (near-dup pair lists,
  * co-occurrence edges, reference links). The dedup family already
  * builds the graphs ([[Dedup.ngramJaccardPairs]],
  * [[Dedup.minhashNearDups]]) and counts their motifs
  * ([[Dedup.triangleStats]]); this module ranks WITHIN them — e.g.
  * "which document is the canonical representative of a near-dup
  * neighborhood" is exactly a centrality question, and PageRank's
  * stationary mass is a principled alternative to min-id
  * representative election when clusters are large and heterogeneous.
  *
  * All arithmetic is int64 fixed-point (rank mass scaled by 1e12,
  * damping as the rational 17/20), so every engine — and the DuckDB
  * oracle — reproduces results bit-exactly: a float power iteration
  * folds neighbor contributions in shuffle order, which no two engines
  * replay identically.
  */
object GraphOps {

  /** Fixed-point rank mass per node at iteration 0: 1.0 ≙ 1e12. */
  val RankScale: Long = 1000000000000L

  /** Damping d = 0.85 as the exact rational 17/20 — the numerator and
    * denominator are applied inside a single int64 DIV so both engines
    * truncate identically.
    */
  val DampNum: Long = 17L
  val DampDen: Long = 20L

  /** Undirected PageRank via `iters` unrolled power-iteration steps in
    * exact int64 fixed-point arithmetic.
    *
    * The edge list is canonicalized (undirected dedup, self-loops and
    * null endpoints dropped), symmetrized into an adjacency relation,
    * and every node starts with [[RankScale]] mass. One step is
    *
    * {{{ r'(u) = (1-d)·S  +  Σ_{v ∈ N(u)} (r(v) · 17) DIV (deg(v) · 20) }}}
    *
    * with S = [[RankScale]], i.e. the standard damped update with the
    * division done once per (neighbor, iteration) in integer math.
    * Nodes outside the edge list do not appear (an isolated document has
    * no centrality story to tell — and keeping the frame edge-bounded is
    * what lets this run on a pair list without ever touching the corpus
    * row count). There are no dangling nodes by construction: every
    * node in the symmetrized adjacency has degree ≥ 1.
    *
    * Scale shape: the adjacency (with each neighbor's degree attached
    * ONCE, up front) is persisted and re-probed each iteration — every
    * iteration is exactly one shuffle of the edge relation (join on the
    * neighbor id + groupBy on the node id, both map-side combinable on
    * the sum). Iterations are a fixed small constant (default 3 — rank
    * separation, not convergence, is what representative election
    * needs), so total cost is `iters` edge-bounded shuffles; for long
    * chains at cluster scale, checkpoint the rank frame every few
    * iterations the same way [[Dedup.connectedComponents]] does.
    * Overflow headroom: Σ ranks ≈ n·S conserves mass, so `r·17`
    * stays far inside int64 for any corpus that fits an int64 node
    * count.
    *
    * Output: `(id, degree, pr)` — `pr` is the fixed-point rank
    * (divide by [[RankScale]].toDouble for the conventional unit-mass
    * reading; kept integral here so oracles hash-match).
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be at least 1: $iters")
    val e = edges
      .select(least(col(s"`$srcCol`"), col(s"`$dstCol`")).as("a"),
        greatest(col(s"`$srcCol`"), col(s"`$dstCol`")).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val adj = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val deg = adj.groupBy(col("v")).agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // attach the NEIGHBOR's degree once — each iteration then needs only
    // the rank join, not a second degree join
    val adjd = adj
      .join(deg, Seq("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = RankScale / DampDen * (DampDen - DampNum) // (1-d)·S exact
    var ranks = deg.select(col("v"), lit(RankScale).as("r"))
    for (_ <- 1 to iters) {
      ranks = adjd.join(ranks, Seq("v"))
        .groupBy(col("u"))
        .agg((lit(base) +
          sum(expr(s"(r * ${DampNum}L) DIV (d * ${DampDen}L)"))).as("r"))
        .select(col("u").as("v"), col("r"))
    }
    deg.join(ranks, Seq("v"))
      .select(col("v").as("id"), col("d").as("degree"), col("r").as("pr"))
  }
}
