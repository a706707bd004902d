package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val S = GraphOps.RankScale

  test("pageRank: regular graphs are fixed points of the update") {
    // path a-b (both degree 1) and triangle c-d-e (all degree 2): every
    // node's in-mass equals its out-mass, so rank stays exactly S
    val edges = Seq((1L, 2L), (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .select("id", "pr").as[(Long, Long)].collect().toMap
    assert(ranks == Map(1L -> S, 2L -> S, 10L -> S, 11L -> S, 12L -> S),
      s"got $ranks")
  }

  test("pageRank: star graph — hand-computed int64 fixed-point values") {
    // star 1-{2,3}: deg(1)=2, deg(2)=deg(3)=1, base=150e9
    // it1: r(1)=150e9+2*(S*17 DIV 20)=1850e9; r(leaf)=150e9+(S*17 DIV 40)=575e9
    // it2: r(1)=150e9+2*((575e9*17) DIV 20)=1_127_500e6
    //      r(leaf)=150e9+(1850e9*17) DIV 40=936_250e6
    // it3: r(1)=150e9+2*((936_250e6*17) DIV 20)=1_741_625e6
    //      r(leaf)=150e9+(1_127_500e6*17) DIV 40=629_187_500_000
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (id, d, r) => id -> ((d, r)) }.toMap
    assert(out(1L) == (2L, 1741625000000L), s"hub: ${out(1L)}")
    assert(out(2L) == (1L, 629187500000L), s"leaf: ${out(2L)}")
    assert(out(3L) == out(2L), "leaves symmetric")
  }

  test("pageRank: overflow guard fails fast on a hub past MaxSafeRank") {
    // mega-star: hub 0 over n degree-1 leaves concentrates ≈ n·0.85·S
    // after one step — n=700k puts the hub at ~5.95e17 > MaxSafeRank
    // ≈5.42e17, exactly the silent int64 wrap the guard exists to stop
    // (without it, iteration 2's r·17 would exceed Long.MaxValue and
    // produce wrong ranks with no error)
    val n = 700000L
    assert(n * (GraphOps.RankScale / 20L * 17L) > GraphOps.MaxSafeRank,
      "test graph must exceed the guard ceiling")
    val edges = spark.range(1L, n + 1L)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val e = intercept[Exception] {
      GraphOps.pageRank(edges, "src", "dst", iters = 2).count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${messages(t.getCause)}"
    assert(messages(e).contains("MaxSafeRank") && messages(e).contains("node 0"),
      messages(e))
    // one node under the ceiling: runs clean and the hub holds the mass
    val ok = GraphOps.pageRank(
      spark.range(1L, 1001L).select(lit(0L).as("src"), col("id").as("dst")),
      "src", "dst", iters = 3)
    assert(ok.filter(col("id") === 0L).select("pr").as[Long].head() >
      1000L * GraphOps.RankScale / 2L, "hub concentrates mass")
  }

  test("pageRank: edge canonicalization — dups, reversals, self-loops, nulls") {
    val edges = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(1L)), // reversal
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)), // dup
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(3L)), // self-loop
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(4L))
    ).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, "src", "dst", iters = 2)
      .select("id", "degree", "pr").as[(Long, Long, Long)].collect()
    // only the canonical 1-2 edge survives: two degree-1 nodes at rank S
    assert(out.toSet == Set((1L, 1L, S), (2L, 1L, S)), out.toSeq.toString)
  }

  test("pageRank: mass is conserved up to truncation and hubs outrank leaves") {
    // barbell-ish: hub 1 connected to 2..6, plus an edge 2-3
    val edges = (2L to 6L).map((1L, _)) :+ (2L, 3L)
    val out = GraphOps.pageRank(edges.toDF("src", "dst"), "src", "dst")
      .select("id", "pr").as[(Long, Long)].collect().toMap
    val total = out.values.sum
    // Σ ranks ≤ n·S (DIV truncates mass away, never creates it), and
    // within 0.1% of it for a graph this small
    assert(total <= 6L * S && total > (6L * S) / 1000L * 999L, s"total $total")
    assert(out(1L) > out(4L), "hub must outrank a pure leaf")
    assert(out(2L) > out(4L), "higher-degree node must outrank a pure leaf")
    assert(out(4L) == out(5L) && out(5L) == out(6L), "symmetric leaves tie")
  }

  test("cooccurrenceLift: hand-checked lift; A-priori floor prunes; dedup within basket") {
    // baskets: {1:(a,b,c)}, {2:(a,b)}, {3:(a)}, {4:(d, d)} -> N=4
    // n_a=3, n_b=2, n_c=1, n_d=1; pairs: (a,b)x2, (a,c)x1, (b,c)x1
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "d"), (4L, "d") // duplicate membership must not double-count
    ).toDF("basket", "item")
    val out = GraphOps.cooccurrenceLift(df, "basket", "item", minCount = 2L)
      .as[(String, String, Long, Double)].collect().toSeq
    // only (a,b) survives both floors: lift = 2*4/(3*2) = 1.333333
    assert(out == Seq(("a", "b", 2L, 1.333333)), out.toString)
    // minCount=1 keeps every co-occurring pair; d never pairs
    val all = GraphOps.cooccurrenceLift(df, "basket", "item", minCount = 1L)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(all.map(r => (r._1, r._2, r._3)) ==
      Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)), all.toString)
    // lift(a,c) = 1*4/(3*1) = 1.333333; lift(b,c) = 1*4/(2*1) = 2.0
    assert(all.map(_._4) == Seq(1.333333, 1.333333, 2.0), all.toString)
  }

  test("cooccurrenceLift: independence baseline scores lift 1") {
    // a and b in every basket: n_ab = N -> lift = N*N/(N*N) = 1
    val df = (1L to 6L).flatMap(b => Seq((b, "a"), (b, "b"))).toDF("basket", "item")
    val out = GraphOps.cooccurrenceLift(df, "basket", "item")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 6L, 1.0)), out.toString)
  }

  test("cooccurrenceLift: hot-basket guard fails fast and names the basket") {
    // one degenerate basket holding every item (each item also appears in
    // a second basket so all pass the frequency floor)
    val rows = (1 to 20).flatMap(i => Seq((999L, s"i$i"), (i.toLong, s"i$i")))
    val e = intercept[Exception] {
      GraphOps.cooccurrenceLift(rows.toDF("basket", "item"),
        "basket", "item", minCount = 2L, maxFrequentPerBasket = 10L).count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${messages(t.getCause)}"
    assert(messages(e).contains("999") &&
      messages(e).contains("maxFrequentPerBasket"), messages(e))
    // under the cap: runs clean (minCount=1 so the hot basket's 190
    // singleton pairs survive the pair floor)
    assert(GraphOps.cooccurrenceLift(rows.toDF("basket", "item"),
      "basket", "item", minCount = 1L, maxFrequentPerBasket = 25L)
      .count() == 190L)
  }

  test("randomized: pageRank == naive driver-side power iteration on 10 seeded graphs") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(20)
      val edges = Seq.fill(30 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val canon = edges.map { case (a, b) => (a.min(b), a.max(b)) }
        .filter { case (a, b) => a != b }.distinct
      val adj = canon.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
      val deg = adj.map { case (v, ns) => v -> ns.size.toLong }
      var r: Map[Long, Long] = deg.map { case (v, _) => v -> GraphOps.RankScale }
      (1 to 3).foreach { _ =>
        r = adj.map { case (u, ns) =>
          u -> (150000000000L + ns.map(v => (r(v) * 17L) / (deg(v) * 20L)).sum)
        }
      }
      val engine = GraphOps.pageRank(
        edges.toDF("src", "dst"), "src", "dst", iters = 3)
        .select("id", "pr").as[(Long, Long)].collect().toMap
      assert(engine == r, s"seed=$seed: engine $engine vs naive $r")
    }
  }

  test("randomized: cooccurrenceLift == naive driver-side fold on 10 seeded corpora") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(200)(
        (rnd.nextInt(25).toLong, s"i${rnd.nextInt(12)}"))
      val membership = rows.distinct
      val nB = membership.map(_._1).distinct.size.toLong
      val ic = membership.groupBy(_._2).map { case (i, m) => i -> m.size.toLong }
      val frequent = ic.filter(_._2 >= 2L).keySet
      val pairCounts = membership.groupBy(_._1).toSeq.flatMap { case (_, m) =>
        val f = m.map(_._2).filter(frequent).distinct.sorted
        for (x <- f.indices; y <- x + 1 until f.size) yield (f(x), f(y))
      }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
        .filter(_._2 >= 2L)
      val naive = pairCounts.map { case ((a, b), nab) =>
        (a, b, nab, BigDecimal((nab * nB).toDouble / (ic(a) * ic(b)).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
      val engine = GraphOps.cooccurrenceLift(
        rows.toDF("basket", "item"), "basket", "item", minCount = 2L)
        .as[(String, String, Long, Double)].collect().toSet
      assert(engine == naive, s"seed=$seed: engine $engine vs naive $naive")
    }
  }
}
