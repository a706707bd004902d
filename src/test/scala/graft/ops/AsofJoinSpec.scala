package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    ("A", 10L, 1), ("A", 20L, 2), ("A", 25L, 3), ("B", 5L, 4), ("C", 7L, 5))
    .toDF("sym", "t", "trade_id")
  private lazy val quotes = Seq(
    ("A", 8L, 100.0), ("A", 20L, 101.0), ("A", 22L, 102.0), ("B", 9L, 50.0))
    .toDF("sym", "qt", "px")

  test("asof: latest quote at or before each trade; no-match → null; key without quotes → null") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select("sym", "t", "trade_id", "px")
      .as[(String, Long, Int, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out == Seq(
      ("A", 10L, 1, Some(100.0)),   // quote@8
      ("A", 20L, 2, Some(101.0)),   // tie: quote@20 included (<=)
      ("A", 25L, 3, Some(102.0)),   // quote@22
      ("B", 5L, 4, None),           // first quote is later
      ("C", 7L, 5, None)))          // no quotes for key
  }

  test("a NULL payload on the latest right row is attached as NULL, not skipped") {
    val q = Seq(
      ("A", 8L, Some(100.0)), ("A", 20L, None))  // latest quote has null px
      .toDF("sym", "qt", "px")
    val out = AsofJoin.asofJoin(
      trades.filter($"t" === 25L), q, Seq("sym"), "t", "qt", Seq("px"))
      .select("trade_id", "px").as[(Int, Option[Double])].collect().toSeq
    assert(out == Seq((3, None)), "DuckDB ASOF semantics: latest row wins even when its payload is null")
  }

  test("multiple payload columns always come from the SAME right row") {
    val q = Seq(
      ("A", 8L, Some(100.0), Some("early")),
      ("A", 20L, None, Some("late")))
      .toDF("sym", "qt", "px", "src")
    val out = AsofJoin.asofJoin(
      trades.filter($"t" === 25L), q, Seq("sym"), "t", "qt", Seq("px", "src"))
      .select("px", "src").as[(Option[Double], Option[String])].collect().toSeq
    assert(out == Seq((None, Some("late"))), "no mixing of rows across payload columns")
  }

  test("forward asof: earliest quote at or after each trade; tie inclusive; no-later → null") {
    val out = AsofJoin.asofJoinForward(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select("sym", "t", "trade_id", "px")
      .as[(String, Long, Int, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out == Seq(
      ("A", 10L, 1, Some(101.0)),   // next quote@20
      ("A", 20L, 2, Some(101.0)),   // tie: quote@20 included (>=)
      ("A", 25L, 3, None),          // no quote after 25
      ("B", 5L, 4, Some(50.0)),     // quote@9 is after
      ("C", 7L, 5, None)))          // no quotes for key
  }

  test("forward asof: null payload on the earliest later row attaches as NULL") {
    val q = Seq(("A", 30L, None: Option[Double]), ("A", 40L, Some(200.0)))
      .toDF("sym", "qt", "px")
    val out = AsofJoin.asofJoinForward(
      trades.filter($"t" === 25L), q, Seq("sym"), "t", "qt", Seq("px"))
      .select("trade_id", "px").as[(Int, Option[Double])].collect().toSeq
    assert(out == Seq((3, None)), "earliest later row wins even when its payload is null")
  }

  test("nearest asof: closest side wins; equidistant goes to prior; no-match null") {
    val out = AsofJoin.asofJoinNearest(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select("sym", "t", "trade_id", "px")
      .as[(String, Long, Int, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out == Seq(
      ("A", 10L, 1, Some(100.0)),   // prior@8 (d=2) beats next@20 (d=10)
      ("A", 20L, 2, Some(101.0)),   // exact hit
      ("A", 25L, 3, Some(102.0)),   // prior@22 (d=3), no next
      ("B", 5L, 4, Some(50.0)),     // only a next@9
      ("C", 7L, 5, None)))
    // equidistant: quote@18 and quote@22 around trade@20 → prior wins
    val eq = AsofJoin.asofJoinNearest(
      Seq(("A", 20L, 9)).toDF("sym", "t", "trade_id"),
      Seq(("A", 18L, 1.0), ("A", 22L, 2.0)).toDF("sym", "qt", "px"),
      Seq("sym"), "t", "qt", Seq("px"))
      .select("px").as[Double].collect().toSeq
    assert(eq == Seq(1.0), "equidistant tie resolves to the prior row")
  }

  test("tolerance null-outs stale matches in every direction") {
    val t1 = Seq(("A", 100L, 1)).toDF("sym", "t", "trade_id")
    val q = Seq(("A", 90L, 1.0), ("A", 140L, 2.0)).toDF("sym", "qt", "px")
    def px(df: org.apache.spark.sql.DataFrame): Option[Double] =
      df.select("px").as[Option[Double]].head()
    assert(px(AsofJoin.asofJoin(t1, q, Seq("sym"), "t", "qt", Seq("px"),
      tolerance = Some(10L))) == Some(1.0))
    assert(px(AsofJoin.asofJoin(t1, q, Seq("sym"), "t", "qt", Seq("px"),
      tolerance = Some(5L))) == None)
    assert(px(AsofJoin.asofJoinForward(t1, q, Seq("sym"), "t", "qt", Seq("px"),
      tolerance = Some(40L))) == Some(2.0))
    assert(px(AsofJoin.asofJoinForward(t1, q, Seq("sym"), "t", "qt", Seq("px"),
      tolerance = Some(39L))) == None)
    // nearest: prior (d=10) within tol, next (d=40) not → prior even
    // though a smaller-tol run drops both
    assert(px(AsofJoin.asofJoinNearest(t1, q, Seq("sym"), "t", "qt", Seq("px"),
      tolerance = Some(10L))) == Some(1.0))
    assert(px(AsofJoin.asofJoinNearest(t1, q, Seq("sym"), "t", "qt", Seq("px"),
      tolerance = Some(5L))) == None)
  }

  /** Run `body` with the union path forced (auto-broadcast disabled). */
  private def unionPath[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  test("randomized: broadcast ≡ union path for backward/forward/nearest, with and without tolerance") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      // unique (key, rt) on the right per the pre-dedup contract
      val right = (for {
        k <- 1 to 5
        rt <- rnd.shuffle((1 to 60).toList).take(rnd.nextInt(12))
      } yield (s"k$k", rt.toLong, rnd.nextInt(1000).toDouble)).toDF("k", "rt", "v")
      val left = (for (i <- 1 to 40) yield
        (s"k${1 + rnd.nextInt(7)}", rnd.nextInt(70).toLong, i)).toDF("k", "lt", "row_id")
      val tol = if (seed % 2 == 0) Some(7L) else None
      def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, Option[Double])] =
        df.select("row_id", "v").as[(Int, Option[Double])].collect().toSet
      val (ub, uf, un) = unionPath {(
        rows(AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt", Seq("v"), tol)),
        rows(AsofJoin.asofJoinForward(left, right, Seq("k"), "lt", "rt", Seq("v"), tol)),
        rows(AsofJoin.asofJoinNearest(left, right, Seq("k"), "lt", "rt", Seq("v"), tol)))}
      assert(rows(AsofJoin.asofJoinBroadcast(
        left, right, Seq("k"), "lt", "rt", Seq("v"), tol)) == ub, s"backward seed=$seed")
      assert(rows(AsofJoin.asofJoinBroadcast(
        left, right, Seq("k"), "lt", "rt", Seq("v"), tol, backward = false)) == uf,
        s"forward seed=$seed")
      assert(rows(AsofJoin.asofJoinBroadcastNearest(
        left, right, Seq("k"), "lt", "rt", Seq("v"), tol)) == un, s"nearest seed=$seed")
    }
  }

  test("a NULL left time matches nothing, identically on both paths and all directions") {
    val left = Seq(("A", Option(20L), 1), ("A", Option.empty[Long], 2))
      .toDF("sym", "t", "trade_id")
    val right = Seq(("A", 10L, 1.0), ("A", 30L, 2.0)).toDF("sym", "qt", "px")
    def px(df: org.apache.spark.sql.DataFrame): Map[Int, Option[Double]] =
      df.select("trade_id", "px").as[(Int, Option[Double])].collect().toMap
    val variants = Seq[org.apache.spark.sql.DataFrame](
      unionPath(AsofJoin.asofJoin(left, right, Seq("sym"), "t", "qt", Seq("px"))),
      unionPath(AsofJoin.asofJoinForward(left, right, Seq("sym"), "t", "qt", Seq("px"))),
      unionPath(AsofJoin.asofJoinNearest(left, right, Seq("sym"), "t", "qt", Seq("px"))),
      AsofJoin.asofJoinBroadcast(left, right, Seq("sym"), "t", "qt", Seq("px")),
      AsofJoin.asofJoinBroadcast(left, right, Seq("sym"), "t", "qt", Seq("px"), backward = false),
      AsofJoin.asofJoinBroadcastNearest(left, right, Seq("sym"), "t", "qt", Seq("px")))
    for ((v, i) <- variants.zipWithIndex) {
      val m = px(v)
      assert(m(2).isEmpty, s"variant $i: null left time must match nothing")
      assert(m(1).nonEmpty, s"variant $i: the non-null row still matches")
    }
  }

  test("auto-routing stays on the union path for non-orderable (map) payloads") {
    val left = Seq(("A", 20L, 1)).toDF("sym", "t", "trade_id")
    val right = Seq(("A", 10L, Map("k" -> 1.0))).toDF("sym", "qt", "attrs")
    // tiny dim → size-eligible, but map payload is not orderable; the
    // call must succeed via the union path instead of failing analysis
    val out = AsofJoin.asofJoin(left, right, Seq("sym"), "t", "qt", Seq("attrs"))
      .select("trade_id", "attrs")
      .as[(Int, Option[Map[String, Double]])].collect().toSeq
    assert(out == Seq((1, Some(Map("k" -> 1.0)))))
  }

  test("broadcast path: the left side is never exchanged (only the dim aggregation shuffles)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val left = spark.range(1000).select(
      (col("id") % 10).cast("string").as("k"), col("id").as("lt"))
    val right = spark.range(50).select(
      (col("id") % 10).cast("string").as("k"), col("id").as("rt"),
      col("id").cast("double").as("v"))
    val out = AsofJoin.asofJoinBroadcast(left, right, Seq("k"), "lt", "rt", Seq("v"))
    val plan = out.queryExecution.sparkPlan
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"expected a BroadcastHashJoin, got:\n$plan")
    val leftShuffles = bhj.head.left.collect { case e: ShuffleExchangeExec => e }
    assert(leftShuffles.isEmpty,
      s"left (stream) side must not shuffle:\n${bhj.head.left}")
    // ... and the small-dim heuristic actually routes asofJoin there
    val routed = AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt", Seq("v"))
    assert(routed.queryExecution.sparkPlan
      .collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "auto-routing did not select the broadcast path for a tiny dim")
  }

  test("left row count preserved; payload collision rejected") {
    assert(AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px")).count()
      == trades.count())
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, quotes.withColumnRenamed("px", "t"),
        Seq("sym"), "t", "qt", Seq("t"))
    }
  }
}
