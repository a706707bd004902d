package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // window = 100. user 1 completes all three steps; user 2 clicks too
  // late (out of window); user 3 clicks BEFORE viewing (wrong order);
  // user 4 never clicks. Extra early/late events must not perturb the
  // chosen earliest-qualifying times.
  private lazy val events = Seq(
    (1L, 10L, "view"), (1L, 50L, "click"), (1L, 60L, "purchase"),
    (1L, 5L, "click"),               // before the view — ignored
    (1L, 40L, "click"),              // earlier qualifying click wins
    (2L, 10L, "view"), (2L, 200L, "click"),
    (3L, 50L, "view"), (3L, 10L, "click"),
    (4L, 10L, "view"))
    .toDF("user_id", "ts", "event_type")

  test("funnelSteps keeps order, window, and earliest-qualifying semantics") {
    val out = Funnel.funnelSteps(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), window = 100L)
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((10L, Some(40L), Some(60L))),
      "earliest qualifying click (40, not 5 or 50) then purchase")
    assert(out(2L) == ((10L, None, None)), "click at 200 is outside window 100")
    assert(out(3L) == ((50L, None, None)), "click before view never qualifies")
    assert(out(4L) == ((10L, None, None)))
  }

  test("funnelCounts folds to per-step reach") {
    val row = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), window = 100L)
      .as[(Long, Long, Long)].head()
    assert(row == ((4L, 1L, 1L)))
  }

  test("funnelSteps handles dotted key names and rejects reserved ones") {
    val dotted = events.withColumnRenamed("user_id", "user.id")
    val out = Funnel.funnelSteps(dotted, "user.id", "ts", "event_type",
      Seq("view", "click", "purchase"), window = 100L)
    assert(out.columns.toSeq == Seq("user.id", "t0", "t1", "t2"))
    assert(out.count() == 4)
    val e = intercept[IllegalArgumentException] {
      Funnel.funnelSteps(events.withColumnRenamed("user_id", "t0"),
        "t0", "ts", "event_type", Seq("view", "click"), window = 100L)
    }
    assert(e.getMessage.contains("collides"))
  }

  test("randomized: funnelSteps ≡ naive per-key fold on 30 seeded event sets") {
    val types = Vector("a", "b", "c")
    val window = 25L
    (1 to 30).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val evs = Seq.fill(200)(
        (rnd.nextInt(12).toLong, rnd.nextInt(300).toLong, types(rnd.nextInt(3))))
        .distinct // duplicate (key, ts, type) rows don't change min-based semantics
      val out = Funnel.funnelSteps(evs.toDF("k", "ts", "tp"), "k", "ts", "tp",
        types, window)
        .as[(Long, Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> ((Option(r._2), r._3, r._4))).toMap

      def naive(k: Long): (Option[Long], Option[Long], Option[Long]) = {
        val mine = evs.filter(_._1 == k)
        def step(prev: Option[Long], tp: String, first: Boolean): Option[Long] =
          if (first) mine.filter(_._3 == tp).map(_._2).minOption
          else prev.flatMap(p =>
            mine.filter(e => e._3 == tp && e._2 > p && e._2 <= p + window)
              .map(_._2).minOption)
        val t0 = step(None, types(0), first = true)
        val t1 = step(t0, types(1), first = false)
        val t2 = step(t1, types(2), first = false)
        (t0, t1, t2)
      }
      val keys = evs.map(_._1).distinct
      keys.foreach { k =>
        val exp = naive(k)
        if (exp._1.isEmpty) assert(!out.contains(k), s"seed=$seed key=$k: no step-0 → no row")
        else assert(out(k) == exp, s"seed=$seed key=$k: ${out.get(k)} vs $exp")
      }
    }
  }
}
