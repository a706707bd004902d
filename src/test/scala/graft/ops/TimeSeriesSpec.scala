package graft.ops

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // buckets of width 10: user 1 hits buckets 0,0,2 (gap at 1); user 2
  // hits bucket 5 only; user 3 has only a null ts (excluded entirely)
  private lazy val events = Seq(
    (1L, Option(3L)), (1L, Option(7L)), (1L, Option(25L)),
    (2L, Option(51L)),
    (3L, Option.empty[Long]))
    .toDF("user_id", "ts")

  test("denseCounts zero-fills interior gaps per key, spans never cross keys") {
    val out = TimeSeries.denseCounts(events, "user_id", "ts", 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 2L), (1L, 1L, 0L), (1L, 2L, 1L),
      (2L, 5L, 1L)))
  }

  test("denseCounts floor-buckets negative timestamps (no double-width bucket 0)") {
    val neg = Seq((1L, Option(-5L)), (1L, Option(5L))).toDF("user_id", "ts")
    val out = TimeSeries.denseCounts(neg, "user_id", "ts", 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, -1L, 1L), (1L, 0L, 1L)),
      "ts=-5 belongs to bucket -1 under floor division, not a merged bucket 0")
  }

  test("denseCounts fails fast with a named key when a span exceeds maxBucketsPerKey") {
    val wild = Seq((7L, Option(0L)), (7L, Option(1000L))).toDF("user_id", "ts")
    val e = intercept[Exception] {
      TimeSeries.denseCounts(wild, "user_id", "ts", 1L, maxBucketsPerKey = 100L)
        .count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${messages(t.getCause)}"
    assert(messages(e).contains("maxBucketsPerKey"), messages(e))
  }

  test("randomized: denseCounts ≡ naive grid on 30 seeded event sets (incl. negative ts)") {
    (1 to 30).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val evs = Seq.fill(300)(
        (rnd.nextInt(8).toLong, rnd.nextInt(400).toLong - 200L)) // ts ∈ [-200, 200)
      val width = 1 + rnd.nextInt(20)
      val out = TimeSeries.denseCounts(
        evs.toDF("k", "ts"), "k", "ts", width.toLong)
        .as[(Long, Long, Long)].collect().toSet

      val expected = evs.groupBy(_._1).flatMap { case (k, rows) =>
        val buckets = rows.map(r => Math.floorDiv(r._2, width.toLong))
        (buckets.min to buckets.max).map(b =>
          (k, b, buckets.count(_ == b).toLong))
      }.toSet
      assert(out == expected, s"seed=$seed width=$width")
    }
  }

  test("resampleLocf carries the last non-null value across gaps; null values are not observations") {
    import org.apache.spark.sql.functions.col
    // width 10. user 1: bucket 0 has obs at ts=3 (v=1.0) and ts=7 (v=2.0)
    // → latest wins (2.0); bucket 1 empty → carried 2.0, not observed;
    // bucket 2 has ONLY a null-value event → n_events=1 but not observed,
    // carried 2.0; bucket 3 observed 9.0. user 2: first bucket unobserved
    // (null value) → value null until nothing follows.
    val ev = Seq(
      (1L, 3L, 10L, Option(1.0)), (1L, 7L, 11L, Option(2.0)),
      (1L, 25L, 12L, Option.empty[Double]),
      (1L, 33L, 13L, Option(9.0)),
      (2L, 5L, 20L, Option.empty[Double]))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.resampleLocf(ev, "user_id", "ts", "value", 10L,
      Seq(col("event_id")))
      .select("user_id", "bucket", "n_events", "is_observed", "value")
      .as[(Long, Long, Long, Boolean, Option[Double])].collect().toSet
    assert(out == Set(
      (1L, 0L, 2L, true, Some(2.0)),
      (1L, 1L, 0L, false, Some(2.0)),
      (1L, 2L, 1L, false, Some(2.0)),
      (1L, 3L, 1L, true, Some(9.0)),
      (2L, 0L, 1L, false, None)))
  }

  test("resampleInterp blends gap buckets linearly; no extrapolation outside the range") {
    import org.apache.spark.sql.functions.col
    // width 10. user 1: obs at ts=5 v=10.0 (bucket 0) and ts=35 v=40.0
    // (bucket 3). Gap buckets 1, 2 interpolate at bucket START time:
    //   t=10 → 10 + 30·(10−5)/(35−5) = 15.0
    //   t=20 → 10 + 30·(20−5)/(35−5) = 25.0
    // bucket 0/3 keep their observed values. Null-value event at ts=25
    // counts events but is not an anchor. user 2: single obs → leading
    // bucket (null-value event only) stays null — no extrapolation.
    val ev = Seq(
      (1L, 5L, 10L, Option(10.0)), (1L, 35L, 11L, Option(40.0)),
      (1L, 25L, 12L, Option.empty[Double]),
      (2L, 3L, 20L, Option.empty[Double]), (2L, 15L, 21L, Option(5.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.resampleInterp(ev, "user_id", "ts", "value", 10L,
      Seq(col("event_id")))
      .select("user_id", "bucket", "n_events", "is_observed", "value")
      .as[(Long, Long, Long, Boolean, Option[Double])].collect().toSet
    assert(out == Set(
      (1L, 0L, 1L, true, Some(10.0)),
      (1L, 1L, 0L, false, Some(15.0)),
      (1L, 2L, 1L, false, Some(25.0)),
      (1L, 3L, 1L, true, Some(40.0)),
      (2L, 0L, 1L, false, None),
      (2L, 1L, 1L, true, Some(5.0))))
  }

  test("resampleInterp keeps the latest observation in an observed bucket (LOCF anchor)") {
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      (1L, 3L, 100L, Option(1.0)), (1L, 7L, 101L, Option(3.0)),
      (1L, 27L, 102L, Option(9.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.resampleInterp(ev, "user_id", "ts", "value", 10L,
      Seq(col("event_id")))
      .select("bucket", "value").as[(Long, Option[Double])].collect().toMap
    assert(out(0L) == Some(3.0), "observed bucket keeps its last observation")
    // gap bucket 1 blends from the bucket-0 anchor (ts=7, v=3.0):
    // 3 + 6·(10−7)/(27−7) = 3.9
    assert(math.abs(out(1L).get - 3.9) < 1e-12)
    assert(out(2L) == Some(9.0))
  }

  test("resampleLocf tiebreaks equal timestamps by the tiebreak column") {
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      (1L, 5L, 100L, Option(1.0)), (1L, 5L, 200L, Option(7.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.resampleLocf(ev, "user_id", "ts", "value", 10L,
      Seq(col("event_id")))
      .select("value").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(7.0)), "higher event_id wins at equal ts")
  }

  test("denseCountsWithStaleness flags gaps and carries the last active bucket") {
    val out = TimeSeries
      .denseCountsWithStaleness(events, "user_id", "ts", 10L)
      .select("user_id", "bucket", "is_gap", "last_active_bucket")
      .as[(Long, Long, Boolean, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, false, 0L), (1L, 1L, true, 0L), (1L, 2L, false, 2L),
      (2L, 5L, false, 5L)))
  }

  test("scd2: runs collapse, half-open intervals chain, nulls and ties handled") {
    // key 1: A,A,B,B,A — three runs (A,B,A); re-appearing A reopens a run
    // key 2: null,null,X — null attr is a run (null-safe compare), then X
    // key 3: two changes at the SAME ts, tiebroken by seq — two runs
    val log = Seq(
      (1L, 10L, 100L, Some("A")), (1L, 11L, 200L, Some("A")),
      (1L, 12L, 300L, Some("B")), (1L, 13L, 400L, Some("B")),
      (1L, 14L, 500L, Some("A")),
      (2L, 20L, 100L, None), (2L, 21L, 200L, None), (2L, 22L, 300L, Some("X")),
      (3L, 30L, 100L, Some("P")), (3L, 31L, 100L, Some("Q"))
    ).toDF("k", "seq", "ts", "state")
    val out = TimeSeries.scd2(log, Seq("k"), Seq("state"), Seq("ts", "seq"))
      .select("k", "state", "valid_from", "valid_to", "is_current", "version")
      .as[(Long, Option[String], Long, Option[Long], Int, Long)]
      .collect().toSet
    assert(out == Set(
      (1L, Some("A"), 100L, Some(300L), 0, 1L),
      (1L, Some("B"), 300L, Some(500L), 0, 2L),
      (1L, Some("A"), 500L, None, 1, 3L),
      (2L, None, 100L, Some(300L), 0, 1L),
      (2L, Some("X"), 300L, None, 1, 2L),
      (3L, Some("P"), 100L, Some(100L), 0, 1L),
      (3L, Some("Q"), 100L, None, 1, 2L)))
    // intervals are gapless: every non-current valid_to == next valid_from
    val byKey = out.groupBy(_._1).values
    byKey.foreach { rows =>
      val sorted = rows.toSeq.sortBy(_._6)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3), s"gap between $a and $b")
        case _ =>
      }
      assert(sorted.last._5 == 1 && sorted.init.forall(_._5 == 0))
    }
  }

  test("randomized: scd2 ≡ naive per-key fold on 30 seeded change logs") {
    (1 to 30).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val states = Seq(Some("A"), Some("B"), Some("C"), None)
      val log = (1L to 5L).flatMap { k =>
        (0 until rnd.nextInt(15)).map { i =>
          // ts collides often (mod 6) — seq is the unique tiebreaker
          (k, i.toLong, rnd.nextInt(6).toLong, states(rnd.nextInt(states.size)))
        }
      }
      if (log.nonEmpty) {
        val out = TimeSeries.scd2(log.toDF("k", "seq", "ts", "state"),
          Seq("k"), Seq("state"), Seq("ts", "seq"))
          .select("k", "state", "valid_from", "valid_to", "is_current", "version")
          .as[(Long, Option[String], Long, Option[Long], Int, Long)]
          .collect().toSet
        val expected = log.groupBy(_._1).flatMap { case (k, rows) =>
          val ordered = rows.sortBy(r => (r._3, r._2))
          val runs = ordered.foldLeft(Vector.empty[(Option[String], Long)]) {
            case (acc, (_, _, ts, st)) =>
              if (acc.isEmpty || acc.last._1 != st) acc :+ (st, ts) else acc
          }
          runs.zipWithIndex.map { case ((st, vf), i) =>
            val vt = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
            (k, st, vf, vt, if (vt.isEmpty) 1 else 0, (i + 1).toLong)
          }
        }.toSet
        assert(out == expected, s"seed $seed: engine $out vs naive $expected")
      }
    }
  }

  test("gapProfile: hand-checked gaps; discrete lower-middle median") {
    val df = Seq(
      (1L, 0L), (1L, 10L), (1L, 30L), (1L, 100L), // gaps 10, 20, 70
      (2L, 5L), (2L, 10L), (2L, 30L),             // gaps 5, 20 (even count)
      (3L, 42L)                                   // single event: no gaps
    ).toDF("user_id", "ts")
    val m = TimeSeries.gapProfile(df, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m(1L) == ((3L, 10L, 70L, 20L)), s"odd-count median: ${m(1L)}")
    assert(m(2L) == ((2L, 5L, 20L, 5L)), s"even count takes lower middle: ${m(2L)}")
    assert(!m.contains(3L), "single-event keys have no gap row")
  }

  test("gapProfile: equal timestamps yield zero gaps deterministically") {
    val df = Seq((1L, 10L), (1L, 10L), (1L, 10L), (1L, 25L))
      .toDF("user_id", "ts")
    val m = TimeSeries.gapProfile(df, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // sorted ts [10,10,10,25] -> gaps {0,0,15} under ANY tie order
    assert(m(1L) == ((3L, 0L, 15L, 0L)), m.toString)
  }

  test("pivotLatest: newest value per attribute; struct-max tiebreak; nulls for unobserved") {
    val df = Seq(
      (1L, "hr", 10L, 60.0, 100L),
      (1L, "hr", 20L, 72.0, 101L),   // newer wins
      (1L, "bp", 20L, 120.0, 102L),
      (2L, "hr", 5L, 55.0, 103L),    // no bp for user 2
      (3L, "spo2", 9L, 0.97, 104L),  // unlisted attribute only -> no row
      (1L, "hr", 20L, 99.0, 90L)     // ts tie: larger event_id (101) wins
    ).toDF("user_id", "attr", "ts", "value", "event_id")
    val out = TimeSeries.pivotLatest(df, "user_id", "attr", "ts", "value",
      Seq("hr", "bp"), "event_id")
      .orderBy("user_id")
      .as[(Long, Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, Some(72.0), Some(120.0)),
      (2L, Some(55.0), None)), out.toString)
    val cols = TimeSeries.pivotLatest(df, "user_id", "attr", "ts", "value",
      Seq("hr", "bp"), "event_id").columns.toSeq
    assert(cols == Seq("user_id", "hr_value", "bp_value"), cols.toString)
  }

  test("cohortRetention: hand-checked triangle; rates against offset-0 size") {
    // width 10: u1 first bucket 0 active {0,1,2}; u2 first 0 active {0,2};
    // u3 first 1 active {1}
    val df = Seq(
      (1L, 0L), (1L, 12L), (1L, 25L),
      (2L, 3L), (2L, 21L),
      (3L, 15L)
    ).toDF("user_id", "ts")
    val out = TimeSeries.cohortRetention(df, "user_id", "ts", 10L)
      .orderBy("cohort", "offset")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5),
      (0L, 2L, 2L, 2L, 1.0),
      (1L, 0L, 1L, 1L, 1.0)), out.toString)
  }

  test("transitionMatrix: hand-checked chain; ties ordered by the tiebreak") {
    // user 1: a -> b -> a -> c (via ts order); user 2: b -> a
    // ties: user 3 has two events at ts=5, event_id decides a -> b
    val fixed = Seq(
      (1L, 10L, "a", 100L), (1L, 20L, "b", 101L),
      (1L, 30L, "a", 102L), (1L, 40L, "c", 103L),
      (2L, 5L, "b", 200L), (2L, 9L, "a", 201L),
      (3L, 5L, "a", 301L), (3L, 5L, "b", 302L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = TimeSeries.transitionMatrix(fixed, "user_id", "ts",
      "event_type", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 2L, 3L, 0.666667),  // 1:a->b, 3:a->b (tiebreak)
      ("a", "c", 1L, 3L, 0.333333),
      ("b", "a", 2L, 2L, 1.0)), out.toString)
  }

  test("cumulativeIncidence: Aalen–Johansen hand check; CIF_A + CIF_B + S conserves mass") {
    val S = TimeSeries.SurvivalScale
    // A at 1, B at 2, censored 3, A at 4
    val subjects = Seq(
      ("g", 1L, Some("A")), ("g", 2L, Some("B")),
      ("g", 3L, None: Option[String]), ("g", 4L, Some("A")))
      .toDF("c", "duration", "cause")
    val out = TimeSeries.cumulativeIncidence(subjects, "c", "duration", "cause", "A", "B")
      .orderBy("duration")
      .select("duration", "n_at_risk", "d_a", "d_b", "cif_a_fp", "cif_b_fp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 1L, 0L, S / 4, 0L),            // cifA = S/4
      (2L, 3L, 0L, 1L, S / 4, S / 4),         // cifB = (3S/4)/3
      (3L, 2L, 0L, 0L, S / 4, S / 4),         // censor: no step
      (4L, 1L, 1L, 0L, 3 * S / 4, S / 4)),    // cifA += S/2 (s was S/2)
      out.toString)
    // mass conservation at the end: both CIFs absorb everything (s = 0)
    assert(out.last._5 + out.last._6 == S)
  }

  test("restrictedMeanSurvival: exact area under the step curve; horizon clamps the tail") {
    val S = TimeSeries.SurvivalScale
    // g: events at 2 (n=3, S→2/3), 4 (n=2, S→1/3); censored 6
    val subjects = Seq(
      ("g", 2L, 1L), ("g", 4L, 1L), ("g", 6L, 0L)).toDF("c", "duration", "observed")
    // τ=5: S=1 on [0,2) → 2·S; 2/3 on [2,4) → 2·(2S/3); 1/3 on [4,5) → 1·(S/3)
    val s1 = S * 2 / 3
    val s2 = s1 * 1 / 2 // (n−d)/n at t=4: (2−1)/2
    val expected = 2 * S + 2 * s1 + 1 * s2
    val out = TimeSeries.restrictedMeanSurvival(subjects, "c", "duration", "observed", tau = 5L)
      .select("rmst_fp", "rmst").as[(Long, Double)].collect().head
    assert(out._1 == expected, s"${out._1} vs $expected")
    assert(out._2 == BigDecimal(expected.toDouble / S)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // τ at/below the first time point: the whole window survives → τ·S
    val early = TimeSeries.restrictedMeanSurvival(subjects, "c", "duration", "observed", tau = 2L)
      .select("rmst_fp").as[Long].collect().head
    assert(early == 2L * S, early.toString)
  }

  test("logRank: hand-checked hypergeometric terms; degenerate single-arm yields null chi2") {
    // a: events at 1, 3, censored 5; b: events at 2, 4, censored 6
    val subjects = Seq(
      ("a", 1L, 1L), ("a", 3L, 1L), ("a", 5L, 0L),
      ("b", 2L, 1L), ("b", 4L, 1L), ("b", 6L, 0L))
      .toDF("grp", "duration", "observed")
    val S = TimeSeries.LogRankScale
    val out = TimeSeries.logRank(subjects, "grp", "duration", "observed", "a")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    // per pooled event time (na, n1a): t1 (6,3), t2 (5,2), t3 (4,2), t4 (3,1)
    val e1 = 1L*3*S/6 + 1L*2*S/5 + 1L*2*S/4 + 1L*1*S/3
    val v = 1L*3*3*5*S/(36L*5) + 1L*2*3*4*S/(25L*4) +
      1L*2*2*3*S/(16L*3) + 1L*1*2*2*S/(9L*2)
    assert(out._1 == 4L && out._2 == 2L && out._3 == e1 && out._4 == v, out.toString)
    val diff = 2.0 * S - e1.toDouble
    val expected = BigDecimal(diff * diff / (S.toDouble * v.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._5.contains(expected), s"${out._5} vs $expected")
    // one-arm data: every event is group-one's, variance 0 → chi2 null
    val single = Seq(("a", 1L, 1L), ("a", 2L, 1L)).toDF("grp", "duration", "observed")
    val deg = TimeSeries.logRank(single, "grp", "duration", "observed", "a")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(deg._5.isEmpty, deg.toString)
  }

  test("kaplanMeier: textbook curve — censoring shrinks the risk set without an event step") {
    // stratum g: 6 subjects, events at 1,2,4,6; censored at 3,5
    val subjects = Seq(
      ("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 0L),
      ("g", 4L, 1L), ("g", 5L, 0L), ("g", 6L, 1L),
      // stratum h: tie — two events at the same duration fold into one step
      ("h", 2L, 1L), ("h", 2L, 1L), ("h", 7L, 0L))
      .toDF("cohort", "duration", "observed")
    val out = TimeSeries.kaplanMeier(subjects, "cohort", "duration", "observed")
      .orderBy("cohort", "duration")
      .select("cohort", "duration", "n_at_risk", "d_events", "survival_fp", "survival")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    val g = out.filter(_._1 == "g")
    // S: 5/6, 2/3, 2/3 (censor: no step), 4/9, 4/9, 0
    assert(g == Seq(
      ("g", 1L, 6L, 1L, 833333333333L, 0.833333),
      ("g", 2L, 5L, 1L, 666666666666L, 0.666667),
      ("g", 3L, 4L, 0L, 666666666666L, 0.666667),
      ("g", 4L, 3L, 1L, 444444444444L, 0.444444),
      ("g", 5L, 2L, 0L, 444444444444L, 0.444444),
      ("g", 6L, 1L, 1L, 0L, 0.0)), g.toString)
    val h = out.filter(_._1 == "h")
    // tie at t=2: n=3, d=2 → S = 1/3; censor tail holds it
    assert(h == Seq(
      ("h", 2L, 3L, 2L, 333333333333L, 0.333333),
      ("h", 7L, 1L, 0L, 333333333333L, 0.333333)), h.toString)
  }

  test("survivalQuantiles: step-curve readings; undefined quantile is null, not zero") {
    val subjects = Seq(
      ("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 0L),
      ("g", 4L, 1L), ("g", 5L, 0L), ("g", 6L, 1L),
      ("h", 2L, 1L), ("h", 2L, 1L), ("h", 7L, 0L))
      .toDF("cohort", "duration", "observed")
    val out = TimeSeries.survivalQuantiles(subjects, "cohort", "duration", "observed")
      .orderBy("cohort").collect().toSeq
    // g curve: .833@1, .667@2, .444@4, 0@6 → q25=2 (S≤.75), med=4 (S≤.5), q75=6 (S≤.25)
    val g = out(0)
    assert(g.getAs[String]("cohort") == "g" && g.getAs[Long]("n_subjects") == 6L)
    assert(g.getAs[Long]("n_events") == 4L)
    assert(g.getAs[Long]("q25") == 2L && g.getAs[Long]("median") == 4L &&
      g.getAs[Long]("q75") == 6L, g.toString)
    // h curve drops to 1/3 at t=2 and never below .25: q75 undefined → null
    val h = out(1)
    assert(h.getAs[Long]("n_subjects") == 3L && h.getAs[Long]("n_events") == 2L)
    assert(h.getAs[Long]("q25") == 2L && h.getAs[Long]("median") == 2L, h.toString)
    assert(h.isNullAt(h.fieldIndex("q75")), "censored tail has no q75")
  }

  test("nelsonAalen: additive exact floor increments; censoring shrinks the risk set; event rows only") {
    val df = Seq(
      ("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 0L),
      ("g", 4L, 1L), ("g", 5L, 0L), ("g", 6L, 1L))
      .toDF("cohort", "duration", "observed")
    val out = TimeSeries.nelsonAalen(df, "cohort", "duration", "observed")
      .orderBy("duration").collect()
    assert(out.length == 4, "rows at event times only (t=5 censored-only)")
    val t1 = out(0)
    assert(t1.getAs[Long]("n_at_risk") == 6L &&
      t1.getAs[Long]("cumhaz_fp") == 166666666666L)
    assert(t1.getAs[Double]("cumhaz") == 0.166667)
    val t2 = out(1) // + 1e12 DIV 5: risk set 5 (one event, one censor at t2)
    assert(t2.getAs[Long]("n_at_risk") == 5L &&
      t2.getAs[Long]("cumhaz_fp") == 366666666666L)
    val t4 = out(2) // + 1e12 DIV 3 (two left at t5 after t4's event... risk 3)
    assert(t4.getAs[Long]("n_at_risk") == 3L &&
      t4.getAs[Long]("cumhaz_fp") == 699999999999L)
    val t6 = out(3) // + 1e12 DIV 1
    assert(t6.getAs[Long]("n_at_risk") == 1L &&
      t6.getAs[Long]("cumhaz_fp") == 1699999999999L)
    assert(t6.getAs[Double]("cumhaz") == 1.7)
  }

  test("autocorrelation: alternating series is −1 at lag 1, +1 at lag 2; flat series null") {
    // key a: events at buckets 0,2,4 → dense [1,0,1,0,1]
    // key b: one event per bucket 0..3 → dense [1,1,1,1] (zero variance)
    val df = (Seq(0L, 2L, 4L).map(b => ("a", b)) ++
      Seq(0L, 1L, 2L, 3L).map(b => ("b", b))).toDF("k", "t")
    val out = TimeSeries.autocorrelation(df, "k", "t", bucketWidth = 1L,
      maxLag = 2)
      .orderBy("k", "lag").collect().toSeq
    val aL1 = out(0)
    assert(aL1.getAs[Long]("n_pairs") == 4L)
    assert(aL1.getAs[Double]("r") == -1.0, aL1.toString)
    val aL2 = out(1)
    assert(aL2.getAs[Long]("n_pairs") == 3L)
    assert(aL2.getAs[Double]("r") == 1.0, aL2.toString)
    assert(out.drop(2).forall(r => r.isNullAt(r.fieldIndex("r"))),
      "flat series has no variance at any lag")
  }

  test("cusumChangepoint: level shift found exactly; ties break earliest; empty-mass null") {
    // key a: 3 events in each of buckets 3,4,5; none in 0..2 (present via
    // bucket-0 event removed → grid starts at first event)... use explicit
    // zeros: events only at 3,4,5 but one marker at 0 to anchor the grid.
    val df = ((Seq.fill(3)(3L) ++ Seq.fill(3)(4L) ++ Seq.fill(3)(5L) :+ 0L)
      .map(b => ("a", b)) ++
      Seq(("b", 0L), ("b", 3L))) // symmetric: stat ties at k=1 and k=3
      .toDF("k", "t")
    val out = TimeSeries.cusumChangepoint(df, "k", "t", bucketWidth = 1L)
      .orderBy("k").collect().toSeq
    val a = out(0)
    // dense [1,0,0,3,3,3]: n=6 T=10, P=(1,1,1,4,7,10)
    // stat_k = |6P − 10k| = (4,14,24,16,8,0) → max 24 at k=3 (bucket 2,
    // the last pre-break bucket)
    assert(a.getAs[Long]("n_buckets") == 6L && a.getAs[Long]("total") == 10L)
    assert(a.getAs[Long]("cp_bucket") == 2L && a.getAs[Long]("cp_index") == 3L)
    assert(a.getAs[Long]("stat_num") == 24L)
    assert(a.getAs[Double]("cusum") == 0.4, a.toString)
    // key b dense [1,0,0,1]: n=4 T=2, stat=|4P−2k| = (2,0,2,0): tie k=1,k=3
    val b = out(1)
    assert(b.getAs[Long]("cp_index") == 1L && b.getAs[Long]("cp_bucket") == 0L,
      b.toString)
  }

  test("lifeTable: actuarial half-censoring adjustment, exact product fold, occupied intervals only") {
    // stratum x, width 10: interval 0 has 2 deaths (t=3,7) + 1 censor
    // (t=5) of 6 subjects; interval 2 (t in [20,30)) has 1 death + 1
    // censor of 3 remaining; interval 3 has 1 censor. interval 1 empty.
    val df = Seq(
      ("x", 3L, 1L), ("x", 7L, 1L), ("x", 5L, 0L),
      ("x", 22L, 1L), ("x", 25L, 0L), ("x", 31L, 0L))
      .toDF("g", "t", "obs")
    val out = TimeSeries.lifeTable(df, "g", "t", "obs", intervalWidth = 10L)
      .collect().map(r => r.getAs[Long]("interval") -> r).toMap
    assert(out.keySet == Set(0L, 2L, 3L), "empty interval 1 never emits")
    val S = 1000000000000L
    // interval 0: n=6, d=2, c=1 → q = 4S DIV 11; s0 = (S−q) (exact)
    val q0 = 4L * S / 11L
    val i0 = out(0L)
    assert(i0.getAs[Long]("n_enter") == 6L && i0.getAs[Long]("d_events") == 2L &&
      i0.getAs[Long]("c_censored") == 1L)
    assert(i0.getAs[Long]("q_fp") == q0)
    assert(i0.getAs[Long]("survival_fp") == S - q0)
    assert(i0.getAs[Long]("t_start") == 0L)
    // interval 2: n=3, d=1, c=1 → q = 2S DIV 5; fold in BigInt
    val q2 = 2L * S / 5L
    val s2 = (BigInt(S - q0) * (S - q2) / S).toLong
    assert(out(2L).getAs[Long]("q_fp") == q2)
    assert(out(2L).getAs[Long]("survival_fp") == s2, out(2L).toString)
    // interval 3: censor only → q = 0, survival unchanged
    assert(out(3L).getAs[Long]("q_fp") == 0L)
    assert(out(3L).getAs[Long]("survival_fp") == s2)
  }

  test("ewmaSmooth: 20 random series match a local reference fold exactly") {
    val rnd = new scala.util.Random(12)
    (1 to 20).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(3)
      val rows = (1 to 30 + rnd.nextInt(40)).map { _ =>
        (s"k${rnd.nextInt(nKeys)}",
          rnd.nextInt(200).toLong * 10L,
          math.rint(rnd.nextDouble() * 1000) / 100)
      }
      val lags = 1 + rnd.nextInt(7)
      val got = TimeSeries.ewmaSmooth(rows.toDF("key", "ts", "v"),
          "key", "ts", "v", bucketWidth = 10L, lags = lags, scale = 100L)
        .collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Long]("bucket")) ->
          (r.getAs[Long]("num"), r.getAs[Long]("den"))).toMap
      // local reference: cents per (key, bucket), then the windowed sums
      val cents = rows.groupBy(r => (r._1, r._2 / 10L))
        .map { case (k, rs) => k -> rs.map(r => math.round(r._3 * 100)).sum }
      val expect = cents.keys.map { case (k, b) =>
        val terms = (0 until lags).flatMap { j =>
          cents.get((k, b - j)).map(v => (v * (1L << (lags - 1 - j)),
            1L << (lags - 1 - j)))
        }
        (k, b) -> (terms.map(_._1).sum, terms.map(_._2).sum)
      }.toMap
      assert(got == expect, s"trial $trial (lags=$lags)")
    }
  }

  test("lifeTable: 20 random cohorts match a local reference fold exactly") {
    val rnd = new scala.util.Random(21)
    (1 to 20).foreach { trial =>
      val rows = (1 to 20 + rnd.nextInt(60)).map { _ =>
        ("c", rnd.nextInt(80).toLong, rnd.nextInt(2).toLong)
      }
      val w = 5L + rnd.nextInt(10)
      val got = TimeSeries.lifeTable(rows.toDF("g", "t", "obs"),
          "g", "t", "obs", intervalWidth = w)
        .collect().map(r => r.getAs[Long]("interval") ->
          (r.getAs[Long]("n_enter"), r.getAs[Long]("q_fp"),
            r.getAs[Long]("survival_fp"))).toMap
      // local reference
      val S = 1000000000000L
      val perI = rows.groupBy(_._2 / w).toSeq.sortBy(_._1)
        .map { case (iv, rs) =>
          (iv, rs.size.toLong, rs.count(_._3 == 1L).toLong) }
      var at = rows.size.toLong
      var s = S
      val expect = perI.map { case (iv, m, d) =>
        val c = m - d
        val q = if (d == 0L) 0L else (BigInt(d) * 2 * S / (2 * at - c)).toLong
        s = (BigInt(s) * (S - q) / S).toLong
        val out = iv -> (at, q, s)
        at -= m
        out
      }.toMap
      assert(got == expect, s"trial $trial (w=$w)")
    }
  }

  test("ewmaSmooth: exact power-of-two trailing weights, gaps renormalize, one division") {
    import org.apache.spark.sql.functions.col
    // key k: buckets 0 (v=1.00), 1 (v=3.00), 3 (v=5.00) — bucket 2 absent
    val df = Seq(("k", 5L, 1.0), ("k", 15L, 3.0), ("k", 35L, 5.0),
      ("k", 36L, 2.0), // same bucket as 35 → cents sum 700
      (null.asInstanceOf[String], 5L, 9.0)).toDF("key", "ts", "v")
    val out = TimeSeries.ewmaSmooth(df, "key", "ts", "v",
      bucketWidth = 10L, lags = 3, scale = 100L).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out.size == 3, "only observed buckets emit; null key excluded")
    // bucket 0: only itself → num=100·4, den=4, ewma=1.0
    assert(out(0L).getAs[Long]("num") == 400L && out(0L).getAs[Long]("den") == 4L)
    assert(out(0L).getAs[Double]("ewma") == 1.0)
    // bucket 1: lags {1(w4), 0(w2)} → num=300·4+100·2=1400, den=6
    assert(out(1L).getAs[Long]("n_lags") == 2L)
    assert(out(1L).getAs[Long]("num") == 1400L && out(1L).getAs[Long]("den") == 6L)
    assert(out(1L).getAs[Double]("ewma") == 2.333333, out(1L).toString)
    // bucket 3: window {3,2,1}; 2 ABSENT → {3(w4), 1(w1)}: num=700·4+300·1
    assert(out(3L).getAs[Long]("n_lags") == 2L)
    assert(out(3L).getAs[Long]("num") == 3100L && out(3L).getAs[Long]("den") == 5L)
    assert(out(3L).getAs[Double]("ewma") == 6.2, out(3L).toString)
  }
}
