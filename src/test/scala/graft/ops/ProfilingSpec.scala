package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: boundaries land as documented; under/overflow catch everything") {
    // [0, 10) in 5 bins of width 2: lo edge inclusive, hi edge overflow
    val vs = Seq(-0.1, 0.0, 1.99, 2.0, 9.99, 10.0, 42.0, Double.NaN)
      .map(Tuple1(_)).toDF("v")
    val out = Profiling.histogram(vs.filter(!isnan(col("v"))), "v", 0.0, 10.0, 5)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(-1L -> 1L, 0L -> 2L, 1L -> 1L, 4L -> 1L, 5L -> 2L), s"got $out")
    // nulls are excluded, not binned
    val withNull = Seq(Some(1.0), None).map(Tuple1(_)).toDF("v")
    assert(Profiling.histogram(withNull, "v", 0.0, 10.0, 5)
      .agg(sum("n")).as[Long].head == 1L)
  }

  test("psi: identical snapshots score exactly zero; a shifted snapshot alarms") {
    val base = (1 to 500).map(i => Tuple1((i % 100).toDouble)).toDF("v")
    val same = Profiling.psi(base, base, "v", 0.0, 100.0, 10)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(same.size == 12) // 10 bins + under/overflow, every bin present
    assert(same.forall(r => r._4 == 0.0), s"identical → zero terms: $same")
    val shifted = base.withColumn("v", col("v") * 1.5 + 10)
    val drift = Profiling.psi(base, shifted, "v", 0.0, 100.0, 10)
      .agg(sum("psi_term")).as[Double].head
    assert(drift > 0.1, s"shift must alarm, got $drift")
  }

  test("quantileNormalize: groups map onto pooled order statistics; identical shapes align exactly") {
    // group a: {10, 20, 30}; group b: {100, 200, 300} — same shape,
    // different scale. Pool sorted: 10,20,30,100,200,300 (N=6).
    // midrank fractions (2r−1)/6 → idx = ceil((2r−1)·6/6) = 1, 3, 5:
    // BOTH groups normalize to (10, 30, 200)
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 100.0), (5L, "b", 200.0), (6L, "b", 300.0))
      .toDF("id", "g", "v")
    val out = Profiling.quantileNormalize(df, "g", "v", "id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("norm_value")).toMap
    assert(out(1L) == 10.0 && out(2L) == 30.0 && out(3L) == 200.0, out.toString)
    assert(out(4L) == 10.0 && out(5L) == 30.0 && out(6L) == 200.0, out.toString)
    // after normalization the groups' distributions are IDENTICAL
    assert(Seq(1L, 2L, 3L).map(out) == Seq(4L, 5L, 6L).map(out))
    // unequal group sizes: a singleton group lands at the pooled median
    // position idx = ceil(N/2)
    val df2 = Seq((1L, "a", 5.0), (2L, "a", 6.0), (3L, "a", 7.0),
      (4L, "s", 999.0)).toDF("id", "g", "v")
    val o2 = Profiling.quantileNormalize(df2, "g", "v", "id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("norm_value")).toMap
    assert(o2(4L) == 6.0, s"singleton → pooled idx ceil(4/2)=2 → 6.0: $o2")
    // every output value is a member of the pool (selection, not math)
    assert(o2.values.toSet.subsetOf(Set(5.0, 6.0, 7.0, 999.0)))
  }

  test("quantileNormalize: 20 random corpora match a local reference selection exactly") {
    val rnd = new scala.util.Random(31)
    (1 to 20).foreach { trial =>
      val rows = (1L to (10L + rnd.nextInt(60))).map { i =>
        (i, s"s${rnd.nextInt(4)}", rnd.nextInt(20).toDouble)
      }
      val got = Profiling.quantileNormalize(rows.toDF("id", "g", "v"),
          "g", "v", "id")
        .collect().map(r => r.getAs[Long]("id") ->
          r.getAs[Double]("norm_value")).toMap
      val pool = rows.sortBy(r => (r._3, r._1)).map(_._3)
      val n = rows.size.toLong
      val expect = rows.groupBy(_._2).flatMap { case (_, grp) =>
        val sorted = grp.sortBy(r => (r._3, r._1))
        val ng = sorted.size.toLong
        sorted.zipWithIndex.map { case (row, i) =>
          val r = i + 1L
          val idx = ((2 * r - 1) * n + 2 * ng - 1) / (2 * ng)
          row._1 -> pool((idx - 1).toInt)
        }
      }
      assert(got == expect, s"trial $trial")
    }
  }

  test("ipwEstimate: exact stratified Horvitz-Thompson terms; no-overlap strata excluded, counted") {
    // stratum a: n=4, e=2, exposed Y {10, 20}, control Y {2, 4}
    //   term1 = 3000·4/2 = 6000 cents-weighted; term0 = 600·4/2 = 1200
    // stratum b: n=3, e=1, exposed {30}, control {5, 7}
    //   term1 = 3000·3/1 = 9000; term0 = 1200·3/2 = 1800
    // stratum c: ALL exposed → no overlap, excluded but counted
    val df = Seq(
      ("a", 1L, 10.0), ("a", 1L, 20.0), ("a", 0L, 2.0), ("a", 0L, 4.0),
      ("b", 1L, 30.0), ("b", 0L, 5.0), ("b", 0L, 7.0),
      ("c", 1L, 99.0), ("c", 1L, 99.0)).toDF("s", "t", "y")
    val r = Profiling.ipwEstimate(df, "s", "t", "y", scale = 1000L)
      .collect()(0)
    assert(r.getAs[Long]("n") == 9L && r.getAs[Long]("n_overlap") == 7L)
    assert(r.getAs[Long]("n_strata") == 3L &&
      r.getAs[Long]("n_strata_no_overlap") == 1L &&
      r.getAs[Long]("n_excluded") == 2L)
    // fp numerators at S=1000: (6000+9000)·1000 and (1200+1800)·1000
    assert(r.getAs[Long]("mu1_num_fp") == 15000000L, r.toString)
    assert(r.getAs[Long]("mu0_num_fp") == 3000000L, r.toString)
    // mu1 = 15000000/(7·1000·100) ≈ 21.428571; mu0 ≈ 4.285714
    assert(r.getAs[Double]("mu1") == 21.428571, r.toString)
    assert(r.getAs[Double]("mu0") == 4.285714, r.toString)
    assert(r.getAs[Double]("ate") == 17.142857, r.toString)
    // all-no-overlap input: counts emitted, estimates null
    val z = Profiling.ipwEstimate(
      Seq(("c", 1L, 1.0)).toDF("s", "t", "y"), "s", "t", "y").collect()(0)
    assert(z.getAs[Long]("n_overlap") == 0L && z.isNullAt(z.fieldIndex("ate")))
  }

  test("jsdDrift: identical zero, symmetric, bounded by ln 2") {
    val base = (1 to 500).map(i => Tuple1((i % 100).toDouble)).toDF("v")
    val same = Profiling.jsdDrift(base, base, "v", 0.0, 100.0, 10)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(same.size == 12 && same.forall(_._4 == 0.0), same.toString)
    val shifted = base.withColumn("v", col("v") * 1.5 + 10)
    val fwd = Profiling.jsdDrift(base, shifted, "v", 0.0, 100.0, 10)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    val rev = Profiling.jsdDrift(shifted, base, "v", 0.0, 100.0, 10)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(fwd == rev, "JSD must be symmetric — PSI's asymmetry is the gap it fills")
    val total = fwd.values.sum
    assert(total > 0.01 && total <= math.log(2.0) + 1e-9,
      s"shift alarms within the ln 2 bound: $total")
    assert(fwd.values.forall(_ >= 0.0), "terms are non-negative")
  }

  test("ksDrift: identical samples gap 0; hand-checked max gap at the right value") {
    val base = Seq(1.0, 2.0, 3.0, 4.0).map(Tuple1(_)).toDF("v")
    val same = Profiling.ksDrift(base, base, "v", topGaps = 10)
      .select("ks_gap").as[Double].collect()
    assert(same.nonEmpty && same.forall(_ == 0.0), same.toSeq.toString)
    // base {1,2,3,4} vs current {3,4,5,6}: gap peaks at 0.5, first at v=2
    val cur = Seq(3.0, 4.0, 5.0, 6.0).map(Tuple1(_)).toDF("v")
    val out = Profiling.ksDrift(base, cur, "v")
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(out.head == ((2.0, 0.5, 0.0, 0.5)), out.toString)
    assert(out.map(_._1).toSet == Set(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    // gap column is sorted descending, value ascending within ties
    assert(out.map(_._4) == out.map(_._4).sorted.reverse, out.toString)
  }

  test("ksDrift: partitioning-independent (two-phase prefix == single-task ECDF)") {
    val rng = new scala.util.Random(7)
    val base = (1 to 400).map(_ => rng.nextGaussian()).map(Tuple1(_)).toDF("v")
    val cur = (1 to 300).map(_ => rng.nextGaussian() * 1.4 + 0.3).map(Tuple1(_)).toDF("v")
    val a = Profiling.ksDrift(base, cur, "v", topGaps = 5)
      .as[(Double, Double, Double, Double)].collect().toSeq
    val b = Profiling.ksDrift(base.repartition(7), cur.coalesce(1), "v", topGaps = 5)
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(a == b, s"$a vs $b")
    // cross-check the statistic against a driver-side exact ECDF scan
    val bs = base.as[Double].collect().sorted
    val cs = cur.as[Double].collect().sorted
    val pts = (bs ++ cs).distinct.sorted
    val ks = pts.map { x =>
      math.abs(bs.count(_ <= x).toDouble / bs.length - cs.count(_ <= x).toDouble / cs.length)
    }.max
    assert(math.abs(a.head._4 - ks) < 1e-6, s"${a.head._4} vs $ks")
  }

  test("ksDrift: nulls excluded; an empty side yields no rows") {
    val base = Seq(Some(1.0), None, Some(2.0)).map(Tuple1(_)).toDF("v")
    val cur = Seq(Some(1.5), None).map(Tuple1(_)).toDF("v")
    val out = Profiling.ksDrift(base, cur, "v").select("value").as[Double].collect()
    assert(out.toSet == Set(1.0, 1.5, 2.0))
    val empty = Seq.empty[Option[Double]].map(Tuple1(_)).toDF("v")
    assert(Profiling.ksDrift(base, empty, "v").isEmpty)
  }

  test("winsorize: clamps into the group band, flags only clamped rows, nulls stay null") {
    // group g: values 1..10 → p0..p100 span; with [0.1, 0.9] the bounds
    // are the interpolated 1.9 and 9.1
    val rows = ((1 to 10).map(i => ("g", Some(i.toDouble))) ++
      Seq(("g", None), ("h", Some(100.0)))).toDF("grp", "v")
    val out = Profiling.winsorize(rows, "grp", "v", 0.1, 0.9)
      .select("grp", "v", "v_w", "was_clamped")
      .as[(String, Option[Double], Option[Double], Int)].collect().toSeq
    val g = out.filter(_._1 == "g")
    assert(g.find(_._2.contains(1.0)).get._3.get == 1.9)
    assert(g.find(_._2.contains(10.0)).get._3.get == 9.1)
    assert(g.find(_._2.contains(5.0)).get._3.get == 5.0)
    assert(g.count(_._4 == 1) == 2, s"exactly the two tail rows clamp: $g")
    // null value: stays null, not resurrected at the bound
    assert(g.find(_._2.isEmpty).get._3.isEmpty)
    // singleton group: its own value is every percentile → untouched
    assert(out.find(_._1 == "h").get._3.contains(100.0))
  }

  test("categoricalPsi: identical mixes score zero; appear/vanish categories carry floor shares") {
    val base = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c"))
      .map(Tuple1(_)).toDF("cat")
    val same = Profiling.categoricalPsi(base, base, "cat")
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(same.size == 3 && same.forall(_._4 == 0.0), s"got $same")
    // c vanishes, d appears; every category of EITHER side is a row
    val cur = (Seq.fill(55)("a") ++ Seq.fill(35)("b") ++ Seq.fill(10)("d"))
      .map(Tuple1(_)).toDF("cat")
    val out = Profiling.categoricalPsi(base, cur, "cat")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("a", "b", "c", "d"))
    // vanished c: current share is the smoothed floor 1/(100+4+1); the
    // appeared d mirrors it on the base side
    assert(math.abs(out("c")._3 - 1.0 / 105) < 1e-6)
    assert(math.abs(out("d")._2 - 1.0 / 105) < 1e-6)
    assert(out.values.map(_._4).sum > 0.1, "appear/vanish must alarm")
    // a null category is a real category, not dropped
    val withNull = base.unionByName(
      Seq(Tuple1(null.asInstanceOf[String])).toDF("cat"))
    val cats = Profiling.categoricalPsi(withNull, withNull, "cat")
      .as[(Option[String], Double, Double, Double)].collect().map(_._1).toSet
    assert(cats.contains(None))
  }

  test("distributionProfile approx lever: rank error bounded by n/accuracy vs the exact form") {
    import spark.implicits._
    // values ARE ranks (1..n), so |approx - exact quantile value| is the
    // rank error directly; approx_percentile contracts it to n/accuracy
    val n = 20000
    val acc = 1000
    val df = spark.range(1, n + 1).toDF("v")
    val qs = Seq(0.05, 0.5, 0.95)
    val exact = Profiling.distributionProfile(df, "v", qs)
      .select("p5", "p50", "p95").as[(Double, Double, Double)].head()
    val approx = Profiling.distributionProfile(df, "v", qs, accuracy = acc)
      .select("p5", "p50", "p95").as[(Double, Double, Double)].head()
    val tol = n.toDouble / acc + 1
    Seq(exact._1 -> approx._1, exact._2 -> approx._2, exact._3 -> approx._3)
      .foreach { case (e, a) =>
        assert(math.abs(e - a) <= tol, s"approx $a drifted from exact $e beyond $tol")
      }
    assert(
      Profiling.distributionProfile(df, "v", Seq(0.999)).columns.contains("p99_9"),
      "fractional quantile name")
  }

  test("winsorize approx lever: approximate band clamps within rank tolerance of the exact band") {
    import spark.implicits._
    val n = 10000
    val acc = 500
    val df = spark.range(1, n + 1).toDF("v").withColumn("g", lit("all"))
    def clampedCount(accuracy: Int): Long =
      Profiling.winsorize(df, "g", "v", accuracy = accuracy)
        .agg(sum(col("was_clamped"))).as[Long].head()
    val exact = clampedCount(0)
    val approx = clampedCount(acc)
    // each bound may drift by at most n/acc ranks → clamped-row count
    // drifts by at most 2·n/acc (+2 for interpolation rounding)
    assert(math.abs(exact - approx) <= 2L * n / acc + 2,
      s"clamped counts diverged: exact=$exact approx=$approx")
  }

  test("groupZscores: hand-checked scores; no-evidence groups stay null") {
    val df = Seq(
      (1L, 1L, Some(1.0)), (2L, 1L, Some(2.0)), (3L, 1L, Some(3.0)),
      (4L, 2L, Some(5.0)),                      // single value: sd null
      (5L, 3L, Some(7.0)), (6L, 3L, Some(7.0)), // zero variance
      (7L, 1L, None)                            // null value in a live group
    ).toDF("event_id", "user_id", "value")
    val out = Profiling.groupZscores(df, "user_id", "value")
      .select("event_id", "group_n", "zscore")
      .as[(Long, Long, Option[Double])].collect().toSeq
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // user 1: mean 2, stddev_samp 1 -> z = -1, 0, 1; count excludes null
    assert(out(1L) == ((3L, Some(-1.0))) && out(2L) == ((3L, Some(0.0))) &&
      out(3L) == ((3L, Some(1.0))), out.toString)
    assert(out(4L) == ((1L, None)), "single-value group must not be scored")
    assert(out(5L) == ((2L, None)), "zero-variance group must not be scored")
    assert(out(7L) == ((3L, None)), "null value gets no score but keeps its row")
  }

  test("groupZscores: exact fixed-point moments — grid snap and engine-order independence") {
    // values snap to the cent grid BEFORE the moments: 1.004 and 0.996
    // both score as 1.00 (their z's are identical), which is the price
    // of exactness the docstring states. Grid values 100,200,300 cents:
    // S=600, Q=140000 -> z = (x·3−600)/sqrt((3·140000−600²)·3/2) = ±1, 0
    val df = Seq(
      (1L, 1L, 1.004), (2L, 1L, 2.0), (3L, 1L, 2.996),
      (4L, 2L, 0.996), (5L, 2L, 1.004)) // same cent -> zero variance
      .toDF("event_id", "user_id", "value")
    val out = Profiling.groupZscores(df, "user_id", "value")
      .select("event_id", "zscore").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) == Some(-1.0) && out(2L) == Some(0.0) &&
      out(3L) == Some(1.0), out.toString)
    assert(out(4L).isEmpty && out(5L).isEmpty,
      "same-cent group has zero grid variance: " + out)
    // a coarser scale coarsens the verdict: at scale=1 all of group 1
    // snaps to 1,2,3 units -> same z's (scale cancels algebraically)
    val unit = Profiling.groupZscores(df, "user_id", "value", scale = 1L)
      .select("event_id", "zscore").as[(Long, Option[Double])].collect().toMap
    assert(unit(1L) == Some(-1.0) && unit(3L) == Some(1.0), unit.toString)
  }

  test("groupZscores: null keys are excluded, rows stay aligned otherwise") {
    val df = Seq(
      (1L, Some(1L), 1.0), (2L, Some(1L), 3.0),
      (3L, None: Option[Long], 9.0)
    ).toDF("event_id", "user_id", "value")
    val out = Profiling.groupZscores(df, "user_id", "value")
    assert(out.count() == 2L)
    assert(out.columns.toSet ==
      Set("event_id", "user_id", "value", "group_n", "zscore"))
  }

  test("benfordProfile: digit extraction from integer cents, shares sum to 1") {
    // 123.45 -> 12345 -> 1; 0.07 -> 7 -> 7; 19.17 (inexact double) -> 1917 -> 1;
    // 0.004 rounds to ZERO cents — excluded (digit-0 would put 1/0 in the
    // Benford expectation), not emitted as a degenerate row
    val df = Seq(123.45, 0.07, 19.17, 2.0, 250.0, 9.99, -5.0, 0.0, 0.004)
      .map(Tuple1(_)).toDF("v")
    val out = Profiling.benfordProfile(df, "v")
      .select("digit", "n").as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 2, 7 -> 1, 2 -> 2, 9 -> 1), s"got $out")
    val shares = Profiling.benfordProfile(df, "v")
      .agg(sum("share")).as[Double].head
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to ~1: $shares")
    // benford_share for digit 1 is log10(2)
    val b1 = Profiling.benfordProfile(df, "v")
      .filter(col("digit") === 1).select("benford_share").as[Double].head
    assert(b1 == BigDecimal(math.log10(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"got $b1")
  }

  test("kAnonymity: class-size histogram, risk flag at k, null QI is its own class") {
    // QI (g, b): class sizes — ("a",1)×3, ("a",2)×1, ("b",1)×2, (null,1)×2
    val df = Seq(
      (Some("a"), 1), (Some("a"), 1), (Some("a"), 1), (Some("a"), 2),
      (Some("b"), 1), (Some("b"), 1),
      (None, 1), (None, 1)).toDF("g", "b")
    val out = Profiling.kAnonymity(df, Seq("g", "b"), k = 3L)
      .orderBy("class_size")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    // sizes: 1 → 1 class (1 row), 2 → 2 classes (4 rows), 3 → 1 class (3 rows)
    assert(out == Seq(
      (1L, 1L, 1L, 0.125, true),
      (2L, 2L, 4L, 0.5, true),
      (3L, 1L, 3L, 0.375, false)), out.toString)
    // row conservation
    assert(out.map(_._3).sum == 8L)
    // coarsening the QI (drop b) clears the risk: every class ≥ 2 rows,
    // at k=2 nothing is at risk
    val coarse = Profiling.kAnonymity(df, Seq("g"), k = 2L)
      .filter(col("at_risk")).count()
    assert(coarse == 0L, "coarsened QI must clear k=2 risk")
  }

  test("lDiversity: homogeneous k-anonymous class flagged; null sensitive is a distinct value") {
    // class A: 4 rows, all sensitive "x" → diversity 1 (k-anonymous at
    // k=4, still at risk); class B: 3 rows, sensitive {x, y, null} →
    // diversity 3 (null counts); class C: 2 rows {x, y} → diversity 2
    val df = Seq(
      ("A", Some("x")), ("A", Some("x")), ("A", Some("x")), ("A", Some("x")),
      ("B", Some("x")), ("B", Some("y")), ("B", None),
      ("C", Some("x")), ("C", Some("y"))).toDF("g", "s")
    val out = Profiling.lDiversity(df, Seq("g"), "s", l = 3L)
      .orderBy("diversity")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 4L, 0.444444, true),
      (2L, 1L, 2L, 0.222222, true),
      (3L, 1L, 3L, 0.333333, false)), out.toString)
    assert(out.map(_._3).sum == 9L, "row conservation")
  }

  test("shuffleSkewProfile: hot key surfaces as max_key_rows; totals and ratios reconcile") {
    // key 7 carries 91 of 100 rows (90 hot + its 1..10 slot) — the
    // one-hot-key shape salting fixes; the other nine keys carry one row
    // each (crowding); null keys excluded
    val rows = Seq.fill(90)(7L) ++ (1L to 10L)
    val df = rows.map(k => (Some(k), "x")).toDF("k", "payload")
      .union(Seq((Option.empty[Long], "x")).toDF("k", "payload"))
    val out = Profiling.shuffleSkewProfile(df, "k", numPartitions = 4)
      .select("bucket", "n_rows", "n_keys", "max_key_rows", "load_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._2).sum == 100L, s"row conservation: $out")
    assert(out.map(_._3).sum == 10L, s"key conservation: $out")
    // the hot key's bucket reports it: exactly one bucket has max_key_rows=90
    assert(out.count(_._4 == 91L) == 1, s"hot key visible: $out")
    // load_ratio = n_rows*P/total for every bucket
    out.foreach { r =>
      assert(math.abs(r._5 - r._2 * 4.0 / 100.0) < 1e-6, r.toString)
    }
    // buckets are in [0, P)
    assert(out.forall(r => r._1 >= 0 && r._1 < 4), out.toString)
  }

  test("equidepthBins: near-equal sizes, contiguous value spans, null exclusion") {
    // 10 values into 3 bins: sizes under rank*k DIV n = 4,3,3 from the
    // low end (rank r -> bin r*3 DIV 10)
    val df = (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .union(Seq((99L, Option.empty[Double])).toDF("id", "v"))
    val out = Profiling.equidepthBins(df, "v", "id", bins = 3)
      .orderBy("bin")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 4L, 1.0, 4.0), (1L, 3L, 5.0, 7.0), (2L, 3L, 8.0, 10.0)), out.toString)
    assert(out.map(_._2).sum == 10L, "null value excluded from ranking")
  }

  test("equidepthBins: skewed data still lands near-equal counts (the histogram can't)") {
    // 90 identical small values + 10 spread large ones: fixed-width bins
    // would put 90% in one bucket; equi-depth ties split by the id
    val df = ((1 to 90).map(i => (i.toLong, 1.0)) ++
      (91 to 100).map(i => (i.toLong, i * 100.0))).toDF("id", "v")
    val sizes = Profiling.equidepthBins(df, "v", "id", bins = 10)
      .select("n").as[Long].collect().toSeq
    assert(sizes.forall(_ == 10L), sizes.toString)
  }

  test("minmaxScale: hand-checked [0,1] positions; zero-span and null verdicts") {
    val df = Seq(
      (1L, "a", Some(10.0)), (2L, "a", Some(20.0)), (3L, "a", Some(15.0)),
      (4L, "b", Some(7.0)), (5L, "b", Some(7.0)), // zero span
      (6L, "a", None)
    ).toDF("id", "g", "v")
    val out = Profiling.minmaxScale(df, "g", "v")
      .select("id", "scaled").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) == Some(0.0) && out(2L) == Some(1.0) && out(3L) == Some(0.5),
      out.toString)
    assert(out(4L).isEmpty && out(5L).isEmpty, "zero-span group scores null")
    assert(out(6L).isEmpty, "null value keeps its row, no position")
  }

  test("abTest: hand-checked rates, lifts, and pooled z; degenerate guards") {
    // control: 4 users, 1 converted; treatment: 4 users, 2 converted
    val df = Seq(
      (0, 1), (0, 0), (0, 0), (0, 0),
      (1, 1), (1, 1), (1, 0), (1, 0)
    ).toDF("variant", "converted")
    val r = Profiling.abTest(df, "variant", "converted").collect()(0)
    assert(r.getAs[Long]("n0") == 4L && r.getAs[Long]("c0") == 1L)
    assert(r.getAs[Long]("n1") == 4L && r.getAs[Long]("c1") == 2L)
    assert(r.getAs[Double]("rate0") == 0.25 && r.getAs[Double]("rate1") == 0.5)
    assert(r.getAs[Double]("abs_lift") == 0.25)
    assert(r.getAs[Double]("rel_lift") == 1.0)
    // p̂ = 3/8; z = 0.25 / sqrt(0.375·0.625·0.5) = 0.730297
    assert(r.getAs[Double]("z_pooled") == 0.730297, r.toString)
    // all-converted pool: no variance, no test
    val deg = Seq((0, 1), (1, 1)).toDF("variant", "converted")
    val d = Profiling.abTest(deg, "variant", "converted").collect()(0)
    assert(d.isNullAt(d.fieldIndex("z_pooled")), "degenerate pool must be null")
    assert(d.getAs[Double]("abs_lift") == 0.0)
    // empty control arm: rates guard, no lift
    val oneArm = Seq((1, 1), (1, 0)).toDF("variant", "converted")
    val o = Profiling.abTest(oneArm, "variant", "converted").collect()(0)
    assert(o.isNullAt(o.fieldIndex("rate0")) && o.isNullAt(o.fieldIndex("abs_lift")))
    assert(o.getAs[Double]("rate1") == 0.5)
  }

  test("rankSumTest: midrank ties, exact integer components, hand-checked z") {
    // A: 1,2,2,5  B: 2,3,4 → sorted 1A 2A 2A 2B 3B 4B 5A (n=7)
    // doubled midranks: 1→2, 2-run(t=3, ranks 2..4)→6, 3→10, 4→12, 5→14
    // R1·2 = 2 + 6 + 6 + 14 = 28; 2U1 = 28 − 4·5 = 8; 2E = 12
    // tie_sum = 3³−3 = 24; 4Var = 4·3·(7·8·6 − 24)/(3·7·6) = 3744/126
    val df = Seq(
      ("A", 1.0), ("A", 2.0), ("A", 2.0), ("A", 5.0),
      ("B", 2.0), ("B", 3.0), ("B", 4.0)
    ).toDF("g", "v")
    val r = Profiling.rankSumTest(df, "g", "v", "A", scale = 1L).collect()(0)
    assert(r.getAs[Long]("n1") == 4L && r.getAs[Long]("n2") == 3L)
    assert(r.getAs[Long]("u1_x2") == 8L && r.getAs[Long]("mu_x2") == 12L)
    assert(r.getAs[Long]("tie_sum") == 24L)
    val expZ = (8.0 - 12.0) / math.sqrt(3744.0 / 126.0)
    assert(math.abs(r.getAs[Double]("z") - expZ) < 2e-6, r.toString)
    // all values tied: zero variance → null z, exact parts still emitted
    val tied = Seq(("A", 1.0), ("A", 1.0), ("B", 1.0)).toDF("g", "v")
    val t = Profiling.rankSumTest(tied, "g", "v", "A", scale = 1L).collect()(0)
    assert(t.isNullAt(t.fieldIndex("z")) && t.getAs[Long]("tie_sum") == 24L)
    // one-arm input: no comparison
    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    val o = Profiling.rankSumTest(one, "g", "v", "A", scale = 1L).collect()(0)
    assert(o.getAs[Long]("n2") == 0L && o.isNullAt(o.fieldIndex("z")))
  }

  test("epi2x2: exact cells, RR/OR/risk difference, undefined guards") {
    val rows = Seq.fill(30)((1, 1)) ++ Seq.fill(70)((1, 0)) ++
      Seq.fill(10)((0, 1)) ++ Seq.fill(90)((0, 0)) ++ Seq((2, 1), (1, 5))
    val r = Profiling.epi2x2(rows.toDF("e", "o"), "e", "o").collect()(0)
    // the (2,1) and (1,5) rows are out-of-domain and must be ignored
    assert(r.getAs[Long]("a") == 30L && r.getAs[Long]("b") == 70L)
    assert(r.getAs[Long]("c") == 10L && r.getAs[Long]("d") == 90L)
    assert(r.getAs[Double]("risk_exposed") == 0.3)
    assert(r.getAs[Double]("risk_unexposed") == 0.1)
    assert(r.getAs[Double]("rr") == 3.0)
    assert(r.getAs[Double]("or") == 3.857143)
    assert(math.abs(r.getAs[Double]("risk_diff") - 0.2) < 1e-9)
    // zero unexposed events: RR undefined, OR undefined (b·c = 0 path)
    val z = Profiling.epi2x2(
      Seq((1, 1), (1, 0), (0, 0)).toDF("e", "o"), "e", "o").collect()(0)
    assert(z.isNullAt(z.fieldIndex("rr")) && z.isNullAt(z.fieldIndex("or")))
    assert(z.getAs[Double]("risk_diff") == 0.5)
  }

  test("chiSquareTest: exact fixed-point cells; zero-observed grid cells included; grid guard") {
    // 2x2 with exact expectations: E = 20/80/20/80 → χ² = 5+1.25+5+1.25 = 12.5
    val rows = Seq.fill(30)((1, 1)) ++ Seq.fill(70)((1, 0)) ++
      Seq.fill(10)((0, 1)) ++ Seq.fill(90)((0, 0))
    val r = Profiling.chiSquareTest(rows.toDF("e", "o"), "e", "o").collect()(0)
    assert(r.getAs[Long]("n") == 200L && r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("n_rows") == 2L && r.getAs[Long]("n_cols") == 2L)
    assert(r.getAs[Long]("chi2_fp") == 12500000000000L, r.toString)
    assert(r.getAs[Double]("chi2") == 12.5)
    // absent (y,q) cell must still contribute expected mass:
    // 2x2 shortcut χ² = 6·(0−4)²/(4·2·4·2) = 1.5
    val sparse = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("x", "q"),
      ("y", "p"), ("y", "p")).toDF("a", "b")
    val z = Profiling.chiSquareTest(sparse, "a", "b").collect()(0)
    assert(z.getAs[Long]("n") == 6L)
    assert(math.abs(z.getAs[Double]("chi2") - 1.5) < 1e-9, z.toString)
    // runaway grid fails fast with the size named
    val err = intercept[Exception] {
      Profiling.chiSquareTest(sparse, "a", "b", maxCells = 1L).collect()
    }
    assert(err.getMessage.contains("maxCells"), err.getMessage)
  }

  test("kruskalWallis: textbook H, tie correction, degenerate nulls") {
    // A{1,2} B{3,4} C{5}: no ties — H = 3.6 (ranks 1..5, hsum = 216)
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0), ("C", 5.0))
      .toDF("g", "v")
    val r = Profiling.kruskalWallis(df, "g", "v", scale = 1L).collect()(0)
    assert(r.getAs[Long]("k_groups") == 3L && r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("tie_sum") == 0L && r.getAs[Long]("hsum") == 216L)
    assert(r.getAs[Long]("dof") == 2L)
    assert(r.getAs[Double]("h") == 3.6 && r.getAs[Double]("h_tied") == 3.6, r.toString)
    // ties: A{1,1} B{1,2} — H = 0.6, correction 0.6 → H' = 1.0
    val t = Profiling.kruskalWallis(
      Seq(("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 2.0)).toDF("g", "v"),
      "g", "v", scale = 1L).collect()(0)
    assert(t.getAs[Long]("hsum") == 104L && t.getAs[Long]("tie_sum") == 24L)
    assert(t.getAs[Double]("h") == 0.6 && t.getAs[Double]("h_tied") == 1.0, t.toString)
    // one group: no comparison
    val d = Profiling.kruskalWallis(
      Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v"), "g", "v", scale = 1L).collect()(0)
    assert(d.isNullAt(d.fieldIndex("h")) && d.isNullAt(d.fieldIndex("h_tied")))
    // all one tie run: correction degenerates → h_tied null, h = 0
    val o = Profiling.kruskalWallis(
      Seq(("A", 1.0), ("B", 1.0)).toDF("g", "v"), "g", "v", scale = 1L).collect()(0)
    assert(o.getAs[Double]("h") == 0.0 && o.isNullAt(o.fieldIndex("h_tied")), o.toString)
  }

  test("rateRatio: exact totals and floor rates, one IEEE division for the ratio") {
    // exposed: 6 events / 200 time; reference: 2 events / 400 time
    val df = Seq(
      ("1", 4L, 120L), ("1", 2L, 80L),
      ("0", 1L, 150L), ("0", 1L, 250L)
    ).toDF("g", "ev", "pt")
    val r = Profiling.rateRatio(df, "g", "ev", "pt", groupOne = "1").collect()(0)
    assert(r.getAs[Long]("e1") == 6L && r.getAs[Long]("t1") == 200L)
    assert(r.getAs[Long]("e0") == 2L && r.getAs[Long]("t0") == 400L)
    assert(r.getAs[Long]("rate1_scaled") == 30L && r.getAs[Long]("rate0_scaled") == 5L)
    assert(r.getAs[Long]("rate_diff_scaled") == 25L)
    // RR = (6·400)/(2·200) = 6.0
    assert(r.getAs[Double]("rate_ratio") == 6.0, r.toString)
    // zero reference events: ratio undefined, rates still emitted
    val z = Profiling.rateRatio(
      Seq(("1", 3L, 100L), ("0", 0L, 100L)).toDF("g", "ev", "pt"),
      "g", "ev", "pt", "1").collect()(0)
    assert(z.isNullAt(z.fieldIndex("rate_ratio")) && z.getAs[Long]("rate1_scaled") == 30L)
  }

  test("weightedIndex: per-key distinct items, unmapped items count but score zero") {
    val df = Seq(
      ("k1", "a"), ("k1", "a"), ("k1", "b"), ("k1", "x"),
      ("k2", "x"), ("k2", null)
    ).toDF("k", "item")
    val out = Profiling.weightedIndex(df, "k", "item", Map("a" -> 2L, "b" -> 1L))
      .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("k1", 3L, 2L, 3L), ("k2", 1L, 0L, 0L)), out.toString)
  }

  test("cmhOddsRatio: exact per-stratum fixed point; crude vs adjusted on one row") {
    def cell(s: String, e: Int, o: Int, n: Int) = Seq.fill(n)((s, e, o))
    // stratum s1: a=4 b=6 c=2 d=8 → ad/n=1.6, bc/n=0.6
    // stratum s2: a=1 b=9 c=1 d=9 → ad/n=0.45, bc/n=0.45
    val df = (cell("s1", 1, 1, 4) ++ cell("s1", 1, 0, 6) ++
      cell("s1", 0, 1, 2) ++ cell("s1", 0, 0, 8) ++
      cell("s2", 1, 1, 1) ++ cell("s2", 1, 0, 9) ++
      cell("s2", 0, 1, 1) ++ cell("s2", 0, 0, 9)).toDF("s", "e", "o")
    val r = Profiling.cmhOddsRatio(df, "s", "e", "o").collect()(0)
    assert(r.getAs[Long]("k_strata") == 2L)
    assert(r.getAs[Long]("num_fp") == 2050000L && r.getAs[Long]("den_fp") == 1050000L)
    // OR_MH = 2.05/1.05 = 1.952381
    assert(r.getAs[Double]("or_mh") == 1.952381, r.toString)
    // crude from pooled cells: a=5 b=15 c=3 d=17 → 85/45 = 1.888889
    assert(r.getAs[Long]("a") == 5L && r.getAs[Long]("d") == 17L)
    assert(r.getAs[Double]("or_crude") == 1.888889)
    // all-concordant stratum set: zero denominator → null OR_MH
    val deg = (cell("s1", 1, 1, 3) ++ cell("s1", 0, 0, 3)).toDF("s", "e", "o")
    val d = Profiling.cmhOddsRatio(deg, "s", "e", "o").collect()(0)
    assert(d.isNullAt(d.fieldIndex("or_mh")) && d.isNullAt(d.fieldIndex("or_crude")))
  }

  test("standardizedRatio: reference rates, exact expectations, hand-checked SMRs") {
    def arm(g: String, s: String, ev: Int, n: Int) =
      Seq.fill(ev)((g, s, 1L)) ++ Seq.fill(n - ev)((g, s, 0L))
    // stratum s1 pooled rate 6/20 = .3, s2 pooled 2/20 = .1
    val df = (arm("A", "s1", 4, 10) ++ arm("A", "s2", 1, 10) ++
      arm("B", "s1", 2, 10) ++ arm("B", "s2", 1, 10)).toDF("g", "s", "e")
    val out = Profiling.standardizedRatio(df, "g", "s", "e")
      .orderBy("g").collect().toSeq
    val a = out(0)
    assert(a.getAs[Long]("n_subjects") == 20L && a.getAs[Long]("observed") == 5L)
    assert(a.getAs[Long]("expected_fp") == 4000000L)
    assert(a.getAs[Double]("smr") == 1.25, a.toString)
    val b = out(1)
    assert(b.getAs[Long]("observed") == 3L && b.getAs[Long]("expected_fp") == 4000000L)
    assert(b.getAs[Double]("smr") == 0.75)
  }

  test("robustZscores: order-statistic centers; outlier cannot mask itself") {
    // group values 1..9 plus one wild outlier 1000:
    // n=10, med = 5th smallest = 5; |v-med| sorted: 0,1,1,2,2,3,3,4,995
    // -> wait n=10: values 1..9 + 1000; deviations 4,3,2,1,0,1,2,3,4,995
    // sorted: 0,1,1,2,2,3,3,4,4,995; rank (10+1) DIV 2 = 5 -> MAD = 2
    val df = ((1 to 9).map(x => (x.toLong, 1L, x.toDouble)) :+
      (10L, 1L, 1000.0)).toDF("id", "k", "v")
    val out = Profiling.robustZscores(df, "k", "v")
      .select("id", "robust_z").as[(Long, Option[Double])].collect().toMap
    // z(1000) = (1000-5)/(2*1.4826) = 335.559153
    assert(out(10L) == Some(BigDecimal(995.0 / (2.0 * 1.4826))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), out.toString)
    // the classical z of the same point would be ~2.8 (masked by itself);
    // the robust score must be enormous
    assert(out(10L).get > 100.0)
    assert(out(5L) == Some(0.0), "the median scores zero")
  }

  test("robustZscores: zero MAD and null values get null verdicts, rows kept") {
    val df = Seq(
      (1L, 1L, Some(5.0)), (2L, 1L, Some(5.0)), (3L, 1L, Some(5.0)),
      (4L, 1L, Some(9.0)),                     // minority outlier, MAD 0
      (5L, 2L, Some(1.0)), (6L, 2L, Some(2.0)), (7L, 2L, Some(4.0)),
      (8L, 2L, None)
    ).toDF("id", "k", "v")
    val out = Profiling.robustZscores(df, "k", "v")
      .select("id", "robust_z").as[(Long, Option[Double])].collect().toMap
    assert(out.size == 8, "all rows kept")
    assert((1L to 4L).forall(out(_).isEmpty), "zero-MAD group: no verdict")
    // group 2: med = 2, deviations 1,0,2 sorted 0,1,2, rank 2 -> MAD 1
    assert(out(5L) == Some(BigDecimal(-1.0 / 1.4826)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), out.toString)
    assert(out(8L).isEmpty, "null value: no verdict")
  }

  test("rfmSegments: tercile scores from hand-built entities; exact cents") {
    // 6 users with strictly increasing R, F, M on the same axis order:
    // terciles must come out 1,1,2,2,3,3 on every dimension
    val rows = (1 to 6).flatMap { u =>
      (1 to u).map(j => (u.toLong, (u * 100 + j).toLong, Some(u * 1.5)))
    }
    val df = rows.toDF("user_id", "ts", "value")
    val out = Profiling.rfmSegments(df, "user_id", "ts", "value")
      .orderBy("user_id")
      .collect()
    assert(out.map(_.getAs[Int]("r_score")).toSeq == Seq(1, 1, 2, 2, 3, 3))
    assert(out.map(_.getAs[Int]("f_score")).toSeq == Seq(1, 1, 2, 2, 3, 3))
    assert(out.map(_.getAs[Int]("m_score")).toSeq == Seq(1, 1, 2, 2, 3, 3))
    assert(out.last.getAs[String]("segment") == "333")
    // exact cents: user 4 has 4 events of 6.0 -> 2400
    assert(out(3).getAs[Long]("monetary_cents") == 2400L)
    // null-value-only users get monetary 0, not null
    val withNull = Seq((9L, 5L, Option.empty[Double])).toDF("user_id", "ts", "value")
    val m0 = Profiling.rfmSegments(withNull, "user_id", "ts", "value")
      .select("monetary_cents").collect()(0).getLong(0)
    assert(m0 == 0L)
  }

  test("trendTest: hand-checked z on a rising dose curve; degenerate nulls") {
    // levels 0,1,2 with n=10 each, r=(1,5,9): t_num=240, var_num/N=4500
    val rows = (Seq.fill(1)((0L, 1)) ++ Seq.fill(9)((0L, 0)) ++
      Seq.fill(5)((1L, 1)) ++ Seq.fill(5)((1L, 0)) ++
      Seq.fill(9)((2L, 1)) ++ Seq.fill(1)((2L, 0))).toDF("lvl", "y")
    val r = Profiling.trendTest(rows, "lvl", "y").collect()(0)
    assert(r.getAs[Long]("n") == 30L && r.getAs[Long]("n_events") == 15L)
    assert(r.getAs[Long]("sw1") == 30L && r.getAs[Long]("sw2") == 50L)
    assert(r.getAs[Long]("swr") == 23L && r.getAs[Long]("t_num") == 240L)
    val expZ = 240.0 / math.sqrt(4500.0)
    assert(math.abs(r.getAs[Double]("z") - expZ) < 2e-6, r.toString)
    // constant outcome: no variance
    val c = Profiling.trendTest(
      Seq((0L, 0), (1L, 0), (2L, 0)).toDF("lvl", "y"), "lvl", "y").collect()(0)
    assert(c.isNullAt(c.fieldIndex("z")))
    // single level: zero weight variance
    val s = Profiling.trendTest(
      Seq((1L, 0), (1L, 1)).toDF("lvl", "y"), "lvl", "y").collect()(0)
    assert(s.isNullAt(s.fieldIndex("z")))
  }

  test("directStdRate: case-mix-corrected rates replay the hand example exactly") {
    // A: rates 0.2/0.4 per stratum; B: 0.1/0.1; std pop w = (40, 60)
    val df = (
      Seq.fill(2)(("A", "s1", 1)) ++ Seq.fill(8)(("A", "s1", 0)) ++
        Seq.fill(8)(("A", "s2", 1)) ++ Seq.fill(12)(("A", "s2", 0)) ++
        Seq.fill(3)(("B", "s1", 1)) ++ Seq.fill(27)(("B", "s1", 0)) ++
        Seq.fill(4)(("B", "s2", 1)) ++ Seq.fill(36)(("B", "s2", 0))
      ).toDF("g", "s", "e")
    val out = Profiling.directStdRate(df, "g", "s", "e", scale = 1000L)
      .orderBy("g").collect()
    val a = out(0)
    assert(a.getAs[Long]("n_subjects") == 30L && a.getAs[Long]("observed") == 10L)
    assert(a.getAs[Long]("crude_fp") == 333L)
    assert(a.getAs[Long]("dsr_fp") == 320L)
    assert(a.getAs[Double]("dsr") == 0.32, a.toString) // 0.2·0.4 + 0.4·0.6
    val b = out(1)
    assert(b.getAs[Long]("crude_fp") == 100L && b.getAs[Long]("dsr_fp") == 100L)
    assert(b.getAs[Double]("dsr") == 0.1, b.toString)
  }

  test("concentration: exact Lorenz cuts inside tie runs; textbook gini; negatives excluded") {
    // totals 1,1,3,5 → gini (2·32)/(4·10) − 5/4 = 0.35
    val df = Seq(("k1", 1.0), ("k2", 1.0), ("k3", 3.0), ("k4", 5.0),
      ("k5", -5.0)) // net-refund key: excluded
      .toDF("k", "v")
    val out = Profiling.concentration(df, "k", "v",
      bottomPerMyriad = Seq(0, 5000, 7500, 10000), scale = 1L)
      .orderBy("p_myriad").collect()
    assert(out.length == 4, out.mkString("; "))
    assert(out.forall(_.getAs[Long]("n_keys") == 4L))
    assert(out.forall(_.getAs[Long]("total_fp") == 10L))
    assert(out.forall(_.getAs[Double]("gini") == 0.35), out.mkString("; "))
    val byP = out.map(r => r.getAs[Int]("p_myriad") ->
      (r.getAs[Long]("kcut"), r.getAs[Long]("bottom_fp"),
        r.getAs[Double]("share_bottom"), r.getAs[Double]("share_top"))).toMap
    assert(byP(0) == ((0L, 0L, 0.0, 1.0)))
    // bottom half = the two 1s → share 0.2
    assert(byP(5000) == ((2L, 2L, 0.2, 0.8)))
    // kcut 3 → bottom {1,1,3} = 5
    assert(byP(7500) == ((3L, 5L, 0.5, 0.5)))
    assert(byP(10000) == ((4L, 10L, 1.0, 0.0)))
  }

  test("balanceTable: exact moments per group; smd on the rounded chain; degenerate nulls") {
    // exposed {1,2,3} (m=2, v=1), unexposed {5,7,9} (m=7, v=4)
    // smd = (2−7)/sqrt(2.5) = −3.162278
    val df = Seq(
      (1, 1.0, 10.0), (1, 2.0, 10.0), (1, 3.0, 10.0),
      (0, 5.0, 10.0), (0, 7.0, 10.0), (0, 9.0, 10.0),
      (2, 99.0, 99.0) // out-of-domain exposure excluded
    ).toDF("e", "x", "c")
    val out = Profiling.balanceTable(df, "e", Seq("x", "c"), scale = 1L)
      .orderBy("covariate").collect()
    val cx = out(1)
    assert(cx.getAs[String]("covariate") == "x")
    assert(cx.getAs[Long]("n1") == 3L && cx.getAs[Long]("n0") == 3L)
    assert(cx.getAs[Double]("mean_exposed") == 2.0 &&
      cx.getAs[Double]("mean_unexposed") == 7.0)
    assert(cx.getAs[Double]("var_exposed") == 1.0 &&
      cx.getAs[Double]("var_unexposed") == 4.0)
    assert(cx.getAs[Double]("smd") == -3.162278, cx.toString)
    // constant covariate: pooled variance zero → smd undefined
    val cc = out(0)
    assert(cc.getAs[String]("covariate") == "c")
    assert(cc.getAs[Double]("var_exposed") == 0.0 &&
      cc.isNullAt(cc.fieldIndex("smd")), cc.toString)
    // a one-row group has no sample variance
    val tiny = Profiling.balanceTable(
      Seq((1, 4.0), (0, 1.0), (0, 2.0)).toDF("e", "x"), "e", Seq("x"), 1L)
      .collect()(0)
    assert(tiny.isNullAt(tiny.fieldIndex("var_exposed")) &&
      tiny.isNullAt(tiny.fieldIndex("smd")))
  }
}
