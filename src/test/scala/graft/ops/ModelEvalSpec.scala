package graft.ops

import graft.SparkSpec

class ModelEvalSpec extends SparkSpec {
  import spark.implicits._

  test("aucScore: pairwise-counted AUC with half-credit ties; one-class null") {
    // pos {3,4,4}, neg {1,2,4}: pairwise wins 2 + 2.5 + 2.5 = 7 of 9
    val df = Seq((1, 3.0), (1, 4.0), (1, 4.0), (0, 1.0), (0, 2.0), (0, 4.0))
      .toDF("y", "s")
    val r = ModelEval.aucScore(df, "y", "s", scale = 1L).collect()(0)
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 3L)
    // doubled midranks 2,4,6,10,10,10 → R1·2 = 26; u_x2 = 26 − 12 = 14
    assert(r.getAs[Long]("u_x2") == 14L)
    assert(r.getAs[Double]("auc") == 0.777778, r.toString)
    assert(r.getAs[Double]("gini") == 0.555556, r.toString)
    // perfect separation
    val p = ModelEval.aucScore(
      Seq((1, 9.0), (1, 8.0), (0, 1.0)).toDF("y", "s"), "y", "s", 1L)
      .collect()(0)
    assert(p.getAs[Double]("auc") == 1.0 && p.getAs[Double]("gini") == 1.0)
    // one class only: no ranking task
    val o = ModelEval.aucScore(
      Seq((1, 1.0), (1, 2.0)).toDF("y", "s"), "y", "s", 1L).collect()(0)
    assert(o.getAs[Long]("n_neg") == 0L && o.isNullAt(o.fieldIndex("auc")))
    // out-of-domain labels are excluded, not misread
    val d = ModelEval.aucScore(
      Seq((1, 9.0), (0, 1.0), (2, 5.0)).toDF("y", "s"), "y", "s", 1L)
      .collect()(0)
    assert(d.getAs[Long]("n_pos") + d.getAs[Long]("n_neg") == 2L)
    // NaN scores are malformed, not grid-0: they must not rank at all
    val nan = ModelEval.aucScore(
      Seq((1, 9.0), (0, 1.0), (1, Double.NaN), (0, Double.NaN))
        .toDF("y", "s"), "y", "s", 1L).collect()(0)
    assert(nan.getAs[Long]("n_pos") == 1L && nan.getAs[Long]("n_neg") == 1L,
      nan.toString)
    assert(nan.getAs[Double]("auc") == 1.0, nan.toString)
  }

  test("calibrationBins: fixed edges, exact per-bin sums, score-1 lands in the top bin") {
    val df = Seq((0, 0.2), (1, 0.3), (1, 0.6), (1, 1.0),
      (1, 1.5), (2, 0.5)) // last two malformed: score>1, label∉{0,1}
      .toDF("y", "s")
    val out = ModelEval.calibrationBins(df, "y", "s", nBins = 2, scale = 100L)
      .orderBy("bin").collect()
    assert(out.length == 2)
    val b0 = out(0)
    assert(b0.getAs[Long]("bin") == 0L && b0.getAs[Long]("n") == 2L)
    assert(b0.getAs[Long]("n_pos") == 1L && b0.getAs[Long]("sum_score_fp") == 50L)
    assert(b0.getAs[Double]("obs_rate") == 0.5)
    assert(b0.getAs[Double]("pred_rate") == 0.25)
    assert(b0.getAs[Double]("gap") == 0.25)
    val b1 = out(1)
    assert(b1.getAs[Long]("bin") == 1L && b1.getAs[Long]("n") == 2L)
    assert(b1.getAs[Long]("sum_score_fp") == 160L)
    assert(b1.getAs[Double]("obs_rate") == 1.0 && b1.getAs[Double]("pred_rate") == 0.8)
    assert(b1.getAs[Double]("gap") == 0.2, b1.toString)
  }

  test("kappaAgreement: textbook 2x2 kappa; constant raters null; po/pe exact") {
    // xx=40 xy=10 yx=20 yy=30 → po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(40)(("x", "x")) ++ Seq.fill(10)(("x", "y")) ++
      Seq.fill(20)(("y", "x")) ++ Seq.fill(30)(("y", "y"))
    val r = ModelEval.kappaAgreement(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getAs[Long]("n") == 100L && r.getAs[Long]("n_agree") == 70L)
    assert(r.getAs[Long]("pe_num") == 5000L)
    assert(r.getAs[Double]("po") == 0.7 && r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4, r.toString)
    // both raters constant: chance term saturates, kappa undefined
    val c = ModelEval.kappaAgreement(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b").collect()(0)
    assert(c.getAs[Double]("po") == 1.0 && c.isNullAt(c.fieldIndex("kappa")))
    // a category present on one side only adds zero product mass
    val s = ModelEval.kappaAgreement(
      Seq(("x", "x"), ("y", "z")).toDF("a", "b"), "a", "b").collect()(0)
    assert(s.getAs[Long]("pe_num") == 1L, s.toString) // only x·x = 1·1
  }

  test("brierScore: exact fixed-point SSE; climatology and skill score; constant-outcome null bss") {
    // scores .1/.9 on labels 0/1: sse = 2·0.01 → brier 0.01
    val df = Seq((0, 0.1), (1, 0.9)).toDF("y", "s")
    val r = ModelEval.brierScore(df, "y", "s", scale = 10L).collect()(0)
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("n_pos") == 1L)
    assert(r.getAs[Long]("sse_fp") == 2L) // (1-0)² + (9-10)²
    assert(r.getAs[Double]("brier") == 0.01, r.toString)
    assert(r.getAs[Double]("uncertainty") == 0.25)
    assert(r.getAs[Double]("bss") == 0.96, r.toString)
    // constant outcome: unc = 0, bss undefined; brier still real
    val c = ModelEval.brierScore(
      Seq((1, 0.5), (1, 0.5)).toDF("y", "s"), "y", "s", 10L).collect()(0)
    assert(c.getAs[Double]("brier") == 0.25 &&
      c.isNullAt(c.fieldIndex("bss")))
    // malformed rows excluded
    val m = ModelEval.brierScore(
      Seq((1, 0.5), (2, 0.5), (1, 1.5)).toDF("y", "s"), "y", "s", 10L)
      .collect()(0)
    assert(m.getAs[Long]("n") == 1L)
  }

  test("prCurve + averagePrecision: tie runs share a threshold; exact step AP") {
    // scores desc: 0.9(+), 0.8(−), 0.7(+), 0.7(+), 0.6(−)
    val df = Seq((1, 0.9), (0, 0.8), (1, 0.7), (1, 0.7), (0, 0.6))
      .toDF("y", "s")
    val pr = ModelEval.prCurve(df, "y", "s", scale = 10L)
      .orderBy(org.apache.spark.sql.functions.col("score_fp").desc).collect()
    assert(pr.length == 4)
    assert(pr(0).getAs[Long]("cum_tp") == 1L && pr(0).getAs[Long]("cum_n") == 1L)
    assert(pr(0).getAs[Double]("precision") == 1.0)
    val tie = pr(2) // threshold 0.7: cum_tp=3, cum_n=4
    assert(tie.getAs[Long]("n_at") == 2L && tie.getAs[Long]("pos_at") == 2L)
    assert(tie.getAs[Long]("cum_tp") == 3L && tie.getAs[Long]("cum_n") == 4L)
    assert(tie.getAs[Double]("precision") == 0.75)
    assert(tie.getAs[Double]("recall") == 1.0)
    // f1 = 2·3/(4+3) = 6/7
    assert(tie.getAs[Double]("f1") == 0.857143, tie.toString)
    // AP = (1/3)·1 + 0 + (2/3)·(3/4) = 1/3 + 1/2 = 5/6
    val ap = ModelEval.averagePrecision(df, "y", "s", 10L, 1000000L)
      .collect()(0)
    assert(ap.getAs[Long]("n_pos") == 3L)
    // term_fp: 1·1·1e6 DIV 1 = 1e6 ; 2·3·1e6 DIV 4 = 1 500 000
    assert(ap.getAs[Long]("ap_num") == 2500000L, ap.toString)
    assert(ap.getAs[Double]("ap") == 0.833333, ap.toString)
    // no positives: ap null
    val z = ModelEval.averagePrecision(
      Seq((0, 0.4)).toDF("y", "s"), "y", "s", 10L).collect()(0)
    assert(z.isNullAt(z.fieldIndex("ap")))
  }

  test("liftTable: top-down cumulative capture and exact integer lift") {
    // 2 bins: top half scores capture 3 of 4 positives
    val df = Seq((1, 0.9), (1, 0.8), (1, 0.6), (0, 0.7),
      (1, 0.3), (0, 0.2), (0, 0.1), (0, 0.4)).toDF("y", "s")
    val out = ModelEval.liftTable(df, "y", "s", nBins = 2)
      .orderBy(org.apache.spark.sql.functions.col("bin").desc).collect()
    assert(out.length == 2)
    val top = out(0)
    assert(top.getAs[Long]("bin") == 1L && top.getAs[Long]("cum_n") == 4L)
    assert(top.getAs[Long]("cum_pos") == 3L)
    assert(top.getAs[Double]("capture") == 0.75)
    assert(top.getAs[Double]("cum_rate") == 0.75)
    // lift = (3·8)/(4·4) = 1.5
    assert(top.getAs[Double]("lift") == 1.5, top.toString)
    val bottom = out(1)
    assert(bottom.getAs[Long]("cum_n") == 8L && bottom.getAs[Long]("cum_pos") == 4L)
    assert(bottom.getAs[Double]("lift") == 1.0)
  }

  test("mcnemarTest: discordant-cell chi-square with continuity correction; concordant null") {
    // b=n10=10, c=n01=4: chi2 = 36/14, cc = 25/14
    val rows = Seq.fill(10)((1, 0)) ++ Seq.fill(4)((0, 1)) ++
      Seq.fill(5)((1, 1)) ++ Seq.fill(3)((0, 0))
    val r = ModelEval.mcnemarTest(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getAs[Long]("n") == 22L && r.getAs[Long]("n10") == 10L &&
      r.getAs[Long]("n01") == 4L)
    assert(r.getAs[Double]("chi2") == 2.571429, r.toString)
    assert(r.getAs[Double]("chi2_cc") == 1.785714, r.toString)
    // perfectly concordant: no discordant mass, test undefined
    val c = ModelEval.mcnemarTest(
      Seq((1, 1), (0, 0)).toDF("a", "b"), "a", "b").collect()(0)
    assert(c.isNullAt(c.fieldIndex("chi2")))
    // |b−c| ≤ 1 → cc clamps to zero, not negative
    val e = ModelEval.mcnemarTest(
      Seq((1, 0), (0, 1), (1, 0)).toDF("a", "b"), "a", "b").collect()(0)
    assert(e.getAs[Double]("chi2_cc") == 0.0, e.toString)
  }

  test("weightedKappa: quadratic weights forgive near-misses; linear variant; constant null") {
    // 3-level ordinal, raters differ by one step on 2 of 10 rows
    val rows = Seq.fill(4)((0, 0)) ++ Seq.fill(4)((2, 2)) ++
      Seq((0, 1), (2, 1))
    val q = ModelEval.weightedKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(q.getAs[Long]("n") == 10L)
    // wo = 2·1 = 2; we: R=(5,0,5), C=(4,2,4) → Σ(i−j)²RiCj
    //   = 5·(0·4+1·2+4·4) + 5·(4·4+1·2+0·4) = 5·18 + 5·18 = 180
    assert(q.getAs[Long]("wo_num") == 2L && q.getAs[Long]("we_num") == 180L)
    // κ_w = (180 − 10·2)/180 = 8/9
    assert(q.getAs[Double]("kappa_w") == 0.888889, q.toString)
    val l = ModelEval.weightedKappa(rows.toDF("a", "b"), "a", "b",
      quadratic = false).collect()(0)
    assert(l.getAs[Long]("wo_num") == 2L && l.getAs[Long]("we_num") == 100L)
    assert(l.getAs[Double]("kappa_w") == 0.8, l.toString)
    // both raters constant equal: we = 0, undefined
    val c = ModelEval.weightedKappa(
      Seq((1, 1), (1, 1)).toDF("a", "b"), "a", "b").collect()(0)
    assert(c.isNullAt(c.fieldIndex("kappa_w")))
  }

  test("hosmerLemeshow: exact per-bin terms; degenerate bins dropped and counted") {
    // 2 bins, scale 10, T 1e6.
    // bin0: s=.2 ×4, O=2 → E=8, n·S=40, dev=2·10−8=12
    //   term = 144·4·1e6 DIV (8·32) = 2 250 000
    // bin1: s=.8 ×4, O=2 → E=32, dev=−12
    //   term = 144·4·1e6 DIV (32·8) = 2 250 000
    val df = Seq((1, 0.2), (1, 0.2), (0, 0.2), (0, 0.2),
      (1, 0.8), (1, 0.8), (0, 0.8), (0, 0.8)).toDF("y", "s")
    val r = ModelEval.hosmerLemeshow(df, "y", "s", nBins = 2, scale = 10L)
      .collect()(0)
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("n_bins_used") == 2L)
    assert(r.getAs[Long]("h_num") == 4500000L, r.toString)
    assert(r.getAs[Double]("h_stat") == 4.5, r.toString)
    assert(r.isNullAt(r.fieldIndex("df_hl"))) // 2 bins − 2 = 0 → null
    // an all-zero-score bin has E=0: dropped, not divided by zero
    val d = ModelEval.hosmerLemeshow(
      Seq((0, 0.0), (1, 0.75), (0, 0.75)).toDF("y", "s"),
      "y", "s", nBins = 2, scale = 10L).collect()(0)
    assert(d.getAs[Long]("n_bins_used") == 1L &&
      d.getAs[Long]("n_bins_dropped") == 1L)
  }

  test("spearmanCorr: monotone ±1, midrank ties match Pearson-on-ranks, zero-variance null") {
    val up = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("x", "y")
    val u = ModelEval.spearmanCorr(up, "x", "y", 1L, 1L).collect()(0)
    assert(u.getAs[Long]("n") == 3L && u.getAs[Double]("rho") == 1.0)
    val down = Seq((1.0, 30.0), (2.0, 20.0), (3.0, 10.0)).toDF("x", "y")
    assert(ModelEval.spearmanCorr(down, "x", "y", 1L, 1L)
      .collect()(0).getAs[Double]("rho") == -1.0)
    // x {1,1,2}, y {5,6,7}: Pearson on midranks = sqrt(3)/2
    val t = ModelEval.spearmanCorr(
      Seq((1.0, 5.0), (1.0, 6.0), (2.0, 7.0)).toDF("x", "y"),
      "x", "y", 1L, 1L).collect()(0)
    assert(t.getAs[Long]("tie_x") == 6L && t.getAs[Long]("tie_y") == 0L)
    assert(t.getAs[Double]("rho") == 0.866025, t.toString)
    // constant axis: no rank variance
    val z = ModelEval.spearmanCorr(
      Seq((1.0, 5.0), (1.0, 6.0)).toDF("x", "y"), "x", "y", 1L, 1L)
      .collect()(0)
    assert(z.isNullAt(z.fieldIndex("rho")))
    // NaN on either axis excludes the ROW (it is not grid value 0)
    val nan = ModelEval.spearmanCorr(
      Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0),
        (Double.NaN, 40.0), (4.0, Double.NaN)).toDF("x", "y"),
      "x", "y", 1L, 1L).collect()(0)
    assert(nan.getAs[Long]("n") == 3L && nan.getAs[Double]("rho") == 1.0,
      nan.toString)
  }

  test("rocCurve: exact cumulative counts, rates against class totals") {
    // scores desc: 0.9(+), 0.8(−), 0.7(+), 0.6(−): P=2, N=2
    val df = Seq((1, 0.9), (0, 0.8), (1, 0.7), (0, 0.6)).toDF("y", "s")
    val pts = ModelEval.rocCurve(df, "y", "s", scale = 10L)
      .orderBy(org.apache.spark.sql.functions.col("score_fp").desc).collect()
    assert(pts.length == 4)
    assert(pts(0).getAs[Long]("cum_tp") == 1L && pts(0).getAs[Long]("cum_fp") == 0L)
    assert(pts(0).getAs[Double]("tpr") == 0.5 && pts(0).getAs[Double]("fpr") == 0.0)
    assert(pts(1).getAs[Double]("tpr") == 0.5 && pts(1).getAs[Double]("fpr") == 0.5)
    assert(pts(3).getAs[Double]("tpr") == 1.0 && pts(3).getAs[Double]("fpr") == 1.0)
    // one-class input: the missing class's rate is null, not a /0
    val one = ModelEval.rocCurve(
      Seq((1, 0.9), (1, 0.1)).toDF("y", "s"), "y", "s", 10L).collect()
    assert(one.forall(_.isNullAt(one(0).fieldIndex("fpr"))))
  }

  test("scoreKs: integer-exact max CDF gap, highest-threshold tiebreak, one-class null") {
    // scores desc: 0.9(+), 0.8(+), 0.7(−), 0.6(+), 0.5(−), 0.4(−)
    // P=3, N=3; gaps·9: t=.9:3, .8:6, .7:3, .6:6, .5:3, .4:0 → KS=6/9
    val df = Seq((1, 0.9), (1, 0.8), (0, 0.7), (1, 0.6), (0, 0.5), (0, 0.4))
      .toDF("y", "s")
    val r = ModelEval.scoreKs(df, "y", "s", scale = 10L).collect()(0)
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 3L)
    assert(r.getAs[Long]("ks_num") == 6L)
    // tie between thresholds 0.8 and 0.6 → the HIGHEST (earliest) wins
    assert(r.getAs[Long]("ks_score_fp") == 8L, r.toString)
    assert(r.getAs[Double]("ks") == 0.666667, r.toString)
    val one = ModelEval.scoreKs(
      Seq((1, 0.9)).toDF("y", "s"), "y", "s", 10L).collect()(0)
    assert(one.isNullAt(one.fieldIndex("ks")))
  }

  test("subgroupAuc: per-group exact rank AUC matches per-group aucScore") {
    val df = Seq(
      ("a", 1, 3.0), ("a", 1, 4.0), ("a", 0, 1.0), ("a", 0, 2.0),
      ("b", 1, 1.0), ("b", 0, 2.0), ("b", 1, 3.0),
      (null.asInstanceOf[String], 1, 9.0)).toDF("g", "y", "s")
    val by = ModelEval.subgroupAuc(df, "g", "y", "s", 1L).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(by.size == 2, "null group excluded")
    for (g <- Seq("a", "b")) {
      val solo = ModelEval.aucScore(
        df.filter(org.apache.spark.sql.functions.col("g") === g), "y", "s", 1L)
        .collect()(0)
      assert(by(g).getAs[Long]("u_x2") == solo.getAs[Long]("u_x2"), g)
      assert(by(g).getAs[Double]("auc") == solo.getAs[Double]("auc"), g)
    }
    assert(by("a").getAs[Double]("auc") == 1.0)
  }

  test("prCurve: NaN scores excluded — no phantom threshold at grid 0") {
    val pr = ModelEval.prCurve(
      Seq((1, 0.9), (0, 0.1), (1, Double.NaN)).toDF("y", "s"),
      "y", "s", scale = 10L).collect()
    assert(pr.length == 2, pr.mkString(";"))
    assert(pr.forall(_.getAs[Long]("score_fp") >= 1L), pr.mkString(";"))
  }
}
