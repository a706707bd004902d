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
  }
}
