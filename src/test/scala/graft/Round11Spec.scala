package graft

import graft.operators.{Croston, Kalman}
import graft.pipeline.{Behavior, Governance, Profiler}
import org.apache.spark.sql.functions._

/** Round-11 operator family: survival hazard, k-group rank tests,
  * PACF, link prediction, k-core, sequential filters, DP release.
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  test("nelsonAalen accumulates d/n hazard terms over risk sets") {
    // u1 dies at dur 0, u2 at dur 2, u3 censored (within horizon)
    val ev = Seq(
      (1L, 0L), (1L, 0L),
      (2L, 0L), (2L, 2L * day),
      (3L, 0L), (3L, 20L * day))
      .toDF("user_id", "t_us")
    val r = Behavior.nelsonAalen(ev, "user_id", "t_us")
      .orderBy("duration_days").collect()
    assert(r.map(_.getAs[Long]("duration_days")).toSeq == Seq(0L, 2L))
    assert(r.map(_.getAs[Long]("n_at_risk")).toSeq == Seq(3L, 2L))
    // H = 1/3, then 1/3 + 1/2
    assert(r(0).getAs[Double]("cum_hazard") == 0.333333)
    assert(r(1).getAs[Double]("cum_hazard") == 0.833333)
    // V = 1*2/27, then + 1*1/8
    assert(r(0).getAs[Double]("hazard_var") == 0.074074)
    assert(r(1).getAs[Double]("hazard_var") == 0.199074)
  }

  test("anovaF matches the hand-computed two-group F") {
    // a: 1,2,3 ; b: 5,6,7 -> SSB=24, SSW=4, F=(24/1)/(4/4)=24
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 5L), ("b", 6L), ("b", 7L)).toDF("g", "vq")
    val row = Profiler.anovaF(df, "g", "vq").collect().head
    assert(row.getAs[Long]("k") == 2 && row.getAs[Long]("n") == 6)
    assert(row.getAs[Double]("ss_between") == 24.0)
    assert(row.getAs[Double]("ss_within") == 4.0)
    assert(row.getAs[Double]("f_stat") == 24.0)
  }

  test("mannWhitneyU: separated groups give U=0 and the exact z") {
    val df = Seq((0, 1L), (0, 2L), (1, 3L), (1, 4L)).toDF("coh", "vq")
    val row = Profiler.mannWhitneyU(df, "coh", "vq").collect().head
    assert(row.getAs[Long]("n_a") == 2 && row.getAs[Long]("n_b") == 2)
    assert(row.getAs[Double]("u_a") == 0.0)
    // z = (0 - 2)/sqrt(4/12 * 5) = -2/sqrt(5/3) = -1.549193
    assert(row.getAs[Double]("z") == -1.549193)
  }

  test("mannWhitneyU averages tied ranks (doubled-integer form)") {
    // A={1,1}, B={1,2}: value 1 has avg rank 2 -> R_A=4, U_A=1
    val df = Seq((0, 1L), (0, 1L), (1, 1L), (1, 2L)).toDF("coh", "vq")
    val row = Profiler.mannWhitneyU(df, "coh", "vq").collect().head
    assert(row.getAs[Double]("u_a") == 1.0)
  }

  test("kruskalWallis matches the hand-computed H; no-tie corr = 1") {
    // {1,2} vs {3,4}: H = 12/20*(4.5+24.5) - 15 = 2.4
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "vq")
    val row = Profiler.kruskalWallis(df, "g", "vq").collect().head
    assert(row.getAs[Double]("h_uncorrected") == 2.4)
    assert(row.getAs[Double]("h") == 2.4)
  }

  test("pacf3: AR(1) series shows phi1 near the coefficient, phi2 small") {
    val rnd = new scala.util.Random(11)
    var x = 0.0
    val rows = (0 until 400).map { i =>
      x = 0.5 * x + (rnd.nextDouble() - 0.5)
      ("s", i.toLong, x)
    }
    val df = rows.toDF("sensor_id", "timestamp_us", "value")
    val row = Profiler.pacf3(df, "sensor_id", "timestamp_us", "value")
      .collect().head
    val phi1 = row.getAs[Double]("phi1")
    val phi2 = row.getAs[Double]("phi2")
    assert(math.abs(phi1 - 0.5) < 0.2, s"phi1=$phi1")
    assert(math.abs(phi2) < 0.2, s"phi2=$phi2")
    // phi1 IS the lag-1 autocorrelation by definition
    val acf1 = Profiler.autocorrelation(
        df, "sensor_id", "timestamp_us", "value", maxLag = 1)
      .collect().head.getAs[Double]("acf")
    assert(phi1 == acf1)
  }

  test("adamicAdar weights shared baskets by 1/ln(size)") {
    val ev = Seq((10L, 1L), (10L, 2L),
      (20L, 1L), (20L, 2L), (20L, 3L)).toDF("bk", "item")
    val r = Behavior.adamicAdar(ev, "bk", "item").collect()
    // (1,2) shares both baskets: 1/ln2 + 1/ln3
    assert(r.head.getAs[Long]("item_a") == 1L &&
      r.head.getAs[Long]("item_b") == 2L)
    assert(r.head.getAs[Long]("n_common") == 2)
    assert(r.head.getAs[Double]("aa_score") == 2.352934)
    // (1,3) and (2,3) share only the size-3 basket
    assert(r.tail.forall(_.getAs[Double]("aa_score") == 0.910239))
  }

  test("kCore peels pendants iteratively") {
    // triangle 1-2-3 plus pendant 4-1: 2-core = the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
      .toDF("a", "b")
    val r = Behavior.kCore(edges, k = 2, rounds = 4)
      .orderBy("node").collect()
    assert(r.map(_.getAs[Long]("node")).toSeq == Seq(1L, 2L, 3L))
    assert(r.forall(_.getAs[Long]("degree") == 2L))
    // and no 3-core exists
    assert(Behavior.kCore(edges, k = 3, rounds = 4).count() == 0)
  }

  test("Kalman filterLast: seed and one-step update are exact") {
    val one = Seq(("s", 0L, 7.5)).toDF(
      "sensor_id", "timestamp_us", "value")
    val r1 = Kalman.filterLast(one).collect().head
    assert(r1.getAs[Long]("n_samples") == 1L)
    assert(r1.getAs[Double]("level") == 7.5)
    assert(r1.getAs[Double]("p_var") == 1.0)

    val two = Seq(("s", 0L, 0.0), ("s", 1L, 4.0)).toDF(
      "sensor_id", "timestamp_us", "value")
    val r2 = Kalman.filterLast(two).collect().head
    val pp = 1.0 + 0.25
    val k = pp / (pp + 4.0)
    assert(r2.getAs[Double]("level") == k * 4.0)
    assert(r2.getAs[Double]("p_var") == (1.0 - k) * pp)
  }

  test("Croston forecast: first-gap seeding then smoothed updates") {
    val dm = Seq((1L, 0L, 2.0), (1L, 3L, 4.0), (1L, 5L, 6.0),
      (2L, 0L, 1.0), (2L, 9L, 1.0)) // item 2: only 2 demands
      .toDF("item", "period", "qty")
    val r = Croston.forecast(dm).collect()
    assert(r.length == 1 && r.head.getAs[Long]("item") == 1L)
    // z: 2 -> 2.5 -> 3.375 ; p: seed 3 -> 2.75
    assert(r.head.getAs[Double]("z_size") == 3.375)
    assert(r.head.getAs[Double]("p_interval") == 2.75)
    assert(r.head.getAs[Double]("rate") == 3.375 / 2.75)
  }

  test("distributionOverlap: cross-multiplied min of bucket masses") {
    // a: {b1:2, b2:2}, b: {b1:1, b2:3} -> (min(8,4)+min(8,12))/16
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 2L),
      ("b", 1L), ("b", 2L), ("b", 2L), ("b", 2L)).toDF("g", "bk")
    val row = Profiler.distributionOverlap(df, "g", "bk")
      .collect().head
    assert(row.getAs[Double]("overlap") == 0.75)
    // identical distributions overlap fully
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "bk")
    assert(Profiler.distributionOverlap(same, "g", "bk")
      .collect().head.getAs[Double]("overlap") == 1.0)
  }

  test("chao1Richness estimates unseen vocabulary from F1/F2") {
    val docs = Seq(("s1", "x y y z z w"), ("s2", "x y"))
      .toDF("source", "text")
    val rows = graft.pipeline.TextAnalysis
      .chao1Richness(docs, "source", "text")
      .orderBy("source").collect()
    // s1: V=4, F1=2, F2=2 -> 4 + 4/4 = 5 ; s2: F2=0 -> 2 + 2*1/2 = 3
    assert(rows(0).getAs[Double]("chao1") == 5.0)
    assert(rows(1).getAs[Double]("chao1") == 3.0)
  }

  test("cohenKappa: perfect and hand-computed partial agreement") {
    val perfect = Seq((true, true), (false, false), (true, true))
      .toDF("a", "b")
    assert(Profiler.cohenKappa(perfect, col("a"), col("b"))
      .collect().head.getAs[Double]("kappa") == 1.0)
    // 2x2 = [2,1;1,2]: po=2/3, pe=1/2, kappa=1/3
    val mixed = Seq((true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false)).toDF("a", "b")
    val row = Profiler.cohenKappa(mixed, col("a"), col("b"))
      .collect().head
    assert(row.getAs[Double]("p_observed") == 0.666667)
    assert(row.getAs[Double]("p_expected") == 0.5)
    assert(row.getAs[Double]("kappa") == 0.333333)
  }

  test("grubbsMax studentizes the worst deviation, cross-multiplied") {
    // [0,0,10]: G = (20/3)/sqrt(200/6) = 2/sqrt(3)
    val df = Seq(("g", 0L), ("g", 0L), ("g", 10L)).toDF("g", "vq")
    val row = Profiler.grubbsMax(df, "g", "vq").collect().head
    assert(row.getAs[Double]("g_stat") == 1.154701)
    // groups below 3 rows are dropped
    val tiny = Seq(("g", 0L), ("g", 1L)).toDF("g", "vq")
    assert(Profiler.grubbsMax(tiny, "g", "vq").count() == 0)
  }

  test("jsdBetweenGroups: 0 on identical, ln2 on disjoint vocab") {
    import graft.pipeline.TextAnalysis
    val same = Seq(("a", "x y"), ("b", "x y")).toDF("source", "text")
    assert(TextAnalysis.jsdBetweenGroups(same, "source", "text")
      .collect().head.getAs[Double]("jsd") == 0.0)
    val disjoint = Seq(("a", "x"), ("b", "y")).toDF("source", "text")
    assert(TextAnalysis.jsdBetweenGroups(disjoint, "source", "text")
      .collect().head.getAs[Double]("jsd") == 0.693147)
  }

  test("PageHinkley: no alarm on constant series, alarm on mean shift") {
    import graft.operators.PageHinkley
    val flat = (0 until 20).map(i => ("s", i.toLong, 1.0))
      .toDF("sensor_id", "timestamp_us", "value")
    val r1 = PageHinkley.detect(flat).collect().head
    assert(r1.getAs[Double]("max_excess") == 0.0)
    assert(!r1.getAs[Boolean]("alarm"))
    val shifted = ((0 until 10).map(i => ("s", i.toLong, 0.0)) ++
      (10 until 20).map(i => ("s", i.toLong, 10.0)))
      .toDF("sensor_id", "timestamp_us", "value")
    val r2 = PageHinkley.detect(shifted).collect().head
    assert(r2.getAs[Boolean]("alarm"))
  }

  test("rmstDays integrates the KM step function exactly") {
    // deaths at dur 0 (S->2/3) and 2 (S->1/3), censored tail to 20:
    // RMST = 0 + (2/3)*2 + (1/3)*18 = 7.333333
    val ev = Seq(
      (1L, 0L), (1L, 0L),
      (2L, 0L), (2L, 2L * day),
      (3L, 0L), (3L, 20L * day))
      .toDF("user_id", "t_us")
    val row = Behavior.rmstDays(ev, "user_id", "t_us").collect().head
    assert(row.getAs[Long]("tau_days") == 20L)
    assert(row.getAs[Long]("n_death_times") == 2L)
    assert(row.getAs[Double]("rmst_days") == 7.333333)
  }

  test("uShapedAttribution splits 40/20/40 with degenerate paths") {
    val touches = Seq(
      (1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "C"), (1L, 3L, "D"),
      (2L, 0L, "A")).toDF("user", "t_us", "channel")
    val conv = Seq((1L, 10L), (2L, 10L)).toDF("user", "conv_t_us")
    val r = Behavior.uShapedAttribution(touches, conv)
      .orderBy("channel").collect()
      .map(x => x.getAs[String]("channel") ->
        x.getAs[Double]("credit")).toMap
    assert(r("A") == 1.4 && r("B") == 0.1 && r("C") == 0.1 &&
      r("D") == 0.4)
  }

  test("Dtw: identical series cost 0; alignment beats Euclidean") {
    import graft.operators.Dtw
    assert(Dtw.dtw(Array(1L, 2L, 3L), Array(1L, 2L, 3L)) == 0L)
    // singleton vs pair: every b must be matched
    assert(Dtw.dtw(Array(5L), Array(1L, 2L)) == 7L)
    // shifted pulse: DTW aligns it to cost 0, Euclidean would pay 4
    assert(Dtw.dtw(Array(0L, 2L, 0L, 0L), Array(0L, 0L, 2L, 0L)) == 0L)
  }

  test("dtwToFleet: single sensor equals the fleet, cost 0") {
    import graft.operators.Dtw
    val rows = (0 until 24).map(h =>
      ("s", h * 3600000000L, h.toDouble))
    val df = rows.toDF("sensor_id", "timestamp_us", "value")
    val r = Dtw.dtwToFleet(df).collect().head
    assert(r.getAs[Long]("n_hours_present") == 24L)
    assert(r.getAs[Long]("dtw_cost") == 0L)
  }

  test("ksBhFdr: identical groups p=1, separated groups exact p") {
    val same = (Seq.tabulate(5)(i => ("a", i.toLong)) ++
      Seq.tabulate(5)(i => ("b", i.toLong))).toDF("g", "vq")
    val r1 = Profiler.ksBhFdr(same, "g", "vq").collect()
    assert(r1.forall(_.getAs[Double]("p_raw") == 1.0))
    assert(r1.forall(_.getAs[Double]("p_adj") == 1.0))
    val sep = (Seq.tabulate(5)(i => ("a", i.toLong)) ++
      Seq.tabulate(5)(i => ("b", i.toLong + 10))).toDF("g", "vq")
    val r2 = Profiler.ksBhFdr(sep, "g", "vq").collect()
    // D=1, lam=sqrt(2.5): p = 2e^-5 - 2e^-20 + 2e^-45 = 0.013476
    assert(r2.forall(_.getAs[Long]("d_num") == 25L))
    assert(r2.forall(_.getAs[Double]("p_raw") == 0.013476))
    // BH adjustment never shrinks below the raw p
    r2.foreach(x => assert(
      x.getAs[Double]("p_adj") >= x.getAs[Double]("p_raw")))
  }

  test("diffInDiff recovers the hand-built 2x2 effect") {
    val df = Seq((1, 1, 4L), (1, 0, 1L), (0, 1, 3L), (0, 0, 2L))
      .toDF("tr", "post", "vq")
    val row = Profiler.diffInDiff(df, "tr", "post", "vq")
      .collect().head
    assert(row.getAs[Double]("did") == 2.0)
    assert(row.getAs[Double]("mean_treat_post") == 4.0)
  }

  test("twoProportionZ matches the hand-computed pooled z") {
    val df = Seq((1, 1), (1, 0), (0, 0), (0, 0)).toDF("grp", "succ")
    val row = Profiler.twoProportionZ(df, "grp", "succ")
      .collect().head
    assert(row.getAs[Double]("p_treat") == 0.5)
    assert(row.getAs[Double]("p_ctrl") == 0.0)
    // z = 0.5 / sqrt(0.25*0.75*1) = 2/sqrt(3)
    assert(row.getAs[Double]("z") == 1.154701)
  }

  test("markovStationary: two-state flip chain stays uniform") {
    val tm = Seq(("A", "B", 10L), ("B", "A", 10L))
      .toDF("from_state", "to_state", "n")
    val r = Behavior.markovStationary(tm).orderBy("state").collect()
    assert(r.map(_.getAs[String]("state")).toSeq == Seq("A", "B"))
    assert(r.forall(_.getAs[Double]("stationary_p") == 0.5))
  }

  test("Sprt crosses the upper barrier at the expected step") {
    import graft.operators.Sprt
    // all successes: +ln(1.4)/step, a=ln(19) -> fires at n=9
    val up = (1 to 12).map(i => ("t", i.toLong, 1))
      .toDF("trial", "seq", "success")
    val r1 = Sprt.test(up).collect().head
    assert(r1.getAs[Int]("decision") == 1)
    assert(r1.getAs[Long]("n_at_decision") == 9L)
    assert(r1.getAs[Long]("n_obs") == 12L)
    // all failures: -ln(0.6)... walks down, fires accept-H0 at n=6
    val down = (1 to 12).map(i => ("t", i.toLong, 0))
      .toDF("trial", "seq", "success")
    val r2 = Sprt.test(down).collect().head
    assert(r2.getAs[Int]("decision") == -1)
    assert(r2.getAs[Long]("n_at_decision") == 6L)
  }

  test("matchedAtt matches nearest control, ties backward, tol drops") {
    val treated = Seq((1L, 10L, 100L), (1L, 1000000L, 999L))
      .toDF("key", "x", "outcome")
    val controls = Seq((1L, 9L, 50L, 2L), (1L, 12L, 70L, 4L))
      .toDF("key", "x", "outcome", "id")
    val row = Behavior.matchedAtt(treated, controls, 100L)
      .collect().head
    assert(row.getAs[Long]("n_treated") == 2L)
    assert(row.getAs[Long]("n_matched") == 1L)
    assert(row.getAs[Double]("att") == 50.0) // 100 - 50 (dist 1 < 2)
    assert(row.getAs[Double]("mean_x_dist") == 1.0)
    // equidistant: backward (lower x) wins
    val tie = Seq((1L, 9L, 40L, 2L), (1L, 11L, 70L, 4L))
      .toDF("key", "x", "outcome", "id")
    val t = Behavior.matchedAtt(
      Seq((1L, 10L, 100L)).toDF("key", "x", "outcome"), tie, 100L)
      .collect().head
    assert(t.getAs[Double]("att") == 60.0)
  }

  test("calibrationBins: dyadic scores give exact bins and Brier") {
    val df = Seq((1L, 0), (7L, 1)).toDF("num", "y")
    val r = Profiler.calibrationBins(df, "num", "y", k = 3, bins = 4)
      .orderBy("bin").collect()
    assert(r.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 3L))
    assert(r(0).getAs[Double]("mean_pred") == 0.125)
    assert(r(0).getAs[Double]("rate") == 0.0)
    assert(r(0).getAs[Double]("brier") == 0.015625)
    assert(r(1).getAs[Double]("mean_pred") == 0.875)
    assert(r(1).getAs[Double]("rate") == 1.0)
    assert(r(1).getAs[Double]("brier") == 0.015625)
  }

  test("Isotonic closed form equals the PAVA fit on a violation") {
    import graft.operators.Isotonic
    // [3,1,2,5] -> pool (3,1) to 2: fit [2,2,2,5]
    val df = Seq(("a", 0L, 3L), ("a", 1L, 1L), ("a", 2L, 2L),
      ("a", 3L, 5L)).toDF("g", "i", "v")
    val r = Isotonic.fit(df).orderBy("i").collect()
    assert(r.map(_.getAs[Double]("iso_fit")).toSeq ==
      Seq(2.0, 2.0, 2.0, 5.0))
    // already monotone input is unchanged
    val mono = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 3L))
      .toDF("g", "i", "v")
    assert(Isotonic.fit(mono).orderBy("i").collect()
      .map(_.getAs[Double]("iso_fit")).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("aucExact: separation 1.0, coin-flip 0.5, hand case 0.25") {
    val perfect = Seq((3L, 1), (4L, 1), (1L, 0), (2L, 0))
      .toDF("score", "y")
    assert(Profiler.aucExact(perfect, "score", "y")
      .collect().head.getAs[Double]("auc") == 1.0)
    val tied = Seq((1L, 1), (1L, 0), (1L, 1), (1L, 0))
      .toDF("score", "y")
    assert(Profiler.aucExact(tied, "score", "y")
      .collect().head.getAs[Double]("auc") == 0.5)
    val mixed = Seq((1L, 1), (3L, 1), (2L, 0), (4L, 0))
      .toDF("score", "y")
    assert(Profiler.aucExact(mixed, "score", "y")
      .collect().head.getAs[Double]("auc") == 0.25)
  }

  test("averagePrecision: hand-computed AP with a miss in between") {
    val df = Seq((1L, 4L, 1), (2L, 3L, 0), (3L, 2L, 1))
      .toDF("id", "score", "y")
    val row = Profiler.averagePrecision(df, "score", "y", "id")
      .collect().head
    assert(row.getAs[Long]("n_pos") == 2L)
    // (1/1 + 2/3)/2 = 0.833333
    assert(row.getAs[Double]("avg_precision") == 0.833333)
  }

  test("log2Histogram buckets by exact bit length, powers of two") {
    val df = Seq(("g", 0L), ("g", 1L), ("g", 2L), ("g", 3L),
      ("g", 4L), ("g", 1024L)).toDF("g", "vq")
    val r = Profiler.log2Histogram(df, "g", "vq")
      .orderBy("bucket").collect()
    // buckets: 0 -> 0; 1 -> 1; 2,3 -> 2; 4 -> 3; 1024 -> 11
    assert(r.map(x => (x.getAs[Int]("bucket"), x.getAs[Long]("cnt")))
      .toSeq == Seq((0, 1L), (1, 1L), (2, 2L), (3, 1L), (11, 1L)))
    val b3 = r.find(_.getAs[Int]("bucket") == 3).get
    assert(b3.getAs[Long]("lo") == 4L && b3.getAs[Long]("hi") == 7L)
  }

  test("negativeSample avoids positives, deterministic, k per user") {
    import graft.pipeline.Sampling
    val pos = Seq((1L, 0L), (1L, 1L), (2L, 2L)).toDF("user", "item")
    val a = Sampling.negativeSample(pos, itemCount = 10, k = 3)
      .orderBy("user", "draw_idx").collect()
    val b = Sampling.negativeSample(pos, itemCount = 10, k = 3)
      .orderBy("user", "draw_idx").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val posSet = Set((1L, 0L), (1L, 1L), (2L, 2L))
    a.foreach { r =>
      val u = r.getAs[Long]("user")
      val it = r.getAs[Long]("item")
      assert(!posSet.contains((u, it)), s"sampled a positive $u $it")
      assert(it >= 0 && it < 10)
    }
    assert(a.count(_.getAs[Long]("user") == 1L) == 3)
    assert(a.count(_.getAs[Long]("user") == 2L) == 3)
  }

  test("negativeSample emits DISTINCT (user, item) negatives under " +
    "heavy residue collision") {
    import graft.pipeline.Sampling
    // item domain of 3 with 12 draws per user forces residue
    // collisions on the same item; the (user,item) min-draw dedup must
    // keep each negative item at most once per user
    val pos = Seq((1L, 0L), (2L, 1L)).toDF("user", "item")
    val r = Sampling.negativeSample(pos, itemCount = 3, k = 3)
      .collect().map(x =>
        (x.getAs[Long]("user"), x.getAs[Long]("item"))).toSeq
    assert(r.distinct == r, s"duplicate negatives: $r")
    // each user has only 2 possible negatives in a 3-item domain
    assert(r.count(_._1 == 1L) <= 2 && r.count(_._1 == 2L) <= 2)
    assert(r.nonEmpty)
  }

  test("importanceWeights: cross-multiplied frequency ratios") {
    // target: bucket 1 x2, bucket 2 x1 ; source: bucket 1 x1, 2 x2
    val df = Seq((1, 1L), (1, 1L), (1, 2L),
      (0, 1L), (0, 2L), (0, 2L)).toDF("is_t", "bk")
    val r = Profiler.importanceWeights(df, "is_t", "bk")
      .orderBy("bucket").collect()
    // w(1) = (2*3)/(1*3) = 2 ; w(2) = (1*3)/(2*3) = 0.5
    assert(r.map(_.getAs[Double]("weight")).toSeq == Seq(2.0, 0.5))
  }

  test("theilIndex: equality gives 0, concentration gives ln(n)") {
    val eq = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 5L))
      .toDF("g", "x")
    assert(Profiler.theilIndex(eq, "g", "x")
      .collect().head.getAs[Double]("theil") == 0.0)
    // all mass on one of n=2 (zero rows excluded -> n=1, T=0);
    // instead: near-total concentration [1, 999]
    val conc = Seq(("g", 1L), ("g", 999L)).toDF("g", "x")
    val t = Profiler.theilIndex(conc, "g", "x")
      .collect().head.getAs[Double]("theil")
    assert(t > 0.6 && t < math.log(2.0) + 1e-9, s"theil=$t")
  }

  test("quantileAlign: median decile maps group onto corpus") {
    // a: 1..4 ; b: 11..14 -> corpus median (decile 5) = 4
    val df = (Seq.tabulate(4)(i => ("a", i + 1L)) ++
      Seq.tabulate(4)(i => ("b", i + 11L))).toDF("g", "v")
    val r = Profiler.quantileAlign(df, "g", "v")
      .filter(col("decile") === 5).orderBy("g").collect()
    assert(r.map(_.getAs[Long]("v_group")).toSeq == Seq(2L, 12L))
    assert(r.forall(_.getAs[Long]("v_corpus") == 4L))
    assert(r.map(_.getAs[Long]("shift")).toSeq == Seq(2L, -8L))
  }

  test("peaks: strict local maxima with drop above higher neighbor") {
    import graft.operators.SensorOps
    // buckets: values 1,5,2,4,4 -> single strict peak at bucket 1
    val rows = Seq(0L -> 1L, 1L -> 5L, 2L -> 2L, 3L -> 4L, 4L -> 4L)
      .map { case (b, v) => ("s", b * 3600000000L, v.toDouble) }
    val df = rows.toDF("sensor_id", "timestamp_us", "value")
    val r = SensorOps.peaks(df, unitsPerValue = 1.0).collect().head
    assert(r.getAs[Long]("n_buckets") == 5L)
    assert(r.getAs[Long]("n_peaks") == 1L)
    assert(r.getAs[Long]("max_drop") == 3L) // 5 - max(1,2)
    assert(r.getAs[Long]("peak_bucket") == 1L)
  }

  test("rakeKeyphrases: degree/frequency scoring on a known corpus") {
    import graft.pipeline.TextAnalysis
    val docs = Seq((1L, "deep learning of deep networks"))
      .toDF("doc_id", "text")
    // phrases: "deep learning" (len 2), "deep networks" (len 2)
    // deg(deep)=4 freq=2 -> 2 ; learning 2/1 -> 2 ; networks 2/1 -> 2
    val r = TextAnalysis.rakeKeyphrases(docs, "doc_id", "text")
      .orderBy("phrase").collect()
    assert(r.map(_.getAs[String]("phrase")).toSeq ==
      Seq("deep learning", "deep networks"))
    assert(r.forall(_.getAs[Double]("score") == 4.0))
  }

  test("jlDistortion: near-1 distortion on random unit-ish vectors") {
    import graft.pipeline.Similarity
    val rnd = new scala.util.Random(3)
    val rows = (0L until 12L).map(i =>
      (i, Array.fill(64)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("vec_id", "vec")
    val r = Similarity.jlDistortion(df, maxId = 12L).collect().head
    assert(r.getAs[Long]("n_pairs") == 66L)
    val mean = r.getAs[Double]("mean_distortion")
    assert(mean > 0.3 && mean < 3.0, s"mean=$mean")
    assert(r.getAs[Double]("min_distortion") <= mean &&
      mean <= r.getAs[Double]("max_distortion"))
  }

  test("classTfIdf surfaces class-characteristic tokens first") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(("A", "alpha alpha beta"), ("B", "beta gamma"))
      .toDF("source", "text")
    val r = TextAnalysis.classTfIdf(docs, "source", "text", topK = 2)
      .collect()
    val top = r.filter(_.getAs[Int]("rank") == 1)
      .map(x => x.getAs[String]("source") -> x.getAs[String]("token"))
      .toMap
    assert(top("A") == "alpha" && top("B") == "gamma")
  }

  test("burrowsDelta: identical classes collapse to zero variance") {
    import graft.pipeline.TextAnalysis
    val same = Seq(("A", "x y z"), ("B", "x y z"))
      .toDF("source", "text")
    // identical profiles: any surviving tokens (quantization leaves
    // ~1e-13 variance) still give z_a = z_b, so delta is exactly 0
    assert(TextAnalysis.burrowsDelta(same, "source", "text")
      .collect().forall(_.getAs[Double]("delta") == 0.0))
    val diff = Seq(("A", "x x x y"), ("B", "y y y x"))
      .toDF("source", "text")
    val row = TextAnalysis.burrowsDelta(diff, "source", "text")
      .collect().head
    assert(row.getAs[Double]("delta") > 0.0)
  }

  test("lincolnPetersen: Chapman estimate on a known overlap") {
    import graft.pipeline.Dedup
    val a = Seq("t1", "t2").toDF("text")
    val b = Seq("t2", "t3").toDF("text")
    val row = Dedup.lincolnPetersen(a, b, "text").collect().head
    assert(row.getAs[Long]("n_a") == 2 && row.getAs[Long]("m") == 1)
    // (3*3)/2 - 1 = 3.5
    assert(row.getAs[Double]("n_estimate") == 3.5)
  }

  test("looAblation: removing a source shifts the corpus mean") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    val r = Profiler.looAblation(df, "g", "v").orderBy("g").collect()
    assert(r(0).getAs[Double]("loo_mean") == 3.0) // without a
    assert(r(0).getAs[Double]("loo_delta") == 1.0)
    assert(r(1).getAs[Double]("loo_mean") == 1.5) // without b
    assert(r(1).getAs[Double]("loo_delta") == -0.5)
  }

  test("rollingZAnomalies flags a spike against its trailing window") {
    import graft.operators.SensorOps
    // 30 flat samples then a spike: the spike's trailing 24 window
    // has tiny variance -> |z| explodes; the flats never flag. Values
    // 0/1 alternate to keep variance nonzero.
    val rows = (0 until 30).map(i =>
      ("s", i.toLong, if (i % 2 == 0) 10.0 else 11.0)) :+
      ("s", 30L, 1000.0)
    val df = rows.toDF("sensor_id", "timestamp_us", "value")
    val r = SensorOps.rollingZAnomalies(df, unitsPerValue = 1.0)
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("timestamp_us") == 30L)
    assert(r.head.getAs[Double]("z") > 100.0)
  }

  test("topNOtherRollup keeps winners and folds the tail") {
    val df = Seq(("a", 10L), ("b", 5L), ("c", 1L), ("d", 1L))
      .toDF("k", "v")
    val r = Profiler.topNOtherRollup(df, "k", "v", topN = 2)
      .orderBy("k").collect()
    val m = r.map(x => x.getAs[String]("k") ->
      (x.getAs[Long]("total"), x.getAs[Long]("n_keys"))).toMap
    assert(m("a") == (10L, 1L) && m("b") == (5L, 1L))
    assert(m("OTHER") == (2L, 2L))
  }

  test("mixRateDecomposition: mix + rate equals delta exactly") {
    // cohort 1: seg X mean 10 (2 rows), seg Y mean 20 (2 rows)
    // cohort 0: seg X mean 10 (3 rows), seg Y mean 10 (1 row)
    val df = Seq((1, "X", 10L), (1, "X", 10L), (1, "Y", 20L),
      (1, "Y", 20L), (0, "X", 10L), (0, "X", 10L), (0, "X", 10L),
      (0, "Y", 10L)).toDF("coh", "seg", "v")
    val row = Profiler.mixRateDecomposition(df, "coh", "seg", "v")
      .collect().head
    val d = row.getAs[Double]("delta_total")
    assert(d == row.getAs[Double]("mix_effect") +
      row.getAs[Double]("rate_effect"))
    // m_A = 15, m_B = 10
    assert(d == 5.0)
  }

  test("contractAudit: violations counted per rule, NULL = violation") {
    import graft.pipeline.Governance
    val df = Seq(("ok", 5L), (null, 3L), ("ok", -1L))
      .toDF("t", "n")
    val r = Governance.contractAudit(df, Seq(
        "t_not_null" -> col("t").isNotNull,
        "n_nonneg" -> (col("n") >= 0)))
      .orderBy("rule").collect()
    val m = r.map(x => x.getAs[String]("rule") ->
      x.getAs[Long]("n_violations")).toMap
    assert(m("t_not_null") == 1L && m("n_nonneg") == 1L)
    assert(r.forall(_.getAs[Long]("n_checked") == 3L))
  }

  test("anonymityLadder: coarser bands raise min_k") {
    import graft.pipeline.Governance
    val df = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 900L, "A"),
      (1L, 901L, "B")).toDF("nation", "v", "seg")
    val r = Governance.anonymityLadder(df, "nation", "v", "seg",
      Seq(1L, 1000L)).orderBy("band").collect()
    assert(r(0).getAs[Long]("band") == 1L &&
      r(0).getAs[Long]("n_classes") == 4L &&
      r(0).getAs[Long]("min_k") == 1L)
    assert(r(1).getAs[Long]("band") == 1000L &&
      r(1).getAs[Long]("n_classes") == 1L &&
      r(1).getAs[Long]("min_k") == 4L)
  }

  test("linearCka: identical paired snapshots score 1.0") {
    import graft.pipeline.Similarity
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 8L by 2L).flatMap { i =>
      val v = Array.fill(64)(rnd.nextDouble() - 0.5)
      Seq((i, v), (i + 1L, v)) // odd twin = even vector
    }
    val df = vecs.toDF("vec_id", "vec")
    val row = Similarity.linearCka(df).collect().head
    assert(row.getAs[Long]("n_pairs") == 4L)
    assert(row.getAs[Double]("cka") == 1.0)
  }

  test("charEntropy: degenerate, binary, and 2-bit alphabets") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(("z", "aaaa"), ("b", "abab"), ("q", "abcd"))
      .toDF("source", "text")
    val r = TextAnalysis.charEntropy(docs, "source", "text")
      .collect()
      .map(x => x.getAs[String]("source") ->
        x.getAs[Double]("entropy_bits")).toMap
    assert(r("z") == 0.0 && r("b") == 1.0 && r("q") == 2.0)
  }

  test("entryExitPages: sessions split on the gap, bounces counted") {
    // user 1: A->B (one session), then C alone after a 1h gap
    val hour = 3600000000L
    val ev = Seq(
      (1L, 0L, 1L, "A"), (1L, 60000000L, 2L, "B"),
      (1L, 2L * hour, 3L, "C")).toDF("u", "t", "id", "p")
    val r = Behavior.entryExitPages(ev, "u", "t", "id", "p")
      .orderBy("page").collect()
    val m = r.map(x => x.getAs[String]("page") ->
      (x.getAs[Long]("entries"), x.getAs[Long]("exits"),
        x.getAs[Long]("bounces"))).toMap
    assert(m("A") == (1L, 0L, 0L)) // entry of session 1
    assert(m("B") == (0L, 1L, 0L)) // exit of session 1
    assert(m("C") == (1L, 1L, 1L)) // bounce session
    val c = r.find(_.getAs[String]("page") == "C").get
    assert(c.getAs[Double]("bounce_rate") == 1.0)
  }

  test("mannKendall: strictly increasing buckets give S = n(n-1)/2") {
    val df = (1 to 10).map(i => ("s", i.toLong, i.toLong))
      .toDF("sid", "bk", "vq")
    val row = Profiler.mannKendall(df, "sid", "bk", "vq")
      .collect().head
    assert(row.getAs[Long]("s_stat") == 45L)
    // z = 44/sqrt(10*9*25/18) = 44/sqrt(125)
    assert(row.getAs[Double]("z") == 3.93548)
    // a flat series has S = 0 but all-tied variance 0 -> dropped
    val flat = (1 to 10).map(i => ("s", i.toLong, 7L))
      .toDF("sid", "bk", "vq")
    assert(Profiler.mannKendall(flat, "sid", "bk", "vq").count() == 0)
  }

  test("effectiveSampleSize: near-iid noise keeps ESS near n") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map(i =>
      ("s", i.toLong, rnd.nextDouble()))
    val df = rows.toDF("sensor_id", "timestamp_us", "value")
    val row = Profiler.effectiveSampleSize(
      df, "sensor_id", "timestamp_us", "value").collect().head
    val n = row.getAs[Long]("n")
    val ess = row.getAs[Double]("ess")
    assert(n == 300L)
    assert(ess > 0.5 * n && ess < 2.0 * n, s"ess=$ess")
  }

  test("laplaceNoisyCounts is deterministic and salt-sensitive") {
    val df = Seq.tabulate(50)(i => (s"g${i % 3}", i)).toDF("g", "x")
    val a = Governance.laplaceNoisyCounts(df, "g", "s1:")
      .orderBy("g").collect()
    val b = Governance.laplaceNoisyCounts(df, "g", "s1:")
      .orderBy("g").collect()
    assert(a.map(_.getAs[Double]("n_noisy")).toSeq ==
      b.map(_.getAs[Double]("n_noisy")).toSeq)
    assert(a.forall(_.getAs[Double]("epsilon") == 1.0))
    val c = Governance.laplaceNoisyCounts(df, "g", "s2:")
      .orderBy("g").collect()
    assert(a.map(_.getAs[Double]("n_noisy")).toSeq !=
      c.map(_.getAs[Double]("n_noisy")).toSeq)
  }
}
