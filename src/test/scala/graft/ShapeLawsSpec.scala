package graft

import graft.operators.Dtw
import graft.pipeline.{Behavior, Profiler}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-law pins for the shape/survival/inequality families —
  * metric axioms and estimator monotonicities that must hold on EVERY
  * input, independent of any oracle. The DTW kernel gets the full
  * ScalaCheck treatment (pure driver code); the Spark-side laws run
  * over seeded random draws and the sf0.001 events table.
  */
class ShapeLawsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("dtw kernel laws: identity 0, symmetry, non-negativity, " +
    "translation invariance") {
    val series = Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))
      .map(_.toArray)
    check(Prop.forAll(series, series, Gen.chooseNum(-500L, 500L)) {
      (a, b, c) =>
        Dtw.dtw(a, a) == 0L &&
        Dtw.dtw(a, b) == Dtw.dtw(b, a) &&
        Dtw.dtw(a, b) >= 0L &&
        Dtw.dtw(a.map(_ + c), b.map(_ + c)) == Dtw.dtw(a, b)
    })
  }

  test("gini laws: exactly 0 on constant values; in [0, 1) and " +
    "scale-invariant on random positive draws") {
    val const = Profiler.gini(
      Seq.fill(50)(7L).toDF("v"), "v").collect().head
    assert(const.getDouble(2) == 0.0)
    for (seed <- Seq(3L, 17L, 2024L)) {
      val r = new scala.util.Random(seed)
      val xs = Seq.fill(200)(1L + r.nextInt(10000).toLong)
      val g = Profiler.gini(xs.toDF("v"), "v").collect().head.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"seed=$seed: gini=$g")
      // ×3: ranks unchanged, every product scales exactly (< 2⁵³), the
      // quotient is the correctly-rounded value of the SAME real number
      val g3 = Profiler.gini(xs.map(_ * 3L).toDF("v"), "v")
        .collect().head.getDouble(2)
      assert(g3 == g, s"seed=$seed: $g3 != $g")
    }
  }

  test("theilIndex laws: exactly 0 within constant groups; " +
    "non-negative and scale-invariant bit-exactly") {
    val constant = (1 to 40).map(i => (i % 2, 5L)) // two constant groups
    val t0 = Profiler.theilIndex(
      constant.toDF("g", "x"), "g", "x").collect()
    assert(t0.forall(_.getDouble(3) == 0.0))
    for (seed <- Seq(5L, 23L, 4096L)) {
      val r = new scala.util.Random(seed)
      val rows = Seq.fill(150)((r.nextInt(3), 1L + r.nextInt(1000).toLong))
      val a = Profiler.theilIndex(rows.toDF("g", "x"), "g", "x")
        .collect().map(x => (x.getInt(0), x.getDouble(3))).toMap
      assert(a.values.forall(_ >= -1e-6), s"seed=$seed: $a")
      // x → 7x: r = xn/s has both operands scaled exactly, so every
      // per-row term — and the quantized sum — is bit-identical
      val b = Profiler.theilIndex(
          rows.map { case (g, x) => (g, 7L * x) }.toDF("g", "x"),
          "g", "x")
        .collect().map(x => (x.getInt(0), x.getDouble(3))).toMap
      assert(a == b, s"seed=$seed: $a != $b")
    }
  }

  test("isotonic fit laws: output monotone per group; already-monotone " +
    "input is a fixed point; block means preserve the total") {
    for (seed <- Seq(11L, 77L, 3001L)) {
      val r = new scala.util.Random(seed)
      val rows = for (g <- 0 to 1; i <- 0 until 20)
        yield (g, i, r.nextInt(1000).toLong)
      val fit = graft.operators.Isotonic.fit(rows.toDF("g", "i", "v"))
        .orderBy("g", "i").collect()
      fit.groupBy(_.getInt(0)).foreach { case (_, rs) =>
        val ys = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
        assert(ys.zip(ys.tail).forall { case (a, b) => b >= a - 1e-9 },
          s"seed=$seed: not monotone ${ys.mkString(",")}")
        // PAVA pools preserve each block's sum, so the totals match
        // up to B ROUND(6) quanta
        val vs = rs.sortBy(_.getInt(1)).map(_.getLong(2).toDouble)
        assert(math.abs(ys.sum - vs.sum) <= 20 * 5e-7 + 1e-6,
          s"seed=$seed: sum ${ys.sum} != ${vs.sum}")
      }
      // already-monotone input: the fit IS the input (interval means
      // of integers hit the diagonal exactly; ROUND(6) is exact there)
      val mono = (0 until 20).map(i => (0, i, (i * 7 + 3).toLong))
      val mfit = graft.operators.Isotonic.fit(mono.toDF("g", "i", "v"))
        .orderBy("i").collect()
      assert(mfit.forall(r2 => r2.getDouble(3) == r2.getLong(2).toDouble))
    }
  }

  test("wassersteinToCorpus laws: a lone group has W1 = 0 exactly; " +
    "translation leaves the whole surface bit-identical") {
    val lone = Seq.tabulate(60)(i => ("a", (i % 13).toLong))
    val w0 = Profiler.wassersteinToCorpus(
      lone.toDF("g", "v"), "g", "v").collect().head
    assert(w0.getDouble(3) == 0.0)
    for (seed <- Seq(19L, 404L)) {
      val r = new scala.util.Random(seed)
      val rows = Seq.fill(120)(
        (s"s${r.nextInt(3)}", r.nextInt(500).toLong))
      def run(xs: Seq[(String, Long)]) =
        Profiler.wassersteinToCorpus(xs.toDF("g", "v"), "g", "v")
          .collect().map(x =>
            (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
          .toSeq
      val a = run(rows)
      assert(a.forall(_._4 >= 0.0))
      // v → v + 1000: gaps and cumulative counts are unchanged, so
      // w1_num (integer) and w1 are bit-identical
      val b = run(rows.map { case (g, v) => (g, v + 1000L) })
      assert(a == b, s"seed=$seed: $a != $b")
    }
  }

  test("survival estimator laws on the events table: KM survival is " +
    "non-increasing in [0,1]; Nelson-Aalen cumulative hazard and " +
    "variance are non-decreasing; S_KM <= exp(-H) pointwise") {
    // sf0.01: the 0.001 draw censors every user (no deaths → empty KM)
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("t_us"))
    // 12 h horizon (the q206 family's): the 7-day default censors
    // every user in these draws — no deaths, empty curves
    val h = 43200000000L
    val km = Behavior.kaplanMeier(ev, "user_id", "t_us",
        censorHorizonUs = h)
      .orderBy("duration_days").collect()
    assert(km.nonEmpty)
    val surv = km.map(_.getDouble(3))
    assert(surv.forall(s => s >= 0.0 && s <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 })
    val na = Behavior.nelsonAalen(ev, "user_id", "t_us",
        censorHorizonUs = h)
      .orderBy("duration_days").collect()
    val haz = na.map(_.getDouble(3))
    val hv = na.map(_.getDouble(4))
    assert(haz.zip(haz.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(hv.zip(hv.tail).forall { case (a, b) => b >= a - 1e-9 })
    // same duration grid by construction; ln(1−x) ≤ −x gives the
    // classic KM ≤ exp(−H_NA) dominance (2e-6 for the ROUND(6) pair)
    assert(km.length == na.length)
    km.zip(na).foreach { case (k, n) =>
      assert(k.getLong(0) == n.getLong(0))
      assert(k.getDouble(3) <= math.exp(-n.getDouble(3)) + 2e-6,
        s"dur=${k.getLong(0)}: S=${k.getDouble(3)} " +
          s"exp(-H)=${math.exp(-n.getDouble(3))}")
    }
  }
}
