package graft

import graft.pipeline.Profiler
import org.apache.spark.sql.{DataFrame, Row}

/** Property-law pins for the inference-statistics family's rank and
  * sum-of-squares machinery — the invariances a correct implementation
  * must satisfy EXACTLY (integer rank tables, order-free decimal sums),
  * checked over seeded random draws that mix heavy ties and tie-free
  * data. These complement Round12Spec's hand-built degenerate fixtures:
  * a law holds for every draw or the machinery is wrong, independent of
  * any oracle.
  */
class StatLawsSpec extends SparkSpec {
  import spark.implicits._

  private val seeds = Seq(1L, 7L, 42L, 1234L, 99991L)

  /** Random (group, value) draw: `groups` labels, values in [0, span)
    * — small spans force tie blocks, wide spans are tie-free.
    */
  private def draw(seed: Long, n: Int, groups: Int, span: Long)
      : Seq[(Int, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)((r.nextInt(groups), math.floorMod(r.nextLong(), span)))
  }

  private def mw(rows: Seq[(Int, Long)]): Row =
    Profiler.mannWhitneyU(
      rows.toDF("cohort", "v"), "cohort", "v").collect().head

  private def kw(rows: Seq[(Int, Long)]): Row =
    Profiler.kruskalWallis(
      rows.toDF("g", "v"), "g", "v").collect().head

  private def anova(rows: Seq[(Int, Long)]): Row =
    Profiler.anovaF(rows.toDF("g", "v"), "g", "v").collect().head

  test("mannWhitneyU law: swapping the cohorts negates z and " +
    "complements U — exactly, ties or not") {
    for (seed <- seeds; span <- Seq(6L, 1000000L)) {
      val rows = draw(seed, 80, 2, span)
      val a = mw(rows)
      val b = mw(rows.map { case (c, v) => (1 - c, v) })
      // cohort sizes swap
      assert(a.getLong(0) == b.getLong(1) && a.getLong(1) == b.getLong(0))
      // U_A' = n_a·n_b − U_A (doubles exact: U is a half-integer)
      assert(b.getDouble(2) ==
        a.getLong(0).toDouble * a.getLong(1).toDouble - a.getDouble(2))
      // z' = −z bit-exactly: the variance chain is symmetric in the
      // cohorts (IEEE multiply commutes) and the numerator negates
      assert(a.getDouble(3) == -b.getDouble(3),
        s"seed=$seed span=$span: z=${a.getDouble(3)} z'=${b.getDouble(3)}")
    }
  }

  test("mannWhitneyU law: strictly increasing affine value transforms " +
    "leave the whole rank surface bit-identical") {
    for (seed <- seeds) {
      val rows = draw(seed, 80, 2, 8L)
      val a = mw(rows)
      val b = mw(rows.map { case (c, v) => (c, 3L * v + 7L) })
      assert(a == b, s"seed=$seed: $a != $b")
    }
  }

  test("kruskalWallis laws: group relabeling and monotone value " +
    "transforms leave (k, n, H) bit-identical; two groups give k=2") {
    for (seed <- seeds) {
      val rows = draw(seed, 90, 3, 7L)
      val a = kw(rows)
      // relabel groups by a fixed permutation (0→2, 1→0, 2→1)
      val b = kw(rows.map { case (g, v) => ((g + 2) % 3, v) })
      // monotone transform: ranks unchanged
      val c = kw(rows.map { case (g, v) => (g, 5L * v + 11L) })
      assert(a == b, s"seed=$seed relabel: $a != $b")
      assert(a == c, s"seed=$seed monotone: $a != $c")
      assert(a.getLong(0) == 3 && a.getLong(1) == 90)
    }
  }

  test("anovaF laws: group relabeling is bit-exact (order-free decimal " +
    "sums); F is non-negative and translation-invariant to 1e-6") {
    for (seed <- seeds) {
      val rows = draw(seed, 90, 3, 1000L)
      val a = anova(rows)
      val b = anova(rows.map { case (g, v) => ((g + 1) % 3, v) })
      assert(a == b, s"seed=$seed relabel: $a != $b")
      val f = a.getDouble(4)
      assert(!f.isNaN && f >= 0.0, s"seed=$seed: F=$f")
      // translation: SS terms are algebraically shift-invariant; the
      // double intermediates may move a final ulp, absorbed by ROUND(6)
      // up to one quantum
      val t = anova(rows.map { case (g, v) => (g, v + 5000L) })
      assert(math.abs(t.getDouble(4) - f) <= 1e-6 + 1e-9 * math.abs(f),
        s"seed=$seed shift: F=$f F'=${t.getDouble(4)}")
    }
  }

  test("mannWhitneyU ↔ kruskalWallis bridge holds on random draws: " +
    "two-group H equals z² under shared tie machinery") {
    for (seed <- seeds) {
      val rows = draw(seed, 60, 2, 5L)
      val z = mw(rows).getDouble(3)
      val h = kw(rows).getDouble(3)
      // both ROUND(6) surfaces; compare at the rounding quantum scaled
      // by the magnitude of z (h = z² amplifies the z rounding by 2|z|)
      assert(math.abs(h - z * z) <= 1e-5 * (1.0 + 2.0 * math.abs(z)),
        s"seed=$seed: h=$h z²=${z * z}")
    }
  }
}
