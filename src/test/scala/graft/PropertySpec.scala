package graft

import graft.infer.TypeInference
import graft.infer.TypeInference.ColumnType._
import graft.operators.{LabelMatcher, Matchers}
import graft.prometheus.{PrometheusRemote, XorChunk}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests the reference lacks (SURVEY §5): inference-lattice
  * invariants, the matcher truth table against its Column compilation,
  * and codec roundtrips under random inputs.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property and fail the suite on falsification
    * (scalatest-plus bridge is not resolvable offline).
    */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(g) { a => f(a); true })

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    check(Prop.forAll(g1, g2) { (a, b) => f(a, b); true })

  test("inference: any Long string infers Integer; any finite Double parses") {
    forAll(Gen.long) { n =>
      assert(TypeInference.inferType(n.toString) == TypeInference.IntegerV(n))
    }
    forAll(Gen.choose(-1e300, 1e300)) { d =>
      {
        val s = d.toString
        // scala Double.toString may use exponent notation the float
        // grammar accepts; parsing must recover the same value
        TypeInference.inferType(s) match {
          case TypeInference.FloatV(x) => assert(x == d)
          case TypeInference.IntegerV(x) => assert(x.toDouble == d)
          case other => fail(s"$s inferred $other")
        }
      }
    }
  }

  test("column lattice: adding a string forces StringC; order-insensitive") {
    val cellGen = Gen.oneOf("1", "2.5", "true", "x", "{\"a\":1}")
    forAll(Gen.listOf(cellGen)) { cells =>
      val t = TypeInference.inferColumnType(cells)
      assert(TypeInference.inferColumnType(cells.reverse) == t)
      if (cells.nonEmpty)
        assert(TypeInference.inferColumnType(cells :+ "not a number!") == StringC)
    }
  }

  test("lattice: float absorbs integer, bool+number degrades to string") {
    forAll(Gen.nonEmptyListOf(Gen.oneOf("1", "2.5"))) { cells =>
      val t = TypeInference.inferColumnType(cells)
      assert(t == IntegerC || t == FloatC)
      if (cells.exists(_.contains('.'))) assert(t == FloatC)
      assert(TypeInference.inferColumnType(cells :+ "true") == StringC)
    }
  }

  test("matcher truth table: in-process evaluator is total and consistent") {
    val keyGen = Gen.oneOf("env", "site", "missing", "__name__")
    val valGen = Gen.oneOf("a", "b", "prod", "")
    val mGen: Gen[LabelMatcher] = for {
      k <- keyGen; v <- valGen
      m <- Gen.oneOf[(String, String) => LabelMatcher](
        (a: String, b: String) => LabelMatcher.Eq(a, b),
        (a: String, b: String) => LabelMatcher.NotEq(a, b),
        (a: String, b: String) =>
          LabelMatcher.Re(a, java.util.regex.Pattern.quote(b)),
        (a: String, b: String) =>
          LabelMatcher.NotRe(a, java.util.regex.Pattern.quote(b)))
    } yield m(k, v)
    val labels = Map("env" -> "prod", "site" -> "a")
    forAll(Gen.nonEmptyListOf(mGen)) { ms =>
      val r = Matchers.matches("metric", labels, ms)
      // AND semantics: any single failing matcher fails the set
      assert(r == ms.forall(m => Matchers.matches("metric", labels, Seq(m))))
      // negation duality on label keys (name key always present)
      ms.foreach {
        case LabelMatcher.Eq(k, v) =>
          assert(Matchers.matches("metric", labels, Seq(LabelMatcher.Eq(k, v))) !=
            Matchers.matches("metric", labels, Seq(LabelMatcher.NotEq(k, v))))
        case _ => ()
      }
    }
  }

  test("XOR chunk roundtrip holds for arbitrary sorted series") {
    val sampleGen = for {
      n <- Gen.choose(0, 200)
      deltas <- Gen.listOfN(n, Gen.choose(0L, 10000000L))
      values <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-1e9, 1e9), Gen.oneOf(0.0, -0.0, 1.5, Double.MaxValue)))
    } yield {
      var t = 1700000000000L
      deltas.zip(values).map { case (d, v) => t += d; XorChunk.Sample(t, v) }
    }
    forAll(sampleGen) { samples =>
      assert(XorChunk.decode(XorChunk.encode(samples)) == samples)
    }
  }

  test("snappy literal-compress roundtrip for arbitrary bytes") {
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      assert(PrometheusRemote.snappyDecompress(
        PrometheusRemote.snappyCompressLiteral(arr)).toSeq == arr.toSeq)
    }
  }

  test("probeMasks: exact binomial count, bit bound, uniqueness") {
    def binom(n: Int, k: Int): Long =
      (0 until k).foldLeft(1L)((acc, i) => acc * (n - i) / (i + 1))
    forAll(Gen.choose(1, 24), Gen.choose(0, 3)) { (bits, h) =>
      val masks = graft.pipeline.Similarity.probeMasks(bits, h)
      val hh = math.min(h, bits)
      assert(masks.length == (0 to hh).map(binom(bits, _)).sum)
      assert(masks.distinct.length == masks.length)
      assert(masks.forall(m => java.lang.Long.bitCount(m) <= h))
      assert(masks.forall(m => m >>> bits == 0L)) // inside the bit space
    }
  }

  test("greedy packing: budget bound, id order inside shards, totals") {
    val gen = for {
      n <- Gen.choose(0, 60)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 40L))
      budget <- Gen.choose(10L, 80L)
    } yield (sizes, budget)
    forAll(gen) { case (sizes, budget) =>
      // reference single-stream fold (shards = 1 in the distributed op)
      var used = 0L; var seq = 0L
      val packs = sizes.map { s =>
        if (used > 0 && used + s > budget) { seq += 1; used = 0 }
        used += s
        seq
      }
      // every pack fits unless it holds a single oversized doc
      val byPack = sizes.zip(packs).groupBy(_._2).values
      assert(byPack.forall(p =>
        p.map(_._1).sum <= budget || p.length == 1))
      // pack ids are non-decreasing and dense
      assert(packs.zip(packs.drop(1)).forall { case (a, b) =>
        b == a || b == a + 1
      })
    }
  }

  test("splitAssign thresholds: disjoint, exhaustive, monotone") {
    // the pure threshold math behind the Column CASE: any 60-bit draw
    // lands in exactly one bucket, and buckets are contiguous
    val gen = for {
      k <- Gen.choose(1, 5)
      ws <- Gen.listOfN(k, Gen.choose(0.05, 1.0))
    } yield ws.map(_ / ws.sum)
    forAll(gen, Gen.choose(0L, (1L << 60) - 1)) { (ws, draw) =>
      val thresholds = ws.scanLeft(0.0)(_ + _).tail
        .map(c => (c * (1L << 60).toDouble).toLong)
      val bucket = thresholds.indexWhere(draw < _) match {
        case -1 => ws.length - 1 // residual absorbs rounding
        case i => i
      }
      assert(bucket >= 0 && bucket < ws.length)
      // monotone: a larger draw never lands in an earlier bucket
      val bucket2 = thresholds.indexWhere(math.min(draw + 1, (1L << 60) - 1) < _) match {
        case -1 => ws.length - 1
        case i => i
      }
      assert(bucket2 >= bucket)
    }
  }

  test("sensor UUID is deterministic and label-order invariant") {
    val labelGen = Gen.listOf(Gen.zip(
      Gen.alphaStr.suchThat(_.nonEmpty), Gen.alphaStr))
    forAll(Gen.alphaStr.suchThat(_.nonEmpty), labelGen) { (name, labels) =>
      val a = graft.model.Sensor.deriveUuid(
        name, graft.model.SensorType.Float, None, labels)
      val b = graft.model.Sensor.deriveUuid(
        name, graft.model.SensorType.Float, None, scala.util.Random.shuffle(labels))
      assert(a == b)
      // version/variant bits
      assert(a.charAt(14) == '8')
      assert("89ab".contains(a.charAt(19)))
    }
  }
}
