package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanized overflow lint (round-10 verdict item #6): the recurring
  * defect class is a LONG×LONG product whose overflow happens BEFORE a
  * following `.cast("decimal…")` can widen it — four such sites were
  * found by review in r9 and nine fixed; this spec keeps the class from
  * regrowing by failing the build on the textual shape
  *
  *   (col(A) * col(B)).cast("decimal…")      and
  *   sum(col(A) * col(B)).cast("decimal…")
  *
  * anywhere in src/main. The correct shape is cast-FIRST:
  * `col(A).cast("decimal…") * col(B)`. Sites whose operands are
  * bounded by a documented contract (so the long product cannot
  * overflow) are exonerated in the explicit allowlist below — adding
  * to it requires writing down the bound, which is the point.
  */
class OverflowLintSpec extends AnyFunSuite {

  /** (file-basename, lhs-col, rhs-col) triples whose long product is
    * bounded by contract — each with the bound that makes it safe. */
  private val allow: Set[(String, String, String)] = Set(
    // embedding micro-quant: |__q| <= ~1e6 (unit-norm-ish embedding x
    // 1e6), so per-row q*q <= ~1e12 and the decimal cast is per-row
    ("Similarity.scala", "__q", "__q"),
    // int-pair element products summed in LONG before one decimal
    // cast: |element| <= 1e6 micro-quant, pairs per (i,j) group are the
    // vector count (<= ~1e6 by the kernel's census guard), so the long
    // sum stays <= ~1e12 * 1e6 / ... < 2^63 by the documented contract
    ("Similarity.scala", "__ai", "__bj"),
    ("Similarity.scala", "__xi", "__xj"),
    // per-bucket event count: c <= rows-per-(series,hour-bucket);
    // c*c < 2^63 up to c ~ 3e9 rows per bucket (documented burstiness
    // contract in burstiness() scaladoc)
    ("Profiler.scala", "__c", "__c"),
    // microUnits quantization carries its own |v| magnitude contract
    // (microUnits scaladoc); vq*vq < 2^63 within it
    ("Profiler.scala", "__vq", "__vq"),
    // pi and h_state are DOUBLES (pi in [0,1], h_state in [0, ln k]);
    // the decimal cast QUANTIZES the product for an order-free sum —
    // there is no long arithmetic here at all
    ("Behavior.scala", "pi", "h_state"))

  private val pat =
    ("""(sum\(\s*)?\(?\s*col\("([^"]+)"\)\s*\*\s*col\("([^"]+)"\)\s*""" +
      """\)\s*\)?\s*\.cast\(\s*"decimal""").r

  private def violations(fileName: String, text: String): Seq[String] =
    pat.findAllMatchIn(text).flatMap { m =>
      val (a, b) = (m.group(2), m.group(3))
      if (allow.contains((fileName, a, b))) None
      else {
        val line = text.substring(0, m.start).count(_ == '\n') + 1
        Some(s"$fileName:$line ($a * $b).cast(decimal) — long product " +
          "overflows before the cast; cast an operand first or add a " +
          "documented bound to the allowlist")
      }
    }.toSeq

  test("self-test: the lint catches a deliberately broken fixture") {
    val bad =
      """df.agg(sum((col("x") * col("y")).cast("decimal(38,0)")))"""
    assert(violations("Fixture.scala", bad).nonEmpty)
    val bad2 =
      """df.agg(sum(col("x") * col("y")).cast("decimal(38,0)"))"""
    assert(violations("Fixture.scala", bad2).nonEmpty)
    // multi-line form is caught too
    val bad3 =
      "df.agg(sum((col(\"x\") *\n    col(\"y\"))\n  .cast(\"decimal(38,0)\")))"
    assert(violations("Fixture.scala", bad3).nonEmpty)
    // the cast-first shape passes
    val good =
      """df.agg(sum(col("x").cast("decimal(19,0)") * col("y")))"""
    assert(violations("Fixture.scala", good).isEmpty)
    // allowlisted pair passes only in its named file
    val allowed =
      """sum((col("__q") * col("__q")).cast("decimal(38,0)"))"""
    assert(violations("Similarity.scala", allowed).isEmpty)
    assert(violations("Other.scala", allowed).nonEmpty)
  }

  test("src/main is free of un-exonerated long-product-then-decimal casts") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root), s"missing $root")
    val found = scala.collection.mutable.ArrayBuffer[String]()
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        found ++= violations(p.getFileName.toString, text)
      }
    }
    assert(found.isEmpty, found.mkString("\n"))
  }
}
