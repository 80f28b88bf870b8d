package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Companion spec for tools/check.py's surface-type lint (round-11
  * verdict item #2): the driver's hash has now rejected BOTH raw
  * doubles (q180 r9/r10) and DECIMAL columns (q180 r11 — parquet
  * decimal128 vs DuckDB DECIMAL canonicalize value-equal cells
  * differently) on otherwise cell-identical compare surfaces. check.py
  * WARNs on both classes; this spec seeds a decimal-surface fixture and
  * asserts the lint fires on it (and stays silent on a BIGINT control),
  * so the lint itself can't silently rot.
  *
  * Requires the driver-side python toolchain (python3 + duckdb +
  * pyarrow — present in the build container); cancels, not fails, if
  * absent so `sbt test` stays portable.
  */
class SurfaceLintSpec extends SparkSpec {
  import spark.implicits._

  private def havePython: Boolean =
    try {
      val p = new ProcessBuilder(
        "python3", "-c", "import duckdb, pyarrow").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  test("check.py flags a seeded decimal compare surface and passes a " +
    "BIGINT control silently") {
    assume(havePython, "python3/duckdb/pyarrow not available")
    val out = Files.createTempDirectory("surface_lint").toString
    // seeded offender: one decimal128 column (value-equal to oracle)
    Seq((1L, BigDecimal("1.500000")))
      .toDF("k", "d")
      .select(col("k"), col("d").cast("decimal(38,6)").as("d"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q_dec_fixture")
    // control: BIGINT-only surface
    Seq((1L, 1500000L)).toDF("k", "d_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q_int_control")
    // approx-only offender: a double that compares close-not-exact to
    // the oracle PLUS a decimal — the risk flags must survive the
    // OK_APPROX branch (an approx compare is MORE hash-risky, not less)
    Seq((1L, 0.1 + 0.2, BigDecimal("2.000000")))
      .toDF("k", "dbl", "dec")
      .select(col("k"), col("dbl"),
        col("dec").cast("decimal(38,6)").as("dec"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q_approx_dec")
    val oracle =
      """{"q_dec_fixture": "SELECT 1 AS k, CAST(1.5 AS DECIMAL(38,6)) AS d",
        | "q_int_control": "SELECT 1 AS k, 1500000 AS d_micro",
        | "q_approx_dec": "SELECT 1 AS k, 0.3::DOUBLE AS dbl, CAST(2 AS DECIMAL(38,6)) AS dec"}"""
        .stripMargin
    Files.writeString(Paths.get(s"$out/oracle_sql.json"), oracle)
    val pb = new ProcessBuilder(
      "python3", "tools/check.py", "/root/testdata/sf0.001", out)
    pb.directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val text = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    assert(code == 0, s"check.py exited $code:\n$text")
    val decLine = text.linesIterator
      .find(_.contains("q_dec_fixture")).getOrElse("")
    val intLine = text.linesIterator
      .find(_.contains("q_int_control")).getOrElse("")
    assert(decLine.contains("DECIMAL_HASH_RISK"),
      s"lint did not flag the seeded decimal surface: $decLine")
    assert(decLine.contains("cols=['d']"), decLine)
    assert(!intLine.contains("DECIMAL_HASH_RISK"),
      s"lint false-positived on the BIGINT control: $intLine")
    assert(text.contains("DECIMAL columns on the compare surface"),
      "summary WARN line missing")
    // the approx-compare branch must KEEP the risk flags
    val approxLine = text.linesIterator
      .find(_.contains("q_approx_dec")).getOrElse("")
    assert(approxLine.contains("OK_APPROX"), approxLine)
    assert(approxLine.contains("DECIMAL_HASH_RISK"),
      s"OK_APPROX dropped the decimal flag: $approxLine")
  }
}
