package graft

import graft.operators.{LabelMatcher, Matchers}
import graft.operators.LabelMatcher._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the reference's matcher truth table, incl. absent-label semantics
  * (reference: src/ingestors/http/crud.rs:145-182,
  * tests/query_sensors_by_labels.rs:84-925): `!=` and `!~` match sensors
  * lacking the label; `=` and `=~` do not; empty matcher set matches none.
  * Checked on BOTH the Column compiler (Spark) and the in-process evaluator.
  */
class MatchersSpec extends SparkSpec {

  // catalog: one sensor with {env: prod}, one with {env: dev}, one with no labels
  private lazy val catalog = {
    val schema = StructType(Seq(
      StructField("uuid", StringType),
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("labels", MapType(StringType, StringType))))
    val rows = Seq(
      Row("u1", "temp", "Float", Map("env" -> "prod")),
      Row("u2", "temp", "Float", Map("env" -> "dev")),
      Row("u3", "hum", "Integer", null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
  }

  private def selected(ms: Seq[LabelMatcher]): Set[String] =
    catalog.filter(Matchers.predicate(ms))
      .collect().map(_.getString(0)).toSet

  private def evalSel(ms: Seq[LabelMatcher]): Set[String] = Set(
    ("u1", "temp", Map("env" -> "prod")),
    ("u2", "temp", Map("env" -> "dev")),
    ("u3", "hum", Map.empty[String, String]))
    .filter { case (_, n, l) => Matchers.matches(n, l, ms) }.map(_._1)

  private def check(ms: Seq[LabelMatcher], expect: Set[String]): Unit = {
    assert(selected(ms) == expect, s"Column path for $ms")
    assert(evalSel(ms) == expect, s"in-process path for $ms")
  }

  test("equality matcher does not match absent label") {
    check(Seq(Eq("env", "prod")), Set("u1"))
  }

  test("not-equal matcher matches absent label") {
    check(Seq(NotEq("env", "prod")), Set("u2", "u3"))
  }

  test("regex matcher does not match absent label") {
    check(Seq(Re("env", "pro")), Set("u1")) // unanchored substring search
  }

  test("not-regex matcher matches absent label") {
    check(Seq(NotRe("env", "pro")), Set("u2", "u3"))
  }

  test("__name__ matchers address the sensor name") {
    check(Seq(Eq("__name__", "temp")), Set("u1", "u2"))
    check(Seq(Re("__name__", "^h")), Set("u3"))
    check(Seq(NotEq("__name__", "temp")), Set("u3"))
  }

  test("matchers AND-combine") {
    check(Seq(Eq("__name__", "temp"), NotEq("env", "prod")), Set("u2"))
  }

  test("empty matcher set selects nothing") {
    check(Nil, Set.empty)
  }

  test("regex is case-sensitive and unanchored") {
    check(Seq(Re("env", "PROD")), Set.empty)
    check(Seq(Re("env", "ro")), Set("u1"))
  }

  test("numeric-only filter keeps Integer/Numeric/Float") {
    val got = Matchers.sensorsByLabels(
      catalog.withColumn("labels", org.apache.spark.sql.functions.col("labels")),
      Seq(NotEq("nope", "x")), numericOnly = true)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("u1", "u2", "u3")) // all are numeric types here
  }
}
