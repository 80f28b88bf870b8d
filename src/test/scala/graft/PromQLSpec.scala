package graft

import graft.operators.LabelMatcher
import graft.promql.SimplePromQL
import graft.promql.SimplePromQL.{ParsedQuery, PromQLError}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's PromQL accept/reject matrix
  * (reference: src/ingestors/http/simple_promql.rs:326-453,
  * tests/simple_promql.rs:102-755).
  */
class PromQLSpec extends AnyFunSuite {

  private val now = 1706745600000000L // 2024-02-01T00:00:00Z in µs

  private def parse(q: String): ParsedQuery = SimplePromQL.parse(q, now)
  private def rejected(q: String): String =
    intercept[PromQLError](parse(q)).message

  test("bare metric name: instant query with 1h lookback") {
    val p = parse("cpu_usage")
    assert(p.matchers == Seq(LabelMatcher.Eq("__name__", "cpu_usage")))
    assert(p.endUs == now)
    assert(p.startUs == now - 3600L * 1000000L)
  }

  test("vector selector with matchers") {
    val p = parse("""cpu{host="a", env!="dev", region=~"eu.*", dc!~"x"}""")
    assert(p.matchers == Seq(
      LabelMatcher.Eq("__name__", "cpu"),
      LabelMatcher.Eq("host", "a"),
      LabelMatcher.NotEq("env", "dev"),
      LabelMatcher.Re("region", "eu.*"),
      LabelMatcher.NotRe("dc", "x")))
  }

  test("matrix selector sets range window") {
    val p = parse("cpu[5m]")
    assert(p.startUs == now - 5L * 60L * 1000000L)
    val p2 = parse("cpu[1h30m]")
    assert(p2.startUs == now - 90L * 60L * 1000000L)
  }

  test("selector without metric name") {
    val p = parse("""{job="node"}""")
    assert(p.matchers == Seq(LabelMatcher.Eq("job", "node")))
  }

  test("parens unwrap recursively") {
    val p = parse("""((cpu{host="a"}))""")
    assert(p.matchers.head == LabelMatcher.Eq("__name__", "cpu"))
  }

  test("aggregations rejected") {
    assert(rejected("sum(cpu)").contains("Aggregation expressions"))
    assert(rejected("avg(cpu)").contains("Aggregation expressions"))
    assert(rejected("count(cpu)").contains("Aggregation expressions"))
    assert(rejected("sum by (host) (cpu)").contains("Aggregation expressions"))
  }

  test("function calls rejected") {
    assert(rejected("rate(cpu[5m])").contains("Function calls"))
    assert(rejected("increase(cpu[1h])").contains("Function calls"))
  }

  test("binary operations rejected") {
    assert(rejected("cpu + mem").contains("Binary operations"))
    assert(rejected("cpu / 100").contains("Binary operations"))
    assert(rejected("cpu and mem").contains("Binary operations"))
  }

  test("unary operations rejected") {
    assert(rejected("-cpu").contains("Unary operations"))
  }

  test("literals rejected") {
    assert(rejected("42").contains("Literal values"))
    assert(rejected("\"hello\"").contains("Literal values"))
  }

  test("subqueries rejected") {
    assert(rejected("cpu[5m:1m]").contains("Subqueries"))
  }

  test("trailing content rejected") {
    assert(rejected("cpu garbage").contains("trailing content") ||
      rejected("cpu garbage").nonEmpty)
  }

  test("empty matcher set rejected") {
    assert(rejected("{}").contains("at least one matcher"))
  }

  test("durations parse") {
    assert(SimplePromQL.parseDurationMs("90s") == 90000L)
    assert(SimplePromQL.parseDurationMs("1h30m") == 5400000L)
    assert(SimplePromQL.parseDurationMs("2d") == 172800000L)
    intercept[PromQLError](SimplePromQL.parseDurationMs("5x"))
  }
}
