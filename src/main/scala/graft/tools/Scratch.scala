package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.adapters.EventsAdapter
import graft.sources.InfluxLineProtocol

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    val d = "/root/testdata/sf0.1"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCRATCH $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    println(s"SCRATCH events rows ${Tables.events(spark, d).count()}")
    val lines = Tables.events(spark, d)
      .filter(col("event_type") === "view")
      .select(concat(
        lit("views,user="), col("user_id"),
        lit(" value="), col("value").cast("string"),
        lit(" "), (unix_micros(col("ts")) * 1000).cast("string")).as("line"))
      .as[String]
    time("synthesize lines")(lines.count())
    time("parse only") {
      InfluxLineProtocol.parse(lines, "bkt", "org", "ns").count()
    }
    time("parse+agg (full q18)") {
      graft.Queries.all("q18_influx_parse")(spark, d).count()
    }
    time("parse+agg 2nd")(
      graft.Queries.all("q18_influx_parse")(spark, d).count())
    spark.stop()
  }
}
