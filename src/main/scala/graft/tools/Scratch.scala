package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.adapters.EventsAdapter
import graft.sources.InfluxLineProtocol

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCRATCH $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val mkLines = () => Tables.events(spark, d)
      .filter(col("event_type") === "view")
      .select(concat(
        lit("views,user="), col("user_id"),
        lit(" value="), col("value").cast("string"),
        lit(" "), (unix_micros(col("ts")) * 1000).cast("string")).as("line"))
      .as[String]

    // warm
    time("warm: line gen count")(mkLines().count())
    val n = time("line gen count")(mkLines().count())
    println(s"SCRATCH n_lines $n")
    time("parse full agg") {
      InfluxLineProtocol.parse(mkLines(), "bkt", "org", "ns")
        .agg(count(lit(1)), sum("double_value")).collect()
    }
    time("parse full agg (2nd)") {
      InfluxLineProtocol.parse(mkLines(), "bkt", "org", "ns")
        .agg(count(lit(1)), sum("double_value")).collect()
    }
    // regex cost alone
    time("rlike fast pred only") {
      mkLines().toDF("line").filter(trim(col("line")).rlike(
        """^[A-Za-z0-9._~-]+(?:,[^,= \\"]+=[^,= \\"]+)* +.*""")).count()
    }
    spark.stop()
  }
}
