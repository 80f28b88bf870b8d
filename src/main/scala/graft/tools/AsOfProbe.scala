package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Probe: native vs composed as-of join on the q14 data. */
object AsOfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val d = sys.env.getOrElse("ASOF_SF", "/root/testdata/sf0.01")
    val ev = Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value").as("click_value"))
    val composed = AsOfJoin.asOf(
      purchases, clicks, "user_id", "ts_us", Seq("click_value"))
      .select("user_id", "ts_us", "purchase_value", "right_ts",
        "click_value")
    val native = AsOfJoin.asOfNative(
      purchases, clicks, "user_id", "ts_us", Seq("click_value"))
      .select("user_id", "ts_us", "purchase_value", "right_ts",
        "click_value")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm both paths once, then time
    composed.count(); native.count()
    time("composed")(composed.count()); time("composed")(composed.count())
    time("native  ")(native.count()); time("native  ")(native.count())
    val diff = composed.exceptAll(native).count() +
      native.exceptAll(composed).count()
    println("PROBE diff rows: " + diff)
    native.explain("formatted")
    spark.stop()
  }
}
