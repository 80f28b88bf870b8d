package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under the scale-factor directory.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (as a Long of ns). Set
    * that conf on the session (GraftSession does) and normalize here to a
    * microsecond TimestampType column, so downstream code sees a uniform
    * schema. Nanos-to-micros truncation matches DuckDB's `epoch_us`.
    */
  private def normalizeEvents(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Widen a narrow scan to the session's parallelism before an
    * expression/UDF-heavy stage. The driver testdata is a single parquet
    * row group, which Spark cannot split below file level — without this
    * one task runs the whole stage (measured 3x slower than the widened
    * plan for the language-ID scan, despite the extra exchange). The
    * round-robin repartition moves the full rows, so it is GUARDED: at
    * corpus scale the store emits many row groups, the scan already has
    * enough splits, and the exchange stays out of the plan entirely.
    */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }
}
