package graft.tools

import org.apache.spark.sql.SparkSession

import graft.model.SensorType
import graft.store.SensorStore

/** Forked-JVM counterpart of CrossProcessSoakSpec: a SECOND process
  * (own SparkSession, own Hadoop FileSystem instances, zero shared
  * JVM state) hammering the same store root / artifact warehouse the
  * parent test JVM is hammering. The in-JVM race soaks in
  * StoreSpec/ArtifactWarehouseSpec can't disprove accidental reliance
  * on JVM-local locks (`ArtifactWarehouse.locks`, Hadoop FS cache
  * serialization) — only a real second process can, which is what the
  * reference's transactional publish contract expects of concurrent
  * writers (reference: src/storage/sqlite/storage.rs:69-77).
  *
  * Modes (args):
  *  - `publish <root> <batches> <prefix>` — stagedAppend unique
  *    two-month batches; prints `CHILD_PUBLISHED i` per batch.
  *  - `vacuum <root> <stopFile>` — vacuum in a loop until the parent
  *    creates `stopFile`.
  *  - `warehouse <whRoot> <iters>` — build-or-serve the SAME keyed
  *    bucketed artifact the parent builds, verifying the served values
  *    each pass (promoteStaging last-writer-wins across processes).
  *
  * Prints `CHILD_DONE` and exits 0 on success; any raised fault exits
  * nonzero (the parent asserts on both).
  */
object StoreRaceChild {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"store-race-child-$mode")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      mode match {
        case "publish" =>
          val root = args(1)
          val batches = args(2).toInt
          val prefix = args(3)
          val store = new SensorStore(spark, root)
          (0 until batches).foreach { i =>
            // unique (sensor, timestamp) rows landing in both months: a
            // compaction that folds a concurrent publish into its output
            // while deleting only its own listing would double these
            val batch = Seq(
              (s"$prefix$i", 1704067200000000L + i, i.toDouble),
              (s"$prefix$i", 1706745600000000L + i, i.toDouble))
              .toDF("sensor_id", "timestamp_us", "value")
            store.publishSamples(SensorType.Float, batch)
            println(s"CHILD_PUBLISHED $i")
          }

        case "vacuum" =>
          val root = args(1)
          val stop = new java.io.File(args(2))
          val store = new SensorStore(spark, root)
          var n = 0
          while (!stop.exists()) {
            store.vacuum(SensorType.Float)
            n += 1
          }
          println(s"CHILD_VACUUMS $n")

        case "warehouse" =>
          System.setProperty("graft.warehouse.dir", args(1))
          val iters = args(2).toInt
          (0 until iters).foreach { i =>
            val df = graft.pipeline.ArtifactWarehouse.bucketed(
              spark, "xpsoak", "fp-shared", "id", 8) {
              spark.range(0, 1000).selectExpr("id", "id * 2 as v")
            }
            val s = df.agg(org.apache.spark.sql.functions.sum("v"))
              .first().getLong(0)
            require(s == 999000L, s"artifact served wrong sum $s on pass $i")
            println(s"CHILD_WH_OK $i")
          }

        case other =>
          throw new IllegalArgumentException(s"unknown mode $other")
      }
      println("CHILD_DONE")
    } finally spark.stop()
  }
}
