package graft

import graft.model.SensorType
import graft.store.{ReadFaults, SensorStore}

/** Cross-PROCESS store/warehouse soak (verdict r15 item 3): every race
  * soak elsewhere runs inside one JVM, where `ArtifactWarehouse.locks`
  * and Hadoop's FileSystem cache accidentally serialize contenders.
  * Here a second JVM ([[graft.tools.StoreRaceChild]], its own
  * SparkSession) races this one against a shared root — the staged
  * atomic-rename publish, vacuum's scan-exactly-what-you-listed
  * contract, and promoteStaging's last-writer-wins must all hold with
  * no shared JVM state. Reference anchor: the transactional publish
  * contract concurrent writers get from the reference's storage layer
  * (src/storage/sqlite/storage.rs:69-77).
  */
class CrossProcessSoakSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String = TempDirs.createPath("graft_xp_soak")

  /** Fork a child JVM with this JVM's classpath and module flags. */
  private def forkChild(args: Seq[String], log: java.io.File): Process = {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    val moduleFlags = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
      .toArray(Array.empty[String])
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val cmd = Seq(javaBin) ++ moduleFlags ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.tools.StoreRaceChild") ++ args
    new ProcessBuilder(cmd: _*)
      .redirectOutput(log)
      .redirectErrorStream(true)
      .start()
  }

  private def childOutput(log: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(log.toPath), "UTF-8")

  test("cross-process publish vs vacuum+read: no loss, no duplication, " +
    "no torn month") {
    val root = tempDir()
    val store = new SensorStore(spark, root)
    // seed both months with several files so every vacuum pass rewrites
    val seed = Seq(
      ("seed", 1704067200000000L, 0.5),
      ("seed", 1706745600000000L, 0.5)).toDF(
      "sensor_id", "timestamp_us", "value")
    (1 to 3).foreach(_ => store.publishSamples(SensorType.Float, seed))

    val batches = 12
    val log = java.io.File.createTempFile("xp_publish", ".log")
    val child = forkChild(Seq("publish", root, batches.toString, "xp"), log)
    val schemaOnRead = spark.read.parquet(s"$root/values_float").schema

    // parent side: vacuum continuously and read under the vanished-file
    // retry contract while the child publishes from its own JVM
    var reads = 0
    var retried = 0
    try {
      while (child.isAlive) {
        store.vacuum(SensorType.Float)
        try {
          val months = spark.read.schema(schemaOnRead)
            .parquet(s"$root/values_float")
            .groupBy("month").count().collect()
          reads += 1
          // seed rows alone already populate both months — a vanished
          // or torn month under compaction would surface here
          assert(months.length >= 2,
            s"read saw ${months.length} month(s) mid-race")
        } catch {
          case e: Throwable if ReadFaults.isVanishedFile(e) => retried += 1
        }
      }
    } finally {
      if (child.isAlive) child.destroyForcibly()
      child.waitFor()
    }
    val out = childOutput(log)
    assert(child.exitValue() == 0 && out.contains("CHILD_DONE"),
      s"child failed (exit ${child.exitValue()}):\n${out.takeRight(2000)}")

    // converge and audit the exact multiset: every child row exactly
    // once (folded-and-double-counted or dropped-by-compaction rows
    // are the two historical failure modes), seeds intact
    store.vacuum(SensorType.Float)
    val rows = store.samples(SensorType.Float)
      .select("sensor_id", "timestamp_us").as[(String, Long)].collect()
    val childRows = rows.filter(_._1.startsWith("xp"))
    assert(childRows.length == batches * 2,
      s"expected ${batches * 2} child rows, got ${childRows.length}")
    assert(childRows.distinct.length == childRows.length,
      "child rows duplicated by a racing compaction")
    assert(rows.count(_._1 == "seed") == 6, "seed rows lost or duplicated")
    assert(reads > 0, "parent never completed a read during the race")
  }

  test("cross-process vacuum vs publish+read: child vacuums while " +
    "parent publishes") {
    val root = tempDir()
    val store = new SensorStore(spark, root)
    (1 to 3).foreach(_ => store.publishSamples(SensorType.Float, Seq(
      ("seed", 1704067200000000L, 0.5),
      ("seed", 1706745600000000L, 0.5)).toDF(
      "sensor_id", "timestamp_us", "value")))

    val stop = new java.io.File(tempDir(), "stop")
    val log = java.io.File.createTempFile("xp_vacuum", ".log")
    val child = forkChild(Seq("vacuum", root, stop.getPath), log)
    try {
      // wait for the child's store to come up (first vacuum logged on
      // exit only — give it the session-startup grace period)
      val batches = 10
      (0 until batches).foreach { i =>
        val batch = Seq(
          (s"pp$i", 1704067200000000L + i, i.toDouble),
          (s"pp$i", 1706745600000000L + i, i.toDouble))
          .toDF("sensor_id", "timestamp_us", "value")
        store.publishSamples(SensorType.Float, batch)
      }
    } finally {
      java.nio.file.Files.createFile(stop.toPath)
      val done = child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) child.destroyForcibly()
      child.waitFor()
    }
    val out = childOutput(log)
    assert(child.exitValue() == 0 && out.contains("CHILD_DONE"),
      s"child failed (exit ${child.exitValue()}):\n${out.takeRight(2000)}")
    assert(out.contains("CHILD_VACUUMS"), "child never vacuumed")

    store.vacuum(SensorType.Float)
    val rows = store.samples(SensorType.Float)
      .select("sensor_id").as[String].collect()
    assert(rows.count(_.startsWith("pp")) == 20,
      "published rows lost or duplicated under cross-process vacuum")
    assert(rows.count(_ == "seed") == 6)
  }

  test("cross-process concurrent artifact build: last-writer-wins, " +
    "both processes serve correct values; gc honors the age contract") {
    val whRoot = tempDir()
    sys.props("graft.warehouse.dir") = whRoot
    try {
      // a pre-aged artifact that the production-contract gc must reap
      val oldArt = new java.io.File(s"$whRoot/xpsoak/stale_artifact")
      java.nio.file.Files.createDirectories(oldArt.toPath)
      val oldManifest = new java.io.File(oldArt, "manifest.properties")
      java.nio.file.Files.write(oldManifest.toPath, "k=v".getBytes)
      oldManifest.setLastModified(
        System.currentTimeMillis() - 7200L * 1000)
      oldArt.setLastModified(System.currentTimeMillis() - 7200L * 1000)

      val iters = 6
      val log = java.io.File.createTempFile("xp_wh", ".log")
      val child = forkChild(Seq("warehouse", whRoot, iters.toString), log)
      try {
        (0 until iters).foreach { i =>
          val df = pipeline.ArtifactWarehouse.bucketed(
            spark, "xpsoak", "fp-shared", "id", 8) {
            spark.range(0, 1000).selectExpr("id", "id * 2 as v")
          }
          val s = df.agg(org.apache.spark.sql.functions.sum("v"))
            .first().getLong(0)
          assert(s == 999000L, s"parent served wrong sum $s on pass $i")
          // production age contract: maxAge far above session length —
          // must reap the stale artifact and NEVER a live one
          pipeline.ArtifactWarehouse.gc(maxAgeMs = 3600L * 1000)
        }
      } finally {
        val done = child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
        if (!done) child.destroyForcibly()
        child.waitFor()
      }
      val out = childOutput(log)
      assert(child.exitValue() == 0 && out.contains("CHILD_DONE"),
        s"child failed (exit ${child.exitValue()}):\n${out.takeRight(2000)}")
      assert((0 until iters).forall(i => out.contains(s"CHILD_WH_OK $i")))
      assert(!oldArt.exists(), "gc failed to reap the pre-aged artifact")
      // exactly one live artifact slot for the contended key
      val arts = Option(new java.io.File(s"$whRoot/xpsoak").listFiles())
        .toSeq.flatten.filter(_.isDirectory)
      assert(arts.length == 1,
        s"expected one artifact slot, found ${arts.map(_.getName).toList}")
      assert(new java.io.File(arts.head, "manifest.properties").exists())
    } finally sys.props.remove("graft.warehouse.dir")
  }
}
