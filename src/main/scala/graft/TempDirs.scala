package graft

/** Per-JVM scratch directories with guaranteed exit cleanup.
  *
  * Every ephemeral directory the engine mints (store round-trip roots,
  * streaming source dumps, artifact symlink farms, probe inputs) hangs
  * off ONE per-JVM root that a single shutdown hook removes
  * recursively. `File.deleteOnExit` cannot do this — it only unlinks
  * EMPTY directories — so each naked `createTempDirectory` call leaked
  * its tree into /tmp for the life of the host (measured: 1,600 dirs /
  * 550 MB after ~50 harness runs). One root + one recursive hook
  * bounds scratch usage to the live JVM.
  *
  * Durable state (SensorStore roots a deployment actually keeps,
  * `ingestStream` checkpoints) must NOT come from here — callers pass
  * those paths explicitly.
  */
object TempDirs {

  /** Recursive best-effort delete; safe on paths that vanish mid-walk.
    * Symlinks are unlinked, never followed: the streaming-source
    * symlink farms point INTO the real source data, and
    * `File.listFiles` follows links — recursing through one would
    * delete the link target's contents (a directory-shaped target,
    * e.g. a Spark-written parquet dir, would be destroyed at JVM
    * exit). `File.delete` on a link removes only the link itself.
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete(); ()
  }

  private lazy val root: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(d.toFile), "graft-tmp-cleanup"))
    d
  }

  /** A fresh scratch directory under the per-JVM root. */
  def create(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)

  /** As [[create]] but the String path (the common call shape). */
  def createPath(prefix: String): String = create(prefix).toString
}
