package graft.store

/** Classification and retry for the ONE fault class the store's swap
  * protocol makes transient: a reader that listed a value-table file
  * before a vacuum/compaction deleted it faults at scan time on the
  * vanished file — or on its checksum sidecar (Hadoop's local
  * ChecksumFileSystem keeps a `.name.crc` beside every data file, and
  * a scan that opened the data file can still lose the `.crc` to the
  * delete). Spark wraps both as `FAILED_READ_FILE.*` task failures,
  * but under DIFFERENT subclasses: a vanished data file surfaces as
  * `FAILED_READ_FILE.FILE_NOT_EXIST` while a vanished `.crc` arrives
  * as `FAILED_READ_FILE.NO_HINT` whose cause is a
  * `java.nio.file.NoSuchFileException` (which is NOT a
  * `java.io.FileNotFoundException`, so Hadoop's own missing-checksum
  * tolerance does not absorb it). Message-substring matching caught
  * the first and missed the second — so classification here walks the
  * CAUSE CHAIN for either exception type, covering every
  * `FAILED_READ_FILE.*` wrapper Spark or Hadoop produces.
  *
  * The store's contract (see [[SensorStore.compactPartition]]): value
  * tables keep these faults LOUD — `ignoreMissingFiles` would silently
  * fabricate an empty month — and the reader retries; a retried read
  * re-lists and sees the compacted files. Reference durability
  * posture: src/storage/sqlite/storage.rs:79-86 (SQLite serializes
  * vacuum against readers; the concurrent store earns the same
  * contract via retry-on-vanished-file).
  */
object ReadFaults {

  /** True when `t` (or anything in its cause chain) is a vanished-file
    * fault: `java.io.FileNotFoundException` (covers Spark's
    * `SparkFileNotFoundException` and `FAILED_READ_FILE.FILE_NOT_EXIST`)
    * or `java.nio.file.NoSuchFileException` (the `NO_HINT` wrapper's
    * cause when a `.crc` sidecar vanishes mid-read). Chain walk is
    * bounded and cycle-safe.
    */
  def isVanishedFile(t: Throwable): Boolean = {
    var cur = t
    var depth = 0
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    while (cur != null && depth < 32 && seen.add(cur)) {
      cur match {
        case _: java.io.FileNotFoundException => return true
        case _: java.nio.file.NoSuchFileException => return true
        case _ => ()
      }
      cur = cur.getCause
      depth += 1
    }
    false
  }

  /** Run `body`, retrying (with a short linear backoff) when it fails
    * on a vanished file — the listed-then-deleted race with a
    * concurrent vacuum/compaction. Each retry re-plans the read, which
    * re-lists the directory and sees the compacted layout. Any other
    * failure, or exhaustion, rethrows the last fault unchanged.
    */
  def retryOnVanishedFiles[T](
      maxAttempts: Int = 4, backoffMs: Long = 50)(body: => T): T = {
    require(maxAttempts >= 1, "need at least one attempt")
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: Throwable if attempt < maxAttempts && isVanishedFile(e) =>
          Thread.sleep(backoffMs * attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
