package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Disk-backed artifact warehouse — the persistence tier under
  * [[DedupArtifacts]]/[[TextArtifacts]]/[[GraphArtifacts]]/
  * [[SimilarityArtifacts]] (r13 verdict item #5). The artifact caches
  * were session-keyed JVM maps: a fresh SparkSession repaid every
  * shingle explosion / token shuffle / Lloyd training even though the
  * on-disk corpus hadn't changed. SURVEY §2.11's own contract is "on a
  * real cluster these live in the metastore beside the corpus and
  * survive the session" — this object is that metastore-lite.
  *
  * Layout: `<root>/<kind>/<keyHash>/` holding
  *   - `manifest.properties` — key column, bucket count, schema DDL,
  *     and the full fingerprint (written ATOMICALLY last: a directory
  *     without a manifest is an abandoned build and is rebuilt);
  *   - `data/` — the parquet files (bucketed layout for [[bucketed]]).
  *
  * Keying: the caller passes a FINGERPRINT built by [[fingerprint]]
  * from the corpus's input files (path + size + mtime) plus the
  * operator parameters — a changed corpus or parameter set hashes to a
  * new directory, so stale artifacts are never served (old directories
  * are garbage — [[gc]] removes them by age; the gateway exposes it
  * at `/api/v1/admin/warehouse_gc`).
  *
  * Cross-session reuse: bucket metadata lives in the session catalog,
  * not in parquet, so a bare `read.parquet` would forfeit the
  * zero-Exchange plans the bucketed artifacts exist for. On a disk hit
  * the table is RE-REGISTERED from the manifest (`CREATE TABLE …
  * CLUSTERED BY … LOCATION`), restoring the bucket spec in the new
  * session. This also retires the stopped-session purge logic the JVM
  * maps needed: there is no session-keyed state here at all.
  *
  * Root resolution: `graft.warehouse.dir` property, then
  * `GRAFT_WAREHOUSE_DIR` env, else a per-JVM scratch root (TempDirs) —
  * unset, behavior matches the old JVM-lifetime caches (plus
  * cross-SparkSession reuse inside the JVM); set, artifacts survive
  * process restarts.
  */
object ArtifactWarehouse {

  def configuredRoot: Option[String] =
    sys.props.get("graft.warehouse.dir")
      .orElse(sys.env.get("GRAFT_WAREHOUSE_DIR")).filter(_.nonEmpty)

  private lazy val scratchRoot: String =
    graft.TempDirs.createPath("graft_warehouse")

  private def root: String = configuredRoot.getOrElse(scratchRoot)

  // one build at a time per artifact key within the JVM (cross-process
  // races both build; the manifest rename is atomic, last writer wins —
  // both results are value-identical by construction)
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def sha(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.take(12).map("%02x".format(_)).mkString
  }

  /** Corpus + params fingerprint: the sorted input-file listing with
    * per-file size and mtime (content proxy — rewritten data changes
    * both), plus the parameter string. Frames without input files
    * (in-memory test fixtures) fingerprint on `params` alone — callers
    * keep the corpus key inside `params` for exactly that case. File
    * metadata lookups cap at 10k files; beyond that the listing alone
    * identifies the corpus (documented coarsening, still path-unique).
    */
  def fingerprint(df: DataFrame, params: String): String = {
    val files = df.inputFiles.sorted
    val sb = new StringBuilder(params)
    if (files.nonEmpty && files.length <= 10000) {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      files.foreach { f =>
        sb.append('\n').append(f)
        try {
          val p = new org.apache.hadoop.fs.Path(f)
          val st = p.getFileSystem(conf).getFileStatus(p)
          sb.append('|').append(st.getLen)
            .append('|').append(st.getModificationTime)
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    } else files.foreach(f => sb.append('\n').append(f))
    sb.toString
  }

  /** Census-driven bucket count for corpus-derived artifacts: the
    * fingerprint pass already stats every input file, so size buckets
    * from the same listing — one bucket per ~2 MB of compressed corpus
    * input (term/edge artifacts explode ~10–30× over parquet bytes),
    * clamped to [8, 4096], rounded UP to a power of two. Deterministic
    * in the same inputs that key the artifact, so the chosen count is
    * stable across sessions; frames without input files (in-memory
    * test fixtures) get the floor. A FIXED bucket count makes each
    * bucket (= one write task, one file) grow linearly with the corpus
    * — the probe measured q108's peak task memory 32→280 MB from sf1
    * to sf10 under buckets=8, which extrapolates to an impossible
    * multi-TB task at crawl scale.
    */
  def bucketsFor(df: DataFrame, floor: Int = 8): Int = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    var bytes = 0L
    // Sum EVERY input file: `inputFiles` has already materialized the
    // listing, so the per-file stat is the only cost, and a truncated
    // census would both undercount and depend on listing order —
    // yielding different bucket counts (hence different artifact
    // fingerprints) for the same corpus across sessions.
    df.inputFiles.foreach { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        bytes += p.getFileSystem(conf).getFileStatus(p).getLen
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    bucketsForBytes(bytes, floor)
  }

  /** The [[bucketsFor]] arithmetic: one bucket per ~2 MB of input,
    * rounded UP to a power of two, clamped to [floor, 4096].
    */
  def bucketsForBytes(bytes: Long, floor: Int = 8): Int = {
    val target = math.min(4096L, math.max(1L, bytes / (2L << 20)))
    var p2 = 1
    while (p2 < target) p2 <<= 1
    math.min(4096, math.max(floor, p2))
  }

  private def manifestPath(dir: String) = Paths.get(dir, "manifest.properties")

  private def loadManifest(dir: String): Option[java.util.Properties] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else {
      val props = new java.util.Properties()
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
      Some(props)
    }
  }

  private def writeManifest(
      dir: String, entries: Map[String, String]): Unit = {
    val props = new java.util.Properties()
    entries.foreach { case (k, v) => props.setProperty(k, v) }
    val tmp = Paths.get(dir, s".manifest.${System.nanoTime()}.tmp")
    val out = Files.newOutputStream(tmp)
    try props.store(out, null) finally out.close()
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Age-based garbage collection: delete artifact directories whose
    * manifest (or, for manifest-less ABANDONED builds, the directory
    * itself) is older than `maxAgeMs`. Returns the number of artifact
    * directories removed. Deployment contract: run with an age far
    * longer than any live session — a reader registered against a
    * GC'd artifact normally faults LOUDLY on its next scan (the same
    * contract as any external-table DROP; [[bucketed]]/[[plain]]
    * self-heal and rebuild on re-entry). The historical silent window —
    * a root vanishing exactly at file-LISTING time lists zero files and
    * plans an empty scan — is closed at the serve layer: [[bucketed]]/
    * [[plain]] perform the first listing INSIDE the guarded serve and
    * retry when it comes back empty with the manifest gone
    * (deterministically exercised via [[gcRaceProbe]]); afterwards the
    * session's cached file index makes a mid-scan deletion a loud
    * vanished-file fault, not an empty result. The age≫session
    * deployment contract remains the production guard against ever
    * entering these retries (race-soaked in ArtifactWarehouseSpec).
    * In-flight builds are never at risk: they live under
    * [[newStagingDir]] until one atomic promotion.
    */
  def gc(maxAgeMs: Long): Int = {
    require(maxAgeMs >= 0, "maxAgeMs must be non-negative")
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val rootDir = new java.io.File(root)
    val kinds = Option(rootDir.listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName != StagingDirName)
    var removed = 0
    for (kind <- kinds; art <- Option(kind.listFiles()).toSeq.flatten
           if art.isDirectory) {
      val manifest = new java.io.File(art, "manifest.properties")
      val stamp =
        if (manifest.exists()) manifest.lastModified() else art.lastModified()
      if (stamp < cutoff) {
        graft.TempDirs.deleteRecursively(art)
        removed += 1
      }
    }
    // staging sweep: in-flight builds live here (see [[promoteStaging]])
    // and MUST NOT be reaped by an aggressive age — a live build is
    // indistinguishable from a crashed one by mtime alone, so staging
    // dirs age against a fixed horizon via their NAME-EMBEDDED stamp
    // (the store's vacuum-janitor discipline), never against maxAgeMs.
    val stagingCutoff = System.currentTimeMillis() - StagingHorizonMs
    val staging = new java.io.File(rootDir, StagingDirName)
    for (s <- Option(staging.listFiles()).toSeq.flatten if s.isDirectory) {
      val stamp = s.getName.takeWhile(_.isDigit)
      if (stamp.nonEmpty && stamp.toLong < stagingCutoff) {
        graft.TempDirs.deleteRecursively(s)
        removed += 1
      }
    }
    removed
  }

  private val StagingDirName = ".staging"

  /** Crashed in-flight builds older than this are swept by [[gc]];
    * far longer than any real artifact build.
    */
  private val StagingHorizonMs: Long = 6 * 3600 * 1000L

  /** New stamped staging directory for an in-flight build — invisible
    * to readers (no manifest path points here) and protected from
    * [[gc]] until [[StagingHorizonMs]].
    */
  private def newStagingDir(): String = {
    val d = s"$root/$StagingDirName/" +
      s"${System.currentTimeMillis()}_${System.nanoTime()}"
    Files.createDirectories(Paths.get(d))
    d
  }

  /** Atomically promote a completed staging build into its artifact
    * slot. Returns true when OUR build now serves at `dir`; false when
    * a concurrent COMPLETED build (manifest present) won the race — the
    * results are value-identical by construction, so ours is discarded.
    * An abandoned target (data, no manifest) is replaced.
    */
  private def promoteStaging(staging: String, dir: String): Boolean = {
    val target = Paths.get(dir)
    Files.createDirectories(target.getParent)
    var tries = 0
    while (true) {
      if (Files.exists(manifestPath(dir))) {
        graft.TempDirs.deleteRecursively(new java.io.File(staging))
        return false
      }
      if (Files.exists(target))
        graft.TempDirs.deleteRecursively(target.toFile)
      try {
        Files.move(Paths.get(staging), target,
          StandardCopyOption.ATOMIC_MOVE)
        return true
      } catch {
        case e @ (_: java.nio.file.FileAlreadyExistsException |
            _: java.nio.file.DirectoryNotEmptyException |
            _: java.nio.file.NoSuchFileException) =>
          // target re-appeared (concurrent winner) or a racing gc swept
          // the empty parent — re-examine, bounded
          tries += 1
          if (tries > 5) throw e
          Files.createDirectories(target.getParent)
      }
    }
    false
  }

  /** Serve a BUCKETED artifact table: on a disk miss, run `build`,
    * write it through [[graft.store.Bucketing]] (hash-bucketed AND
    * per-bucket sorted on `key`), and manifest it; on a hit, re-register
    * the bucketed table in this session's catalog if absent. Either
    * way the caller reads `spark.table(name)` — the SAME plan shape on
    * first build and on every reuse (the build result itself is never
    * served directly), so consumers are bit-identical across the two
    * paths by construction.
    */
  def bucketed(
      spark: SparkSession, kind: String, fingerprint: String,
      key: String, buckets: Int)(build: => DataFrame): DataFrame = {
    val keyHash = sha(s"$kind|$fingerprint|$key|$buckets")
    val name = s"graft_wh_${kind}_$keyHash"
    val dir = s"$root/$kind/$keyHash"
    val lock = locks.computeIfAbsent(name, _ => new Object)
    def serveOrBuild(): DataFrame = {
      // self-heal the GC-vs-live-session race: an artifact GC'd under a
      // registered session leaves a catalog entry over vanished files —
      // detect it here (manifest gone) and fall through to a rebuild
      // instead of serving a scan that can only fault. A reader holding
      // a DataFrame ACROSS the GC still faults mid-scan (the documented
      // external-table-DROP contract); its retry lands here and heals.
      if (spark.catalog.tableExists(name) &&
          !Files.exists(manifestPath(dir)))
        spark.sql(s"DROP TABLE IF EXISTS $name")
      if (spark.catalog.tableExists(name)) spark.table(name)
      else loadManifest(dir) match {
        case Some(m) =>
          // disk hit from a prior session/JVM: restore the bucket spec
          val schema = m.getProperty("schema")
          spark.sql(
            s"CREATE TABLE $name ($schema) USING PARQUET " +
              s"CLUSTERED BY ($key) SORTED BY ($key) " +
              s"INTO $buckets BUCKETS LOCATION '$dir/data'")
          spark.table(name)
        case None =>
          // build into a STAGED directory (invisible to readers and to
          // gc's artifact sweep — an in-flight build must not look like
          // an abandoned one), manifest it there, then ONE atomic
          // rename into the artifact slot
          val staging = newStagingDir()
          val df = build
          val schemaDdl = df.schema.toDDL
          graft.store.Bucketing.writeBucketed(
            df, name, key, buckets, s"$staging/data")
          // a build may hand back an eager checkpoint (so IT can free
          // its own temps before returning); its blocks are spent once
          // the table is written
          PipelineCache.free(df)
          writeManifest(staging, Map(
            "kind" -> kind, "key" -> key, "buckets" -> buckets.toString,
            "schema" -> schemaDdl, "fingerprint" -> fingerprint))
          // writeBucketed registered the table at the staging location;
          // re-register at the artifact slot either way
          spark.sql(s"DROP TABLE IF EXISTS $name")
          promoteStaging(staging, dir)
          spark.sql(
            s"CREATE TABLE $name ($schemaDdl) USING PARQUET " +
              s"CLUSTERED BY ($key) SORTED BY ($key) " +
              s"INTO $buckets BUCKETS LOCATION '$dir/data'")
          spark.table(name)
      }
    }
    lock.synchronized {
      // bounded retry on vanished files: an adversarial concurrent
      // gc(0) can delete the directory BETWEEN the manifest check and
      // the serve/build (or yank a mid-build staging dir). The fault
      // class is exactly the store's listed-then-deleted race; a fresh
      // attempt re-lists, drops the stale entry, and rebuilds.
      var attempt = 0
      var out: DataFrame = null
      while (out == null) {
        try {
          val cand = serveOrBuild()
          gcRaceProbe()
          // listing validation: perform the first file listing HERE,
          // inside the guarded serve — a root gc'd between the manifest
          // check and listing time would otherwise plan a silent empty
          // scan (the window the gc scaladoc documents). Empty listing
          // + vanished manifest is unambiguous: retry and rebuild. The
          // listing itself can also throw a raw IOException ("Invalid
          // directory") when the dir vanishes mid-list — same verdict.
          if (servedSlotVanished(dir)) {
            if (attempt >= 3) throw new IllegalStateException(
              s"artifact $dir vanished at listing time on every retry — " +
                "a concurrent gc is running with an age shorter than " +
                "live sessions, violating the deployment contract")
            attempt += 1
            spark.sql(s"DROP TABLE IF EXISTS $name")
            spark.catalog.refreshByPath(dir)
          } else out = cand
        } catch {
          case e: Throwable
              if attempt < 3 && graft.store.ReadFaults.isVanishedFile(e) =>
            attempt += 1
            spark.sql(s"DROP TABLE IF EXISTS $name")
            spark.catalog.refreshByPath(dir)
        }
      }
      out
    }
  }

  /** Post-serve generation check: the manifest doubles as the
    * artifact's liveness marker (gc deletes the whole slot, manifest
    * included, and every publish path lands it atomically last). A
    * serve that found the manifest present but finds it GONE afterwards
    * was raced by a gc — whatever Spark listed (or cached) for the
    * slot is condemned, so retry. One stat call on the happy path; no
    * Spark-cache interplay (an `inputFiles` probe here would validate
    * against a listing cached BEFORE the deletion and pass). The
    * residual window — gc landing between this stat and Spark's first
    * listing — is micro-seconds wide and still ends loud-or-healed:
    * once listed, the cached index turns later deletions into
    * vanished-file faults, whose consumer retry re-enters here.
    */
  private def servedSlotVanished(dir: String): Boolean =
    !Files.exists(manifestPath(dir))

  /** Serve a PLAIN (unbucketed) artifact: parquet on disk, registered
    * as a catalog table — first build included, so the served plan is
    * identical whether this process built the artifact or found it,
    * AND repeat consumers hit the catalog's cached relation instead of
    * paying a fresh file listing + schema inference per call (a bare
    * `read.parquet` per query measured ~100 ms of pure metadata on a
    * millisecond scan). For the materialized-frame artifacts (graph
    * edges, k-means assignments) whose consumers only need the VALUES,
    * not a layout.
    */
  def plain(
      spark: SparkSession, kind: String, fingerprint: String)(
      build: => DataFrame): DataFrame = {
    val keyHash = sha(s"$kind|$fingerprint")
    val name = s"graft_wh_${kind}_$keyHash"
    val dir = s"$root/$kind/$keyHash"
    // serving tier: Spark's OWN cache manager holds the (small,
    // corpus-orders-smaller) artifact in memory for repeat consumers —
    // session-scoped, LRU-evictable, owned by Spark, so no bespoke
    // session-keyed state returns; the parquet below remains the
    // cross-session source of truth. Lazy: the first scan populates.
    def serve(): DataFrame = {
      if (!spark.catalog.isCached(name)) spark.catalog.cacheTable(name)
      spark.table(name)
    }
    val lock = locks.computeIfAbsent(name, _ => new Object)
    def dropStale(): Unit = {
      if (spark.catalog.isCached(name)) spark.catalog.uncacheTable(name)
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
    def serveOrBuild(): DataFrame = {
      // same GC-vs-live-session self-heal as [[bucketed]] (also drops
      // the cache entry pinning vanished files)
      if (spark.catalog.tableExists(name) &&
          !Files.exists(manifestPath(dir)))
        dropStale()
      if (spark.catalog.tableExists(name)) serve()
      else loadManifest(dir) match {
        case Some(m) =>
          spark.sql(s"CREATE TABLE $name (${m.getProperty("schema")}) " +
            s"USING PARQUET LOCATION '$dir/data'")
          serve()
        case None =>
          // staged build + atomic promote — see [[bucketed]]
          val staging = newStagingDir()
          val df = build
          val schemaDdl = df.schema.toDDL
          df.write.mode("overwrite").parquet(s"$staging/data")
          PipelineCache.free(df)
          writeManifest(staging, Map(
            "kind" -> kind, "fingerprint" -> fingerprint,
            "schema" -> schemaDdl))
          promoteStaging(staging, dir)
          spark.sql(s"CREATE TABLE $name ($schemaDdl) " +
            s"USING PARQUET LOCATION '$dir/data'")
          serve()
      }
    }
    lock.synchronized {
      // bounded vanished-file retry + listing validation — see [[bucketed]]
      var attempt = 0
      var out: DataFrame = null
      while (out == null) {
        try {
          val cand = serveOrBuild()
          gcRaceProbe()
          if (servedSlotVanished(dir)) {
            if (attempt >= 3) throw new IllegalStateException(
              s"artifact $dir vanished at listing time on every retry — " +
                "a concurrent gc is running with an age shorter than " +
                "live sessions, violating the deployment contract")
            attempt += 1
            dropStale()
            spark.catalog.refreshByPath(dir)
          } else out = cand
        } catch {
          case e: Throwable
              if attempt < 3 && graft.store.ReadFaults.isVanishedFile(e) =>
            attempt += 1
            dropStale()
            spark.catalog.refreshByPath(dir)
        }
      }
      out
    }
  }

  /** Fault-injection seam for the vanished-at-listing-time window:
    * invoked between a successful serve and its listing validation,
    * nowhere else. ArtifactWarehouseSpec swaps in a one-shot
    * dir-deleter to exercise the retry deterministically; production
    * leaves the no-op.
    */
  private[graft] var gcRaceProbe: () => Unit = () => ()
}
