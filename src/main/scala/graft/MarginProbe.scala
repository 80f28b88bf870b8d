package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, PipelineCache, Similarity}

/** Executable threshold-margin probe for the value-dependent cuts in the
  * oracled dedup/similarity queries.
  *
  * Several oracles compare a computed float (jaccard, cosine,
  * containment) against a fixed threshold. The comparison is
  * engine-exact — both sides produce bit-identical doubles — but the
  * DATA is not fixed: the driver regenerates the synthetic corpus
  * between rounds, and a new content draw can land a value arbitrarily
  * close to a threshold (q46's cosine cut once sat 9.9e-6 from τ),
  * where the next draw could flip a row across the cut and turn a green
  * query red with NO code change. This probe makes the re-probe
  * discipline executable: for every thresholded query it recomputes the
  * nearest value to the cut over the SAME candidate surface the query
  * scans, and fails loudly — "data moved, not code" — when any margin
  * falls below [[MarginProbe.Floor]], BEFORE the oracle diff produces a
  * confusing hash mismatch.
  *
  * Probed cuts (kept in sync with the registry by construction — each
  * probe calls the same library operator with the threshold disabled):
  *  - q24/q25: 3-gram Jaccard ≥ 0.5 over documents;
  *  - q136: Jaccard ≥ 0.3 over the ASCII document slice;
  *  - q46: pairwise cosine ≥ τ over embeddings (vec_id < 600);
  *  - q134: within-cluster cosine ≥ 0.44 (same k-means config), PLUS
  *    the assignment margin — the min gap between nearest and
  *    second-nearest centroid over all vectors (centroid means are
  *    data-ordered float sums, so a near-zero gap means engine ulp
  *    drift could flip an argmin and move a vector's dup verdicts to
  *    another cluster);
  *  - q139: eval-side containment ≥ 0.5 across the train/eval split.
  *
  * Runs inside `Verify` on the driver's 2-arg invocation (and
  * standalone via its own main); writes `margins.json` next to the
  * query dumps so the round record carries the probed values.
  */
object MarginProbe {

  /** Minimum acceptable |value − threshold| over a value-cut surface
    * (jaccard / cosine / containment, all O(0.1–1) magnitudes). The cut
    * values are exact IEEE results on both engines, so the floor guards
    * data drift (a future draw landing ON the cut), not float noise;
    * 1e-4 is ~10 ulps of headroom at these magnitudes times a generous
    * safety factor.
    */
  val Floor = 1e-4

  /** Floor for the k-means ASSIGNMENT gap, which lives in SQUARED
    * euclidean distance units, not value units. The failure mode it
    * guards is different: centroid MEANS are data-ordered float sums,
    * so two engines' centroids can differ by reduction-order drift —
    * per coordinate at most ~(n−1)·ε·Σ|x| ≈ 4e-13 for the ~75-element
    * cluster sums here — which perturbs a squared distance by at most
    * ~2·Σᵢ|vᵢ−cᵢ|·δᵢ ≈ 3e-11 on this data (dim 64, coordinates
    * O(0.1)). 1e-9 keeps ~30× headroom above that WORST-CASE bound
    * (observed drift is orders smaller); a gap below it means two
    * centroids are genuinely near-equidistant from some vector and the
    * argmin could flip between engines.
    */
  val GapFloor = 1e-9

  final case class Probe(
      name: String, threshold: Double, margin: Double,
      floor: Double = Floor) {
    def ok: Boolean = margin >= floor
  }

  /** q46's cosine threshold, shared with the registry (re-centered from
    * 0.40 after the round-8 regeneration left only 9.9e-6 of margin;
    * 0.44 holds ≥7e-4 from the nearest pair at all three SFs).
    */
  val CosineTau = 0.44

  def probeAll(spark: SparkSession, sfDir: String): Seq[Probe] = {
    val docs = Tables.spread(spark, Tables.documents(spark, sfDir))
    val emb = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 600)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

    // min |col − t| over the full candidate surface; an empty surface
    // has nothing near the cut
    def minDist(df: DataFrame, c: String, t: Double): Double = {
      val r = df.agg(min(abs(col(c) - lit(t)))).first()
      val m = if (r.isNullAt(0)) Double.PositiveInfinity else r.getDouble(0)
      PipelineCache.free(df)
      m
    }

    val jacAll = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.0)
    val jacMargin = minDist(jacAll, "jaccard", 0.5)

    val ascii = docs.filter(col("text").rlike("\\A[ -~]*\\z"))
    val jacAscii = Dedup.ngramJaccardPairs(ascii, "doc_id", "text", 3, 0.0)
    val jacAsciiMargin = minDist(jacAscii, "jaccard", 0.3)

    val cosMargin = minDist(
      Similarity.cosineNearDupPairs(emb, tau = -1.0, bits = 0),
      "cosine", CosineTau)

    // q134: same clustering config as the query (k=8, 2 Lloyd steps)
    val centroids = Similarity.kmeansCentroids(emb, k = 8, iters = 2)
    val assign = Similarity.kmeansAssign(emb, k = 8, iters = 2)
    val e = emb.join(assign, "vec_id")
    val within = e.as("a").join(e.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(Similarity.cosine(col("a.vec"), col("b.vec")).as("cosine"))
    val semMargin = minDist(within, "cosine", 0.44)
    val gapMargin = emb
      .select(Similarity.centroidGap(col("vec"), centroids).as("gap"))
      .agg(min(col("gap"))).first().getDouble(0)

    val trainSrc = (0 to 9).map(i => s"src$i")
    val evalSrc = (10 to 19).map(i => s"src$i")
    val contMargin = minDist(
      Dedup.crossContaminationPairs(
        docs.filter(col("source").isin(trainSrc: _*)),
        docs.filter(col("source").isin(evalSrc: _*)),
        "doc_id", "text", n = 3, tau = 0.0),
      "containment", 0.5)

    // q291/q296 watermark boundary cuts: exact integer-µs compares on
    // both engines, so the only risk is a regenerated draw landing a
    // row EXACTLY on a boundary — where the pinned </≤ form vs
    // Spark's internal predicate (empirically indistinguishable off
    // the boundary) could diverge. Margin = min |lhs − rhs| in µs;
    // floor 1 µs means "no exact tie in this draw".
    val evTs = Tables.events(spark, sfDir).select(col("event_id"),
      unix_micros(col("ts")).as("t"), col("event_type"), col("user_id"))
    val winUs = 600000000L
    def maxT(df: DataFrame): Long = df.agg(max(col("t"))).first().getLong(0)
    val wm1 = maxT(evTs.filter(col("event_id") % 3 === 0)) - 1800000000L
    val wmF = maxT(evTs) - 1800000000L
    def winEnd = floor(col("t") / winUs).cast("long") * winUs + winUs
    def minAbs(df: DataFrame, c: org.apache.spark.sql.Column): Double = {
      val r = df.select(abs(c).cast("long").as("__m"))
        .agg(min(col("__m"))).first()
      if (r.isNullAt(0)) Double.PositiveInfinity else r.getLong(0).toDouble
    }
    val lateMargin = minAbs(
      evTs.filter(col("event_id") % 3 === 2), winEnd - wm1)
    val emitMargin = minAbs(evTs, winEnd - wmF)
    val clicks10 = evTs.filter(col("event_type") === "click" &&
      col("user_id") < 10)
    val views10 = evTs.filter(col("event_type") === "view" &&
      col("user_id") < 10)
    val wmJ = math.min(maxT(clicks10), maxT(views10)) - 3600000000L
    val outerMargin = minAbs(clicks10, col("t") + 300000000L - wmJ)

    // q360/q249 detector cuts (round-11 re-aims that made both gates
    // non-vacuous): both values come off ONE fixed IEEE chain over
    // exact integer sums on each engine, so the floor guards a future
    // draw parking a value where the two chains' last-ulp could
    // differ. q249's surface is DENSE (9k+ rows beyond the cut at
    // sf0.1, spacing ~1e-5), so its floor is 1e-5 — still ~1e10 ulps
    // of headroom at d² ≈ 5.
    val zMargin = minDist(
      graft.operators.SensorOps.rollingZAnomalies(
        adapters.EventsAdapter.samples(spark, sfDir)
          .select(col("sensor_id"), col("timestamp_us"), col("value")),
        window = 8, zCut = 1e-12)
        .select(abs(col("z")).as("az")),
      "az", 2.4)
    val d2Margin = minDist(
      graft.pipeline.Profiler.mahalanobis2d(
        Tables.lineitem(spark, sfDir), "l_quantity", "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"), threshold = -1.0),
      "d2", 5.0)

    Seq(
      Probe("q24_q25_jaccard", 0.5, jacMargin),
      Probe("q360_rolling_z_cut", 2.4, zMargin),
      Probe("q249_mahalanobis_cut", 5.0, d2Margin, floor = 1e-5),
      Probe("q136_jaccard_ascii", 0.3, jacAsciiMargin),
      Probe(s"q46_cosine", CosineTau, cosMargin),
      Probe("q134_semdedup_cosine", 0.44, semMargin),
      Probe("q134_assignment_gap", 0.0, gapMargin, floor = GapFloor),
      Probe("q139_containment", 0.5, contMargin),
      Probe("q291_late_boundary_us", 0.0, lateMargin, floor = 1.0),
      Probe("q291_emit_boundary_us", 0.0, emitMargin, floor = 1.0),
      Probe("q296_outer_emit_boundary_us", 0.0, outerMargin, floor = 1.0))
  }

  /** Run the probes, report, and write `outDir/margins.json`. Returns
    * true when every margin clears the floor; on violation prints the
    * "data moved, not code" banner so a subsequent oracle mismatch is
    * pre-diagnosed.
    */
  def runAndReport(
      spark: SparkSession, sfDir: String, outDir: String): Boolean = {
    val probes = probeAll(spark, sfDir)
    val json = probes.map { p =>
      f"""{"name": "${p.name}", "threshold": ${p.threshold}%s, """ +
        f""""margin": ${p.margin}%s, "floor": ${p.floor}%s, """ +
        f""""ok": ${p.ok}%s}"""
    }.mkString("[", ",\n ", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/margins.json"), json)
    probes.foreach { p =>
      System.err.println(
        f"[margin] ${p.name}%-22s tau=${p.threshold}%.2f " +
          f"margin=${p.margin}%.3g ${if (p.ok) "ok" else "TOO THIN"}%s")
    }
    val bad = probes.filterNot(_.ok)
    bad.foreach { p =>
      System.err.println(
        s"[margin] *** DATA MOVED, NOT CODE: ${p.name} margin " +
          s"${p.margin} < floor ${p.floor} at threshold ${p.threshold}. " +
          "The testdata draw has a value within float noise of this " +
          "cut; re-probe and re-center the threshold before trusting " +
          "any oracle diff on the affected queries. ***")
    }
    bad.isEmpty
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = if (args.length > 1) args(1) else "/tmp/margins"
    new java.io.File(outDir).mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ok = runAndReport(spark, sfDir, outDir)
    spark.stop()
    if (!ok) sys.exit(2)
  }
}
