package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`): brute-force
  * cosine top-k baseline + seeded random-hyperplane LSH for the scale path.
  * Vector math is a tight scalar-UDF dot product in double precision —
  * Spark's higher-order array functions (`zip_with`/`aggregate`) are
  * interpreted per element and were the dominant cost; the UDF keeps the
  * same left-to-right fold order. Pair joins precompute per-vector norms
  * so each candidate pair evaluates exactly one dot product.
  */
object Similarity {

  /** Sequential left-to-right dot product (deterministic fp order — the
    * same fold a HOF `aggregate(zip_with(...))` performs), as a codegen'd
    * Catalyst expression: a UDF pays an encoder round-trip per call
    * (boxed Seq per array, ~µs/pair on 64-dim vectors), and HOF lambdas
    * are interpreted per element; [[graft.functions.DotProductExpression]]
    * reads internal ArrayData unboxed inside whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine with norms precomputed per side — pair joins evaluate ONE dot
    * per pair instead of three (the per-vector norms are computed once per
    * row before the join, not once per candidate pair).
    */
  private def cosinePrenormed(
      a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus, rank per query. The corpus scan stays partition-parallel; the
    * only shuffle is the per-query top-k window (WindowGroupLimit — no full
    * sort of the joined table).
    */
  def bruteForceTopK(
      queries: DataFrame, // (query_id, qvec: array<double>)
      corpus: DataFrame, // (vec_id, vec: array<double>)
      k: Int,
      includeSelf: Boolean = false): DataFrame = {
    val joined = corpus.withColumn("__nv", norm(col("vec")))
      .crossJoin(broadcast(queries.withColumn("__nq", norm(col("qvec")))))
      .withColumn("cosine", cosinePrenormed(
        col("qvec"), col("vec"), col("__nq"), col("__nv")))
    val filtered =
      if (includeSelf) joined
      else joined.filter(col("query_id") =!= col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    filtered
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Brute-force EUCLIDEAN top-k — [[bruteForceTopK]]'s metric twin for
    * unnormalized embeddings (where cosine and distance genuinely rank
    * differently — the pair feeds [[rrfFuse]]). The squared distance is
    * computed as (q·q + v·v) − 2·q·v: three `vec_dot` kernels (same
    * ascending-index fold as the SQL replay) combined in one fixed
    * expression shape, so ranks replay exactly off-Spark; ties break on
    * the id.
    */
  def bruteForceTopKEuclid(
      queries: DataFrame, // (query_id, qvec: array<double>)
      corpus: DataFrame, // (vec_id, vec: array<double>)
      k: Int,
      includeSelf: Boolean = false): DataFrame = {
    val joined = corpus.withColumn("__nv", dot(col("vec"), col("vec")))
      .crossJoin(broadcast(
        queries.withColumn("__nq", dot(col("qvec"), col("qvec")))))
      .withColumn("dist2",
        (col("__nq") + col("__nv")) -
          lit(2.0) * dot(col("qvec"), col("vec")))
    val filtered =
      if (includeSelf) joined
      else joined.filter(col("query_id") =!= col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist2").asc, col("vec_id").asc)
    filtered
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "dist2")
  }

  /** Int8-quantized brute-force top-k — the 8× cheaper first pass of a
    * quantize-then-rerank serving stack: corpus and queries compress to
    * one byte per dimension (`vec_q8`, a codegen'd Expression), the
    * ranking dot runs in pure integer arithmetic (`vec_dot8`, exact at
    * any fold order), and the score dequantizes as
    * `dotq·scale_q·scale_v`. At 100 TB the corpus bytes — the broadcast
    * / scan / cache volume — drop 8×, which is why every billion-vector
    * ANN stack quantizes its first pass; callers wanting exact
    * float ranks re-rank the survivors with [[bruteForceTopK]]'s
    * kernel over k·r candidates instead of the corpus.
    */
  def quantizedTopK(
      queries: DataFrame, // (query_id, qvec: array<double>)
      corpus: DataFrame, // (vec_id, vec: array<double>)
      k: Int,
      includeSelf: Boolean = false): DataFrame = {
    def q8(c: Column) = call_function("vec_q8", c)
    val qc = corpus.select(col("vec_id"),
      q8(col("vec")).getField("scale").as("__sv"),
      q8(col("vec")).getField("q").as("__qv"))
    val qq = queries.select(col("query_id"),
      q8(col("qvec")).getField("scale").as("__sq"),
      q8(col("qvec")).getField("q").as("__qq"))
    val joined = qc.crossJoin(broadcast(qq))
      .withColumn("dot_q8",
        call_function("vec_dot8", col("__qq"), col("__qv")))
      .withColumn("approx_dot",
        col("dot_q8").cast("double") * col("__sq") * col("__sv"))
    val filtered =
      if (includeSelf) joined
      else joined.filter(col("query_id") =!= col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dot").desc, col("vec_id").asc)
    filtered
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "dot_q8", "approx_dot")
  }

  /** The full quantize-then-rerank serving stack: the int8 first pass
    * ranks the whole corpus by approximate dot and keeps `k·overfetch`
    * survivors per query; the exact float cosine then re-ranks ONLY the
    * survivors. At corpus scale the expensive exact kernel touches
    * k·overfetch rows per query instead of the corpus — the quantized
    * pass (8× smaller reads, integer arithmetic) does the winnowing.
    * Returns [[bruteForceTopK]]'s schema; equal to it whenever the
    * first pass's recall holds at the overfetch margin.
    */
  def quantizedRerankTopK(
      queries: DataFrame, // (query_id, qvec: array<double>)
      corpus: DataFrame, // (vec_id, vec: array<double>)
      k: Int,
      overfetch: Int = 4): DataFrame = {
    require(k >= 1 && overfetch >= 1, "k and overfetch must be >= 1")
    val survivors = quantizedTopK(queries, corpus, k * overfetch)
      .select("query_id", "vec_id")
    // survivors = k·overfetch·|queries| rows — query-set-bounded, so
    // broadcast: the SMJ alternative shuffles the whole corpus by
    // vec_id to pick out a handful of candidates (r16 scale gate)
    val cand = corpus.join(broadcast(survivors), "vec_id")
      .join(broadcast(queries), "query_id")
      .withColumn("cosine", cosinePrenormed(
        col("qvec"), col("vec"), norm(col("qvec")), norm(col("vec"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplanes (seeded; no wall-clock or
    * global RNG).
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id from `bits` hyperplanes. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce[Column]((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: queries join the corpus only within
    * their hyperplane bucket (shuffle on bucket id, not a cross join).
    * Multi-probe: each query additionally probes every bucket within
    * Hamming distance `probeHamming` of its own, trading candidate growth
    * for recall. Recall is data-dependent: isotropic random corpora (near-
    * orthogonal true neighbors) are the worst case; clustered real
    * embeddings do far better at the same settings. Returns the same
    * schema as [[bruteForceTopK]].
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      bits: Int = 8,
      probeHamming: Int = 1,
      seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col("vec"))).first().getInt(0)
    val planes = hyperplanes(dim, bits, seed)
    val corpusB = corpus.withColumn("bucket", lshBucket(col("vec"), planes))
      .withColumn("__nv", norm(col("vec")))
    val probes = probeMasks(bits, probeHamming).map(lit)
    val queriesB = queries
      .withColumn("qbucket", lshBucket(col("qvec"), planes))
      .withColumn("__nq", norm(col("qvec")))
      .withColumn("bucket",
        explode(array_distinct(array(probes.map(p =>
          col("qbucket").bitwiseXOR(p)): _*))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    // the probe side is |queries|·|probe masks| rows — bounded by the
    // query set, never the corpus. Say so: the auto-broadcast estimate
    // derives from the filtered corpus scan and is arbitrarily wrong,
    // so at scale the planner otherwise shuffles the whole bucketed
    // corpus into an SMJ (r16 scale gate, measured at the 100× probe)
    corpusB.join(broadcast(queriesB), "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", cosinePrenormed(
        col("qvec"), col("vec"), col("__nq"), col("__nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Every mask over `bits` positions with at most `maxSetBits` bits
    * set — Σ C(bits, i) masks enumerated directly by choosing set-bit
    * positions. Filtering the full 2^bits space instead is quadratically
    * wasteful at bits=24 and pathological at bits≥32 (and overflows the
    * shift at 64); the probe COUNT itself stays the caller's
    * responsibility — it is the multi-probe fan-out, visible in the
    * plan as the explode width.
    */
  private[graft] def probeMasks(bits: Int, maxSetBits: Int): Seq[Long] = {
    require(bits >= 1 && bits <= 62, s"lsh bits out of range: $bits")
    val out = Seq.newBuilder[Long]
    def choose(fromPos: Int, remaining: Int, acc: Long): Unit = {
      out += acc
      if (remaining > 0) {
        var p = fromPos
        while (p < bits) {
          choose(p + 1, remaining - 1, acc | (1L << p))
          p += 1
        }
      }
    }
    choose(0, math.max(0, maxSetBits), 0L)
    out.result()
  }

  // ------------------------------------------------------------------ IVF

  /** Squared L2 distances to every centroid, as a tight primitive loop.
    * Deliberately a UDF closure rather than Column math: an expression
    * tree of `nlist × dim` literals makes Catalyst analysis/codegen the
    * bottleneck (measured: ~seconds per plan at nlist=8, dim=64), while a
    * scalar UDF keeps the plan tiny and the per-row cost a JVM loop.
    */
  private def centroidDists(
      centroids: Array[Array[Double]], v: Seq[Double]): Array[Double] = {
    val vec = v.toArray
    val out = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var s = 0.0
      var i = 0
      while (i < cent.length) {
        val d = vec(i) - cent(i)
        s += d * d
        i += 1
      }
      out(c) = s
      c += 1
    }
    out
  }

  /** Index of the nearest centroid (ties to the lower index). */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    udf { v: Seq[Double] =>
      val d = centroidDists(centroids, v)
      var best = 0
      var i = 1
      while (i < d.length) { if (d(i) < d(best)) best = i; i += 1 }
      best
    }.apply(vec)

  /** Gap between the nearest and second-nearest centroid (squared
    * euclidean — the metric [[nearestCentroid]] compares). A gap near 0
    * means reduction-order ulp drift in the centroid means could flip
    * the argmin between engines; `Verify`'s margin probe takes the min
    * over a corpus to certify the assignment is drift-stable
    * (see [[graft.pipeline.Dedup.semDedup]]'s replay caveat).
    */
  def centroidGap(vec: Column, centroids: Array[Array[Double]]): Column =
    udf { v: Seq[Double] =>
      val d = centroidDists(centroids, v).sorted
      if (d.length < 2) Double.PositiveInfinity else d(1) - d(0)
    }.apply(vec)

  /** The `nprobe` nearest centroid ids (ascending distance). */
  def probeCentroids(
      vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    udf { v: Seq[Double] =>
      centroidDists(centroids, v).zipWithIndex.sortBy(_._1)
        .take(nprobe).map(_._2)
    }.apply(vec)

  /** Lloyd k-means refinement from caller-supplied initial centroids.
    * Each step is fully distributed — assignment is a per-row argmin,
    * the mean reduction ships only `k × dim` partial sums to the driver
    * (the same driver-sized state the IVF probe expressions broadcast).
    * Empty clusters keep their previous centroid, so `k` never shrinks.
    */
  def lloyd(
      corpus: DataFrame, // (vec_id, vec: array<double>)
      init: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    var centroids = init
    for (_ <- 0 until iters) {
      val sums = corpus
        .select(nearestCentroid(col("vec"), centroids).as("cid"),
          posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone()) // empty lists keep their centroid
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      centroids = next
    }
    centroids
  }

  /** k-means-lite centroids for an IVF index: deterministic seeded init
    * (hash-ordered sample) + `iters` [[lloyd]] steps.
    */
  def ivfCentroids(
      corpus: DataFrame, // (vec_id, vec: array<double>)
      nlist: Int,
      iters: Int = 2,
      seed: Long = 42L): Array[Array[Double]] =
    lloyd(corpus,
      corpus
        .orderBy(xxhash64(col("vec_id"), lit(seed)))
        .limit(nlist)
        .select(col("vec"))
        .collect()
        .map(_.getSeq[Double](0).toArray),
      iters)

  /** Full k-means corpus clustering: deterministic init from the `k`
    * lowest `vec_id`s (externally replayable, unlike the seeded IVF
    * sample), `iters` [[lloyd]] refinement steps, then a final
    * assignment pass. Output `(vec_id, cluster)` — cluster ids are
    * init-order indices, ties to the lower id.
    *
    * Scale shape: every iteration is one shuffle keyed by
    * (cluster, position) whose output is `k × dim` rows — the driver
    * holds only centroid state, never corpus rows; assignment is a
    * per-row scalar loop at scan parallelism. The integer assignment
    * table is the stable surface for downstream joins (per-cluster
    * sampling, stratified mixing): distances are macroscopically
    * separated so last-ulp float divergence between engines never flips
    * an argmin, unlike hashing the float centroids themselves.
    */
  def kmeansAssign(
      corpus: DataFrame, // (vec_id, vec: array<double>)
      k: Int,
      iters: Int = 2): DataFrame = {
    val centroids = kmeansCentroids(corpus, k, iters)
    corpus.select(col("vec_id"),
      nearestCentroid(col("vec"), centroids).as("cluster"))
  }

  /** The trained centroids behind [[kmeansAssign]] (deterministic
    * lowest-`vec_id` init + `iters` Lloyd steps), exposed so callers
    * can reuse the model (assign new batches, probe assignment margins)
    * without retraining.
    */
  def kmeansCentroids(
      corpus: DataFrame, k: Int, iters: Int = 2): Array[Array[Double]] =
    lloyd(corpus,
      corpus
        .orderBy(col("vec_id"))
        .limit(k)
        .select(col("vec"))
        .collect()
        .map(_.getSeq[Double](0).toArray),
      iters)

  /** Clustering-quality scores against ground-truth labels: PURITY
    * (Σ per-cluster majority-label count / n) and the ADJUSTED RAND
    * INDEX — the two standard external evaluation measures for a
    * clustering run (k-means sanity gates, dedup-cluster audits).
    *
    * Everything except three final divisions is INTEGER arithmetic
    * (pair counts via x·(x−1) DIV 2 — integer division stays exact
    * where a double product would round past 2^53), so the scores
    * replay bit-identically in any engine; the divisions and the ARI
    * expectation term are single IEEE ops on identical operands, with
    * ROUND(6) on the output surface. The a·b product in ARI's
    * expectation is computed in DOUBLE deliberately: as integers it
    * overflows int64 near n ≈ 55k pairs-of-pairs, while the double
    * product is exact parity at any scale.
    *
    * Scale shape: one (cluster, label) contingency aggregate (map-side
    * combined, k×m rows), then scalar aggregates over that tiny table —
    * nothing downstream is O(rows). Returns one row:
    * (n, purity, ari).
    */
  def clusterAgreement(
      assigned: DataFrame, clusterCol: String, labelCol: String): DataFrame = {
    val cont = assigned
      .groupBy(col(clusterCol).as("c"), col(labelCol).as("l"))
      .agg(count(lit(1)).as("nij"))
      .cache()
    // x·(x−1) is even, so a right shift IS the exact integer halving
    // (Column./ would go through double and round past 2^53)
    def pairs(x: Column): Column = shiftright(x * (x - lit(1L)), 1)
    val sp = cont.agg(sum(pairs(col("nij"))).as("sp"),
      sum(col("nij")).as("n"))
    val ac = cont.groupBy(col("c")).agg(sum(col("nij")).as("ai"))
      .agg(sum(pairs(col("ai"))).as("a"))
    val bc = cont.groupBy(col("l")).agg(sum(col("nij")).as("bj"))
      .agg(sum(pairs(col("bj"))).as("b"))
    val pur = cont.groupBy(col("c")).agg(max(col("nij")).as("mx"))
      .agg(sum(col("mx")).as("pure"))
    val joined = sp.crossJoin(ac).crossJoin(bc).crossJoin(pur)
      .withColumn("total", pairs(col("n")))
      .withColumn("exp",
        col("a").cast("double") * col("b").cast("double") /
          col("total").cast("double"))
      // Degenerate-agreement guard: when max(index) == expected(index)
      // the general formula is 0/0. One cluster × one label (or any
      // split where chance explains everything it could) is PERFECT
      // agreement by convention → ARI = 1 (Hubert-Arabie).
      .withColumn("ari",
        when((col("a") + col("b")).cast("double") * lit(0.5) === col("exp"),
          lit(1.0))
          .otherwise((col("sp").cast("double") - col("exp")) /
            ((col("a") + col("b")).cast("double") * lit(0.5) - col("exp"))))
      .withColumn("purity",
        col("pure").cast("double") / col("n").cast("double"))
    PipelineCache.materialize(cont)(joined.select(col("n"),
      round(col("purity"), 6).as("purity"),
      round(col("ari"), 6).as("ari")))
  }

  /** IVF approximate top-k: corpus rows live in their nearest-centroid
    * list; each query probes its `nprobe` nearest lists. The join shuffles
    * on the centroid id — candidate count is ~`nprobe/nlist` of the corpus
    * per query instead of a full cross join, and the assignment/probing
    * expressions are codegen'd scalar math. Returns [[bruteForceTopK]]'s
    * schema.
    */
  def ivfTopK(
      queries: DataFrame, // (query_id, qvec)
      corpus: DataFrame, // (vec_id, vec)
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2,
      seed: Long = 42L): DataFrame =
    ivfTopKWith(queries, corpus, k,
      ivfCentroids(corpus, nlist, iters, seed), nprobe)

  /** [[ivfTopK]] with caller-supplied centroids — the index build and the
    * probe search are separable (a real deployment trains centroids once
    * and reuses them across queries; a correctness harness can pass
    * deterministic centroids recoverable by an external oracle).
    */
  def ivfTopKWith(
      queries: DataFrame, // (query_id, qvec)
      corpus: DataFrame, // (vec_id, vec)
      k: Int,
      centroids: Array[Array[Double]],
      nprobe: Int): DataFrame = {
    val corpusA = corpus
      .withColumn("cid", nearestCentroid(col("vec"), centroids))
      .withColumn("__nv", norm(col("vec")))
    val queriesA = queries
      .withColumn("__nq", norm(col("qvec")))
      .withColumn("cid",
        explode(probeCentroids(col("qvec"), centroids, nprobe)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    // probe side = |queries|·nprobe rows, bounded by the query set —
    // broadcast for the same reason as lshTopK (the estimate from the
    // filtered scan otherwise flips this to a corpus-wide SMJ at scale)
    corpusA.join(broadcast(queriesA), "cid")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", cosinePrenormed(
        col("qvec"), col("vec"), col("__nq"), col("__nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Product-quantization codebooks from the first `ksub` corpus
    * vectors (by id): subspace `s` of codeword `j` is the `s`-th
    * `dim/m` slice of the `j`-th vector. The deterministic-first-N
    * construction (the q40 IVF precedent) — an external oracle can
    * rebuild the codebooks from the data with a window rank, where
    * k-means-refined codebooks would need the full Lloyd unroll per
    * subspace. Production deployments pass [[lloyd]]-refined
    * codebooks through the same encode/search entry points.
    */
  def pqCodebooksFirstN(
      corpus: DataFrame, // (vec_id, vec: array<double>)
      m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 1, "m and ksub must be positive")
    val seed = corpus.orderBy(col("vec_id").asc).limit(ksub)
      .select(col("vec")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seed.length == ksub, s"need $ksub seed vectors")
    val dim = seed.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m)(s =>
      seed.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub)))
  }

  /** PQ encoding: per vector, the per-subspace nearest-codeword index
    * (squared euclidean, ties to the lower code — the
    * [[nearestCentroid]] contract per subspace). A 64-dim f64 vector
    * compresses to m bytes — 64× — which is the entire point at
    * 100 TB: the codes table rides in memory where the vectors never
    * could, and ADC search touches only codes.
    */
  def pqEncode(
      corpus: DataFrame, // (vec_id, vec)
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val codes = array((0 until m).map(s =>
      nearestCentroid(slice(col("vec"), s * dsub + 1, dsub),
        codebooks(s))): _*)
    corpus.select(col("vec_id"), codes.as("codes"))
  }

  /** Asymmetric-distance PQ top-k: per query, the per-subspace
    * distance table to every codeword is computed ONCE (driver-side —
    * queries×m×ksub entries, the bounded serving edge), broadcast as
    * a flat array, and each corpus vector's approximate distance is m
    * table lookups summed in explicit subspace order — a codegen'd
    * scan expression over the codes table; the full vectors are never
    * read at search time. Top-k per query via the rank window
    * (WindowGroupLimit, the [[bruteForceTopK]] shape).
    *
    * Replay: table entries are the same ascending-dimension
    * left-assoc squared-euclidean fold as [[nearestCentroid]], and
    * the ADC sum adds them in subspace order — every double is
    * bit-identical on any engine, so ordering AND the ROUND(6)
    * surface replay exactly.
    */
  def pqTopK(
      queries: DataFrame, // (query_id, qvec)
      corpus: DataFrame, // (vec_id, vec)
      codebooks: Array[Array[Array[Double]]],
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val ksub = codebooks.head.length
    val q = queries.select(col("query_id").cast("long"), col("qvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // per-query flattened (s, j) → squared-distance table, same fold
    // as centroidDists
    val qtab = q.map { case (qid, qv) =>
      val flat = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        val dsub = codebooks(s).head.length
        val sub = java.util.Arrays.copyOfRange(qv, s * dsub, (s + 1) * dsub)
        val d = centroidDists(codebooks(s), sub)
        System.arraycopy(d, 0, flat, s * ksub, ksub)
        s += 1
      }
      (qid, flat)
    }.toSeq
    val qdf = broadcast(spark.createDataset(qtab).toDF("query_id", "__tab"))
    val encoded = pqEncode(corpus, codebooks)
    val adc = (0 until m).map(s =>
      element_at(col("__tab"),
        lit(s * ksub) + element_at(col("codes"), s + 1) + lit(1)))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    encoded.crossJoin(qdf)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("adc"), 6).as("adc"))
  }

  /** The full PQ serving stack: ADC over the codes table winnows the
    * corpus to `k·overfetch` survivors per query, then the exact
    * squared-euclidean kernel re-ranks ONLY the survivors (reading a
    * corpus-fraction of full vectors — the [[quantizedRerankTopK]]
    * pattern at 64× compression instead of 8×). On isotropic vectors
    * — PQ's worst case — recall@5 measures ~0.55 at overfetch 10 vs
    * ~0.16 for raw ADC ranks, which is why no PQ deployment serves
    * ADC order directly.
    */
  def pqRerankTopK(
      queries: DataFrame, // (query_id, qvec)
      corpus: DataFrame, // (vec_id, vec)
      codebooks: Array[Array[Array[Double]]],
      k: Int,
      overfetch: Int = 10): DataFrame = {
    require(k >= 1 && overfetch >= 1, "k and overfetch must be >= 1")
    val survivors = pqTopK(queries, corpus, codebooks, k * overfetch)
      .select("query_id", "vec_id")
    val dim = codebooks.length * codebooks.head.head.length
    val sqdist = {
      // same ascending-dim fold as the driver kernel, as Column math —
      // aggregate() over zipped arrays would leave codegen; the
      // explicit per-dim unroll stays inside it
      val terms = (1 to dim).map { i =>
        val d = element_at(col("qvec"), i) - element_at(col("vec"), i)
        d * d
      }
      terms.reduce(_ + _)
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("vec_id").asc)
    corpus.join(broadcast(survivors), "vec_id")
      .join(broadcast(queries), "query_id")
      .withColumn("dist", sqdist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("dist"), 6).as("dist"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98): pick `k` results from the query's top-`topN` relevance
    * candidates, greedily maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — the standard
    * diversity-aware selection a retrieval stack runs after ANN (near-
    * duplicate hits crowd out coverage when k results all say the same
    * thing).
    *
    * The distributed part is the relevance pass — one corpus scan and a
    * TakeOrdered top-`topN` (exactly [[bruteForceTopK]]'s shape; swap
    * in the quantized or IVF pass upstream at scale). The greedy phase
    * is INHERENTLY sequential (each pick changes every remaining
    * score), so it runs on the driver over the topN-bounded candidate
    * set — the IVF-centroid precedent, never O(corpus).
    *
    * Engine replay: all cosines QUANTIZE to integer micro-units
    * (`round(cos·1e6)`, the q68 BIGINT-micro-units precedent) before
    * any comparison, so the greedy argmax chain is integer/fixed-point
    * arithmetic an external oracle replays exactly — no float-argmax
    * drift. With the default λ=0.5 every score is a half-integer. The
    * driver fold mirrors the `vec_dot` kernel's sequential index-order
    * dot and Spark's HALF_UP rounding bit-for-bit.
    *
    * @return (rank, vec_id, rel_u, mmr_u): rank 1..k in pick order,
    *         relevance and MMR score in cosine micro-units
    */
  def mmrRerank(
      corpus: DataFrame, // (vec_id, vec: array<double>)
      queryVec: Array[Double],
      lambdaRel: Double = 0.5,
      topN: Int = 20,
      k: Int = 5): DataFrame = {
    require(k >= 1 && topN >= k, "need topN >= k >= 1")
    require(lambdaRel >= 0.0 && lambdaRel <= 1.0, "lambda in [0,1]")
    val spark = corpus.sparkSession
    import spark.implicits._
    def quantize(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong
    // same expression shape as the cosine() Column kernel, sequential
    // index-order fold like vec_dot
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cand = mmrCandidates(corpus, queryVec, topN)
      .collect() // bounded by topN — the IVF-centroid serving edge
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    val n = cand.length
    val simq = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 0L else quantize(cos(cand(i)._2, cand(j)._2))
    }
    runGreedy(cand, simq, lambdaRel, k, spark)
  }

  /** The distributed relevance pass of [[mmrRerank]]: quantized cosine
    * to the query, top-`topN` by (relq desc, id) — plans
    * `TakeOrderedAndProject` (per-partition heaps + a topN-row driver
    * merge), never a total sort. Exposed for plan pinning.
    */
  private[graft] def mmrCandidates(
      corpus: DataFrame, queryVec: Array[Double], topN: Int): DataFrame = {
    val qlit = array(queryVec.map(lit): _*)
    corpus
      .select(col("vec_id").cast("long").as("id"), col("vec"),
        round(cosine(col("vec"), qlit) * lit(1e6)).cast("long").as("relq"))
      .orderBy(col("relq").desc, col("id").asc)
      .limit(topN)
  }

  private def runGreedy(
      cand: Array[(Long, Array[Double], Long)],
      simq: Array[Array[Long]],
      lambdaRel: Double,
      k: Int,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val n = cand.length
    val comp = 1.0 - lambdaRel // computed complement (IEEE lesson)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    while (picks.length < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!selected.contains(i)) {
          val maxSim =
            if (selected.isEmpty) 0L
            else selected.iterator.map(s => simq(i)(s)).max
          val sc = lambdaRel * cand(i)._3 - comp * maxSim
          if (sc > bestScore ||
              (sc == bestScore && best >= 0 && cand(i)._1 < cand(best)._1)) {
            best = i; bestScore = sc
          }
        }
        i += 1
      }
      selected += best
      picks += ((picks.length + 1L, cand(best)._1, cand(best)._3, bestScore))
    }
    spark.createDataset(picks.toSeq)
      .toDF("rank", "vec_id", "rel_u", "mmr_u")
  }

  /** Embedding near-duplicate pairs above a cosine threshold, LSH-bucketed
    * with verification (the embedding-cosine member of the dedup family).
    * `bits=0` degenerates to one bucket — the exact all-pairs variant
    * (use only when the corpus fits a single join partition; the bucketed
    * form is the scale path, trading recall for candidate count).
    */
  /** Exact all-pairs cosine (the bits=0 contract bounds the corpus to
    * broadcast size). An equi-join on the constant bucket key would
    * collapse to one shuffle partition AND pay the per-pair UDF
    * array-conversion tax (~µs/pair); this kernel broadcasts the corpus
    * as primitive arrays once and loops pairs partition-parallel with a
    * fused dot (~ns/pair). FP identical to the join path: same
    * left-to-right dot fold, same dot/(na*nb) expression shape.
    * Requires an integral `vec_id` (the embeddings contract).
    */
  /** Ceiling on the bits=0 all-pairs corpus: above this the collect
    * would endanger the driver heap (2×10⁵ × dim-64 doubles ≈ 100 MB)
    * and the LSH-bucketed path (bits>0) is strictly the right tool.
    * Env-tunable for bigger drivers (GRAFT_ALLPAIRS_MAX); the system
    * property of the same name wins (test hook). Read per-call so a
    * long-lived session sees updates. */
  private[graft] def allPairsMax: Long =
    sys.props.get("GRAFT_ALLPAIRS_MAX")
      .orElse(sys.env.get("GRAFT_ALLPAIRS_MAX"))
      .map(_.toLong).getOrElse(200000L)

  private def cosineAllPairsKernel(vectors: DataFrame, tau: Double): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val ds = vectors
      .select(col("vec_id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
    // census before collect — fail FAST (one cheap count) instead of
    // OOMing the driver; the autoJoin census discipline applied to the
    // bits=0 small-corpus contract
    val n = ds.count()
    require(n <= allPairsMax,
      s"cosineNearDupPairs(bits=0) is the exact all-pairs kernel and " +
        s"collects the corpus to the driver; corpus has $n vectors > " +
        s"ceiling $allPairsMax. Use bits>0 (LSH-bucketed scale path) " +
        s"or raise GRAFT_ALLPAIRS_MAX.")
    val all = ds.collect()
    val ids = all.map(_._1)
    val vecs = all.map(_._2)
    val norms = vecs.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    ds.repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val (ids, vecs, norms) = bc.value
        it.flatMap { case (ida, va) =>
          var sa = 0.0; var i = 0
          while (i < va.length) { sa += va(i) * va(i); i += 1 }
          val na = math.sqrt(sa)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var j = 0
          while (j < ids.length) {
            if (ids(j) > ida) {
              val vb = vecs(j)
              var s = 0.0; var k = 0
              val n = math.min(va.length, vb.length)
              while (k < n) { s += va(k) * vb(k); k += 1 }
              val c = s / (na * norms(j))
              if (c >= tau) out += ((ida, ids(j), c))
            }
            j += 1
          }
          out
        }
      }
      .toDF("id_a", "id_b", "cosine")
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) — the standard
    * hybrid-retrieval combiner: given N ranked candidate lists per
    * query (an exact pass, a quantized pass, a lexical pass…), score
    * each candidate Σᵢ 1/(c + rankᵢ) over the rankers that returned it
    * and re-rank. Rank positions beat raw scores for fusion because
    * they need no cross-ranker score calibration.
    *
    * Exactness: each term is one IEEE division of exact integers, terms
    * add in EXPLICIT ranker-argument order (left-assoc — never a
    * data-ordered float SUM), and absent rankers contribute a literal
    * 0.0 — the fused score replays bit-identically on any engine. Final
    * ties break on the item id.
    *
    * Scale shape: every input is already top-k-bounded per query
    * (k·|queries| rows), so the fusion is full-outer joins + a window
    * over candidate-sized tables — the upstream rankers own the
    * corpus-scale work.
    */
  def rrfFuse(
      rankings: Seq[DataFrame], // each (query_id, vec_id, rank)
      c: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.size >= 2, "fusing fewer than two rankers is a rename")
    require(c >= 1 && topK >= 1, "need c >= 1, topK >= 1")
    val terms = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("vec_id"), col("rank").as(s"__r$i"))
    }
    val joined = terms.reduce(
      (a, b) => a.join(b, Seq("query_id", "vec_id"), "full"))
    val score = terms.indices
      .map(i => coalesce(
        lit(1.0) / (lit(c.toLong) + col(s"__r$i")).cast("double"),
        lit(0.0)))
      .reduce(_ + _) // left-assoc: explicit ranker order, not data order
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("vec_id").asc)
    joined
      .withColumn("rrf_score", score)
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
      .select("query_id", "fused_rank", "vec_id", "rrf_score")
  }

  def cosineNearDupPairs(
      vectors: DataFrame, // (vec_id, vec)
      tau: Double,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    if (bits == 0) return cosineAllPairsKernel(vectors, tau)
    val dim = vectors.select(size(col("vec"))).first().getInt(0)
    val b = vectors
      .withColumn("bucket", lshBucket(col("vec"), hyperplanes(dim, bits, seed)))
      .withColumn("__n", norm(col("vec")))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", cosinePrenormed(
        col("a.vec"), col("b.vec"), col("a.__n"), col("b.__n")))
      .filter(col("cosine") >= tau)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("cosine"))
  }

  /** Per-vector label margin: squared distance to the OWN label
    * centroid minus the nearest OTHER centroid — negative margin flags
    * likely mislabeled samples, tiny positive margins flag boundary
    * cases. The per-sample companion to [[labelCentroidSimilarity]].
    *
    * Exactness: with µ-unit integer coordinates and centroid SUMS
    * (c = S/n), d² expands to Σx² − 2(Σx·S)/n + (ΣS²)/n² — every Σ is
    * an exact integer/DECIMAL aggregate (order-free), and d² is a
    * fixed IEEE shape, so cross-label argmin replays exactly. The
    * per-(vector, label) inner-product table is the only data-scale
    * join (dims × |labels| fan-out, linear in vectors).
    *
    * Output: (vec_id, label, d2_own, d2_other, margin) in original
    * units², ROUND(6).
    */
  def labelMargin(
      vectors: DataFrame // (vec_id, label, vec)
  ): DataFrame = {
    val dims = vectors
      .select(col("vec_id"), col("label"),
        posexplode(col("vec").cast("array<double>")))
      .select(col("vec_id"), col("label"), col("pos").as("dim"),
        floor(col("col") * 1e6).cast("long").as("__q"))
    val cent = dims.groupBy(col("label").as("__cl"), col("dim"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__q").cast("decimal(38,0)")).as("__s"))
    val centStats = cent.groupBy(col("__cl"))
      .agg(max(col("__n")).as("__nc"),
        sum(col("__s") * col("__s")).cast("double").as("__s2"))
    val x2 = dims.groupBy(col("vec_id"))
      .agg(sum((col("__q") * col("__q")).cast("decimal(38,0)"))
        .cast("double").as("__x2"))
    val inner = dims.join(cent, "dim")
      .groupBy(col("vec_id"), col("label"), col("__cl"))
      .agg(sum(col("__q").cast("decimal(19,0)") * col("__s"))
        .cast("double").as("__a"))
    val d2 = inner
      .join(broadcast(centStats), "__cl")
      .join(x2, "vec_id")
      .withColumn("__d2", expr(
        "(__x2 - 2.0 * __a / CAST(__nc AS DOUBLE)" +
          " + __s2 / (CAST(__nc AS DOUBLE) * CAST(__nc AS DOUBLE)))" +
          " / 1e12"))
    val own = d2.filter(col("__cl") === col("label"))
      .select(col("vec_id"), col("label"), col("__d2").as("__down"))
    val other = d2.filter(col("__cl") =!= col("label"))
      .groupBy(col("vec_id")).agg(min(col("__d2")).as("__doth"))
    own.join(other, "vec_id")
      .select(col("vec_id"), col("label"),
        round(col("__down"), 6).as("d2_own"),
        round(col("__doth"), 6).as("d2_other"),
        round(col("__doth") - col("__down"), 6).as("margin"))
  }

  /** Per-label dimension sums of µ-unit-quantized embeddings — the
    * shared exact kernel of [[labelCentroidSimilarity]] and
    * [[labelDispersion]]. Quantizing each coordinate to
    * floor(x·1e6) makes every downstream sum an exact integer
    * (DECIMAL-accumulated), so centroid geometry is reduction-order
    * free and replays bit-for-bit in an external engine. One shuffle
    * keyed by (label, dim); the result is |labels|·dim rows.
    */
  private def labelDimSums(vectors: DataFrame): DataFrame =
    vectors
      .select(col("label"), posexplode(col("vec").cast("array<double>")))
      .select(col("label"), col("pos").as("dim"),
        floor(col("col") * 1e6).cast("long").as("__q"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__q").cast("decimal(38,0)")).as("__s"),
        sum((col("__q") * col("__q")).cast("decimal(38,0)")).as("__sq"))

  /** Pairwise cosine similarity between label centroids — the
    * label-taxonomy diagnostic (which classes overlap in embedding
    * space) run before stratifying or balancing on a label column.
    * Cosine is scale-invariant, so the per-label dimension SUMS stand
    * in for the means and the whole computation stays exact-integer
    * until three final IEEE ops. Pair join runs on the
    * |labels|·dim-bounded sum table, never on vectors.
    *
    * Output: (label_a, label_b, n_a, n_b, cosine) upper triangle.
    */
  def labelCentroidSimilarity(
      vectors: DataFrame // (label, vec)
  ): DataFrame = {
    val sums = labelDimSums(vectors)
    val a = sums.select(col("label").as("label_a"), col("dim"),
      col("__n").as("__na"), col("__s").as("__sa"))
    val b = sums.select(col("label").as("label_b"), col("dim"),
      col("__n").as("__nb"), col("__s").as("__sb"))
    a.join(b, Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("__sa") * col("__sb")).cast("double").as("__ab"),
        sum(col("__sa") * col("__sa")).cast("double").as("__aa"),
        sum(col("__sb") * col("__sb")).cast("double").as("__bb"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(col("__ab") / (sqrt(col("__aa")) * sqrt(col("__bb"))), 6)
          .as("cosine"))
  }

  /** Per-label embedding dispersion: root-mean-square distance of a
    * label's vectors to their centroid, via the identity
    * Σ|x−c|²/n = Σ|x|²/n − |Σx|²/n² — no second pass over the
    * vectors, everything from the same exact per-dimension sums.
    * Reported in original embedding units (÷10⁶), ROUND(6).
    *
    * Output: (label, n, rms_dispersion).
    */
  def labelDispersion(
      vectors: DataFrame // (label, vec)
  ): DataFrame = {
    labelDimSums(vectors)
      .groupBy(col("label"))
      .agg(max(col("__n")).as("n"),
        sum(col("__sq")).cast("double").as("__ssq"),
        sum(col("__s") * col("__s")).cast("double").as("__s2"))
      .select(col("label"), col("n"),
        round(sqrt(col("__ssq") / col("n").cast("double") -
            col("__s2") / (col("n").cast("double") *
              col("n").cast("double"))) / 1e6, 6)
          .as("rms_dispersion"))
  }

  /** Centroid drift between two corpus snapshots (vec_id parity as
    * the A/B surrogate): per label, the L1 distance between snapshot
    * centroids — the embedding-space companion to the q117/q130
    * tabular drift monitors (did a re-embed or data refresh move a
    * class?). Computed WITHOUT dividing first: delta_d = S^A_d·n_B −
    * S^B_d·n_A is exact in int64 (µ-unit dimension sums × counts), so
    * Σ_d|delta_d| stays an exact integer < 2⁵³ and converts exactly
    * to double; the normalized drift pays ONE IEEE division. L1 over
    * L2 is deliberate: L2 would need Σ delta² in int128, whose
    * →double cast double-rounds on some engines (the q180 lesson) —
    * L1 keeps the whole compare surface in the exactly-convertible
    * range. One (label, dim)-keyed shuffle; the drift table is
    * |labels| rows.
    */
  def centroidDrift(
      vectors: DataFrame // (vec_id, label, vec)
  ): DataFrame = {
    val sums = vectors
      .select(col("label"), (col("vec_id") % 2 === 0).as("__even"),
        posexplode(col("vec").cast("array<double>")))
      .select(col("label"), col("__even"), col("pos").as("dim"),
        floor(col("col") * 1e6).cast("long").as("__q"))
      .groupBy(col("label"), col("dim"))
      .agg(
        coalesce(sum(when(col("__even"), col("__q"))), lit(0L))
          .cast("long").as("__sa"),
        count(when(col("__even"), lit(1))).as("__na"),
        coalesce(sum(when(!col("__even"), col("__q"))), lit(0L))
          .cast("long").as("__sb"),
        count(when(!col("__even"), lit(1))).as("__nb"))
      .filter(col("__na") > 0 && col("__nb") > 0)
    sums.groupBy(col("label"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(abs(col("__sa") * col("__nb") - col("__sb") * col("__na")))
          .cast("long").as("l1_mu"))
      .select(col("label"), col("n_a"), col("n_b"), col("l1_mu"),
        (col("l1_mu").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double") *
            lit(1000000.0))).as("l1_drift"))
      .orderBy("label")
  }

  /** Hard-negative mining for contrastive training: per anchor, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the
    * negatives that actually move a contrastive loss (similar but
    * wrong-class). Same broadcast-anchor shape as [[bruteForceTopK]]
    * (anchors are a bounded working set, the corpus streams map-side,
    * one shuffle for the per-anchor window); the label exclusion is a
    * scan-stage predicate, zero extra cost. At corpus scale the
    * LSH/IVF first pass bounds the candidate set and this kernel is
    * the exact scorer over it.
    */
  def hardNegatives(
      anchors: DataFrame, // (query_id, qlabel, qvec: array<double>)
      corpus: DataFrame, // (vec_id, label, vec: array<double>)
      k: Int): DataFrame = {
    val joined = corpus.withColumn("__nv", norm(col("vec")))
      .crossJoin(broadcast(anchors.withColumn("__nq", norm(col("qvec")))))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cosine", cosinePrenormed(
        col("qvec"), col("vec"), col("__nq"), col("__nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "label", "cosine")
  }

  /** Int8 affine-quantization calibration (the per-tensor/per-channel
    * scale computation every PTQ toolchain runs before serving): per
    * dimension, min, max, and the affine scale (max−min)/255. One
    * generate (posexplode — no shuffle) feeding a d-group hash
    * aggregate with map-side combine: the shuffle carries d rows per
    * task regardless of corpus size. min/max are exact value
    * selections; the scale is the single IEEE division of two exact
    * doubles, so the surface replays on any engine.
    */
  def quantCalibration(vectors: DataFrame, vecCol: String): DataFrame =
    vectors
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("__pos", "__v")))
      .groupBy((col("__pos") + 1).as("dim"))
      .agg(min(col("__v")).as("vmin"), max(col("__v")).as("vmax"))
      .select(col("dim").cast("int").as("dim"), col("vmin"), col("vmax"),
        ((col("vmax") - col("vmin")) / lit(255.0)).as("scale"))
      .orderBy("dim")

  /** Gram matrix Xᵀ X over an embedding column — the one-pass input to
    * covariance/PCA-whitening decisions. Components quantize to
    * integer µ-units (FLOOR(v·u) — exact and engine-portable), so
    * every accumulated product is an exact long and the result is
    * order-free: a typed [[GramAggregator]] keeps ONE primitive
    * d(d+1)/2 upper-triangle buffer per task (map-side partial
    * aggregation — the `treeAggregate` shape), merging to a single
    * row; the only shuffle is numPartitions buffers of 8·d²/2 bytes.
    * The naive alternative (explode to (i,j,xᵢxⱼ) and groupBy) would
    * shuffle N·d²/2 rows — 2×10¹³ at 100 TB — this shuffles ~10⁴.
    *
    * Magnitude contract (same family as Profiler.microUnits): needs
    * N·(u·max|v|)² < 2⁶³ — at u=10⁶, |v|≤3, that is N ≤ 10⁵ rows per
    * FULL corpus... per accumulated sum; for larger corpora pass a
    * coarser `unitsPerValue` (u=10³ lifts the bound by 10⁶×).
    */
  def gramMatrix(
      vectors: DataFrame,
      vecCol: String,
      unitsPerValue: Long = 1000000L): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val dim = vectors.select(size_(col(vecCol))).first().getInt(0)
    val quantized = vectors
      .select(transform(col(vecCol).cast("array<double>"),
        v => floor(v * lit(unitsPerValue.toDouble)).cast("long")).as("q"))
      .as[Array[Long]]
    val g = new GramAggregator(dim)
    val flat = quantized.select(g.toColumn).toDF("g")
    // linear upper-triangle index -> (i, j), joined back as a bounded
    // d²/2-row broadcast (plan-time constant, never data-dependent)
    val mapping = (for {
      i <- 0 until dim
      j <- i until dim
    } yield (i * dim - i * (i - 1) / 2 + (j - i), i, j))
      .toDF("idx", "i", "j")
    flat
      .select(posexplode(col("g")).as(Seq("idx", "gram_mu2")))
      .join(broadcast(mapping), Seq("idx"))
      .select(col("i"), col("j"), col("gram_mu2"),
        (col("gram_mu2").cast("double") /
          lit(unitsPerValue.toDouble * unitsPerValue.toDouble))
          .as("gram"))
      .orderBy("i", "j")
  }

  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)

  /** Linear CKA (centered-kernel-alignment with linear kernels, the
    * UNcentered HSIC form) between two paired representation
    * matrices: CKA = ‖XᵀY‖²F / (‖XᵀX‖F·‖XᵀY... ‖YᵀY‖F) — the
    * standard "do these two embedding snapshots encode the same
    * geometry" similarity (Kornblith et al. 2019). Pairs here are
    * (vec, its id+1 successor) capped by `maxId` — an audit set, not
    * a corpus sweep.
    *
    * Exactness: vectors µ-quantize to exact integers; every
    * cross-covariance entry is an exact integer sum (posexplode ×2,
    * one (i, j)-keyed aggregate); Frobenius accumulations square in
    * cast-first DECIMAL; the final ratio is one IEEE shape over
    * wide-int→double casts (the established correctly-rounded
    * surface), ROUND(6).
    *
    * Scale shape: the entry table is |pairs|·d² rows before its one
    * aggregate — bounded by the audit cap, never corpus-sized.
    */
  def linearCka(
      embeddings: DataFrame, maxId: Long = 200L,
      unitsPerValue: Double = 1e6): DataFrame = {
    val vq = expr(s"transform(vec, x -> CAST(floor(x * " +
      s"${unitsPerValue}D) AS BIGINT))")
    val base = embeddings.filter(col("vec_id") < maxId)
      .select(col("vec_id"), vq.as("__vq"))
    val a = base.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("__pid"), col("__vq").as("__va"))
    val b = base.filter(col("vec_id") % 2 === 1)
      .select((col("vec_id") - 1).as("__pid"),
        col("__vq").as("__vb"))
    val paired = a.join(b, "__pid")
    val entries = paired
      .select(col("__pid"),
        posexplode(col("__va")).as(Seq("__i", "__ai")),
        col("__vb"))
      .select(col("__pid"), col("__i"), col("__ai"),
        posexplode(col("__vb")).as(Seq("__j", "__bj")))
    val cEntries = entries.groupBy(col("__i"), col("__j"))
      .agg(sum(col("__ai") * col("__bj")).cast("decimal(38,0)")
        .as("__c"))
    val c2 = cEntries.agg(
      sum(col("__c").cast("decimal(19,0)") * col("__c"))
        .cast("double").as("__c2"))
    def selfF(side: DataFrame, vcol: String): DataFrame = {
      val e = side
        .select(posexplode(col(vcol)).as(Seq("__i", "__xi")),
          col(vcol).as("__v2"))
        .select(col("__i"), col("__xi"),
          posexplode(col("__v2")).as(Seq("__j", "__xj")))
      e.groupBy(col("__i"), col("__j"))
        .agg(sum(col("__xi") * col("__xj")).cast("decimal(38,0)")
          .as("__g"))
        .agg(sum(col("__g").cast("decimal(19,0)") * col("__g"))
          .cast("double").as("__f2"))
    }
    val a2 = selfF(paired.select(col("__va")), "__va")
      .withColumnRenamed("__f2", "__a2")
    val b2 = selfF(paired.select(col("__vb")), "__vb")
      .withColumnRenamed("__f2", "__b2")
    val nPairs = paired.agg(count(lit(1)).as("n_pairs"))
    broadcast(nPairs).crossJoin(broadcast(c2))
      .crossJoin(broadcast(a2)).crossJoin(broadcast(b2))
      .select(col("n_pairs"),
        round(col("__c2") / (sqrt(col("__a2")) * sqrt(col("__b2"))),
          6).as("cka"))
  }

  /** Johnson–Lindenstrauss distortion audit: project the embeddings
    * onto `k` seeded Gaussian directions and report how pairwise
    * squared distances survive — the empirical check behind every
    * "can I train on the 16-dim projection" decision. Distortion of
    * a pair = ‖RΔx‖²/(k·‖Δx‖²) (≈1 when JL holds).
    *
    * Exactness: vectors AND planes are µ-quantized to exact integers,
    * so each projected coordinate is an exact-integer dot (products
    * ≤ 2⁵³ in double — fold-order-free); coordinate deltas square in
    * cast-first DECIMAL (they exceed 2⁵³); the ratio is ONE fixed
    * IEEE shape; per-pair ratios DECIMAL(28,12)-quantize before the
    * order-free mean. Pairs are bounded by contract (`maxId` caps the
    * audit set — an audit, not a corpus sweep).
    *
    * Scale shape: the projection is a scan-stage expression over
    * literal planes; the pair stage is an id<id self-join of the
    * capped audit set.
    */
  def jlDistortion(
      embeddings: DataFrame, k: Int = 16, maxId: Long = 30L,
      seed: Long = 7L, unitsPerValue: Double = 1e6): DataFrame = {
    require(k >= 1 && maxId >= 2, "need k >= 1 and at least one pair")
    val dim = 64
    val planesQ: Array[Array[Long]] = hyperplanes(dim, k, seed)
      .map(_.map(x => math.floor(x * unitsPerValue).toLong))
    val vq = expr(s"transform(vec, x -> CAST(floor(x * " +
      s"${unitsPerValue}D) AS BIGINT))")
    val base = embeddings
      .filter(col("vec_id") < maxId)
      .select(col("vec_id"), vq.as("__vq"))
    val projCols = planesQ.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      aggregate(zip_with(col("__vq"), planeCol, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as(s"__y$i")
    }
    val proj = base.select(
      (col("vec_id") +: projCols.toSeq) :+ col("__vq"): _*)
    val a = proj.columns.foldLeft(proj)((df, c) =>
      df.withColumnRenamed(c, s"a_$c"))
    val b = proj.columns.foldLeft(proj)((df, c) =>
      df.withColumnRenamed(c, s"b_$c"))
    // broadcast the right side: both sides are ≤ maxId rows, but they
    // ride the full scan's partitioning, so a plain cartesian planned
    // |parts|² tasks (1025 at the 100× probe) each re-reading a scan
    // block — the broadcast nested-loop streams the left side once
    val pairs = a.crossJoin(broadcast(b))
      .filter(col("a_vec_id") < col("b_vec_id"))
    val sqY = (0 until k).map { i =>
      val d = col(s"a___y$i") - col(s"b___y$i")
      d.cast("decimal(19,0)") * d
    }.reduce(_ + _)
    val sqX = aggregate(
      zip_with(col("a___vq"), col("b___vq"), (x, y) => {
        val d = x - y
        d * d
      }), lit(0L), (acc, x) => acc + x)
    // sqY carries the planes' µ² scale on top of sqX's — the
    // denominator folds k·units² in as ONE exact constant
    val ratio = sqY.cast("double") /
      (lit(k.toDouble * unitsPerValue * unitsPerValue) *
        sqX.cast("double"))
    pairs
      .select(ratio.cast("decimal(28,12)").as("__r"))
      .agg(count(lit(1)).as("n_pairs"),
        round(min(col("__r")).cast("double"), 6).as("min_distortion"),
        round(max(col("__r")).cast("double"), 6).as("max_distortion"),
        round(sum(col("__r")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_distortion"))
  }
}

/** Upper-triangle Gram accumulator: primitive long buffer, O(d²)
  * tight loop per row, associative exact-integer merge. See
  * [[Similarity.gramMatrix]] for the magnitude contract.
  */
class GramAggregator(dim: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      Array[Long], Array[Long], Array[Long]] {
  private val len = dim * (dim + 1) / 2
  def zero: Array[Long] = new Array[Long](len)
  def reduce(b: Array[Long], x: Array[Long]): Array[Long] = {
    require(x.length == dim,
      s"gramMatrix: expected dim=$dim, row has ${x.length}")
    var idx = 0
    var i = 0
    while (i < dim) {
      val xi = x(i)
      var j = i
      while (j < dim) { b(idx) += xi * x(j); idx += 1; j += 1 }
      i += 1
    }
    b
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }
  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
