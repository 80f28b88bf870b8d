package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`): brute-force
  * cosine top-k baseline + seeded random-hyperplane LSH for the scale path.
  * All vector math is `zip_with`/`aggregate` Column expressions in double
  * precision — codegen'd, no UDFs.
  */
object Similarity {

  /** Sequential left-to-right dot product (deterministic fp order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", cosine(col("qvec"), col("vec")))
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
    val probes = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeHamming)
      .map(lit)
    val queriesB = queries
      .withColumn("qbucket", lshBucket(col("qvec"), planes))
      .withColumn("bucket",
        explode(array_distinct(array(probes.map(p =>
          col("qbucket").bitwiseXOR(p)): _*))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    corpusB.join(queriesB, "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", cosine(col("qvec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Embedding near-duplicate pairs above a cosine threshold, LSH-bucketed
    * with verification (the embedding-cosine member of the dedup family).
    */
  def cosineNearDupPairs(
      vectors: DataFrame, // (vec_id, vec)
      tau: Double,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val dim = vectors.select(size(col("vec"))).first().getInt(0)
    val planes = hyperplanes(dim, bits, seed)
    val b = vectors.withColumn("bucket", lshBucket(col("vec"), planes))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", cosine(col("a.vec"), col("b.vec")))
      .filter(col("cosine") >= tau)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("cosine"))
  }
}
