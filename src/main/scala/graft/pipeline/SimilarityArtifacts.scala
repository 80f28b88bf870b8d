package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Shared embedding-model artifacts — the [[DedupArtifacts]] idea
  * applied to the k-means family: the deterministic Lloyd model over a
  * corpus at a given (k, iters) is identical for every consumer
  * (cluster listing, balanced per-cluster sampling, external
  * validation, …), yet each one repaid the full training — `iters`
  * corpus-wide (cluster, position) shuffles with a driver collect each
  * — plus the assignment scan. Train once per (corpus
  * fingerprint, k, iters) and serve the integer assignment table from
  * [[ArtifactWarehouse]] parquet (one int per vector) — the persisted
  * cluster-assignment column a vector pipeline maintains next to its
  * embeddings, surviving the session; the assignment values are layout-independent integers
  * (argmin over macroscopically-separated distances), so serving the
  * cached table is bit-identical to retraining.
  */
object SimilarityArtifacts {

  /** [[Similarity.kmeansAssign]] of `corpus`, materialized once per
    * (session, corpusKey, k, iters). Output: (vec_id, cluster).
    * `corpusKey` IDENTIFIES the corpus (e.g. its directory) — callers
    * passing a filtered/derived frame must use a distinct key, or they
    * are served the artifact of whichever frame arrived first.
    */
  def kmeansAssignments(
      corpus: DataFrame, k: Int, iters: Int,
      corpusKey: String): DataFrame = {
    val fp = ArtifactWarehouse.fingerprint(corpus,
      s"kmeans|$corpusKey|$k|$iters")
    ArtifactWarehouse.plain(corpus.sparkSession, "kmeans_assign", fp) {
      Similarity.kmeansAssign(corpus, k, iters)
    }
  }
}
