package graft

import org.apache.spark.sql.SparkSession

/** CI-resident layout-invariance sweep (r11 verdict item #5): the
  * round-11 certification — the full registry bit-identical at
  * local[4]/[7]/[32] × three SFs — was a one-off probe; this spec
  * keeps a reduced version in `sbt test` so a future data-ordered
  * float reduction is caught at commit time, not at round close.
  *
  * Sixteen layout-SENSITIVE queries (every float-aggregate family:
  * NLL/DSIR scorers, regr/χ²/entropy/JSD/RBO/Wasserstein statistics,
  * PSI/quantile/Spearman profiling, TF-IDF/BM25 ranking, Gini,
  * Chao1) run under two deliberately different physical layouts —
  * shuffle partition counts 3 vs 7, plus a split-forcing
  * maxPartitionBytes on the second — and every cell must match
  * BIT-exactly (string render distinguishes -0.0/0.0 and NaN, so
  * ulp drift from a reordered float reduction fails loudly).
  *
  * Engine-parity discipline makes this pass by construction: scorers
  * either quantize per-term contributions before order-free sums,
  * pivot literal-keyed cells, or round a provably-stable shape — the
  * sweep is the regression net over exactly that discipline.
  */
class LayoutInvarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val queries = Seq(
    "q78_unigram_nll", "q100_bigram_nll", "q108_tfidf_keywords",
    "q115_quantile_profile", "q119_zipf_fit", "q128_categorical_profile",
    "q130_psi_drift", "q135_bm25", "q147_dsir_scores",
    "q176_pmi_collocations", "q182_chi_square", "q197_spearman",
    "q203_gini", "q205_entropy_rate", "q309_wasserstein", "q329_chao1")

  private def layoutSession(shufflePartitions: Int,
      maxPartitionBytes: Option[Long]): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
    maxPartitionBytes.foreach(b =>
      s.conf.set("spark.sql.files.maxPartitionBytes", b))
    s
  }

  private def render(s: SparkSession, name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(s, sf)
    val out = df.collect().toSeq
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i)))
        .mkString("\u0001"))
      .sorted
    graft.pipeline.PipelineCache.free(df)
    out
  }

  test("16 layout-sensitive queries are bit-identical under two " +
    "physical layouts (shuffle 3 vs 7 + forced scan splits)") {
    val a = layoutSession(3, None)
    val b = layoutSession(7, Some(256L * 1024))
    val bad = queries.flatMap { name =>
      val (ra, rb) = (render(a, name), render(b, name))
      if (ra == rb) None
      else {
        val firstDiff = ra.zipAll(rb, "<missing>", "<missing>")
          .find { case (x, y) => x != y }
        Some(s"$name: ${ra.size}/${rb.size} rows; first diff $firstDiff")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
