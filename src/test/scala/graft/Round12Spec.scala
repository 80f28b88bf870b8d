package graft

import graft.pipeline.{Dedup, DedupArtifacts}
import org.apache.spark.sql.functions._

/** Round-12 additions: the shared persisted dedup artifact and its
  * pre-bucketed connected-components consumer.
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("connectedComponentsPreBucketed ≡ connectedComponents on the " +
    "documents corpus") {
    val docs = Tables.documents(spark, sf)
    val viaEdges = Dedup.nearDupClusters(docs, "doc_id", "text", 3, 0.5)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaArtifact = Dedup.nearDupClustersShared(
        docs, "doc_id", "text", 3, 0.5, corpusKey = sf)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaArtifact.toSeq == viaEdges.toSeq)
    assert(viaArtifact.nonEmpty)
  }

  test("symEdgeTable is built once per (session, corpus, params) and " +
    "carries both edge directions plus self-loops") {
    val docs = Tables.documents(spark, sf)
    val a = DedupArtifacts.symEdgeTable(docs, "doc_id", "text", 3, 0.5, sf)
    val b = DedupArtifacts.symEdgeTable(docs, "doc_id", "text", 3, 0.5, sf)
    // same cached plan object — the construction ran once
    assert(a eq b)
    val rows = a.collect().map(r => (r.getLong(0), r.getLong(1)))
    val loops = rows.filter(r => r._1 == r._2).map(_._1).toSet
    val edges = rows.filter(r => r._1 != r._2)
    // symmetric: every (s,d) has (d,s)
    edges.foreach { case (s, d) =>
      assert(rows.contains((d, s)), s"missing reverse of ($s,$d)") }
    // every edge endpoint has a self-loop
    edges.foreach { case (s, d) =>
      assert(loops.contains(s) && loops.contains(d)) }
  }
}
