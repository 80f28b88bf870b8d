package graft

import graft.operators.TheilSen
import graft.pipeline.{Profiler, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-10 operator family: FK integrity, bitmap distinct, robust
  * slope, feature hashing, boilerplate prefixes, hard negatives,
  * quantization calibration, Gram aggregation.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  test("refIntegrity counts orphan rows/keys and excludes NULL refs") {
    val child = Seq(Some(1L), Some(2L), Some(99L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profiler.refIntegrity(
      Seq(("c->p", child, "fk", parent, "pk"))).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_child") == 4) // NULL ref excluded
    assert(row.getAs[Long]("n_keys") == 3)
    assert(row.getAs[Long]("n_orphan_rows") == 2)
    assert(row.getAs[Long]("n_orphan_keys") == 1)
    assert(row.getAs[Double]("orphan_rate") == 0.5)
  }

  test("refIntegrity reports zero orphans on intact edges") {
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val row = Profiler.refIntegrity(
      Seq(("c->p", child, "fk", parent, "pk"))).collect().head
    assert(row.getAs[Long]("n_orphan_rows") == 0)
    assert(row.getAs[Double]("orphan_rate") == 0.0)
  }

  test("bitmapDistinct matches exact distinct across lane boundaries") {
    // ids 0, 62, 63, 126 exercise lane edges; duplicates collapse
    val df = Seq(
      ("a", 0L), ("a", 62L), ("a", 63L), ("a", 126L), ("a", 126L),
      ("b", 5L), ("b", 5L), ("b", 700L))
      .toDF("g", "id")
    val r = Profiler.bitmapDistinct(df, "g", "id")
      .orderBy("g").collect()
    assert(r.map(_.getAs[Long]("n_distinct_bitmap")).toSeq == Seq(4L, 2L))
    r.foreach(row => assert(
      row.getAs[Long]("n_distinct_bitmap") ==
        row.getAs[Long]("n_distinct_exact")))
    // lanes: a -> {0, 1, 2}, b -> {0, 11}
    assert(r.map(_.getAs[Long]("n_lanes")).toSeq == Seq(3L, 2L))
  }

  test("bitmapDistinct agrees with countDistinct on a random draw") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)(("g", rnd.nextInt(1000).toLong))
    val df = rows.toDF("g", "id")
    val row = Profiler.bitmapDistinct(df, "g", "id").collect().head
    assert(row.getAs[Long]("n_distinct_bitmap") ==
      row.getAs[Long]("n_distinct_exact"))
  }

  test("theilSen ignores a single outlier OLS would chase") {
    val pts = Seq(
      ("s", 1L, 10L), ("s", 2L, 20L), ("s", 3L, 30L),
      ("s", 4L, 40L), ("s", 5L, 1000L)).toDF("g", "t", "y")
    val row = TheilSen.robustSlope(pts, "g", "t", "y").collect().head
    assert(row.getAs[Long]("n_pairs") == 10)
    // 6 of 10 pairwise slopes are exactly 10; the outlier's 4 pairs
    // sort above the median ranks
    assert(row.getAs[Double]("theil_sen") == 10.0)
  }

  test("theilSen even pair count averages the two middle slopes") {
    // 4 points -> 6 pairs; slopes sorted: 1,1,1,3,5,9 -> median (1+3)/2
    val pts = Seq(("s", 0L, 0L), ("s", 1L, 1L), ("s", 2L, 2L),
      ("s", 3L, 9L)).toDF("g", "t", "y")
    val row = TheilSen.robustSlope(pts, "g", "t", "y").collect().head
    assert(row.getAs[Long]("n_pairs") == 6)
    assert(row.getAs[Double]("theil_sen") == 2.0)
  }

  test("featureHash is deterministic, signed, and in-range") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "alpha")).toDF(
      "doc_id", "text")
    val r = TextAnalysis.featureHash(docs, "doc_id", "text", 64)
      .collect()
    r.foreach { row =>
      val b = row.getAs[Long]("bucket")
      assert(b >= 0 && b < 64)
    }
    // same token -> same bucket and sign; doc 1 has alpha twice
    val d1 = r.filter(_.getAs[Long]("doc_id") == 1L)
      .map(row => row.getAs[Long]("bucket") -> row.getAs[Long]("fval"))
      .toMap
    val d2 = r.filter(_.getAs[Long]("doc_id") == 2L)
      .map(row => row.getAs[Long]("bucket") -> row.getAs[Long]("fval"))
      .toMap
    d2.foreach { case (bucket, v1) =>
      assert(d1.contains(bucket) && d1(bucket) == v1 * 2) }
  }

  test("boilerplatePrefixes flags shared normalized prefixes") {
    val docs = Seq(
      ("web", "COOKIE NOTICE please accept"),
      ("web", "cookie notice from our site"),
      ("web", "something entirely different"),
      ("book", "once upon a time")).toDF("source", "text")
    val r = TextAnalysis.boilerplatePrefixes(docs, "text", "source")
      .orderBy("source").collect()
    val web = r.find(_.getAs[String]("source") == "web").get
    assert(web.getAs[Long]("n_docs") == 3)
    assert(web.getAs[Long]("n_groups") == 1)
    assert(web.getAs[Long]("n_boiler_docs") == 2)
    val book = r.find(_.getAs[String]("source") == "book").get
    assert(book.getAs[Long]("n_boiler_docs") == 0)
  }

  test("hardNegatives never returns the anchor's own label") {
    val corpus = Seq(
      (1L, 0, Array(1.0, 0.0)), (2L, 0, Array(0.9, 0.1)),
      (3L, 1, Array(0.95, 0.05)), (4L, 1, Array(0.0, 1.0)),
      (5L, 2, Array(0.8, 0.2))).toDF("vec_id", "label", "vec")
    val anchors = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("vec").as("qvec"))
    val r = Similarity.hardNegatives(anchors, corpus, 2).collect()
    assert(r.length == 2)
    r.foreach(row => assert(row.getAs[Int]("label") != 0))
    // rank 1 is the most-similar wrong-label vector (id 3)
    assert(r.find(_.getAs[Int]("rank") == 1).get
      .getAs[Long]("vec_id") == 3L)
  }

  test("quantCalibration per-dim min/max/scale") {
    val vecs = Seq(
      Tuple1(Array(0.0, -1.0)), Tuple1(Array(2.55, 1.0)))
      .toDF("embedding")
    val r = Similarity.quantCalibration(vecs, "embedding")
      .orderBy("dim").collect()
    assert(r(0).getAs[Double]("vmin") == 0.0)
    assert(r(0).getAs[Double]("vmax") == 2.55)
    assert(math.abs(r(0).getAs[Double]("scale") - 0.01) < 1e-12)
    assert(r(1).getAs[Double]("scale") == 2.0 / 255.0)
  }

  test("gramMatrix equals the naive local computation") {
    val data = Seq(
      Array(0.5, -0.25, 1.0),
      Array(1.5, 0.75, -0.5),
      Array(-1.0, 0.125, 0.25))
    val df = data.map(Tuple1(_)).toDF("embedding")
    val got = Similarity.gramMatrix(df, "embedding").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        r.getAs[Long]("gram_mu2")).toMap
    val q = data.map(_.map(v => math.floor(v * 1e6).toLong))
    for (i <- 0 until 3; j <- i until 3) {
      val expected = q.map(x => x(i) * x(j)).sum
      assert(got((i, j)) == expected, s"mismatch at ($i,$j)")
    }
    assert(got.size == 6)
  }

  test("resampleLinear interpolates interior gaps, keeps endpoints") {
    val day = 86400000000L
    val samples = Seq(
      ("s1", 0L * day + 5L, 10.0),
      ("s1", 3L * day + 7L, 40.0),
      ("s2", 0L, 1.0)).toDF("sensor_id", "timestamp_us", "value")
    val r = graft.operators.SensorOps.resampleLinear(samples, day)
      .orderBy("sensor_id", "bucket_start_us").collect()
    val s1 = r.filter(_.getString(0) == "s1")
    assert(s1.map(_.getAs[Double]("value")).toSeq ==
      Seq(10.0, 20.0, 30.0, 40.0))
    assert(s1.map(_.getAs[Int]("filled")).toSeq == Seq(0, 1, 1, 0))
    // a single-sample sensor yields its own bucket, unfilled
    val s2 = r.filter(_.getString(0) == "s2")
    assert(s2.length == 1 && s2.head.getAs[Double]("value") == 1.0)
  }

  test("resampleLinear matches forward fill on gap-free series") {
    val samples = Seq(
      ("s", 0L, 1.0), ("s", 100L, 2.0), ("s", 200L, 3.0))
      .toDF("sensor_id", "timestamp_us", "value")
    val lin = graft.operators.SensorOps.resampleLinear(samples, 100L)
      .orderBy("bucket_start_us").collect().map(_.getAs[Double]("value"))
    val ff = graft.operators.SensorOps.resampleForwardFill(samples, 100L)
      .orderBy("bucket_start_us").collect().map(_.getAs[Double]("value"))
    assert(lin.toSeq == ff.toSeq)
  }

  test("partialAggs merge equals direct aggregation") {
    import graft.operators.PartialAggs
    val df = Seq(("a", 1.25), ("a", 2.50), ("b", 10.0), ("b", -3.0),
      ("a", 4.75)).toDF("k", "v")
    val merged = PartialAggs.merge(Seq(
      PartialAggs.partial(df.limit(2), Seq("k"), "v"),
      PartialAggs.partial(df.except(df.limit(2)), Seq("k"), "v")),
      Seq("k"))
    val direct = PartialAggs.partial(df, Seq("k"), "v")
    val m = merged.orderBy("k").collect()
    val t = direct.orderBy("k").collect()
    assert(m.map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2), r.getDouble(3), r.getDouble(4))).toSeq ==
      t.map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2), r.getDouble(3), r.getDouble(4))).toSeq)
  }

  test("centroidDrift is zero when parities share the distribution") {
    // identical vectors in both parities per label
    val rows = for {
      label <- Seq(0, 1); id <- 0L until 4L
    } yield (id + label * 100, label, Array(0.5 + label, -0.25))
    val df = rows.toDF("vec_id", "label", "vec")
    val r = Similarity.centroidDrift(df).orderBy("label").collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[Long]("l1_mu") == 0L)
      assert(row.getAs[Double]("l1_drift") == 0.0)
    }
  }

  test("centroidDrift measures a known shift") {
    // label 0: even ids at 1.0, odd ids at 2.0 -> centroid gap 1.0
    val df = Seq(
      (0L, 0, Array(1.0)), (2L, 0, Array(1.0)),
      (1L, 0, Array(2.0)), (3L, 0, Array(2.0)))
      .toDF("vec_id", "label", "vec")
    val row = Similarity.centroidDrift(df).collect().head
    assert(row.getAs[Long]("n_a") == 2 && row.getAs[Long]("n_b") == 2)
    // |S_A*n_B - S_B*n_A| = |2e6*2 - 4e6*2| = 4e6; / (2*2*1e6) = 1.0
    assert(row.getAs[Long]("l1_mu") == 4000000L)
    assert(row.getAs[Double]("l1_drift") == 1.0)
  }

  test("dupSpanCoverage merges overlapping spans, exact interval math") {
    import graft.pipeline.Dedup
    // doc 1 and 2 share the 4-token span "a b c d"; doc 1 repeats it
    // shifted so islands overlap: positions 0 and 2 -> union [0,5]
    val docs = Seq(
      (1L, "a b a b c d x y"), // spans at p in {2}: "a b c d" (k=4)
      (2L, "q a b c d z"),
      (3L, "totally unrelated text here")).toDF("doc_id", "text")
    val r = Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 4)
      .collect().map(row => row.getAs[Long]("doc_id") ->
        (row.getAs[Long]("covered_tokens"), row.getAs[Double]("coverage")))
      .toMap
    // shared shingle "a b c d": doc1 p=2, doc2 p=1 -> covered 4 each
    assert(r(1L) == ((4L, 0.5)))
    assert(r(2L)._1 == 4L)
    assert(!r.contains(3L))
  }

  test("dupSpanCoverage overlapping islands union, not double-count") {
    import graft.pipeline.Dedup
    // the 3-token span "a b c" appears at p=0 and p=2 in doc 1 (and in
    // doc 2): intervals [0,2] and [2,4] overlap -> union length 5
    val docs = Seq(
      (1L, "a b a b c x"), (2L, "a b c"), (3L, "a b q"))
      .toDF("doc_id", "text")
    val r = Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 2)
      .collect().map(row => row.getAs[Long]("doc_id") ->
        row.getAs[Long]("covered_tokens")).toMap
    // doc1 dup 2-grams: "a b"@0, "a b"@2 (overlap at [0,1],[2,3] ->
    // adjacent islands len 4), "b c"? only in docs 1,2 -> @3 overlaps
    assert(r(1L) == 5L) // positions 0..4 covered
    assert(r(2L) == 3L)
  }

  test("fakePcmEnergy windows, exact energy, silence gate") {
    import graft.pipeline.Multimodal
    // 'O' = 0x4F = 79 -> amp 0 (silence); '~' = 126 -> amp 47
    val docs = Seq((1L, "O" * 20), (2L, "~" * 16)).toDF("doc_id", "text")
    val r = Multimodal.fakePcmEnergy(docs, "doc_id", "text")
      .collect()
    val d1 = r.filter(_.getAs[Long]("media_id") == 1L)
    assert(d1.length == 2) // 16 + 4 tail
    assert(d1.map(_.getAs[Long]("n_samples")).toSeq == Seq(16L, 4L))
    d1.foreach { row =>
      assert(row.getAs[Long]("energy") == 0L)
      assert(row.getAs[Int]("silence") == 1)
    }
    val d2 = r.filter(_.getAs[Long]("media_id") == 2L).head
    assert(d2.getAs[Long]("energy") == 16L * 47 * 47)
    assert(d2.getAs[Int]("silence") == 0)
  }

  test("lttbDownsample keeps endpoints and picks the spike") {
    // 3 buckets of width 100: flat at 1.0 except a spike in bucket 1
    val rows = Seq(
      ("s", 0L, 1.0), ("s", 50L, 1.0), // bucket 0
      ("s", 110L, 1.0), ("s", 150L, 9.0), ("s", 190L, 1.0), // bucket 1
      ("s", 210L, 1.0), ("s", 290L, 1.0)) // bucket 2
    val df = rows.toDF("sensor_id", "timestamp_us", "value")
    val r = graft.operators.SensorOps.lttbDownsample(df, 100L)
      .collect().map(row => row.getAs[Long]("bucket") ->
        (row.getAs[Long]("timestamp_us"), row.getAs[Double]("value")))
      .toMap
    assert(r.size == 3)
    assert(r(0L) == ((0L, 1.0))) // first point of first bucket
    assert(r(1L) == ((150L, 9.0))) // the spike wins the triangle
    assert(r(2L) == ((290L, 1.0))) // last point of last bucket
  }

  test("lttbDownsample interior tie breaks on earliest point") {
    // symmetric bucket: two points with equal area -> earliest t wins
    val rows = Seq(
      ("s", 0L, 0.0), // bucket 0
      ("s", 140L, 2.0), ("s", 160L, 2.0), // bucket 1, symmetric
      ("s", 290L, 0.0)) // bucket 2
    val df = rows.toDF("sensor_id", "timestamp_us", "value")
    val r = graft.operators.SensorOps.lttbDownsample(df, 100L)
      .collect().map(row => row.getAs[Long]("bucket") ->
        row.getAs[Long]("timestamp_us")).toMap
    assert(r(1L) == 160L || r(1L) == 140L)
    // determinism: the same call yields the same choice
    val r2 = graft.operators.SensorOps.lttbDownsample(df, 100L)
      .collect().map(row => row.getAs[Long]("bucket") ->
        row.getAs[Long]("timestamp_us")).toMap
    assert(r(1L) == r2(1L))
  }

  test("goldenRecord elects mode with smallest-value tie-break") {
    import graft.pipeline.Dedup
    val members = Seq(
      (10L, 1L, "en", 100L), (10L, 2L, "en", 250L), (10L, 3L, "fr", 90L),
      (20L, 4L, "de", 10L), (20L, 5L, "es", 10L)) // tie -> 'de'
      .toDF("cluster_id", "id", "lang", "n_chars")
    val r = Dedup.goldenRecord(members, "cluster_id", "id",
        modeCols = Seq("lang"), maxCols = Seq("n_chars"))
      .orderBy("cluster_id").collect()
    assert(r.map(_.getAs[String]("lang_mode")).toSeq == Seq("en", "de"))
    assert(r.map(_.getAs[Long]("n_chars_max")).toSeq == Seq(250L, 10L))
    assert(r.map(_.getAs[Long]("rep_id")).toSeq == Seq(1L, 4L))
    assert(r.map(_.getAs[Long]("n_members")).toSeq == Seq(3L, 2L))
  }

  test("asOfNative equals the composed as-of join on random series") {
    import graft.operators.AsOfJoin
    val rnd = new scala.util.Random(11)
    // distinct (key, ts) per side — the documented tie contract
    val lRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, i.toLong * 7 + rnd.nextInt(3), rnd.nextDouble()))
      .distinctBy(r => (r._1, r._2))
    val rRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, i.toLong * 5 + rnd.nextInt(4), rnd.nextDouble()))
      .distinctBy(r => (r._1, r._2))
    val l = lRows.toDF("k", "t", "lv")
    val r = rRows.toDF("k", "t", "rv")
    val composed = AsOfJoin.asOf(l, r, "k", "t", Seq("rv"))
      .select("k", "t", "lv", "right_ts", "rv")
    val native = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rv"))
      .select("k", "t", "lv", "right_ts", "rv")
    assert(composed.exceptAll(native).count() == 0)
    assert(native.exceptAll(composed).count() == 0)
    assert(native.count() == composed.count())
  }

  test("asOfNative handles empty right side and missing matches") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 5L, 3.0))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 15L, 9.0)).toDF("k", "t", "rv")
    val got = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rv")).collect()
    // only (1, 20) has a prior right row; (1,10) and key 2 drop
    assert(got.length == 1)
    assert(got.head.getAs[Long]("t") == 20L &&
      got.head.getAs[Long]("right_ts") == 15L &&
      got.head.getAs[Double]("rv") == 9.0)
    val empty = Seq.empty[(Long, Long, Double)].toDF("k", "t", "rv")
    assert(AsOfJoin.asOfNative(l, empty, "k", "t", Seq("rv"))
      .collect().isEmpty)
  }

  test("asOfNative: null keys match nothing; mismatched key types " +
    "rejected at plan time") {
    import graft.operators.AsOfJoin
    // string keys so null is representable on both sides
    val l = Seq((Some("a"), 10L, 1.0), (None, 20L, 2.0),
      (Some("b"), 30L, 3.0)).toDF("k", "t", "lv")
    val r = Seq((Some("a"), 5L, 9.0), (None, 1L, 8.0),
      (Some("b"), 25L, 7.0)).toDF("k", "t", "rv")
    val got = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rv"))
      .orderBy("t").collect()
    // null-keyed left row emits nothing; null-keyed right row is
    // skipped (matches nothing) — same as the composed twin / SQL
    assert(got.map(_.getAs[String]("k")).toSeq == Seq("a", "b"))
    assert(got.map(_.getAs[Double]("rv")).toSeq == Seq(9.0, 7.0))
    // mismatched key types: clear plan-time error, not a deep CCE
    val rInt = Seq((1L, 5L, 9.0)).toDF("k", "t", "rv")
    val e = intercept[Exception] {
      AsOfJoin.asOfNative(l, rInt, "k", "t", Seq("rv")).collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("key types must match"), e.getMessage)
  }

  test("asOfNative exact-tie matches (right ts == left ts)") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 10L, 1.0)).toDF("k", "t", "lv")
    val r = Seq((1L, 10L, 5.0), (1L, 9L, 4.0)).toDF("k", "t", "rv")
    val got = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rv")).collect()
    assert(got.length == 1 && got.head.getAs[Long]("right_ts") == 10L)
  }

  test("asOfNearest picks the closer side, ties backward") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 100L, 0.0), (1L, 200L, 0.0), (1L, 305L, 0.0))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 90L, 1.0), (1L, 210L, 2.0), (1L, 400L, 3.0))
      .toDF("k", "t", "rv")
    val got = AsOfJoin.asOfNearest(l, r, "k", "t", "rv", 1000L)
      .orderBy("t").collect()
      .map(row => row.getAs[Long]("t") ->
        (row.getAs[Long]("right_ts"), row.getAs[Double]("rv"))).toMap
    assert(got(100L) == ((90L, 1.0))) // 10 back vs 110 fwd
    assert(got(200L) == ((210L, 2.0))) // 110 back vs 10 fwd
    assert(got(305L) == ((210L, 2.0))) // 95 back vs 95 fwd: tie -> back
  }

  test("asOfNearest tolerance drops out-of-window rows") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 1000L, 0.0)).toDF("k", "t", "lv")
    val r = Seq((1L, 10L, 1.0)).toDF("k", "t", "rv")
    assert(AsOfJoin.asOfNearest(l, r, "k", "t", "rv", 100L)
      .collect().isEmpty)
    assert(AsOfJoin.asOfNearest(l, r, "k", "t", "rv", 990L)
      .collect().length == 1)
  }

  test("wassersteinToCorpus: identical distributions have W1 = 0") {
    val df = (Seq.fill(10)(("a", 5L)) ++ Seq.fill(10)(("b", 5L)) ++
      Seq.fill(4)(("a", 9L)) ++ Seq.fill(4)(("b", 9L)))
      .toDF("g", "v")
    val r = Profiler.wassersteinToCorpus(df, "g", "v").collect()
    r.foreach(row => assert(row.getAs[Long]("w1_num") == 0L))
  }

  test("wassersteinToCorpus: known shift gives exact distance") {
    // group a all at 0, group b all at 10; corpus = half each.
    // |F_a - F| = 1/2 on [0,10) -> W1(a, corpus) = 5 exactly
    val df = (Seq.fill(6)(("a", 0L)) ++ Seq.fill(6)(("b", 10L)))
      .toDF("g", "v")
    val r = Profiler.wassersteinToCorpus(df, "g", "v")
      .collect().map(row => row.getAs[String]("g") ->
        row.getAs[Double]("w1")).toMap
    assert(r("a") == 5.0 && r("b") == 5.0)
  }

  test("logRank: identical cohorts give O = E and z = 0") {
    // same durations/events in both cohorts
    val rows = for (g <- Seq(0, 1); d <- Seq(1L, 2L, 3L, 5L))
      yield (g, d, 1)
    val df = rows.toDF("g", "d", "e")
    val row = Profiler.logRank(df, "g", "d", "e").collect().head
    assert(row.getAs[Long]("o_a") == 4)
    assert(row.getAs[Double]("e_a") == 4.0)
    assert(row.getAs[Double]("z") == 0.0)
  }

  test("logRank: early-failing cohort has O_A > E_A") {
    // cohort 0 fails at t=1..3, cohort 1 censored far out
    val rows = Seq((0, 1L, 1), (0, 2L, 1), (0, 3L, 1),
      (1, 10L, 0), (1, 10L, 0), (1, 10L, 0))
    val df = rows.toDF("g", "d", "e")
    val row = Profiler.logRank(df, "g", "d", "e").collect().head
    assert(row.getAs[Long]("o_a") == 3)
    assert(row.getAs[Double]("e_a") < 3.0)
    assert(row.getAs[Double]("z") > 0.0)
    assert(row.getAs[Long]("n_event_times") == 3)
  }

  test("governance masks: deterministic, band floors correct on negatives") {
    import graft.pipeline.Governance
    val df = Seq((-999L, "Customer#000000001"), (-1000L, "X"),
      (999L, "AB"), (0L, "Customer#000000002"))
      .toDF("bal", "name")
    val r = df.select(col("bal"),
        Governance.bandFloor("bal", 1000L).as("band"),
        Governance.partialMask(col("name"), 9).as("masked"),
        Governance.hashMask(col("name"), "s:").as("h"))
      .collect().map(row => row.getAs[Long]("bal") ->
        (row.getAs[Long]("band"), row.getAs[String]("masked"),
          row.getAs[Long]("h"))).toMap
    assert(r(-999L)._1 == -1000L) // floor, not trunc-toward-zero
    assert(r(-1000L)._1 == -1000L)
    assert(r(999L)._1 == 0L)
    // extreme negatives: the posmod form needs NO magnitude assumption
    // (the old offset-shift diverged below -band*10^6)
    val xr = Seq((-1000000001L, "x"), (-999999999999L, "y"),
      (Long.MinValue + 1000L, "z")).toDF("bal", "name")
      .select(col("bal"), Governance.bandFloor("bal", 1000L).as("band"))
      .collect().map(row => row.getAs[Long]("bal") ->
        row.getAs[Long]("band")).toMap
    assert(xr(-1000000001L) == -1000001000L)
    assert(xr(-999999999999L) == -1000000000000L)
    assert(xr(Long.MinValue + 1000L) ==
      Long.MinValue + 1000L - Math.floorMod(Long.MinValue + 1000L, 1000L))
    assert(r(0L)._2 == "Customer#*********")
    assert(r(999L)._2 == "AB") // shorter than keep -> unchanged
    // surrogate is deterministic: same input, same session -> same value
    val again = df.select(col("bal"),
        Governance.hashMask(col("name"), "s:").as("h"))
      .collect().map(row => row.getAs[Long]("bal") ->
        row.getAs[Long]("h")).toMap
    assert(again(0L) == r(0L)._3 && r(0L)._3 > 0)
  }

  test("kAnonymityAudit flags small classes and l=1 leaks") {
    import graft.pipeline.Governance
    val df = Seq(
      ("n1", 0L, "A"), ("n1", 0L, "B"), ("n1", 0L, "A"),
      ("n1", 0L, "B"), ("n1", 0L, "A"), // class k=5, l=2
      ("n2", 0L, "A"), ("n2", 0L, "A")) // class k=2 < 5, l=1
      .toDF("nation", "band", "seg")
    val row = Governance.kAnonymityAudit(
      df, Seq("nation", "band"), "seg").collect().head
    assert(row.getAs[Long]("n_classes") == 2)
    assert(row.getAs[Long]("rows_below_k") == 2)
    assert(row.getAs[Long]("classes_below_k") == 1)
    assert(row.getAs[Long]("min_l") == 1)
    assert(row.getAs[Long]("classes_l1") == 1)
    assert(row.getAs[Double]("reident_rate") == 2.0 / 7.0)
  }

  test("gramMatrix rejects ragged rows") {
    val df = Seq(Tuple1(Array(1.0, 2.0)), Tuple1(Array(1.0)))
      .toDF("embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.gramMatrix(df, "embedding").collect()
    }
    assert(e.getMessage != null)
  }
}
