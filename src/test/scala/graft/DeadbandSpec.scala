package graft

import graft.streaming.Deadband
import graft.streaming.Deadband.Sample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DeadbandSpec extends SparkSpec {
  import spark.implicits._

  test("batch deadband keeps first sample and >eps moves only") {
    val df = Seq(
      ("s1", 1L, 10.0), ("s1", 2L, 10.05), ("s1", 3L, 10.2),
      ("s1", 4L, 10.21), ("s1", 5L, 9.0),
      ("s2", 1L, 1.0))
      .toDF("sensor_id", "timestamp_us", "value")
    val got = Deadband.compress(df, eps = 0.1)
      .orderBy("sensor_id", "timestamp_us")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("s1", 1L, 10.0), ("s1", 3L, 10.2), ("s1", 5L, 9.0),
      ("s2", 1L, 1.0)))
  }

  test("batch deadband: a null sensor_id series keeps its first sample " +
    "(no collision with the no-series-yet sentinel)") {
    // the first |value| <= eps sample of a null-id series used to be
    // deadbanded against the phantom lastKept = 0.0 — while
    // compressStream's groupByKey gave the null key fresh state,
    // breaking batch ≡ streaming equivalence
    val df = Seq(
      (null.asInstanceOf[String], 1L, 0.05),
      (null.asInstanceOf[String], 2L, 0.06),
      ("s1", 1L, 0.05))
      .toDF("sensor_id", "timestamp_us", "value")
    val got = Deadband.compress(df, eps = 0.1)
      .as[(String, Long, Double)].collect().toSeq
      .sortBy(r => (Option(r._1).getOrElse(""), r._2))
    assert(got == Seq(
      (null, 1L, 0.05), // first sample of the null series IS kept
      ("s1", 1L, 0.05)))
  }

  test("batch deadband is deterministic under duplicate timestamps") {
    // two samples share timestamp 1: the (ts, value) sort visits 5.0
    // first — the same order compressStream uses — so the kept set is
    // stable across runs and matches the streaming sweep
    val df = Seq(
      ("s1", 1L, 9.0), ("s1", 1L, 5.0), ("s1", 2L, 9.05))
      .toDF("sensor_id", "timestamp_us", "value")
    val got = Deadband.compress(df, eps = 0.1)
      .orderBy("timestamp_us", "value")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", 1L, 5.0), ("s1", 1L, 9.0)))
  }

  test("ewma: per-series recurrence matches the hand-rolled fold") {
    import graft.operators.Ewma
    val df = Seq(
      ("s1", 1L, 8.0), ("s1", 2L, 4.0), ("s1", 3L, 0.0),
      ("s2", 5L, 1.0), ("s2", 6L, 2.0))
      .toDF("sensor_id", "timestamp_us", "value")
    val got = Ewma.smooth(df, alpha = 0.25)
      .orderBy("sensor_id", "timestamp_us")
      .as[(String, Long, Double, Double)].collect().toSeq
    // s1: 8; 0.25*4+0.75*8 = 7; 0.25*0+0.75*7 = 5.25
    // s2: 1; 0.25*2+0.75*1 = 1.25 — series state resets between ids
    assert(got == Seq(
      ("s1", 1L, 8.0, 8.0), ("s1", 2L, 4.0, 7.0), ("s1", 3L, 0.0, 5.25),
      ("s2", 5L, 1.0, 1.0), ("s2", 6L, 2.0, 1.25)))
  }

  test("ewma: duplicate timestamps fold in (ts, value) order") {
    import graft.operators.Ewma
    val df = Seq(("s1", 1L, 4.0), ("s1", 1L, 0.0), ("s1", 2L, 8.0))
      .toDF("sensor_id", "timestamp_us", "value")
    val got = Ewma.smooth(df, alpha = 0.5)
      .orderBy("timestamp_us", "value")
      .as[(String, Long, Double, Double)].collect().toSeq
    // visit order 0.0 then 4.0: y = 0, then 2, then 5
    assert(got == Seq(
      ("s1", 1L, 0.0, 0.0), ("s1", 1L, 4.0, 2.0), ("s1", 2L, 8.0, 5.0)))
  }

  test("ewma half-life: decay follows the actual time gap") {
    import graft.operators.Ewma
    // gaps of exactly one and two half-lives: w = 0.5 then 0.25
    val df = Seq(("s1", 0L, 8.0), ("s1", 10L, 0.0), ("s1", 30L, 4.0))
      .toDF("sensor_id", "timestamp_us", "value")
    val got = Ewma.smoothHalfLife(df, halfLifeUs = 10L)
      .orderBy("timestamp_us")
      .as[(String, Long, Double, Double)].collect().toSeq
    // y1 = 8; y2 = 0.5*0 + 0.5*8 = 4; y3 = 0.75*4 + 0.25*4 = 4
    assert(got.map(_._4) == Seq(8.0, 4.0, 4.0))
  }

  test("streaming deadband state survives across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Sample]
    val name = s"deadband_out_${System.nanoTime()}"
    val q = Deadband.compressStream(in.toDS(), eps = 0.1)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(Sample("s1", 1L, 10.0), Sample("s1", 2L, 10.05))
      q.processAllAvailable()
      // second batch: 10.06 is within eps of the KEPT 10.0 (not of
      // 10.05, which was suppressed) — only 10.3 passes
      in.addData(Sample("s1", 3L, 10.06), Sample("s1", 4L, 10.3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).orderBy("timestamp_us")
      .as[Sample].collect().toSeq
    assert(got == Seq(Sample("s1", 1L, 10.0), Sample("s1", 4L, 10.3)))
  }

  test("streaming cusum carries drift across micro-batches = batch") {
    import graft.operators.Cusum
    import graft.streaming.StreamingCusum
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(Cusum.Sample("s1", 1L, 13.0), Cusum.Sample("s1", 2L, 14.0),
      Cusum.Sample("s2", 1L, 5.0))
    val b2 = Seq(Cusum.Sample("s1", 3L, 15.0), Cusum.Sample("s2", 2L, 30.0))
    val in = MemoryStream[Cusum.Sample]
    val name = s"cusum_out_${System.nanoTime()}"
    val q = StreamingCusum.detectStream(in.toDS(),
        target = 10.0, slack = 1.0, threshold = 8.0)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name)
      .orderBy("sensor_id", "timestamp_us")
      .as[StreamingCusum.Alarm].collect().toSeq
    // batch operator over the concatenated data must agree exactly —
    // including s1's drift 2+3+4=9 tripping the alarm only in batch 2
    val batch = Cusum.detect((b1 ++ b2).map(s =>
        (s.sensor_id, s.timestamp_us, s.value))
        .toDF("sensor_id", "timestamp_us", "value"),
        target = 10.0, slack = 1.0, threshold = 8.0)
      .orderBy("sensor_id", "timestamp_us")
      .as[StreamingCusum.Alarm].collect().toSeq
    assert(streamed == batch)
    // s1 trips in batch 2 (drift 2+3+4 = 9); s2 jumps straight past it
    assert(streamed.filter(_.alarm == 1)
      .map(a => (a.sensor_id, a.timestamp_us)) ==
      Seq(("s1", 3L), ("s2", 2L)))
  }
}
