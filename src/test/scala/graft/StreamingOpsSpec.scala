package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._
import graft.streaming.StreamingOps

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

case class CdcRow(h: Long, doc_id: Long, ck: Long)

/** Batch ≡ stream equality on a bounded slice: the same transform function
  * (StreamingOps.tumblingAgg / dedupCount) is driven once as a batch plan
  * and once through MemoryStream + a memory sink, and the final answers must
  * match row-for-row. */
class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def boundedSlice(): Seq[Ev] = {
    import spark.implicits.newLongEncoder // no $-interpolator clash
    io.Tables.events(spark, sf)
      .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00")))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getAs[Timestamp](1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .toSeq
  }

  test("streaming tumbling agg with watermark equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    assert(slice.nonEmpty)

    val stream = MemoryStream[Ev]
    stream.addData(slice)
    val agg = StreamingOps.tumblingAgg(
      stream.toDF().withWatermark("ts", "2 hours"))
    val q = agg.writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("tumbling_out")
      .orderBy($"window_start", $"event_type").collect().toSeq
    val batch = StreamingOps.tumblingAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .orderBy($"window_start", $"event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("watermark drops late data and finalizes windows in append mode") {
    // The state-eviction semantics that matter at scale: once the
    // watermark passes a window's end, the window EMITS (append mode) and
    // an event arriving later than the lateness horizon is dropped — state
    // cannot grow unboundedly and stragglers cannot mutate shipped
    // results. Complete-mode tests can't show this (they keep all state).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    def ev(id: Long, minute: Int) = Ev(id,
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), 1L, "view", 1.0)
    val stream = MemoryStream[Ev]
    val agg = StreamingOps.tumblingAgg(
      stream.toDF().withWatermark("ts", "10 minutes"))
    val q = agg.writeStream
      .format("memory").queryName("late_out").outputMode("append").start()
    try {
      stream.addData(ev(1, 5), ev(2, 10)) // hour-10 window, wm -> 10:00
      q.processAllAvailable()
      // advance event time far enough that watermark (12:50) passes 11:00
      stream.addData(ev(3, 0).copy(ts = java.sql.Timestamp.valueOf("2024-01-01 13:00:00")))
      q.processAllAvailable()
      // hour-10 window is now FINAL; this event is 2h late -> dropped
      stream.addData(ev(4, 20))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late_out")
      .select($"window_start", $"n_events").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.get("2024-01-01 10:00:00").contains(2L),
      s"hour-10 window must finalize with the 2 on-time events, got $out")
  }

  test("late-data model equals a real 3-micro-batch watermark stream") {
    // the registered stream_late_data lane MODELS watermark semantics
    // relationally (batch id = event_id mod 3); here the REAL engine runs
    // the same schedule — MemoryStream fed those three batches under
    // withWatermark(30 min), 1h tumbling window, append mode — and the
    // final sink must equal the model row-for-row, pinning the drop rule
    // (window end <= batch watermark) and the emission rule (window end
    // <= final watermark) against Spark's actual state store.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val byBatch = slice.groupBy(_.event_id % 3)
    val stream = MemoryStream[Ev]
    val agg = StreamingOps.tumblingAgg(
      stream.toDF().withWatermark("ts", "30 minutes"))
    val q = agg.writeStream
      .format("memory").queryName("late_model_out").outputMode("append")
      .start()
    try {
      Seq(0L, 1L, 2L).foreach { b =>
        stream.addData(byBatch.getOrElse(b, Nil).toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("late_model_out")
      .orderBy($"window_start", $"event_type").collect().map(_.toSeq).toSeq
    val model = StreamingOps.lateDataAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .orderBy($"window_start", $"event_type").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty, "the slice must finalize at least one window")
    assert(streamed == model,
      s"model diverges from the engine: engine-only=${streamed.diff(model).take(3)} model-only=${model.diff(streamed).take(3)}")
    // and the schedule genuinely drops something: the no-watermark batch
    // twin must count strictly more events than the late-data model
    val full = StreamingOps.tumblingAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .agg(sum($"n_events")).collect().head.getLong(0)
    val kept = StreamingOps.lateDataAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .agg(sum($"n_events")).collect().head.getLong(0)
    assert(kept < full, s"model must drop late rows ($kept vs $full)")
  }

  test("streaming count-min sketch state equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val stream = MemoryStream[Ev]
    // two batches: the sketch must accumulate across micro-batches
    val (b1, b2) = slice.splitAt(slice.length / 2)
    stream.addData(b1)
    val q = StreamingOps.cmsAgg(stream.toDF()).writeStream
      .format("memory").queryName("cms_out").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cms_out")
      .orderBy($"i", $"j").collect().toSeq
    val batch = StreamingOps.cmsAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .orderBy($"i", $"j").collect().toSeq
    assert(streamed == batch)
    // bounded state: never more than 4 x 1024 counters
    assert(streamed.length <= 4 * 1024)
  }

  test("streaming HLL registers equal the batch sketch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val stream = MemoryStream[Ev]
    // registers must fold across micro-batches (max is associative)
    val (b1, b2) = slice.splitAt(slice.length / 2)
    stream.addData(b1)
    val q = StreamingOps.hllAgg(stream.toDF()).writeStream
      .format("memory").queryName("hll_out").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hll_out")
      .orderBy($"event_type", $"j").collect().toSeq
    val batch = StreamingOps.hllAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .orderBy($"event_type", $"j").collect().toSeq
    assert(streamed == batch, "stream state must equal the batch registers")
    // bounded state: at most 64 registers per event type
    assert(streamed.length <= 5 * 64)
    assert(streamed.forall(_.getLong(2) >= 1), "observed registers have rank >= 1")
  }

  test("streaming session windows equal the batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val stream = MemoryStream[Ev]
    stream.addData(slice)
    val agg = StreamingOps.sessionAgg(
      stream.toDF().withWatermark("ts", "2 hours"))
    val q = agg.writeStream
      .format("memory").queryName("session_out").outputMode("complete")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("session_out")
      .orderBy($"user_id", $"session_start_us").collect().toSeq
    val batch = StreamingOps.sessionAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .orderBy($"user_id", $"session_start_us").collect().toSeq
    assert(streamed == batch)
  }

  test("custom state via flatMapGroupsWithState: running per-user counters") {
    // KeyValueGroupedDataset custom state — the seam for stateful logic the
    // built-in windows can't express. Running count per user over a stream,
    // checked against the plain groupBy answer.
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.{newProductEncoder, newLongEncoder}
    implicit val tupEnc = spark.implicits.newProductEncoder[(Long, Long)]
    val slice = boundedSlice().take(500)
    val stream = MemoryStream[Ev]
    stream.addData(slice)
    val counted = stream.toDF().as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, evs, state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          Iterator((user, n))
      }.toDF("user_id", "n")
    val q = counted.writeStream
      .format("memory").queryName("fmgws_out").outputMode("update")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    // last update per user == total count per user
    val got = spark.table("fmgws_out")
      .groupBy($"user_id").agg(max($"n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = slice.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("mapGroupsWithState carries per-user state across micro-batches and matches batch") {
    // statefulUserStats is the REGISTERED custom-state query (batch form,
    // oracle-checked as stream_stateful_stats). Here the same function runs
    // as a stream split into two micro-batches: the second batch's updates
    // must START from the first batch's state, and the final per-user rows
    // must equal the single-pass batch answer.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val (first, second) = slice.splitAt(slice.length / 2)
    val stream = MemoryStream[Ev]
    val updated = StreamingOps.statefulUserStats(stream.toDF())
    val q = updated.writeStream
      .format("memory").queryName("stateful_out").outputMode("update")
      .start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()
    // final state per user = row with the highest n_events (counts are
    // monotone across updates); max_value rides along in the same struct
    val got = spark.table("stateful_out")
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"max_value")).as("s"))
      .select($"user_id", $"s.n_events", $"s.max_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = StreamingOps.statefulUserStats(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    // and state genuinely carried: some user present in BOTH halves must
    // have emitted a second-batch row whose count exceeds its first-batch one
    val both = first.map(_.user_id).toSet intersect second.map(_.user_id).toSet
    assert(both.nonEmpty)
  }

  test("flatMapGroupsWithState sessionizer merges a session spanning micro-batches") {
    // Inline fixture: user 7's batch-2 events continue (≤30 min gap) the
    // session batch 1 left open, so the stream must MERGE them via carried
    // state; user 8's batch-2 event is >30 min later, so state must CLOSE
    // the old session and open a new one. Final deduped rows must equal the
    // single-pass batch answer, which itself equals the session_window twin.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    def ev(id: Long, user: Long, minute: Long): Ev =
      Ev(id, Timestamp.from(Timestamp.valueOf("2024-01-01 10:00:00").toInstant
        .plusSeconds(minute * 60)), user, "view", 1.0)
    val batch1 = Seq(ev(1, 7, 0), ev(2, 7, 10), ev(3, 8, 0))
    val batch2 = Seq(ev(4, 7, 35), ev(5, 8, 45)) // 7: 25min gap → merge; 8: 45min → new
    val stream = MemoryStream[Ev]
    val out = StreamingOps.customSessions(stream.toDF())
    val q = out.writeStream
      .format("memory").queryName("csess_out").outputMode("append")
      .start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    // keep the max-n row per (user, session_start) — re-emissions only grow n
    val got = spark.table("csess_out")
      .groupBy($"user_id", $"session_start_us")
      .agg(max(struct($"n_events", $"session_end_us", $"total")).as("s"))
      .select($"user_id", $"session_start_us", $"s.session_end_us",
        $"s.n_events", $"s.total")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val batchDf = StreamingOps.customSessions(
      spark.createDataFrame(batch1 ++ batch2))
    val want = batchDf.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got == want)
    // user 7 merged across the batch boundary into ONE 3-event session
    assert(got.count(_._1 == 7L) == 1 && got.find(_._1 == 7L).get._4 == 3L)
    // user 8 split into TWO 1-event sessions
    assert(got.count(_._1 == 8L) == 2)
    // and the custom sessionizer agrees with the built-in session_window
    val builtin = StreamingOps.sessionAgg(spark.createDataFrame(batch1 ++ batch2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(want == builtin)
  }

  test("stream-static broadcast enrichment equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val customers = io.Tables.customer(spark, sf)
    val stream = MemoryStream[Ev]
    stream.addData(slice)
    val agg = StreamingOps.enrichedSegmentAgg(stream.toDF(), customers)
    val q = agg.writeStream
      .format("memory").queryName("enrich_out").outputMode("complete")
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("enrich_out")
      .orderBy($"c_mktsegment").collect().toSeq
    val want = StreamingOps.enrichedSegmentAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))), customers)
      .orderBy($"c_mktsegment").collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("watermarked stream-stream interval join equals the batch twin") {
    // Inline fixture with known pairs: purchase at 10:30 picks up clicks at
    // 10:21..10:30 (within 10 min), not the 10:05 click; cross-user clicks
    // never match.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    def at(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val clicks = Seq(
      Ev(101, at("10:05"), 1, "click", 0), Ev(102, at("10:21"), 1, "click", 0),
      Ev(103, at("10:30"), 1, "click", 0), Ev(104, at("10:25"), 2, "click", 0))
    val purchases = Seq(
      Ev(201, at("10:30"), 1, "purchase", 9), Ev(202, at("11:30"), 2, "purchase", 9))
    val cs = MemoryStream[Ev]; val ps = MemoryStream[Ev]
    val joined = StreamingOps.clickAttribution(
      cs.toDF().withWatermark("ts", "1 hour"),
      ps.toDF().withWatermark("ts", "1 hour"))
    val q = joined.writeStream
      .format("memory").queryName("attrib_out").outputMode("append")
      .start()
    try {
      cs.addData(clicks); ps.addData(purchases); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attrib_out")
      .select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = StreamingOps.clickAttribution(
      spark.createDataFrame(clicks), spark.createDataFrame(purchases))
      .select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got == Set((201L, 102L), (201L, 103L))) // hand-computed pairs
  }

  test("file sink restarted from its checkpoint neither loses nor duplicates rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val (first, second) = slice.splitAt(slice.length / 2)
    val data = java.nio.file.Files.createTempDirectory("graft_fsink").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_fsink_chk").toString
    val stream = MemoryStream[Ev]
    // batch 1, then STOP the query (simulated failure/redeploy)
    stream.addData(first)
    val q1 = graft.streaming.StreamingSinks.parquetSink(stream.toDF(), data, chk)
    try q1.processAllAvailable() finally q1.stop()
    // restart from the SAME checkpoint: committed offsets skip batch 1
    stream.addData(second)
    val q2 = graft.streaming.StreamingSinks.parquetSink(stream.toDF(), data, chk)
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(data)
      .select($"event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = slice.map(_.event_id).sorted
    assert(got == want) // every event exactly once across the restart
  }

  test("foreachBatch batchId-keyed writes stay idempotent across replays") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val (first, second) = slice.splitAt(slice.length / 2)
    val data = java.nio.file.Files.createTempDirectory("graft_bsink").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_bsink_chk").toString
    val stream = MemoryStream[Ev]
    stream.addData(first)
    val q1 = graft.streaming.StreamingSinks.idempotentBatchSink(stream.toDF(), data, chk)
    try q1.processAllAvailable() finally q1.stop()
    stream.addData(second)
    val q2 = graft.streaming.StreamingSinks.idempotentBatchSink(stream.toDF(), data, chk)
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$data/batch=*")
      .select($"event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == slice.map(_.event_id).sorted)
  }

  test("streaming dropDuplicates discards replayed events exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice().take(200)
    val stream = MemoryStream[Ev]
    stream.addData(slice)
    stream.addData(slice.take(50)) // replay a prefix — must be dropped
    val deduped = StreamingOps.dedupCount(
      stream.toDF().withWatermark("ts", "1 hour"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("complete")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }

    val row = spark.table("dedup_out").collect().head
    assert(row.getLong(0) == slice.length.toLong)
  }

  test("CDC latest-value state upserts across micro-batches and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def ev(id: Long, user: Long, min: Int, v: Double) = Ev(id,
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), user, "upd", v)
    val stream = MemoryStream[Ev]
    val q = StreamingOps.cdcLatest(stream.toDF())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    try {
      stream.addData(ev(1, 7, 5, 1.0), ev(2, 8, 6, 2.0))
      q.processAllAvailable()
      // batch 2: user 7 updated later; user 8 gets a LATE event (must lose);
      // same-ts tie for user 9 resolves to the higher event_id
      stream.addData(ev(3, 7, 30, 9.0), ev(4, 8, 1, 5.0),
        ev(5, 9, 40, 3.0), ev(6, 9, 40, 4.0))
      q.processAllAvailable()
    } finally q.stop()
    // update-mode memory sink: keep each user's LAST emitted row
    val streamed = spark.table("cdc_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.last }.values.toSeq
      .sortBy(_._1)
    val batch = StreamingOps.cdcLatest(
      Seq(ev(1, 7, 5, 1.0), ev(2, 8, 6, 2.0), ev(3, 7, 30, 9.0),
        ev(4, 8, 1, 5.0), ev(5, 9, 40, 3.0), ev(6, 9, 40, 4.0)).toDF())
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(streamed == batch, s"stream $streamed != batch $batch")
    val byUser = batch.map(r => r._1 -> r._4).toMap
    assert(byUser(7L) == 9.0, "later event wins")
    assert(byUser(8L) == 2.0, "late-arriving older event must not regress state")
    assert(byUser(9L) == 4.0, "same-ts tie resolves to higher event_id")
  }

  test("streaming PSI stage: windowed band counts equal the batch stage") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val stream = MemoryStream[Ev]
    stream.addData(slice)
    val agg = StreamingOps.psiWindowAgg(
      stream.toDF().withWatermark("ts", "2 hours"))
    val q = agg.writeStream.format("memory").queryName("psi_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("psi_out")
      .select($"w.start", $"bucket", $"n")
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = StreamingOps.psiWindowAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .select($"w.start", $"bucket", $"n")
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming LSH ingest dedup: batch-2 arrival collides with its batch-1 anchor") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // doc 1 and doc 3 are near-identical (one token differs), doc 2 is
    // unrelated filler; 1 and 2 arrive in micro-batch 1, 3 in micro-batch
    // 2 — the collision MUST point at the anchor persisted from batch 1
    val base = (1 to 60).map(i => s"w${i % 17} t$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, (1 to 60).map(i => s"z$i q${i * 3}").mkString(" ")),
      (3L, base.replace("t7", "x7")))
    def bandRows(ds: Seq[(Long, String)]) =
      graft.ops.LlmTextOps.minhashBandRows(ds.toDF("doc_id", "text"))
        .select($"doc_id", $"band", $"s0", $"s1", $"s2", $"s3")
        .collect()
        .map(r => StreamingOps.BandRow(r.getLong(0), r.getInt(1),
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val stream = MemoryStream[StreamingOps.BandRow]
    val q = StreamingOps.neardupCollisions(stream.toDF())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      stream.addData(bandRows(docs.take(2)).toSeq)
      q.processAllAvailable()
      stream.addData(bandRows(docs.drop(2)).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("neardup_out")
      .orderBy($"doc_id", $"band").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // batch twin over the full doc set
    val batch = StreamingOps.neardupCollisions(
      graft.ops.LlmTextOps.minhashBandRows(docs.toDF("doc_id", "text")))
      .orderBy($"doc_id", $"band").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.nonEmpty && streamed.forall { case (d, _, a) => d == 3L && a == 1L },
      s"only doc 3 collides, and with anchor 1: $streamed")
    assert(streamed.length >= 6,
      s"J≈0.95 near-dup should collide in most of the 8 bands: $streamed")
  }

  test("streaming as-of enrichment carries the last purchase across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def ev(id: Long, u: Long, t: String, typ: String, v: Double) =
      Ev(id, Timestamp.valueOf(t), u, typ, v)
    val b1 = Seq(
      ev(1, 7, "2024-01-01 10:00:00", "purchase", 5.0),
      ev(2, 7, "2024-01-01 10:30:00", "click", 0.0),
      ev(3, 8, "2024-01-01 11:00:00", "click", 0.0)) // no prior purchase
    val b2 = Seq(
      ev(4, 7, "2024-01-02 09:00:00", "click", 0.0), // served from batch-1 state
      ev(5, 7, "2024-01-02 10:00:00", "purchase", 7.5),
      ev(6, 7, "2024-01-02 10:00:00", "click", 0.0)) // same instant: purchase first
    val stream = MemoryStream[Ev]
    val q = StreamingOps.asofEnrich(stream.toDF())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
      .sortBy(_._1).toSeq
    val streamed = shape(spark.table("asof_out").collect())
    val batch = shape(StreamingOps.asofEnrich((b1 ++ b2).toDF()).collect())
    assert(streamed == batch, s"stream $streamed != batch $batch")
    val byId = batch.map(t => t._1 -> t._3).toMap
    assert(byId(2L) == Some(5.0))
    assert(byId(3L) == None, "click before any purchase carries null")
    assert(byId(4L) == Some(5.0), "state must carry across micro-batches")
    assert(byId(6L) == Some(7.5), "same-instant purchase counts (as-of <=)")
  }

  test("streaming EWMA carries the value deque across batches, stream = batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def ev(id: Long, u: Long, t: String, v: Double) =
      Ev(id, Timestamp.valueOf(t), u, "metric", v)
    // user 7: values 1, 2 in batch 1; 3 in batch 2 → its EWMA must blend
    // batch-1 history: (3·1e6 + 2·6e5 + 1·3.6e5)·100 DIV 1.96e6 = 2.3265…
    val b1 = Seq(ev(1, 7, "2024-01-01 10:00:00", 1.0),
      ev(2, 7, "2024-01-01 10:01:00", 2.0),
      ev(3, 8, "2024-01-01 10:00:00", 9.0))
    val b2 = Seq(ev(4, 7, "2024-01-01 10:02:00", 3.0))
    val stream = MemoryStream[Ev]
    val q = StreamingOps.ewmaStream(stream.toDF())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val streamed = shape(spark.table("ewma_out").collect())
    val batch = shape(StreamingOps.ewmaStream((b1 ++ b2).toDF()).collect())
    assert(streamed == batch, s"stream $streamed != batch $batch")
    val byId = streamed.toMap
    assert(byId(1L) == 10000L, "seed event is its own EWMA (1.0)")
    assert(byId(2L) == (200L * 1000000 + 100L * 600000) * 100 / 1600000)
    assert(byId(4L) ==
      (300L * 1000000 + 200L * 600000 + 100L * 360000) * 100 / 1960000,
      "batch-2 event must see batch-1 history through the carried deque")
    assert(byId(3L) == 90000L, "keys are independent")
  }

  test("every-nth sampler carries its counter across batches, stream = batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def ev(id: Long, u: Long, t: String) =
      Ev(id, Timestamp.valueOf(t), u, "metric", 0.0)
    // user 7 gets 7 events split 3 + 4 across batches: events #1 and #6
    // must emit, and #6 lands in batch 2 — provable only if the batch-1
    // count (3) carried. user 8's single event emits as its #1.
    val b1 = Seq(ev(1, 7, "2024-01-01 10:00:00"),
      ev(2, 7, "2024-01-01 10:01:00"),
      ev(3, 7, "2024-01-01 10:02:00"),
      ev(10, 8, "2024-01-01 10:00:00"))
    val b2 = (4 to 7).map(i => ev(i.toLong, 7, s"2024-01-01 10:0$i:00")).toSeq
    val stream = MemoryStream[Ev]
    val q = StreamingOps.sampleNthStream(stream.toDF())
      .writeStream.format("memory").queryName("nth_out")
      .outputMode("append").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val streamed = shape(spark.table("nth_out").collect())
    val batch = shape(StreamingOps.sampleNthStream((b1 ++ b2).toDF()).collect())
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed == Seq((7L, 1L, 1L), (7L, 6L, 6L), (8L, 10L, 1L)),
      s"kept set must be events #1 and #6 for user 7, #1 for user 8: $streamed")
  }

  test("windowed top-k: streamed counts + serve-time rank equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    val stream = MemoryStream[Ev]
    // two deliveries: the stateful count stage must merge across batches
    val (b1, b2) = slice.splitAt(slice.length / 2)
    val agg = StreamingOps.windowedCounts(
      stream.toDF().withWatermark("ts", "2 hours"))
    val q = agg.writeStream
      .format("memory").queryName("topk_counts").outputMode("complete")
      .start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = StreamingOps.topkFinish(spark.table("topk_counts"))
      .orderBy($"window_start", $"rk").collect().toSeq
    val batch = StreamingOps.topkFinish(StreamingOps.windowedCounts(
        io.Tables.events(spark, sf)
          .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00")))))
      .orderBy($"window_start", $"rk").collect().toSeq
    assert(streamed == batch, "serve-time rank over streamed state = batch twin")
    // every window emits at most 3 rows, ranked 1..k with descending counts
    streamed.groupBy(_.getString(0)).foreach { case (w, rs) =>
      assert(rs.length <= 3, s"$w top-k bound")
      assert(rs.map(_.getLong(3)).toSeq == (1L to rs.length), s"$w dense ranks")
      val ns = rs.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"$w count order")
    }
  }

  test("streaming keyword tagging carries per-(doc, term) counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    // Static dictionary mined batch-side from the corpus at rest — the
    // stream only ever joins it, never recomputes it.
    val dict = StreamingOps.tagDict(io.Tables.documents(spark, sf))
    val terms = dict.collect().map(_.getString(0)).toSeq
    assert(terms.size == 8, s"mined dictionary must fill its size: $terms")
    // One document's rows SPLIT across two micro-batches: the (doc, term)
    // counts must accumulate in the state store, not reset per batch.
    val b1 = Seq(SDoc(1L, s"${terms.head} x ${terms.head} ${terms(1)}"),
      SDoc(2L, s"${terms(1)} y"))
    val b2 = Seq(SDoc(1L, s"${terms.head} z ${terms(1)}"))
    val stream = MemoryStream[SDoc]
    val agg = StreamingOps.tagHits(stream.toDF(), dict)
    val q = agg.writeStream
      .format("memory").queryName("tag_hits").outputMode("complete")
      .start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = StreamingOps.tagFinish(spark.table("tag_hits"))
      .orderBy($"doc_id").collect().toSeq
    val batch = StreamingOps.tagFinish(StreamingOps.tagHits(
        spark.createDataFrame(b1 ++ b2), dict))
      .orderBy($"doc_id").collect().toSeq
    assert(streamed == batch, "streamed tag summary must equal the batch twin")
    // doc 1 saw terms.head 3x across the two batches (2 + 1) and terms(1) 2x
    val d1 = streamed.find(_.getLong(0) == 1L).get
    assert(d1.getLong(1) == 2L && d1.getLong(2) == 5L &&
      d1.getString(3) == terms.head,
      s"doc 1 must accumulate cross-batch hits: $d1")
  }

  test("streaming BM25: postings state accumulates; serve-time scores track the growing corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val terms = Seq("dup", "vector")
    val b1 = Seq(SDoc(1L, "dup dup vector pad pad"),
      SDoc(2L, "vector other words here"))
    val b2 = Seq(SDoc(3L, "dup filler filler filler filler filler"),
      SDoc(4L, "nothing relevant at all"))
    val stream = MemoryStream[SDoc]
    val q = StreamingOps.bm25Index(stream.toDF()).writeStream
      .format("memory").queryName("bm25_tf").outputMode("complete")
      .start()
    def serve() = StreamingOps.bm25Finish(spark.table("bm25_tf"), terms, 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val (mid, fin) = try {
      stream.addData(b1); q.processAllAvailable()
      val m = serve()
      // each serve is its own "query" — drop its cached state snapshot so
      // the next read sees the grown postings (the runner's release contract)
      graft.Caches.release()
      stream.addData(b2); q.processAllAvailable()
      (m, serve())
    } finally { q.stop(); graft.Caches.release() }
    def batchOver(docs: Seq[SDoc]) = StreamingOps.bm25Finish(
      StreamingOps.bm25Index(spark.createDataFrame(docs)), terms, 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    // serve-time reads equal the batch pipeline over whatever has arrived
    assert(mid == batchOver(b1), "mid-stream serve must equal batch over b1")
    assert(fin == batchOver(b1 ++ b2), "final serve must equal the batch twin")
    // the document-length pipeline is LIVE: doc 1's score after batch 2
    // differs from its batch-1 score (N, df, avgdl all moved)
    val d1mid = mid.find(_._1 == 1L).get._2
    val d1fin = fin.find(_._1 == 1L).get._2
    assert(d1mid != d1fin, "corpus growth must move serve-time scores")
    // and the registered twin's scoring is the batch lane's, verbatim:
    // same oracle string by construction
    assert(StreamingOps.bm25Streamed.oracle ==
      graft.ops.RankingOps.bm25Rank.oracle)
  }

  test("streaming CDC dedup carries chunk anchors across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val stream = MemoryStream[CdcRow]
    // doc 1 presents digests 100, 200 in batch 1; doc 2 re-presents 100 in
    // batch 2 (must flag with the BATCH-1 anchor — state carried), docs
    // 2 and 3 both present 300 within batch 2 (anchor = within-batch min)
    stream.addData(CdcRow(100L, 1L, 0L), CdcRow(200L, 1L, 1L))
    val q = StreamingOps.cdcDedupStream(stream.toDF()).writeStream
      .format("memory").queryName("cdc_dedup_out").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      stream.addData(CdcRow(100L, 2L, 0L), CdcRow(300L, 2L, 1L),
        CdcRow(300L, 3L, 0L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cdc_dedup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((2L, 0L, 1L), (3L, 0L, 2L)),
      s"anchor must persist across batches and min within a batch: $got")
  }

  test("streaming CDC dedup over doc-ordered batches equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    // chunk rows of the sf corpus, split into two DOC-ORDERED batches (the
    // lane's arrival convention, like the EWMA twin's event-time order)
    val chunks = LlmTextOps.cdcChunkFrameOf(io.Tables.documents(spark, sf))
      .select($"h", $"doc_id", $"ck").collect()
      .map(r => CdcRow(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(c => (c.doc_id, c.ck))
    assert(chunks.nonEmpty)
    val mid = chunks(chunks.length / 2).doc_id
    val stream = MemoryStream[CdcRow]
    stream.addData(chunks.filter(_.doc_id <= mid).toSeq)
    val q = StreamingOps.cdcDedupStream(stream.toDF()).writeStream
      .format("memory").queryName("cdc_dedup_sf").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      stream.addData(chunks.filter(_.doc_id > mid).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cdc_dedup_sf")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), min($"anchor_id").as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = StreamingOps.cdcDedup.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      "two doc-ordered micro-batches must equal the one-batch twin")
  }
  test("streaming ANN upsert: last-writer-wins state, serve tracks re-embeddings") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val e = graft.ops.EmbeddingOps.vectors(spark, sf)
    val arr = StreamingOps.annArrivals(e).collect()
      .map(r => VecArr(r.getLong(0), r.getLong(1),
        r.getSeq[Double](2), r.getDouble(3)))
    val b1 = arr.filter(_.seq == 0L).toSeq // initial embeddings
    val b2 = arr.filter(_.seq == 1L).toSeq // the re-embed upserts
    assert(b2.nonEmpty, "the fixture must exercise at least one upsert")
    val stream = MemoryStream[VecArr]
    val q = StreamingOps.annUpsertState(stream.toDF()).writeStream
      .format("memory").queryName("ann_state").outputMode("complete")
      .start()
    def serve() = graft.ops.EmbeddingOps.annLshScaledOf(
        spark.table("ann_state"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val (mid, fin) = try {
      stream.addData(b1); q.processAllAvailable()
      val m = serve()
      graft.Caches.release() // next serve must see the grown state
      stream.addData(b2); q.processAllAvailable()
      (m, serve())
    } finally { q.stop(); graft.Caches.release() }
    def batchOver(rows: Seq[VecArr]) = {
      val r = graft.ops.EmbeddingOps.annLshScaledOf(
        StreamingOps.annUpsertState(spark.createDataFrame(rows)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      graft.Caches.release(); r
    }
    assert(mid == batchOver(b1),
      "mid-stream serve must equal the batch search over arrived vectors")
    assert(fin == batchOver(b1 ++ b2),
      "final serve must equal the batch twin over all arrivals")
    assert(mid != fin,
      "re-embedding ~14% of the corpus must move some query's top-k")
    // the registered twin runs the same pipeline over the parquet table
    val twin = StreamingOps.annUpsert.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    graft.Caches.release()
    assert(twin == fin, "registered twin must equal the final serve")
  }
}

/** Streamed document row for the keyword-tagging test. */
case class SDoc(doc_id: Long, text: String)

/** Streamed vector arrival for the ANN upsert test. */
case class VecArr(vec_id: Long, seq: Long, v: Seq[Double], nrm: Double)
