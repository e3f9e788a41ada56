package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables
import graft.ops._

/** Structured Streaming extension over the `events` table (SURVEY.md §2.10 —
  * the reference has no streaming surface; the driver designates `events` as
  * the streaming testbed).
  *
  * Each operator is ONE transform function applied to both a batch
  * DataFrame (registered below, DuckDB-oracle-checked) and a streaming
  * DataFrame (StreamingOpsSpec drives it through MemoryStream and asserts
  * the final result equals the batch twin on the same bounded slice). That
  * shared-code-path design is the point: in Spark the same logical plan
  * runs incrementally under a watermark, so proving the batch twin correct
  * plus batch≡stream equality verifies the streaming path too.
  *
  * Scale notes: tumbling/sliding windows shuffle on (window, event_type) —
  * naturally balanced keys; state size under a watermark is bounded by
  * (windows in the lateness horizon × types). The dedup operator keys state
  * on event_id with the same horizon bound.
  */
object StreamingOps {

  /** 1-hour tumbling window: count + sum per (window, type). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n_events", $"total")

  /** 1-hour window sliding every 30 minutes (each event lands in 2 windows). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n_events", $"total")

  /** Exactly-once by key: drop duplicate event_ids (the streaming form keys
    * its state store on event_id, bounded by the watermark horizon). */
  def dedupCount(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")
      .agg(count(lit(1)).as("n_unique")) // count only: distinct-aggs are not
  // incrementalizable on streams, and the twin must be stream-runnable

  /** Gap-based sessionization: a user's events ≤30 min apart share a
    * session (`session_window` — Spark's built-in merging session state;
    * under streaming this is the stateful session store, no custom
    * `mapGroupsWithState` needed). Boundaries go out as unix micros so the
    * oracle compare is exact-integer. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total"))
      .select($"user_id",
        unix_micros($"session_window.start").as("session_start_us"),
        unix_micros($"session_window.end").as("session_end_us"),
        $"n_events", $"total")

  /** Typed row for the custom-state path (only the columns the state
    * function touches — prune before the shuffle). */
  final case class UserEvent(user_id: Long, value: Double)

  /** Custom per-key state through `KeyValueGroupedDataset.mapGroupsWithState`
    * — the seam for stateful logic the built-in windows can't express
    * (SURVEY.md §2.10). The SAME function runs in both execution modes: on a
    * stream the state carries across micro-batches (StreamingOpsSpec feeds
    * two batches and asserts the carried totals), in batch each group is
    * seen once with empty state — and the batch form is the registered,
    * oracle-checked query. Count + max only: both are arrival-order
    * independent, so batch, stream, and oracle agree exactly with no
    * float-accumulation-order caveat. State size: one (long, double) per
    * live user key — at 100 TB this is the state-store-backed path with a
    * timeout (`GroupStateTimeout.ProcessingTimeTimeout`) evicting idle keys;
    * NoTimeout here because the testbed stream is bounded. */
  def statefulUserStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val evEnc: Encoder[UserEvent] = Encoders.product[UserEvent]
    implicit val stEnc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val outEnc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    events.select($"user_id", $"value").as[UserEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[UserEvent], state: GroupState[(Long, Double)]) =>
          var (n, mx) = state.getOption.getOrElse((0L, Double.NegativeInfinity))
          evs.foreach { e => n += 1; if (e.value > mx) mx = e.value }
          state.update((n, mx))
          (uid, n, mx)
      }
      .toDF("user_id", "n_events", "max_value")
  }

  /** Stream–static enrichment: the event stream joined to the (slowly
    * changing) customer dimension, aggregated per market segment. The
    * dimension side is `broadcast()` — on a stream this is the canonical
    * enrichment plan (no stateful join, each micro-batch hash-joins against
    * the broadcast table; at 100 TB/day of events the dimension still fits
    * in memory and the join stays shuffle-free). */
  def enrichedSegmentAgg(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(broadcast(customer.select($"c_custkey", $"c_mktsegment")),
        $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total"))

  /** Stream–stream interval join: each purchase matched to the same user's
    * clicks in the 10 minutes leading up to it (click-attribution). In
    * streaming both sides carry watermarks and the time-interval condition
    * bounds the join state Spark must retain (clicks older than the horizon
    * are evicted); in batch the same plan is an equi-join on user_id with a
    * range residual — never a cross product. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame =
    purchases
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        $"ts".as("p_ts"))
      .join(
        clicks.select($"user_id".as("c_user"), $"event_id".as("click_id"),
          $"ts".as("c_ts")),
        expr("""p_user = c_user AND
                c_ts >= p_ts - INTERVAL 10 MINUTES AND c_ts <= p_ts"""))
      .select($"p_user".as("user_id"), $"purchase_id", $"click_id",
        unix_micros($"p_ts").as("purchase_ts_us"),
        unix_micros($"c_ts").as("click_ts_us"))

  /** Typed row and open-session state for the custom sessionizer. */
  final case class SessEvent(user_id: Long, ts_us: Long, value: Double)
  final case class OpenSession(start_us: Long, last_us: Long, n: Long, total: Double)

  private val SessionGapUs: Long = 30L * 60 * 1000000

  /** Gap-based sessionization re-expressed through
    * `flatMapGroupsWithState` — the whole-operator custom-state seam
    * (SURVEY.md §2.10), computing exactly what `session_window` computes so
    * the SAME relational oracle checks it. Each invocation folds the key's
    * new events (ts-sorted) into sessions: a >30-min gap closes one. Closed
    * sessions and the currently-open one are emitted; the open one is kept
    * in state so the next micro-batch extends it instead of starting fresh
    * (re-emissions only grow `n`, so a reader keeps the max-n row per
    * (user, session_start) — StreamingOpsSpec does exactly that). In batch
    * each group is seen once and complete, so the emission IS the final
    * session list. State is one `OpenSession` per live user; on an unbounded
    * stream an event-time timeout at `last_us + gap` would both flush and
    * evict (bounded here, so NoTimeout). */
  def customSessions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val evEnc: Encoder[SessEvent] = Encoders.product[SessEvent]
    implicit val stEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
    implicit val outEnc: Encoder[(Long, Long, Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    events
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"value").as[SessEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, (Long, Long, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          val sorted = evs.toArray.sortBy(_.ts_us)
          val closed = Array.newBuilder[OpenSession]
          var cur = state.getOption.orNull
          sorted.foreach { e =>
            if (cur == null) cur = OpenSession(e.ts_us, e.ts_us, 1L, e.value)
            else if (e.ts_us - cur.last_us <= SessionGapUs)
              cur = OpenSession(cur.start_us, e.ts_us, cur.n + 1, cur.total + e.value)
            else { closed += cur; cur = OpenSession(e.ts_us, e.ts_us, 1L, e.value) }
          }
          if (cur != null) state.update(cur)
          (closed.result().iterator ++ Option(cur).iterator).map { s =>
            (uid, s.start_us, s.last_us + SessionGapUs, s.n, s.total)
          }
      }
      .toDF("user_id", "session_start_us", "session_end_us", "n_events", "raw_total")
      .select($"user_id", $"session_start_us", $"session_end_us", $"n_events",
        round($"raw_total", 2).as("total"))
  }

  /** Lateness horizon for [[lateDataAgg]] (ms — Spark watermarks are
    * millisecond-granular: event-time stats collect max(ts) in ms, so the
    * model floors to ms before subtracting). */
  private val LateDelayMs = 30L * 60 * 1000

  /** RELATIONAL MODEL of watermark late-data semantics — the one
    * streaming behavior the batch≡stream twins above cannot carry,
    * because dropping is a property of the BATCH SCHEDULE, not the data.
    * So the schedule is made data: batch id = event_id mod 3, and the
    * model replays exactly what a 3-micro-batch run of
    * `withWatermark(30 min) → 1h tumbling window → append` produces:
    *
    *  - watermark at batch b = ⌊max event-time over batches < b⌋ms − 30 min
    *    (NULL for batch 0 — no watermark yet);
    *  - a row is DROPPED iff its window END ≤ the watermark of ITS batch
    *    (the state for that window is already finalized and evicted);
    *  - a window is EMITTED iff its end ≤ the final watermark (append
    *    mode ships a window exactly once, when the watermark passes it).
    *
    * StreamingOpsSpec drives the REAL engine — MemoryStream fed the same
    * three batches under the same watermark — and asserts row-for-row
    * equality with this model, so the drop and emission rules above are
    * pinned against Spark's actual state-store behavior, and the DuckDB
    * oracle replays them relationally. At 100 TB this model is also the
    * capacity story: state ≤ (windows inside the horizon) × types,
    * independent of stream length. */
  def lateDataAgg(events: DataFrame): DataFrame = {
    val b = events
      .withColumn("batch", pmod($"event_id", lit(3L)))
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("wend_us",
        unix_micros(window($"ts", "1 hour").getField("end")))
    val mx = b.groupBy($"batch").agg(max($"ts_us").as("mx"))
    val wm = mx.as("a")
      .join(mx.as("p"), col("p.batch") < col("a.batch"), "left")
      .groupBy(col("a.batch").as("batch"))
      .agg(max(col("p.mx")).as("pmx"))
      .select($"batch",
        ((expr("pmx DIV 1000") - LateDelayMs) * 1000L).as("wm_us"))
    val wmFinal = mx.agg(
      ((expr("max(mx) DIV 1000") - LateDelayMs) * 1000L).as("wm_final_us"))
    b.join(broadcast(wm), Seq("batch"))
      .filter($"wm_us".isNull || $"wend_us" > $"wm_us")
      .crossJoin(broadcast(wmFinal))
      .filter($"wend_us" <= $"wm_final_us")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n_events", $"total")
  }

  val lateData: QueryDef = QueryDef(
    "stream_late_data",
    """WITH b AS (SELECT event_id % 3 AS batch, ts, event_type, value,
      |                  epoch_us(ts) AS ts_us,
      |                  epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS wend_us
      |           FROM events),
      |mx AS (SELECT batch, max(ts_us) AS mx FROM b GROUP BY 1),
      |wm AS (SELECT a.batch, (max(p.mx) // 1000 - 1800000) * 1000 AS wm_us
      |       FROM mx a LEFT JOIN mx p ON p.batch < a.batch
      |       GROUP BY a.batch),
      |wf AS (SELECT (max(mx) // 1000 - 1800000) * 1000 AS wm_final_us FROM mx),
      |kept AS (SELECT b.* FROM b JOIN wm ON wm.batch = b.batch, wf
      |         WHERE (wm.wm_us IS NULL OR b.wend_us > wm.wm_us)
      |           AND b.wend_us <= wf.wm_final_us)
      |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, count(*) AS n_events, round(sum(value), 2) AS total
      |FROM kept GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
  ) { (spark, dir) =>
    lateDataAgg(Tables.events(spark, dir))
      .orderBy($"window_start", $"event_type")
  }

  // ------------------------------------------------- registered batch twins

  val tumbling: QueryDef = QueryDef(
    "stream_tumbling_agg",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, count(*) AS n_events, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
  ) { (spark, dir) =>
    tumblingAgg(Tables.events(spark, dir))
      .orderBy($"window_start", $"event_type")
  }

  val sliding: QueryDef = QueryDef(
    "stream_sliding_agg",
    // Each event belongs to the windows starting at its 30-min bucket and
    // 30 minutes before it; pure date_trunc/interval arithmetic keeps the
    // naive timeline (no epoch/timezone round-trips).
    """WITH w AS (
      |  SELECT date_trunc('hour', ts)
      |         + (CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END)
      |         - (CASE WHEN o.off = 1 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END) AS ws,
      |         event_type, value
      |  FROM events CROSS JOIN (VALUES (0), (1)) o(off))
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, count(*) AS n_events, round(sum(value), 2) AS total
      |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
  ) { (spark, dir) =>
    slidingAgg(Tables.events(spark, dir))
      .orderBy($"window_start", $"event_type")
  }

  val dedup: QueryDef = QueryDef(
    "stream_dedup",
    "SELECT count(DISTINCT event_id) AS n_unique FROM events",
  ) { (spark, dir) => dedupCount(Tables.events(spark, dir)) }

  /** Oracle replays session merging relationally: a session break is a
    * >30-min gap (or first event) per user; running-sum the breaks to get a
    * session id, then aggregate. Session end = last event + gap, matching
    * `session_window` semantics. Shared by the built-in (`session_window`)
    * and custom (`flatMapGroupsWithState`) sessionizers — identical
    * semantics, one oracle. */
  private val sessionOracle: String =
    """WITH s AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (
      |  SELECT user_id, ts, value,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM s)
      |SELECT user_id,
      |       CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
      |       CAST(epoch_us(max(ts) + INTERVAL 30 MINUTE) AS BIGINT) AS session_end_us,
      |       count(*) AS n_events, round(sum(value), 2) AS total
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  val session: QueryDef = QueryDef("stream_session_agg", sessionOracle) {
    (spark, dir) =>
      sessionAgg(Tables.events(spark, dir))
        .orderBy($"user_id", $"session_start_us")
  }

  val customSession: QueryDef = QueryDef("stream_custom_sessions", sessionOracle) {
    (spark, dir) =>
      customSessions(Tables.events(spark, dir))
        .orderBy($"user_id", $"session_start_us")
  }

  val enriched: QueryDef = QueryDef(
    "stream_static_join",
    """SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS total
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    enrichedSegmentAgg(Tables.events(spark, dir), Tables.customer(spark, dir))
      .orderBy($"c_mktsegment")
  }

  val attribution: QueryDef = QueryDef(
    "stream_stream_join",
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
      |       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us,
      |       CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us
      |FROM events p JOIN events c
      |  ON c.user_id = p.user_id
      | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
      |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |ORDER BY purchase_id, click_id""".stripMargin,
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    clickAttribution(
      ev.filter($"event_type" === "click"),
      ev.filter($"event_type" === "purchase"))
      .orderBy($"purchase_id", $"click_id")
  }

  val stateful: QueryDef = QueryDef(
    "stream_stateful_stats",
    """SELECT user_id, count(*) AS n_events, max(value) AS max_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  ) { (spark, dir) =>
    statefulUserStats(Tables.events(spark, dir)).orderBy($"user_id")
  }

  /** Count-min sketch of user-activity frequencies maintained as a
    * STREAMING aggregate: 4 hash rows × 1024 counters of state regardless
    * of stream volume — the reason sketches are the streaming-state form
    * at scale (an exact per-user count grows state with the user
    * population; the sketch never does). Same portable-hash bucket
    * derivation as the batch `sketch_cms_topk`, so the batch twin is
    * oracle-checked and the spec proves stream ≡ batch on the same slice. */
  def cmsAgg(events: DataFrame): DataFrame =
    events
      .select($"user_id", explode(array((0 to 3).map(lit(_)): _*)).as("i"))
      .withColumn("j", call_function("md5hash60",
        concat($"i".cast("string"), lit(":"), $"user_id".cast("string"))) % 1024)
      .groupBy($"i", $"j").agg(count(lit(1)).as("hits"))

  val cms: QueryDef = QueryDef(
    "stream_cms",
    """SELECT i, j, CAST(count(*) AS BIGINT) AS hits
      |FROM (SELECT g.i,
      |             ('0x' || substr(md5(CAST(g.i AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT % 1024 AS j
      |      FROM events e, (SELECT unnest([0, 1, 2, 3]) AS i) g)
      |GROUP BY i, j ORDER BY i, j""".stripMargin,
  ) { (spark, dir) =>
    cmsAgg(Tables.events(spark, dir)).orderBy($"i", $"j")
  }

  /** Typed row for the CDC apply path. */
  final case class CdcEvent(user_id: Long, ts_us: Long, event_id: Long,
      value: Double)

  /** CDC APPLY — materialize the LATEST value per key from a change
    * stream (last-writer-wins by event time, ties to the higher
    * event_id: the later sequence number is the later change). The SAME
    * fold runs in batch (each key seen once, complete) and on a stream,
    * where the state store carries each key's current winner across
    * micro-batches and every batch emits the refreshed row (update-mode
    * consumers upsert it — the standard CDC-to-serving-table shape).
    * State is one (ts_us, event_id, value) triple per live key, and an
    * event-time timeout would evict keys idle past the horizon on an
    * unbounded stream. The comparison is arrival-order independent (max
    * by a total order), so batch, stream, and the oracle's window
    * ranking agree exactly. */
  def cdcLatest(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val evEnc: Encoder[CdcEvent] = Encoders.product[CdcEvent]
    implicit val stEnc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    implicit val outEnc: Encoder[(Long, Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaDouble)
    events
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"value")
      .as[CdcEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[(Long, Long, Double), (Long, Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[CdcEvent], state: GroupState[(Long, Long, Double)]) =>
          var cur = state.getOption.getOrElse((Long.MinValue, Long.MinValue, 0.0))
          evs.foreach { e =>
            if (e.ts_us > cur._1 || (e.ts_us == cur._1 && e.event_id > cur._2))
              cur = (e.ts_us, e.event_id, e.value)
          }
          state.update(cur)
          (uid, cur._1, cur._2, cur._3)
      }
      .toDF("user_id", "last_ts_us", "last_event_id", "last_value")
  }

  /** Batch twin of [[cdcLatest]], oracle-ranked by the identical
    * (ts DESC, event_id DESC) total order. */
  val cdc: QueryDef = QueryDef(
    "stream_cdc_latest",
    """SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
      |       event_id AS last_event_id, value AS last_value
      |FROM (SELECT user_id, ts, event_id, value,
      |             row_number() OVER (PARTITION BY user_id
      |                    ORDER BY ts DESC, event_id DESC) AS rk
      |      FROM events) WHERE rk = 1
      |ORDER BY user_id""".stripMargin,
  ) { (spark, dir) =>
    cdcLatest(Tables.events(spark, dir)).orderBy($"user_id")
  }

  /** Typed rows for the streaming as-of enrichment. */
  final case class EnrichEvent(user_id: Long, event_id: Long,
      is_purchase: Boolean, ts_us: Long, value: Double)
  final case class LastPurchase(ts_us: Long, value: Double)
  final case class EnrichedClick(event_id: Long, user_id: Long,
      click_ts_us: Long, purchase_ts_us: Option[Long],
      purchase_value: Option[Double])

  /** STREAMING point-in-time enrichment — the as-of join
    * (`asof_purchase_click` family) as a stateful stream operator: every
    * click is emitted with the user's latest prior-or-simultaneous
    * purchase, carried across micro-batches as ONE (ts, value) pair per
    * user. This is the serving form of the SCD2 lookup
    * (`dq_scd2_lookup`): unbounded lookback with O(1) state per key,
    * where the stream-stream interval join (`stream_stream_join`) can
    * only afford a bounded window of retained state.
    *
    * Within a batch, events fold in (ts, purchase-first, event_id) order
    * — purchases at the same instant win over clicks (the as-of ≤ rule)
    * and the max-event_id purchase wins a same-instant tie, matching the
    * oracle's dedup rank. Cross-batch correctness assumes event-time-
    * ordered batches (the spec's arrangement; an out-of-order deployment
    * adds a watermark hold-back in front). In batch each group is seen
    * once and complete, so the fold IS the exact as-of join — that twin
    * is the oracle-checked registered query. */
  def asofEnrich(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val evEnc: Encoder[EnrichEvent] = Encoders.product[EnrichEvent]
    implicit val stEnc: Encoder[LastPurchase] = Encoders.product[LastPurchase]
    implicit val outEnc: Encoder[EnrichedClick] = Encoders.product[EnrichedClick]
    events
      .filter($"event_type".isin("purchase", "click"))
      .select($"user_id", $"event_id",
        ($"event_type" === "purchase").as("is_purchase"),
        unix_micros($"ts").as("ts_us"), $"value")
      .as[EnrichEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[LastPurchase, EnrichedClick](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[EnrichEvent], state: GroupState[LastPurchase]) =>
          // purchase sorts before click at an equal instant: !is_purchase
          // is false < true; among same-instant purchases the LAST
          // (max event_id) overwrites, matching the oracle's rank
          val sorted = evs.toArray.sortBy(e => (e.ts_us, !e.is_purchase, e.event_id))
          var cur = state.getOption.orNull
          val out = Array.newBuilder[EnrichedClick]
          sorted.foreach { e =>
            if (e.is_purchase) cur = LastPurchase(e.ts_us, e.value)
            else out += EnrichedClick(e.event_id, uid, e.ts_us,
              Option(cur).map(_.ts_us), Option(cur).map(_.value))
          }
          if (cur != null) state.update(cur)
          out.result().iterator
      }
      .toDF("event_id", "user_id", "click_ts_us", "purchase_ts_us", "pv_raw")
      .select($"event_id", $"user_id", $"click_ts_us", $"purchase_ts_us",
        round($"pv_raw", 2).as("purchase_value"))
  }

  /** Batch twin of [[asofEnrich]]; the oracle is DuckDB's native
    * `ASOF LEFT JOIN` over max-event_id-deduped purchases — an
    * independent implementation of the same point-in-time rule. */
  val asofEnriched: QueryDef = QueryDef(
    "stream_asof_enrich",
    """WITH p0 AS (SELECT user_id, ts, value,
      |                   row_number() OVER (PARTITION BY user_id, ts
      |                                      ORDER BY event_id DESC) AS rn
      |            FROM events WHERE event_type = 'purchase'),
      |p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1),
      |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id,
      |       CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
      |       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us,
      |       round(p.value, 2) AS purchase_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
      |ORDER BY c.event_id""".stripMargin,
  ) { (spark, dir) =>
    asofEnrich(Tables.events(spark, dir)).orderBy($"event_id")
  }

  private val PsiW = 10.0 // event-value band width for the drift monitor

  /** Stage 1 of the streaming drift monitor: per (1-hour window, value
    * band) counts — the one STATEFUL operator, shared verbatim by the
    * batch twin and the stream (state bounded by windows-in-horizon ×
    * bands). */
  def psiWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window($"ts", "1 hour").as("w"),
        floor($"value" / PsiW).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** STREAMING drift monitor — PSI of each event-time hour's value
    * distribution against the whole-corpus reference: the per-window
    * form of `dq_psi_drift` (which compares two static cohorts), i.e.
    * "did THIS hour's traffic shift?" — the pager alert, not the
    * postmortem. Stage 1 ([[psiWindowAgg]]) is the only stateful piece
    * and is spec-proven stream ≡ batch; everything after — reference
    * proportions, Laplace smoothing over the reference band set,
    * 1e-6-quantized contributions, the per-window rollup — is stateless
    * arithmetic over tiny aggregates (bands × windows), exactly the
    * work a `foreachBatch` finisher runs on each micro-batch's output.
    * A window missing a reference band contributes its smoothed term
    * (n = 0), so sparse hours score honestly high. */
  val psi: QueryDef = QueryDef(
    "stream_psi",
    s"""WITH wb AS (SELECT date_trunc('hour', ts) AS ws,
       |                   CAST(floor(value / $PsiW) AS BIGINT) AS bucket,
       |                   count(*) AS n
       |            FROM events GROUP BY 1, 2),
       |ref AS (SELECT CAST(floor(value / $PsiW) AS BIGINT) AS bucket,
       |               count(*) AS n_ref
       |        FROM events GROUP BY 1),
       |rt AS (SELECT sum(n_ref) AS tot_ref, CAST(count(*) AS BIGINT) AS k FROM ref),
       |wt AS (SELECT ws, sum(n) AS tot_w FROM wb GROUP BY 1),
       |gx AS (SELECT wt.ws, wt.tot_w, ref.bucket, ref.n_ref,
       |              coalesce(wb.n, 0) AS n
       |       FROM wt CROSS JOIN ref
       |            LEFT JOIN wb ON wb.ws = wt.ws AND wb.bucket = ref.bucket),
       |terms AS (SELECT ws, tot_w,
       |                 CAST(round(((CAST(n + 1 AS DOUBLE) / (tot_w + rt.k))
       |                             - (CAST(n_ref + 1 AS DOUBLE) / (rt.tot_ref + rt.k)))
       |                            * ln((CAST(n + 1 AS DOUBLE) / (tot_w + rt.k))
       |                                 / (CAST(n_ref + 1 AS DOUBLE) / (rt.tot_ref + rt.k)))
       |                            * 1000000) AS BIGINT) AS c_e6
       |          FROM gx, rt)
       |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       |       CAST(max(tot_w) AS BIGINT) AS n_events,
       |       round(CAST(sum(c_e6) AS DOUBLE) / 1000000.0, 6) AS psi
       |FROM terms GROUP BY ws ORDER BY window_start""".stripMargin,
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val wb = psiWindowAgg(ev)
      .select($"w.start".as("ws"), $"bucket", $"n")
    val ref = ev.groupBy(floor($"value" / PsiW).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_ref"))
    val rt = ref.agg(sum($"n_ref").as("tot_ref"), count(lit(1)).as("k"))
    val wt = wb.groupBy($"ws").agg(sum($"n").as("tot_w"))
    val gx = wt.crossJoin(broadcast(ref))
      .join(wb, Seq("ws", "bucket"), "left")
      .select($"ws", $"tot_w", $"n_ref", coalesce($"n", lit(0L)).as("n"))
      .crossJoin(broadcast(rt))
    val pw = ($"n" + 1).cast("double") / ($"tot_w" + $"k")
    val pr = ($"n_ref" + 1).cast("double") / ($"tot_ref" + $"k")
    gx.select($"ws", $"tot_w",
        round((pw - pr) * log(pw / pr) * 1000000).cast("long").as("c_e6"))
      .groupBy($"ws")
      .agg(max($"tot_w").as("n_events"),
        round(sum($"c_e6").cast("double") / 1000000.0, 6).as("psi"))
      .select(date_format($"ws", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"n_events", $"psi")
      .orderBy($"window_start")
  }

  /** One (doc, band) row with the band's raw MinHash signature tuple. */
  final case class BandRow(doc_id: Long, band: Int,
      s0: Long, s1: Long, s2: Long, s3: Long)

  /** STREAMING ingest near-dup detection — MinHash-LSH collision tracking
    * as the documents arrive, the "kill near-duplicates at the door"
    * stage of a live training-data pipeline (the batch miners in
    * `LlmTextOps` audit a corpus at rest; this catches the duplicate
    * before it lands). State is keyed on the (band, signature-tuple)
    * bucket and holds ONE long — the bucket's anchor (lowest doc_id seen);
    * every later arrival in the bucket emits a collision row pointing at
    * the anchor. The SAME function runs in batch (each bucket seen once,
    * complete → anchor = min) and on a stream (anchor carries across
    * micro-batches, so a batch-2 arrival still collides with its batch-1
    * anchor — StreamingOpsSpec feeds exactly that split and asserts
    * stream ≡ batch).
    *
    * Scale shape: state is one long per OCCUPIED bucket — bounded by
    * distinct content, not stream volume, and an event-time timeout would
    * evict cold buckets on an unbounded stream (NoTimeout here: the
    * testbed is bounded). The shuffle keys on the band tuple — the same
    * bucket-join shape as the batch LSH, incrementalized. */
  def neardupCollisions(bandRows: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val rowEnc: Encoder[BandRow] = Encoders.product[BandRow]
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    implicit val keyEnc: Encoder[(Int, Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc: Encoder[(Long, Int, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaLong)
    bandRows.as[BandRow]
      .groupByKey(r => (r.band, r.s0, r.s1, r.s2, r.s3))
      .flatMapGroupsWithState[Long, (Long, Int, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[BandRow], state: GroupState[Long]) =>
          val sorted = rows.toArray.sortBy(_.doc_id)
          val anchor = state.getOption
            .map(a => math.min(a, sorted.head.doc_id))
            .getOrElse(sorted.head.doc_id)
          state.update(anchor)
          sorted.iterator.filter(_.doc_id != anchor)
            .map(r => (r.doc_id, r.band, anchor))
      }
      .toDF("doc_id", "band", "anchor_id")
  }

  /** Batch twin: per colliding document, how many of its 8 band buckets
    * already had an anchor and the lowest anchor it collided with — the
    * row an ingest gate would quarantine. The oracle replays the exact
    * signature derivation and bucket-min semantics relationally. */
  val neardup: QueryDef = QueryDef(
    "stream_neardup",
    LlmTextOps.shingleCte + ",\n" + LlmTextOps.minhashBandSqlCtes +
      """,
        |an AS (SELECT band, s0, s1, s2, s3, min(doc_id) AS anchor_id
        |       FROM br GROUP BY 1, 2, 3, 4, 5),
        |co AS (SELECT br.doc_id, br.band, an.anchor_id
        |       FROM br JOIN an USING (band, s0, s1, s2, s3)
        |       WHERE br.doc_id != an.anchor_id)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_bands,
        |       min(anchor_id) AS anchor_id
        |FROM co GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) =>
    neardupCollisions(
      LlmTextOps.minhashBandRows(Tables.documents(spark, dir)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hit_bands"), min($"anchor_id").as("anchor_id"))
      .orderBy($"doc_id")
  }

  /** Typed CDC chunk row for [[cdcDedupStream]]. */
  final case class CdcChunkRow(h: Long, doc_id: Long, ck: Long)

  /** STREAMING CDC-chunk dedup — the ingest-gate twin of
    * `llm_cdc_chunks`: documents arrive as a stream, each is cut by the
    * SAME content-defined rule (`LlmTextOps.cdcChunkFrameOf` — shared code
    * path, the §2.10 design), and state per chunk DIGEST is the anchor
    * (first document ever to present that chunk's content). Every later
    * arrival of a known digest emits a collision row — the "this incoming
    * doc is mostly chunks we already store" signal a 100 TB ingest gate
    * acts on before the document ever lands.
    *
    * State is one long per distinct chunk digest (the deduplicated chunk
    * store's keyspace — exactly what a production CDC store keeps anyway);
    * within a batch groups fold in (doc_id, ck) order so the batch twin
    * (all groups complete in one batch) is the relational min-anchor form
    * the oracle replays. The spec proves a two-batch split carries
    * anchors across the boundary. */
  def cdcDedupStream(chunks: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val rowEnc: Encoder[CdcChunkRow] = Encoders.product[CdcChunkRow]
    implicit val stEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    chunks.select($"h", $"doc_id", $"ck").as[CdcChunkRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState[Long, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[CdcChunkRow], state: GroupState[Long]) =>
          val sorted = rows.toArray.sortBy(r => (r.doc_id, r.ck))
          val anchor = state.getOption
            .map(a => math.min(a, sorted.head.doc_id))
            .getOrElse(sorted.head.doc_id)
          state.update(anchor)
          sorted.iterator.filter(_.doc_id != anchor)
            .map(r => (r.doc_id, r.ck, anchor))
      }
      .toDF("doc_id", "ck", "anchor_id")
  }

  /** Batch twin of [[cdcDedupStream]]: per colliding document, how many of
    * its CDC chunks already existed under another anchor and the lowest
    * anchor hit. Oracle = the llm_cdc_chunks chunk CTEs + relational
    * min-anchor semantics. */
  val cdcDedup: QueryDef = QueryDef(
    "stream_cdc_dedup",
    LlmTextOps.cdcChunks.oracle.get
      .replaceFirst("(?s)\nfr AS .*$", "") +
      """
        |an AS (SELECT h, min(doc_id) AS anchor_id FROM ch GROUP BY h),
        |co AS (SELECT ch.doc_id, an.anchor_id
        |       FROM ch JOIN an USING (h) WHERE ch.doc_id <> an.anchor_id)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_chunks,
        |       min(anchor_id) AS anchor_id
        |FROM co GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) =>
    cdcDedupStream(LlmTextOps.cdcChunkFrameOf(Tables.documents(spark, dir)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_dup_chunks"), min($"anchor_id").as("anchor_id"))
      .orderBy($"doc_id")
  }

  /** Typed rows for the streaming EWMA. */
  final case class EwmaEvent(user_id: Long, event_id: Long, tus: Long, vc: Long)
  final case class EwmaOut(user_id: Long, event_id: Long, ewma_q: Long,
      ewma: Double)

  /** STREAMING EWMA — the batch `a4_ewma` (10-term truncated,
    * renormalized, decay 0.6) as a stateful stream operator: state per
    * user is the deque of its last ≤ 9 cent values, so every arriving
    * event emits its smoothed value with O(1) bounded state and no
    * shuffle-per-window. The truncation that made the batch form a
    * parallel window expression is exactly what makes the streaming
    * state BOUNDED — the untruncated recurrence would also be O(1) but
    * could never agree with a finite-window oracle.
    *
    * Within a batch, events fold in (event-time, event_id) order — the
    * batch window's sort key — so when each group is seen complete (the
    * registered batch twin) the fold IS `a4_ewma` and shares its DuckDB
    * oracle verbatim. Cross-batch correctness assumes event-time-ordered
    * batches, the same arrangement as [[asofEnrich]]; the spec proves a
    * two-batch split carries the deque across the boundary. All
    * arithmetic is the identical integer path (shared weight literals,
    * positive DIV), so stream ≡ batch ≡ oracle bit-for-bit. */
  def ewmaStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val evEnc: Encoder[EwmaEvent] = Encoders.product[EwmaEvent]
    implicit val stEnc: Encoder[List[Long]] = Encoders.kryo[List[Long]]
    implicit val outEnc: Encoder[EwmaOut] = Encoders.product[EwmaOut]
    val wts = graft.ops.WindowOps.EwmaWts
    events
      .select($"user_id", $"event_id", unix_micros($"ts").as("tus"),
        round($"value" * 100).cast("long").as("vc"))
      .as[EwmaEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[List[Long], EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[EwmaEvent], state: GroupState[List[Long]]) =>
          var hist = state.getOption.getOrElse(Nil) // most recent first, ≤ 9
          val out = evs.toSeq.sortBy(e => (e.tus, e.event_id)).map { e =>
            val window = (e.vc :: hist).take(10)
            val num = window.lazyZip(wts).map(_ * _).sum
            val den = wts.take(window.size).sum
            val q = num * 100 / den
            hist = window.take(9)
            EwmaOut(uid, e.event_id, q,
              BigDecimal(q).bigDecimal.movePointLeft(4).doubleValue)
          }
          state.update(hist)
          out.iterator
      }
      .toDF("user_id", "event_id", "ewma_q", "ewma")
  }

  /** Batch twin of [[ewmaStream]] — every group complete, so the fold
    * reproduces `a4_ewma` exactly and reuses its oracle SQL verbatim. */
  val ewmaStreamed: QueryDef = QueryDef(
    "stream_ewma",
    graft.ops.WindowOps.ewma.oracle.get,
  ) { (spark, dir) =>
    ewmaStream(Tables.events(spark, dir)).orderBy($"user_id", $"event_id")
  }

  /** Typed rows for the streaming every-nth sampler. */
  final case class NthEvent(user_id: Long, event_id: Long, tus: Long)
  final case class NthOut(user_id: Long, event_id: Long, seq_n: Long)

  /** STREAMING RATE-LIMIT SAMPLER — deterministic every-5th-event-per-key
    * throttling, the ingestion primitive for high-volume telemetry where a
    * random sample would be non-replayable: state per user is ONE long (its
    * lifetime event count), each arriving event increments it, and exactly
    * the 1st, 6th, 11th, … emit. Unlike `rand()`-based sampling the kept
    * set is a pure function of the event-time order, so a batch backfill
    * and the live stream select IDENTICAL events — which is what makes the
    * batch twin below oracle-checkable at all.
    *
    * Same arrival contract as [[ewmaStream]]/[[asofEnrich]]: within a
    * micro-batch events fold in (event-time, event_id) order and batches
    * arrive in event-time order; the spec proves the counter carries across
    * a two-batch split. O(1) state per key, no shuffle beyond the
    * `groupByKey` exchange every stateful op pays. */
  def sampleNthStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val evEnc: Encoder[NthEvent] = Encoders.product[NthEvent]
    implicit val stEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[NthOut] = Encoders.product[NthOut]
    events
      .select($"user_id", $"event_id", unix_micros($"ts").as("tus"))
      .as[NthEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[Long, NthOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[NthEvent], state: GroupState[Long]) =>
          var seen = state.getOption.getOrElse(0L)
          val out = evs.toSeq.sortBy(e => (e.tus, e.event_id)).flatMap { e =>
            seen += 1
            if ((seen - 1) % 5 == 0) Some(NthOut(uid, e.event_id, seen))
            else None
          }
          state.update(seen)
          out.iterator
      }
      .toDF("user_id", "event_id", "seq_n")
  }

  /** Batch twin of [[sampleNthStream]] — each group seen complete, so the
    * counter is the per-user row_number and the kept set is rn ≡ 1 (mod 5),
    * which is exactly what the oracle replays. */
  val sampleNth: QueryDef = QueryDef(
    "stream_sample_nth",
    """WITH s AS (SELECT user_id, event_id,
      |                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |           FROM events)
      |SELECT user_id, event_id, CAST(rn AS BIGINT) AS seq_n FROM s
      |WHERE (rn - 1) % 5 = 0 ORDER BY user_id, seq_n""".stripMargin,
  ) { (spark, dir) =>
    sampleNthStream(Tables.events(spark, dir)).orderBy($"user_id", $"seq_n")
  }

  /** Stage 1 of the windowed TOP-K: per-(1h window, type) counts — the
    * incremental stateful stage, same state bound as [[tumblingAgg]]
    * (windows in the lateness horizon × types). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n_events")

  /** Stage 2: per-window rank → top 3 (ties break on type). Ranking is not
    * row-incremental, so in streaming it runs at SERVE time on the tiny
    * agg output (the production-leaderboard split: stateful count upstream,
    * rank on read); the registered batch twin fuses both stages. */
  def topkFinish(counts: DataFrame): DataFrame =
    counts
      .select($"window_start", $"event_type", $"n_events",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"window_start")
          .orderBy($"n_events".desc, $"event_type")).cast("long").as("rk"))
      .filter($"rk" <= 3)

  val topk: QueryDef = QueryDef(
    "stream_topk",
    """WITH c AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |                  event_type, CAST(count(*) AS BIGINT) AS n_events
      |           FROM events GROUP BY 1, 2)
      |SELECT window_start, event_type, n_events, rk FROM (
      |  SELECT window_start, event_type, n_events,
      |         row_number() OVER (PARTITION BY window_start ORDER BY n_events DESC, event_type) AS rk
      |  FROM c) r WHERE rk <= 3
      |ORDER BY window_start, rk""".stripMargin,
  ) { (spark, dir) =>
    topkFinish(windowedCounts(Tables.events(spark, dir)))
      .orderBy($"window_start", $"rk")
  }

  /** Dictionary size for [[keywordTagged]]. */
  private val StreamTagK = 8

  /** Static tag dictionary for the streaming tagger — the [[StreamTagK]]
    * most frequent non-stopword unigrams (ties by text), mined BATCH-side
    * from the corpus at rest. In production this is the curated lexicon /
    * blocklist refreshed offline; the stream never recomputes it. */
  def tagDict(docs: DataFrame): DataFrame =
    docs.select(explode(split($"text", " ")).as("term"))
      .filter(!$"term".isin("a", "the"))
      .groupBy($"term").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"term").limit(StreamTagK)
      .select($"term")

  /** STREAMING keyword tagging — the batch `llm_keyword_tag` shape at the
    * ingest door: documents arrive on a stream, the static dictionary is
    * BROADCAST into a stream-static join (stateless — no state store
    * entry per row), and the only stateful operator is the
    * (doc_id, term)-keyed hit count, whose state is bounded by
    * tagged-vocabulary × documents-in-horizon, not stream volume. The
    * SAME function runs in batch (the registered, oracle-checked twin)
    * and on the stream (StreamingOpsSpec splits one document's rows
    * across two micro-batches and asserts the carried counts equal the
    * batch answer). */
  def tagHits(docs: DataFrame, dict: DataFrame): DataFrame =
    docs.select($"doc_id", explode(split($"text", " ")).as("term"))
      .join(broadcast(dict), "term")
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("n_hits"))

  /** Serve-time per-document tag summary over [[tagHits]] output — like
    * [[topkFinish]], row-incremental rank logic that in streaming runs at
    * READ time on the tiny hit table; the registered batch twin fuses
    * both stages. Emits tag count, total hits, and the dominant term
    * (ties to the lexicographically smallest). */
  def tagFinish(hits: DataFrame): DataFrame =
    hits
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"n_hits".desc, $"term")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tags"), sum($"n_hits").as("n_hits"),
        max(when($"rk" === 1, $"term")).as("top_term"))

  val keywordTagged: QueryDef = QueryDef(
    "stream_keyword_tag",
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |           FROM documents),
       |d AS (SELECT term FROM t WHERE term NOT IN ('a', 'the')
       |      GROUP BY 1 ORDER BY count(*) DESC, term LIMIT $StreamTagK),
       |h AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS n_hits
       |      FROM t JOIN d USING (term) GROUP BY 1, 2),
       |r AS (SELECT doc_id, term, n_hits,
       |             row_number() OVER (PARTITION BY doc_id
       |                                ORDER BY n_hits DESC, term) AS rk
       |      FROM h)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tags,
       |       CAST(sum(n_hits) AS BIGINT) AS n_hits,
       |       max(CASE WHEN rk = 1 THEN term END) AS top_term
       |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    tagFinish(tagHits(docs, tagDict(docs))).orderBy($"doc_id")
  }

  /** STREAMING BM25 indexing — the batch `llm_bm25_rank` pipeline split at
    * its natural stream/serve seam: the INDEX STATE is the (doc_id,
    * term)-keyed tf table, maintained as one streaming count aggregate
    * (associative — every micro-batch of arriving documents folds in
    * exactly like the batch count; state is postings-sized, the thing a
    * streaming search indexer actually persists). EVERYTHING else BM25
    * needs derives from that one state at read time: dl(doc) = Σ_w tf
    * (the "document-length pipeline" — avgdl shifts live as documents
    * arrive), df(w) = postings length, N and Σdl from the dl frame. */
  def bm25Index(docs: DataFrame): DataFrame =
    docs.select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))

  /** Serve-time BM25 over the [[bm25Index]] state — the identical
    * quantized scoring expression as the batch lane (k1 = 1.2, b = 0.75,
    * 1e-6 BIGINT contributions), so the registered twin shares
    * `llm_bm25_rank`'s oracle verbatim: same query terms, same top-k,
    * same scores — proving the state-derived dl/df/avgdl equal the
    * corpus-at-rest ones. */
  def bm25Finish(tf0: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val tf = graft.Caches.persist(tf0)
    // aliased join keys: the state table arrives as a memory-sink VIEW,
    // whose self-joins the analyzer does not attribute-deduplicate the
    // way file relations are — fresh output names on every derived side
    val dl = graft.Caches.persist(
      tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
        .select($"doc_id".as("dl_doc"), $"dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val dfreq = tf.groupBy($"w").agg(count(lit(1)).as("df"))
      .select($"w".as("df_w"), $"df")
    val contrib = tf
      .filter($"w".isin(terms: _*))
      .join(broadcast(dfreq.filter($"df_w".isin(terms: _*))),
        $"w" === $"df_w")
      .join(dl, $"doc_id" === $"dl_doc")
      .crossJoin(broadcast(stats))
      .select($"doc_id",
        round(
          round(log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)), 6)
            * ($"tf" * 2.2)
            / ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" * $"n_docs" / $"sum_dl".cast("double")))
            * 1000000).cast("long").as("cq"))
    contrib.groupBy($"doc_id")
      .agg(round(sum($"cq") / 1e6, 6).as("bm25"))
      .orderBy($"bm25".desc, $"doc_id")
      .limit(k)
  }

  val bm25Streamed: QueryDef = QueryDef(
    "stream_bm25_rank",
    graft.ops.RankingOps.bm25Rank.oracle.get,
  ) { (spark, dir) =>
    bm25Finish(bm25Index(Tables.documents(spark, dir)),
      Seq("dup", "vector", "merge"), 20)
  }

  /** Vector arrival stream for the ANN upsert lane, derived from the
    * embeddings table: every vector arrives once at seq 0, and vectors
    * with `vec_id % 7 == 3` (~14%, query ids included) arrive AGAIN at
    * seq 1 carrying a REPLACEMENT embedding — the negated vector, so
    * the re-embedding is deterministic, norm-preserving, and
    * closed-form-derivable on both engines (the model-refresh /
    * re-embed event a production vector store upserts). */
  def annArrivals(e: DataFrame): DataFrame =
    e.select($"vec_id", lit(0L).as("seq"), $"v", $"nrm")
      .unionAll(e.filter($"vec_id" % 7 === 3)
        .select($"vec_id", lit(1L).as("seq"),
          transform($"v", x => -x).as("v"), $"nrm"))

  /** The UPSERT STATE: last-writer-wins per vec_id as ONE associative
    * streaming aggregate (`max_by` over the arrival sequence number) —
    * the state store carries one row per LIVE vector (index-sized, not
    * stream-sized), and every micro-batch folds in exactly like the
    * batch aggregate, so mid-stream serves are always a consistent
    * index snapshot. At 100 TB this is the ingest half of a streaming
    * vector store: arrivals shuffle once on vec_id; payload vectors
    * never move again. */
  def annUpsertState(arrivals: DataFrame): DataFrame =
    arrivals.groupBy($"vec_id")
      .agg(max_by(struct($"v", $"nrm"), $"seq").as("s"))
      .select($"vec_id", $"s.v".as("v"), $"s.nrm".as("nrm"))

  /** STREAMING ANN maintenance twin (round-15 verdict item 6) — the
    * batch lifecycle (insert/delete/merge/compact) at the streaming
    * surface: vector arrivals maintained as the [[annUpsertState]]
    * upsert aggregate, served by the SAME corpus-derived-ladder
    * bucketed search as `llm_ann_lsh_scaled`
    * ([[graft.ops.EmbeddingOps.annLshScaledOf]]), so serve-time top-k
    * always reflects every arrival so far — re-embedded vectors move
    * buckets and rankings live. Oracle: the resolved corpus in closed
    * form + the search replay (never a replay of the upsert
    * mechanics); the spec proves mid-stream serve ≡ batch over arrived
    * vectors and that the upsert batch MOVES a query's top-k. */
  val annUpsert: QueryDef = QueryDef(
    "stream_ann_upsert",
    graft.ops.EmbeddingOps.annUpsertOracle,
  ) { (spark, dir) =>
    graft.ops.EmbeddingOps.annLshScaledOf(
      annUpsertState(annArrivals(graft.ops.EmbeddingOps.vectors(spark, dir))))
  }

  /** Per-type distinct-user HLL registers maintained as a STREAMING
    * aggregate — the streaming twin of `sketch_hll_registers`: register j
    * of a type's sketch is `max(rho)` over the hashed users landing in j,
    * and max is associative, so the state store carries 64 BIGINTs per
    * event type regardless of stream volume and every micro-batch folds
    * in exactly like the batch aggregate (the [[cmsAgg]] argument, for
    * cardinality instead of frequency). The registered batch twin emits
    * the SPARSE register table (observed registers only — the mergeable
    * object a sketch store persists); the estimate readout stays with the
    * batch op. Oracle replays the identical integer register derivation;
    * the spec proves stream ≡ batch across micro-batches. */
  def hllAgg(events: DataFrame): DataFrame = SketchOps.hllRegisterAgg(events)

  val hll: QueryDef = {
    val powers = (0 to 53).map(1L << _).mkString("[", ", ", "]")
    QueryDef(
      "stream_hll",
      s"""SELECT event_type, h % 64 AS j,
         |       CAST(max(1 + list_sum(list_transform($powers,
         |              p -> CASE WHEN h // 64 < p THEN 1 ELSE 0 END))) AS BIGINT) AS m
         |FROM (SELECT event_type,
         |             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |      FROM events)
         |GROUP BY event_type, j ORDER BY event_type, j""".stripMargin,
    ) { (spark, dir) =>
      hllAgg(Tables.events(spark, dir)).orderBy($"event_type", $"j")
    }
  }

  val all: Seq[QueryDef] = Seq(tumbling, sliding, dedup, session, stateful,
    customSession, enriched, attribution, cms, neardup, cdc, psi,
    asofEnriched, ewmaStreamed, sampleNth, topk, keywordTagged, hll,
    cdcDedup, lateData, bm25Streamed, annUpsert)
}
