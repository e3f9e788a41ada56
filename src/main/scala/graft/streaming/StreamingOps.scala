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
    * `session_window` semantics. */
  val session: QueryDef = QueryDef(
    "stream_session_agg",
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
      |ORDER BY user_id, session_start_us""".stripMargin,
  ) { (spark, dir) =>
    sessionAgg(Tables.events(spark, dir))
      .orderBy($"user_id", $"session_start_us")
  }

  val stateful: QueryDef = QueryDef(
    "stream_stateful_stats",
    """SELECT user_id, count(*) AS n_events, max(value) AS max_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  ) { (spark, dir) =>
    statefulUserStats(Tables.events(spark, dir)).orderBy($"user_id")
  }

  val all: Seq[QueryDef] = Seq(tumbling, sliding, dedup, session, stateful)
}
