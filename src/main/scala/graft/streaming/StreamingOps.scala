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

  val all: Seq[QueryDef] = Seq(tumbling, sliding, dedup)
}
