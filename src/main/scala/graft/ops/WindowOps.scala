package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Window-function breadth beyond the reference's ROW_NUMBER/RANK usage
  * (SURVEY §2.5): lag/lead event gaps, frame-bounded moving aggregates,
  * gap-based sessionization, per-group NTILE and distribution ranks — the
  * shapes an events/time-series surface needs that the reference's engines
  * (`Bigtable.java` scans, `redis_client.py` sorted sets) compute client-side
  * when they compute them at all.
  *
  * Scale notes: every window here is partitioned on a high-cardinality key
  * (`user_id`, `c_nationkey`, `c_mktsegment`), so the plan is ONE hash
  * shuffle on the partition key followed by a per-partition sort — no global
  * sort, no single-partition window (the classic scale bug with an
  * unpartitioned OVER ()). Sessionization is the lag→flag→running-sum
  * composition, all inside the same window partitioning, so the three window
  * functions share one exchange + sort. Timestamps are compared as integer
  * microseconds (`unix_micros` ↔ DuckDB `epoch_us`) so gap thresholds are
  * exact integer predicates on both engines.
  */
object WindowOps {

  /** Events keyed for user-ordered windows: integer-µs event time. */
  private def userEvents(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"value", unix_micros($"ts").as("tus"))

  private def userWindow = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")

  /** Per-user previous/next inter-event gaps (lag + lead over one window —
    * both functions share the single user-keyed sort). */
  val lagLead: QueryDef = QueryDef(
    "a4_lag_lead",
    """SELECT user_id, event_id,
      |       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_prev_us,
      |       lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_next_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |ORDER BY user_id, event_id""".stripMargin,
  ) { (spark, dir) =>
    val w = userWindow
    userEvents(spark, dir)
      .select($"user_id", $"event_id",
        ($"tus" - lag($"tus", 1).over(w)).as("gap_prev_us"),
        (lead($"tus", 1).over(w) - $"tus").as("gap_next_us"))
      .orderBy($"user_id", $"event_id")
  }

  /** Frame-bounded moving aggregate: average and max of the last 4 readings
    * per user (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW). The average is
    * round(sum,2)/count — the repo's float-determinism convention — and the
    * max is exact, so the frame aggregate hash-compares. */
  val movingAvg: QueryDef = QueryDef(
    "a4_moving_avg",
    """SELECT user_id, event_id,
      |       round(sum(value) OVER w, 2) / count(value) OVER w AS mov_avg,
      |       max(value) OVER w AS mov_max
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin,
  ) { (spark, dir) =>
    val w = userWindow.rowsBetween(-3, Window.currentRow)
    userEvents(spark, dir)
      .select($"user_id", $"event_id",
        (round(sum($"value").over(w), 2) / count($"value").over(w)).as("mov_avg"),
        max($"value").over(w).as("mov_max"))
      .orderBy($"user_id", $"event_id")
  }

  /** Gap-based sessionization (30-minute inactivity closes a session): the
    * batch twin of `stream_session_agg`'s session windows, as the canonical
    * lag → new-session flag → running-sum session id, then one aggregate per
    * (user, session). All three window steps reuse the same user-keyed
    * exchange + sort; the final aggregate shuffles on (user_id, session_id).
    */
  val sessionize: QueryDef = QueryDef(
    "a4_sessionize",
    """WITH x AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS tus,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, value, tus,
      |         CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM x),
      |s AS (
      |  SELECT user_id, value, tus,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM f)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       max(tus) - min(tus) AS dur_us,
      |       round(sum(value), 2) AS sum_value
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin,
  ) { (spark, dir) => sessionizeOf(userEvents(spark, dir)) }

  /** Session assembly over (user_id, event_id, value, tus) rows — split out
    * so the spec can pin boundary semantics on an inline fixture. */
  private[graft] def sessionizeOf(e: org.apache.spark.sql.DataFrame) = {
    val wo = userWindow
    e.withColumn("prev", lag($"tus", 1).over(wo))
      .withColumn("brk",
        when($"prev".isNull || $"tus" - $"prev" > 1800000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum($"brk").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        (max($"tus") - min($"tus")).as("dur_us"),
        round(sum($"value"), 2).as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** Per-nation account-balance quartiles: NTILE(4) inside each nation, then
    * one aggregate per (nation, quartile). The window partitions on
    * nationkey, so quartile assignment parallelizes per nation group. */
  val ntileQuartiles: QueryDef = QueryDef(
    "a2_ntile_quartiles",
    """WITH q AS (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |         ntile(4) OVER (PARTITION BY c_nationkey
      |                        ORDER BY c_acctbal DESC, c_custkey) AS quartile
      |  FROM customer)
      |SELECT c_nationkey, CAST(quartile AS BIGINT) AS quartile,
      |       CAST(count(*) AS BIGINT) AS n_cust,
      |       round(sum(c_acctbal), 2) AS sum_bal
      |FROM q GROUP BY c_nationkey, quartile
      |ORDER BY c_nationkey, quartile""".stripMargin,
  ) { (spark, dir) =>
    val w = Window.partitionBy($"c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(spark, dir)
      .select($"c_nationkey", $"c_acctbal",
        ntile(4).over(w).cast("long").as("quartile"))
      .groupBy($"c_nationkey", $"quartile")
      .agg(count(lit(1)).as("n_cust"), round(sum($"c_acctbal"), 2).as("sum_bal"))
      .orderBy($"c_nationkey", $"quartile")
  }

  /** PERCENT_RANK + CUME_DIST per market segment. Both are exact rational
    * divisions of the same integers on both engines ((rank-1)/(n-1),
    * rows≤/n), so the doubles are bit-identical — no rounding needed. */
  val percentRank: QueryDef = QueryDef(
    "a2_percent_rank",
    """SELECT c_mktsegment, c_custkey,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin,
  ) { (spark, dir) =>
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    Tables.customer(spark, dir)
      .select($"c_mktsegment", $"c_custkey",
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }

  /** Time-interval RANGE frame — the frame type [[movingAvg]]'s ROWS frame
    * cannot express: per user, the event count and value sum over the
    * TRAILING HOUR of event time, however many rows that is. Ordering and
    * the frame bound are integer microseconds on both engines (`unix_micros`
    * ↔ `epoch_us`, bound = 3_600_000_000), so peer-row and boundary
    * semantics are exact; values quantize to 1e-3 BIGINTs before the frame
    * sum (same determinism contract as `a4_zscore_outliers`), so the
    * windowed aggregate hash-compares at any parallelism. Same single
    * user-keyed exchange + sort as every other window here. */
  val rangeFrame: QueryDef = QueryDef(
    "a4_range_frame",
    """SELECT user_id, event_id, epoch_us(ts) AS tus,
      |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |       CAST(sum(CAST(round(value * 1000.0) AS BIGINT)) OVER w AS BIGINT) AS sumq_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin,
  ) { (spark, dir) =>
    val w = Window.partitionBy($"user_id").orderBy($"tus")
      .rangeBetween(-3600000000L, Window.currentRow)
    userEvents(spark, dir)
      .select($"user_id", $"event_id", $"tus",
        count(lit(1)).over(w).as("n_1h"),
        sum(round($"value" * 1000.0).cast("long")).over(w).as("sumq_1h"))
      .orderBy($"user_id", $"event_id")
  }

  /** first/nth/last_value over the full partition frame — the positional
    * window family the other queries don't touch. One row per
    * (event_type, day) group (row_number()=1 filter after the full-frame
    * values are computed), ordering pinned by (µs, event_id) so same-µs
    * ties can't flip a position. The frame must be spelled UNBOUNDED
    * PRECEDING AND UNBOUNDED FOLLOWING on both engines: the default frame
    * stops at CURRENT ROW, which silently turns last_value into "current
    * value" — the classic positional-window bug, pinned here by the
    * oracle. */
  val positional: QueryDef = QueryDef(
    "a4_positional_values",
    """SELECT event_type, day, first_v, second_v, last_v FROM (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |         first_value(value) OVER w AS first_v,
      |         nth_value(value, 2) OVER w AS second_v,
      |         last_value(value) OVER w AS last_v,
      |         row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |                            ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
      |               ORDER BY epoch_us(ts), event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |WHERE rn = 1 ORDER BY event_type, day""".stripMargin,
  ) { (spark, dir) =>
    val wRank = Window
      .partitionBy($"event_type", $"day").orderBy($"tus", $"event_id")
    val w = wRank
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        unix_micros($"ts").as("tus"), $"event_id", $"value")
      .select($"event_type", $"day",
        first($"value").over(w).as("first_v"),
        nth_value($"value", 2).over(w).as("second_v"),
        last($"value").over(w).as("last_v"),
        row_number().over(wRank).as("rn"))
      .filter($"rn" === 1).drop("rn")
      .orderBy($"event_type", $"day")
  }

  /** The BUILT-IN session assembly (`session_window(ts, gap)`) — the same
    * sessions [[sessionize]] derives manually via lag→flag→running-sum,
    * through Spark's native session-window aggregate instead (one
    * user-keyed aggregate, merge-on-overlap state; also the form
    * Structured Streaming runs incrementally). Boundary semantics differ
    * at EXACTLY the gap: the built-in closes a session when the next event
    * is ≥ gap away (windows are half-open `[start, start+gap)`), while the
    * manual form's `> gap` keeps it — the oracle spells `>=` to pin the
    * built-in's convention. */
  val sessionWindow: QueryDef = QueryDef(
    "a4_session_window",
    """WITH x AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS tus,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, value, tus,
      |         CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM x),
      |s AS (
      |  SELECT user_id, value, tus,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM f)
      |SELECT user_id, min(tus) AS session_start,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       round(sum(value), 2) AS sum_value
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin,
  ) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .select($"user_id",
        unix_micros($"session_window.start").as("session_start"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start")
  }

  /** Exponentially-weighted moving average (decay 0.6) of `value` over each
    * user's trailing 10 events — the smoothing step a monitoring/feature
    * pipeline runs after [[movingAvg]]'s uniform window. The finite-horizon
    * truncation (10 terms ≈ decay¹⁰ < 1.1% residual mass, renormalized over
    * the weights actually present) makes EWMA a plain windowed expression
    * instead of a sequential recurrence — the form that parallelizes: ONE
    * user-keyed exchange + sort shared by all ten `lag`s, no cross-row
    * dependency chain, so the plan scales exactly like any other window op.
    *
    * Determinism: the decay weights are pre-rounded 1e-6 INTEGER literals
    * (`round(0.6^k·1e6)`), values are exact cents, so numerator/denominator
    * are exact BIGINTs on both engines and the quantized quotient is a
    * single positive-integer division (floor ≡ truncate) — no float enters
    * until the final display scaling. */
  /** Pre-rounded 1e-6 integer decay weights `round(0.6^k · 1e6)`,
    * k = 0..9 — shared by the SQL oracle and the Spark plan so the two
    * can never drift. */
  private[graft] val EwmaWts = Seq(1000000L, 600000L, 360000L, 216000L,
    129600L, 77760L, 46656L, 27994L, 16796L, 10078L)

  val ewma: QueryDef = {
    val wts = EwmaWts
    val lagSql = (1 to 9).map(k => s"lag(vc, $k) OVER w AS v$k").mkString(",\n      |         ")
    val numSql = ("vc * 1000000" +: (1 to 9).map(k => s"coalesce(v$k, 0) * ${wts(k)}")).mkString(" + ")
    val denSql = ("1000000" +: (1 to 9).map(k =>
      s"CASE WHEN v$k IS NULL THEN 0 ELSE ${wts(k)} END")).mkString(" + ")
    QueryDef(
      "a4_ewma",
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
         |                  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
         |l AS (SELECT user_id, event_id, vc,
         |         $lagSql
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |q AS (SELECT user_id, event_id,
         |             CAST(($numSql) * 100 AS BIGINT) // CAST($denSql AS BIGINT) AS ewma_q
         |      FROM l)
         |SELECT user_id, event_id, ewma_q,
         |       round(CAST(ewma_q AS DOUBLE) / 10000.0, 4) AS ewma
         |FROM q ORDER BY user_id, event_id""".stripMargin,
    ) { (spark, dir) =>
      ewmaOf(Tables.events(spark, dir)
        .select($"user_id", $"event_id", $"value", unix_micros($"ts").as("tus")))
    }
  }

  /** The EWMA plan over (user_id, event_id, value, tus) rows — split out so
    * the spec can pin the weight renormalization on an inline fixture. */
  private[graft] def ewmaOf(e: org.apache.spark.sql.DataFrame) = {
    val wts = EwmaWts
    val w = userWindow
    val vc = round($"value" * 100).cast("long").as("vc")
    val lags = (1 to 9).map(k => lag($"vc", k).over(w).as(s"v$k"))
    val l = e.select($"user_id", $"event_id", $"tus", vc)
      .select($"user_id" +: $"event_id" +: $"vc" +: lags: _*)
    val num = (1 to 9).foldLeft($"vc" * 1000000L) { (acc, k) =>
      acc + coalesce(col(s"v$k"), lit(0L)) * wts(k)
    }
    val den = (1 to 9).foldLeft(lit(1000000L).cast("long")) { (acc, k) =>
      acc + when(col(s"v$k").isNull, 0L).otherwise(wts(k))
    }
    l.select($"user_id", $"event_id", (num * 100).as("num"), den.as("den"))
      .select($"user_id", $"event_id", expr("num DIV den").as("ewma_q"))
      .select($"user_id", $"event_id", $"ewma_q",
        round($"ewma_q".cast("double") / 10000.0, 4).as("ewma"))
      .orderBy($"user_id", $"event_id")
  }

  /** Daily bounce rate — fraction of sessions with exactly one event, the
    * product-analytics staple derived one step past [[sessionize]]: same
    * gap-30-min session assembly (one user-keyed window sort, shared
    * exchange with the whole `a4_*` family), then sessions roll up to a
    * calendar-bounded |days| frame keyed by session START day. Rate is
    * exact integer ppm; a session spanning midnight counts once, on its
    * start day (pinned by the fixture spec). */
  val bounceRate: QueryDef = QueryDef(
    "a4_bounce_rate",
    """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
      |                  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |           FROM events),
      |f AS (SELECT user_id, event_id, tus,
      |             CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM x),
      |s AS (SELECT user_id, tus,
      |             sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      |      FROM f),
      |g AS (SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events, min(tus) AS start_us
      |      FROM s GROUP BY 1, 2),
      |d AS (SELECT CAST(make_timestamp(start_us) AS DATE) AS day,
      |             CAST(count(*) AS BIGINT) AS n_sessions,
      |             CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces
      |      FROM g GROUP BY 1)
      |SELECT CAST(day AS VARCHAR) AS day, n_sessions, n_bounces,
      |       CAST(n_bounces * 1000000 // n_sessions AS BIGINT) AS bounce_ppm
      |FROM d ORDER BY day""".stripMargin,
  ) { (spark, dir) => bounceRateOf(userEvents(spark, dir)) }

  /** Bounce-rate assembly over (user_id, event_id, tus) rows — split out
    * so the spec can pin the midnight-spanning and single-event cases. */
  private[graft] def bounceRateOf(e: org.apache.spark.sql.DataFrame) = {
    val wo = userWindow
    e.withColumn("prev", lag($"tus", 1).over(wo))
      .withColumn("brk",
        when($"prev".isNull || $"tus" - $"prev" > 1800000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum($"brk").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), min($"tus").as("start_us"))
      .groupBy(to_date(timestamp_micros($"start_us")).as("d"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when($"n_events" === 1, 1L).otherwise(0L)).as("n_bounces"))
      .select(date_format($"d", "yyyy-MM-dd").as("day"),
        $"n_sessions", $"n_bounces",
        expr("n_bounces * 1000000 DIV n_sessions").as("bounce_ppm"))
      .orderBy($"day")
  }

  /** Interval-union coverage: each event projects a 5-minute activity
    * interval `[ts, ts+300 s)`; per user, the total length of the UNION of
    * those intervals (overlaps merged, not double-counted) and the number
    * of merged intervals — the "how much wall-clock was this key active"
    * question sessionization's gap rule approximates but never measures.
    * The sweep is the classic sort + running-max-end: an interval's new
    * contribution is `max(0, end − max(prev_max_end, start))`, a break
    * opens when the running max can't reach the next start. One user-keyed
    * window (the shared a4 exchange), all math integer µs. */
  val coverageUnion: QueryDef = QueryDef(
    "a4_coverage_union",
    """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS fin FROM events),
      |w AS (SELECT user_id, s, fin,
      |             max(fin) OVER (PARTITION BY user_id ORDER BY s, event_id
      |                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |      FROM iv),
      |c AS (SELECT user_id,
      |             CASE WHEN pmax IS NULL OR pmax <= s THEN 1 ELSE 0 END AS brk,
      |             greatest(0, fin - greatest(coalesce(pmax, s), s)) AS contrib
      |      FROM w)
      |SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_intervals,
      |       CAST(sum(contrib) AS BIGINT) AS covered_us
      |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
  ) { (spark, dir) => coverageUnionOf(userEvents(spark, dir)) }

  /** Coverage sweep over (user_id, event_id, tus) rows, 5-min intervals —
    * split out for fixture specs (overlap, nesting, exact-touch cases). */
  private[graft] def coverageUnionOf(e: org.apache.spark.sql.DataFrame) = {
    e.select($"user_id", $"event_id", $"tus".as("s"),
        ($"tus" + 300000000L).as("fin"))
      .withColumn("pmax", max($"fin").over(
        Window.partitionBy($"user_id").orderBy($"s", $"event_id")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select($"user_id",
        when($"pmax".isNull || $"pmax" <= $"s", 1L).otherwise(0L).as("brk"),
        greatest(lit(0L), $"fin" - greatest(coalesce($"pmax", $"s"), $"s")).as("contrib"))
      .groupBy($"user_id")
      .agg(sum($"brk").as("n_intervals"), sum($"contrib").as("covered_us"))
      .orderBy($"user_id")
  }

  /** 7-day ROLLING MEDIAN of each type's daily counts — the robust
    * smoother next to `a4_moving_avg`'s mean (one outlier day drags a mean
    * for a week; the median shrugs). No engine exposes a median window
    * frame, so the op materializes each day's trailing week explicitly: a
    * day-range self-join on the |types|×|days| CALENDAR aggregate (≤7
    * rows per output row — calendar-bounded state, never events²), then
    * the LOWER median as a real order statistic under the (count, day)
    * total order — the same rank-filter discipline as `stats_theil_sen`.
    * Warm-up days (fewer than 7 in window) emit with their actual window
    * size rather than dropping — n_in_window says which is which. */
  val rollingMedian: QueryDef = QueryDef(
    "a4_rolling_median",
    """WITH d AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |                  datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
      |                  CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2, 3),
      |j AS (SELECT a.event_type AS event_type, a.day AS day, a.dn AS dn,
      |             b.c AS c, b.dn AS bdn
      |      FROM d a JOIN d b ON a.event_type = b.event_type
      |                       AND b.dn BETWEEN a.dn - 6 AND a.dn),
      |r AS (SELECT event_type, day, c,
      |             row_number() OVER (PARTITION BY event_type, dn ORDER BY c, bdn) AS rk,
      |             count(*) OVER (PARTITION BY event_type, dn) AS cnt
      |      FROM j)
      |SELECT event_type, day, CAST(cnt AS BIGINT) AS n_in_window, c AS rolling_median
      |FROM r WHERE rk = (cnt + 1) // 2 ORDER BY event_type, day""".stripMargin,
  ) { (spark, dir) =>
    val d = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").cast("string").as("day"),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date")).as("dn"))
      .agg(count(lit(1)).as("c"))
    val j = d.as("a")
      .join(d.as("b"), $"a.event_type" === $"b.event_type" &&
        $"b.dn".between($"a.dn" - 6, $"a.dn"))
      .select($"a.event_type".as("event_type"), $"a.day".as("day"),
        $"a.dn".as("dn"), $"b.c".as("c"), $"b.dn".as("bdn"))
    val byDay = Window.partitionBy($"event_type", $"dn")
    j.select($"event_type", $"day", $"c",
        row_number().over(byDay.orderBy($"c", $"bdn")).as("rk"),
        count(lit(1)).over(byDay).as("cnt"))
      .filter($"rk" === expr("(cnt + 1) DIV 2"))
      .select($"event_type", $"day", $"cnt".as("n_in_window"),
        $"c".as("rolling_median"))
      .orderBy($"event_type", $"day")
  }

  val all: Seq[QueryDef] =
    Seq(lagLead, movingAvg, sessionize, ntileQuartiles, percentRank,
      rangeFrame, positional, sessionWindow, ewma, bounceRate, coverageUnion,
      rollingMedian)
}
