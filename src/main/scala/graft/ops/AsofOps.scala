package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** As-of (point-in-time) join — the canonical operator Spark's built-in
  * surface lacks (north-star extension; the reference has no counterpart).
  * `asofJoin(left, right)` attaches to each left event the LATEST right
  * event of the same key with `right.ts <= left.ts`.
  *
  * Implementation is the scale-correct union form, per SURVEY §2 preference
  * (a) compose existing ops: tag both sides, union, and take
  * `last(right payload, ignoreNulls)` over a per-key window ordered by
  * (ts, side) with rows unbounded-preceding→current. ONE shuffle on the
  * join key, state linear in rows — never the naive range join whose
  * candidate set explodes quadratically per key, and no per-key driver
  * loop. Ties: a right event at exactly left.ts counts (≤ — right sorts
  * first at equal ts); equal-ts right events should be pre-deduped by the
  * caller for a deterministic pick.
  *
  * The DuckDB oracle uses its native `ASOF LEFT JOIN` — an independent
  * implementation agreeing row-for-row.
  */
object AsofOps {

  /** Generic as-of join on (`key`, `ts`): returns `left`'s columns plus
    * each right `payload` column as `asof_<name>` (null when no prior
    * right event exists for the key).
    *
    * The payload travels as ONE struct through a single
    * `last(..., ignoreNulls)` — not one window per column — so every
    * `asof_*` field comes from the same matched right row, including that
    * row's own NULLs. Per-column carries would backfill a NULL field from
    * an OLDER right event while other fields came from the newer one,
    * silently mixing rows (and diverging from `ASOF JOIN` semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select((key +: ts +: payload).map(col): _*)
      .withColumn("__side", lit(0))
    // pad each side with the other's missing columns (typed nulls), union
    val types = (l.schema ++ r.schema).map(f => f.name -> f.dataType).toMap
    val allCols = (l.columns ++ r.columns).distinct.toSeq
    def pad(df: DataFrame): DataFrame = allCols.foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(types(c))))
    val unioned = pad(l).select(allCols.map(col): _*)
      .unionByName(pad(r).select(allCols.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The when() wraps the struct, so left rows contribute NULL (skipped by
    // ignoreNulls) while a matched right row contributes atomically — a
    // right row whose payload fields are ALL null still overwrites older
    // ones, because the struct value itself is non-null.
    val carried = unioned.withColumn("__asof",
      last(when(col("__side") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    val projected = carried.filter(col("__side") === 1)
      .drop("__side")
      .drop(payload: _*)
    payload.foldLeft(projected)((df, p) =>
        df.withColumn(s"asof_$p", col("__asof").getField(p)))
      .drop("__asof")
  }

  /** For each purchase, the user's latest prior (or simultaneous) click:
    * `ASOF JOIN` over the events table. Right side deduped per (user, ts)
    * to the max event id so tie resolution is deterministic in both
    * engines. */
  val purchaseAsofClick: QueryDef = QueryDef(
    "asof_purchase_click",
    """WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
      |c0 AS (SELECT user_id, ts, event_id, value,
      |              row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |       FROM events WHERE event_type = 'click'),
      |c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
      |      FROM c0 WHERE rn = 1)
      |SELECT p.event_id, p.user_id,
      |       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us,
      |       round(p.value, 2) AS purchase_value,
      |       c.click_id, round(c.click_value, 2) AS click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin,
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    val clicks = ev.filter($"event_type" === "click")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"ts").orderBy(desc("event_id"))))
      .filter($"rn" === 1)
      .select($"user_id", $"ts", $"event_id".as("click_id"),
        $"value".as("click_value"))
    asofJoin(purchases, clicks, "user_id", "ts",
      payload = Seq("click_id", "click_value"))
      .select($"event_id", $"user_id",
        unix_micros($"ts").as("purchase_ts_us"),
        round($"value", 2).as("purchase_value"),
        $"asof_click_id".as("click_id"),
        round($"asof_click_value", 2).as("click_value"))
      .orderBy($"event_id")
  }

  /** Mirror of [[asofJoin]] looking FORWARD: attaches to each left event
    * the EARLIEST right event of the same key with `right.ts >= left.ts`.
    * Same union/window composition, reflected: at equal ts the left row
    * sorts first (`__side` 0 vs 1) so a simultaneous right event is
    * visible to the `[current, unbounded following]` frame — the ≥ tie
    * rule, matching the backward join's ≤. One shuffle on the key, state
    * linear in rows, same as the backward form. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(0))
    val r = right.select((key +: ts +: payload).map(col): _*)
      .withColumn("__side", lit(1))
    val types = (l.schema ++ r.schema).map(f => f.name -> f.dataType).toMap
    val allCols = (l.columns ++ r.columns).distinct.toSeq
    def pad(df: DataFrame): DataFrame = allCols.foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(types(c))))
    val unioned = pad(l).select(allCols.map(col): _*)
      .unionByName(pad(r).select(allCols.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned.withColumn("__asof",
      first(when(col("__side") === 1, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    val projected = carried.filter(col("__side") === 0)
      .drop("__side")
      .drop(payload: _*)
    payload.foldLeft(projected)((df, p) =>
        df.withColumn(s"asof_$p", col("__asof").getField(p)))
      .drop("__asof")
  }

  /** Conversion attribution: for each click, the user's FIRST subsequent
    * purchase within a 7-day horizon and the time-to-convert — the
    * forward as-of question ("what did this touch lead to?") that the
    * backward join ("what preceded this?") cannot answer. The horizon is
    * applied AFTER the match: an attribution window nulls out a
    * conversion that came too late rather than attributing the next one
    * beyond it. Purchases deduped per (user, ts) to the MIN event id so
    * tie resolution is deterministic in both engines. */
  val clickNextPurchase: QueryDef = QueryDef(
    "asof_click_next_purchase",
    """WITH c AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'),
      |p0 AS (SELECT user_id, ts, event_id, value,
      |              row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
      |       FROM events WHERE event_type = 'purchase'),
      |p AS (SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      |      FROM p0 WHERE rn = 1),
      |j AS (SELECT c.event_id, c.user_id,
      |             CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
      |             p.purchase_id, p.purchase_value,
      |             CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
      |      FROM c ASOF LEFT JOIN p
      |        ON c.user_id = p.user_id AND p.ts >= c.ts)
      |SELECT event_id, user_id, click_ts_us,
      |       CASE WHEN lag_us <= 604800000000 THEN purchase_id END AS purchase_id,
      |       CASE WHEN lag_us <= 604800000000 THEN round(purchase_value, 2) END AS purchase_value,
      |       CASE WHEN lag_us <= 604800000000 THEN lag_us END AS time_to_convert_us
      |FROM j ORDER BY event_id""".stripMargin,
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", $"value")
    val purchases = ev.filter($"event_type" === "purchase")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"ts").orderBy(asc("event_id"))))
      .filter($"rn" === 1)
      .select($"user_id", $"ts", $"event_id".as("purchase_id"),
        $"value".as("purchase_value"), unix_micros($"ts").as("p_ts_us"))
    val horizon = 604800000000L // 7 days in µs
    asofJoinForward(clicks, purchases, "user_id", "ts",
      payload = Seq("purchase_id", "purchase_value", "p_ts_us"))
      .withColumn("lag_us", $"asof_p_ts_us" - unix_micros($"ts"))
      .select($"event_id", $"user_id",
        unix_micros($"ts").as("click_ts_us"),
        when($"lag_us" <= horizon, $"asof_purchase_id").as("purchase_id"),
        when($"lag_us" <= horizon, round($"asof_purchase_value", 2)).as("purchase_value"),
        when($"lag_us" <= horizon, $"lag_us").as("time_to_convert_us"))
      .orderBy($"event_id")
  }

  /** NEAREST-in-time join: for each error event, the user's closest click
    * in EITHER direction within a 1-hour horizon — completing the as-of
    * family (backward [[purchaseAsofClick]], forward [[clickNextPurchase]],
    * nearest here) by COMPOSING the two directional joins and picking the
    * smaller absolute gap (tie → the earlier, backward click; the
    * matched-event convention for log correlation: "which click explains
    * this error"). The emitted delta is SIGNED (negative = click before
    * the error), so the direction survives into the output.
    *
    * Scale: two union-window as-of passes over the same user-keyed
    * exchange plus a per-row CASE — still no range join, state linear. */
  val nearestClick: QueryDef = QueryDef(
    "asof_nearest_click",
    """WITH e AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'),
      |c0 AS (SELECT user_id, ts, event_id,
      |              row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |       FROM events WHERE event_type = 'click'),
      |c AS (SELECT user_id, ts, event_id AS click_id FROM c0 WHERE rn = 1),
      |b AS (SELECT e.event_id, e.user_id, CAST(epoch_us(e.ts) AS BIGINT) AS e_us,
      |             c.click_id AS b_id, CAST(epoch_us(c.ts) AS BIGINT) AS b_us
      |      FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND c.ts <= e.ts),
      |f AS (SELECT e.event_id, c.click_id AS f_id, CAST(epoch_us(c.ts) AS BIGINT) AS f_us
      |      FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND c.ts >= e.ts),
      |j AS (SELECT b.event_id, b.user_id, b.e_us,
      |             CASE WHEN b.e_us - b.b_us <= 3600000000 THEN b.b_id END AS b_id,
      |             CASE WHEN b.e_us - b.b_us <= 3600000000 THEN b.e_us - b.b_us END AS db,
      |             CASE WHEN f.f_us - b.e_us <= 3600000000 THEN f.f_id END AS f_id,
      |             CASE WHEN f.f_us - b.e_us <= 3600000000 THEN f.f_us - b.e_us END AS df
      |      FROM b JOIN f ON b.event_id = f.event_id)
      |SELECT event_id, user_id, e_us AS error_ts_us,
      |       CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df) THEN b_id
      |            ELSE f_id END AS near_click_id,
      |       CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df) THEN -db
      |            ELSE df END AS signed_delta_us
      |FROM j ORDER BY event_id""".stripMargin,
  ) { (spark, dir) =>
    val horizon = 3600000000L // 1 hour in µs
    val ev = Tables.events(spark, dir)
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id")
    val clicks = ev.filter($"event_type" === "click")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"ts").orderBy(desc("event_id"))))
      .filter($"rn" === 1)
      .select($"user_id", $"ts", $"event_id".as("click_id"),
        unix_micros($"ts").as("c_us"))
    val back = asofJoin(errors, clicks, "user_id", "ts",
      payload = Seq("click_id", "c_us"))
      .select($"user_id", $"ts", $"event_id",
        $"asof_click_id".as("b_id0"), $"asof_c_us".as("b_us"))
    val both = asofJoinForward(back, clicks, "user_id", "ts",
      payload = Seq("click_id", "c_us"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("e_us"),
        $"b_id0", $"b_us",
        $"asof_click_id".as("f_id0"), $"asof_c_us".as("f_us"))
    both
      .select($"event_id", $"user_id", $"e_us",
        when($"e_us" - $"b_us" <= horizon, $"b_id0").as("b_id"),
        when($"e_us" - $"b_us" <= horizon, $"e_us" - $"b_us").as("db"),
        when($"f_us" - $"e_us" <= horizon, $"f_id0").as("f_id"),
        when($"f_us" - $"e_us" <= horizon, $"f_us" - $"e_us").as("df"))
      .select($"event_id", $"user_id", $"e_us".as("error_ts_us"),
        when($"db".isNotNull && ($"df".isNull || $"db" <= $"df"), $"b_id")
          .otherwise($"f_id").as("near_click_id"),
        when($"db".isNotNull && ($"df".isNull || $"db" <= $"df"), -$"db")
          .otherwise($"df").as("signed_delta_us"))
      .orderBy($"event_id")
  }

  val all: Seq[QueryDef] = Seq(purchaseAsofClick, clickNextPurchase,
    nearestClick)
}
