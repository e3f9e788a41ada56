package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Bounded-interval (range) join — the second classic operator Spark lacks
  * natively (north-star extension). `rangeJoin(left, right)` pairs rows of
  * the same key whose timestamps differ by at most `windowUs`.
  *
  * Scale plan: a naive implementation is an equi-join on the key with a
  * |Δt| filter — a per-key cartesian product that detonates on hot keys.
  * Here both sides are bucketed into window-sized time buckets and the
  * LEFT side probes its own bucket plus both neighbors (3 probe rows), so
  * the pairing is an EQUI-join on (key, bucket): any pair within the
  * window shares exactly one probed bucket (|Δbucket| ≤ 1, probe values
  * distinct — no duplicate pairs), and a final exact |Δt| filter removes
  * the overshoot. Shuffle is keyed on (key, bucket) — bounded candidate
  * sets, no quadratic blow-up.
  */
object RangeJoinOps {

  /** Right side's `ts` comes back as `__rts`; other right columns pass
    * through (caller avoids name clashes beyond `key`/`ts`). */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      windowUs: Long): DataFrame = {
    val lb = left
      .withColumn("__b0", floor(unix_micros(col(ts)) / windowUs))
      .withColumn("__b",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val rb = right
      .withColumnRenamed(ts, "__rts")
      .withColumn("__b", floor(unix_micros(col("__rts")) / windowUs))
    lb.join(rb, Seq(key, "__b"))
      .filter(abs(unix_micros(col(ts)) - unix_micros(col("__rts"))) <= windowUs)
      .drop("__b")
  }

  /** Every (error, click) pair of the same user within 6 hours of each
    * other, with the signed gap — the "what was the user doing around this
    * error" investigation query. Oracle is the naive inequality join
    * (quadratic is fine for the oracle, never for the engine). */
  val errorNearClick: QueryDef = QueryDef(
    "range_error_click",
    """SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id,
      |       CAST(epoch_us(c.ts) - epoch_us(e.ts) AS BIGINT) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id
      | AND abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 21600000000
      |ORDER BY error_id, click_id""".stripMargin,
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    rangeJoin(errors, clicks, key = "user_id", ts = "ts",
      windowUs = 21600000000L)
      .select($"event_id".as("error_id"), $"click_id", $"user_id",
        (unix_micros($"__rts") - unix_micros($"ts")).cast("long").as("gap_us"))
      .orderBy($"error_id", $"click_id")
  }

  /** Session gap (48 h — sized to this corpus's ~35 h median per-user
    * inter-event gap, so sessions are real multi-event spans; a web-scale
    * clickstream would use minutes) and overlap-join bucket width (7 d).
    * The bucket width bounds per-interval fan-out (span/width + 1
    * candidate rows) — size it near the typical interval length at
    * deploy time. */
  private val SessGapUs = 172800000000L
  private val OverlapBucketUs = 604800000000L

  /** Gap-based activity sessions of one event type: a new session opens
    * when the gap from the previous same-user event exceeds `gapUs`.
    * One user-keyed shuffle; both windows (gap detection, running session
    * counter) ride the same partitioning. */
  private[graft] def sessionsOf(ev: DataFrame, etype: String, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    ev.filter($"event_type" === etype)
      .select($"user_id", $"ts", $"event_id")
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("new_s", ($"prev".isNull ||
        unix_micros($"ts") - unix_micros($"prev") > gapUs).cast("long"))
      .withColumn("sess", sum($"new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess")
      .agg(min($"ts").as("s_start"), max($"ts").as("s_end"),
        count(lit(1)).as("n_events"))
  }

  /** INTERVAL×INTERVAL overlap join — the third range-family operator
    * (point-asof, point-band, and now span-overlap): pair intervals of
    * the same key that share at least one instant (closed intervals —
    * touching endpoints count, overlap_us = 0).
    *
    * Scale plan: each interval emits one row per [[OverlapBucketUs]]-wide
    * time bucket it spans; candidates equi-join on (key, bucket) — any
    * overlapping pair shares the bucket containing the overlap instant,
    * so recall is exact by construction; duplicate bucket matches dedup
    * on the pair key and the exact predicate prunes same-bucket
    * non-overlaps. Shuffle is keyed (key, bucket); fan-out per interval
    * is span/bucket + 1 — bounded, never the per-key cartesian the naive
    * inequality join detonates into on hot keys. */
  private[graft] def intervalOverlapJoin(a: DataFrame, b: DataFrame,
      key: String, bucketUs: Long): DataFrame = {
    def buckets(df: DataFrame, pfx: String): DataFrame =
      df.select(col(key),
          col("sess").as(s"${pfx}_sess"),
          col("s_start").as(s"${pfx}_start"), col("s_end").as(s"${pfx}_end"))
        .withColumn("__b", explode(sequence(
          floor(unix_micros(col(s"${pfx}_start")) / bucketUs),
          floor(unix_micros(col(s"${pfx}_end")) / bucketUs))))
    buckets(a, "a").join(buckets(b, "b"), Seq(key, "__b"))
      .drop("__b").distinct()
      .filter($"a_start" <= $"b_end" && $"b_start" <= $"a_end")
  }

  /** Overlapping (click-session, view-session) pairs per user with the
    * shared duration — "was the user browsing while clicking" co-activity
    * analysis. Oracle is the naive inequality join over identically
    * sessionized intervals (quadratic is fine for the oracle, never for
    * the engine). */
  val sessionOverlap: QueryDef = QueryDef(
    "range_session_overlap",
    s"""WITH ce AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
       |cg AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
       |                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $SessGapUs
       |                      THEN 1 ELSE 0 END AS new_s
       |       FROM ce WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |cs AS (SELECT user_id, sess, min(ts) AS s_start, max(ts) AS s_end
       |       FROM (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess FROM cg)
       |       GROUP BY 1, 2),
       |ve AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
       |vg AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
       |                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $SessGapUs
       |                      THEN 1 ELSE 0 END AS new_s
       |       FROM ve WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |vs AS (SELECT user_id, sess, min(ts) AS s_start, max(ts) AS s_end
       |       FROM (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess FROM vg)
       |       GROUP BY 1, 2)
       |SELECT cs.user_id, CAST(cs.sess AS BIGINT) AS click_sess,
       |       CAST(vs.sess AS BIGINT) AS view_sess,
       |       CAST(least(epoch_us(cs.s_end), epoch_us(vs.s_end))
       |            - greatest(epoch_us(cs.s_start), epoch_us(vs.s_start)) AS BIGINT) AS overlap_us
       |FROM cs JOIN vs ON cs.user_id = vs.user_id
       |                AND cs.s_start <= vs.s_end AND vs.s_start <= cs.s_end
       |ORDER BY cs.user_id, click_sess, view_sess""".stripMargin,
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    intervalOverlapJoin(
      sessionsOf(ev, "click", SessGapUs),
      sessionsOf(ev, "view", SessGapUs),
      key = "user_id", bucketUs = OverlapBucketUs)
      .select($"user_id", $"a_sess".as("click_sess"), $"b_sess".as("view_sess"),
        (least(unix_micros($"a_end"), unix_micros($"b_end"))
          - greatest(unix_micros($"a_start"), unix_micros($"b_start")))
          .cast("long").as("overlap_us"))
      .orderBy($"user_id", $"click_sess", $"view_sess")
  }

  /** BAND join on a VALUE domain (|a.x − b.x| ≤ δ with no equi-key at
    * all) — the third classic join Spark lacks, completing the family:
    * [[rangeJoin]] bands time within a key, `asof_*` picks one row, this
    * bands a measure across two tables. Customer×supplier account
    * balances within $1: the same bucket-and-probe plan as [[rangeJoin]]
    * but the BUCKET IS THE ONLY JOIN KEY (floor(cents/δ), probe 3
    * buckets), so what would be a full cartesian product becomes a
    * bucket-keyed equi-join whose candidate sets are bounded by the value
    * density per δ-band — on a cluster the shuffle partitions by value
    * band, the distributed sort-merge band join. Exact |Δ| filter on
    * candidates; cents arithmetic end-to-end. */
  val bandBalance: QueryDef = QueryDef(
    "range_band_join",
    """WITH c AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS c_cents
      |           FROM customer),
      |s AS (SELECT s_suppkey, CAST(round(s_acctbal * 100) AS BIGINT) AS s_cents,
      |             CAST(floor(CAST(round(s_acctbal * 100) AS BIGINT) / 100.0) AS BIGINT) AS b
      |      FROM supplier),
      |cb AS (SELECT c_custkey, c_cents,
      |              CAST(floor(c_cents / 100.0) AS BIGINT) + o.off AS b
      |       FROM c CROSS JOIN (VALUES (-1), (0), (1)) o(off))
      |SELECT cb.c_custkey, s.s_suppkey, cb.c_cents, s.s_cents,
      |       s.s_cents - cb.c_cents AS diff_cents
      |FROM cb JOIN s ON cb.b = s.b
      |WHERE abs(s.s_cents - cb.c_cents) <= 100
      |ORDER BY c_custkey, s_suppkey""".stripMargin,
  ) { (spark, dir) =>
    val delta = 100L // $1 band in cents
    val c = Tables.customer(spark, dir)
      .select($"c_custkey", round($"c_acctbal" * 100).cast("long").as("c_cents"))
    val s = Tables.supplier(spark, dir)
      .select($"s_suppkey", round($"s_acctbal" * 100).cast("long").as("s_cents"))
      .withColumn("b", floor($"s_cents" / (delta * 1.0)).cast("long"))
    val cb = c
      .withColumn("b0", floor($"c_cents" / (delta * 1.0)).cast("long"))
      .withColumn("b", explode(array($"b0" - 1, $"b0", $"b0" + 1)))
      .drop("b0")
    cb.join(s, "b")
      .filter(abs($"s_cents" - $"c_cents") <= delta)
      .select($"c_custkey", $"s_suppkey", $"c_cents", $"s_cents",
        ($"s_cents" - $"c_cents").as("diff_cents"))
      .orderBy($"c_custkey", $"s_suppkey")
  }

  val all: Seq[QueryDef] = Seq(errorNearClick, sessionOverlap, bandBalance)
}
