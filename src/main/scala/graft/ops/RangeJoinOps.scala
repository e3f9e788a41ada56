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

  val all: Seq[QueryDef] = Seq(errorNearClick)
}
