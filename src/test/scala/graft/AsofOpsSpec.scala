package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class AsofOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks latest prior-or-equal right event per key") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val quotes = Seq( // (key, ts, px)
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 50.0),
    ).toDF("k", "t", "px")
    val trades = Seq( // (key, ts, trade_id)
      (1L, ts("2024-01-01 10:05:00"), 900L), // equal ts → match 101
      (1L, ts("2024-01-01 10:07:30"), 901L), // between → match 101
      (1L, ts("2024-01-01 10:30:00"), 902L), // after all → match 102
      (2L, ts("2024-01-01 10:00:00"), 903L), // before any quote → null
      (3L, ts("2024-01-01 10:00:00"), 904L), // key with no quotes → null
    ).toDF("k", "t", "trade_id")
    val out = AsofOps.asofJoin(trades, quotes, "k", "t", Seq("px"))
      .orderBy($"trade_id")
      .collect()
      .map(r => r.getLong(r.fieldIndex("trade_id")) ->
        (if (r.isNullAt(r.fieldIndex("asof_px"))) None
         else Some(r.getDouble(r.fieldIndex("asof_px")))))
      .toSeq
    assert(out == Seq(
      900L -> Some(101.0), 901L -> Some(101.0), 902L -> Some(102.0),
      903L -> None, 904L -> None))
  }

  test("payload fields are carried atomically from the single matched row") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // The latest prior quote (10:05, id 20) has px = NULL. Per-column
    // carries would backfill px from the 10:00 row (100.0) while taking
    // venue from the 10:05 row — mixing two right events. Atomic carry must
    // return (px = null, venue = "B"), both from the 10:05 row.
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0), "A"),
      (1L, ts("2024-01-01 10:05:00"), Option.empty[Double], "B"),
    ).toDF("k", "t", "px", "venue")
    val trades = Seq((1L, ts("2024-01-01 10:08:00"), 900L))
      .toDF("k", "t", "trade_id")
    val out = AsofOps.asofJoin(trades, quotes, "k", "t", Seq("px", "venue"))
      .collect().head
    assert(out.isNullAt(out.fieldIndex("asof_px")),
      "asof_px must be the matched row's NULL, not an older row's value")
    assert(out.getString(out.fieldIndex("asof_venue")) == "B")
  }

  test("every purchase appears exactly once in the registered asof query") {
    val sf = "/root/testdata/sf0.001"
    val out = AsofOps.purchaseAsofClick.run(spark, sf)
    val purchases = io.Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(out.count() == purchases)
    assert(out.select($"event_id").distinct().count() == purchases)
  }

  test("forward asofJoin picks the earliest simultaneous-or-later right event") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val purchases = Seq( // (key, ts, pid)
      (1L, ts("2024-01-01 10:05:00"), 700L),
      (1L, ts("2024-01-01 10:10:00"), 701L),
      (2L, ts("2024-01-01 09:00:00"), 702L),
    ).toDF("k", "t", "pid")
    val clicks = Seq( // (key, ts, click_id)
      (1L, ts("2024-01-01 10:05:00"), 800L), // equal ts → match 700 (≥)
      (1L, ts("2024-01-01 10:06:00"), 801L), // between → next is 701
      (1L, ts("2024-01-01 10:30:00"), 802L), // after all → null
      (2L, ts("2024-01-01 10:00:00"), 803L), // purchase already past → null
      (3L, ts("2024-01-01 10:00:00"), 804L), // key never purchases → null
    ).toDF("k", "t", "click_id")
    val out = AsofOps.asofJoinForward(clicks, purchases, "k", "t", Seq("pid"))
      .collect().map(r => r.getAs[Long]("click_id") ->
        Option(r.getAs[java.lang.Long]("asof_pid")).map(_.toLong)).toMap
    assert(out == Map(800L -> Some(700L), 801L -> Some(701L), 802L -> None,
      803L -> None, 804L -> None))
  }

  test("attribution horizon nulls late conversions instead of skipping to none") {
    val rows = AsofOps.clickNextPurchase
      .run(spark, "/root/testdata/sf0.001").collect()
    val horizon = 604800000000L
    rows.foreach { r =>
      val pid = Option(r.getAs[java.lang.Long]("purchase_id"))
      val lag = Option(r.getAs[java.lang.Long]("time_to_convert_us"))
      assert(pid.isDefined == lag.isDefined, "id and lag null together")
      lag.foreach(l => assert(l >= 0 && l <= horizon,
        s"converted lag $l outside [0, horizon]"))
    }
    assert(rows.exists(r => r.get(3) != null), "some click converts")
  }

  test("nearest click picks the smaller absolute gap, backward on ties") {
    import org.apache.spark.sql.functions.{col, desc, row_number, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val horizon = 3600000000L
    val ev = graft.io.Tables.events(spark, sf)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replicate the op's (user, ts) click dedup: max event_id wins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts")).orderBy(desc("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val out = AsofOps.nearestClick.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (Option(r.getAs[java.lang.Long]("near_click_id")),
        Option(r.getAs[java.lang.Long]("signed_delta_us")))).toMap
    assert(out.size == errors.length)
    var matched = 0
    for ((eid, uid, eus) <- errors) {
      val cs = clicks.getOrElse(uid, Array.empty)
      val back = cs.filter(c => c._3 <= eus && eus - c._3 <= horizon)
        .sortBy(c => (eus - c._3, -c._2)).headOption
      val fwd = cs.filter(c => c._3 >= eus && c._3 - eus <= horizon)
        .sortBy(c => (c._3 - eus, -c._2)).headOption
      val want = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (eus - b._3 <= f._3 - eus) Some((b._2, -(eus - b._3)))
          else Some((f._2, f._3 - eus))
        case (Some(b), None) => Some((b._2, -(eus - b._3)))
        case (None, Some(f)) => Some((f._2, f._3 - eus))
        case _ => None
      }
      assert(out(eid) == ((want.map(_._1), want.map(_._2))), s"error $eid")
      if (want.isDefined) matched += 1
    }
    assert(matched > 0, "some error has a click within the hour")
  }
}
