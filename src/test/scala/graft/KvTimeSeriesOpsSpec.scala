package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class KvTimeSeriesOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("hourly dedup keeps exactly one (earliest) reading per station-hour") {
    val hourly = TimeSeriesOps.hourlyDedup.run(spark, sf)
    val dupKeys = hourly.groupBy($"event_type", $"day", $"hr")
      .count().filter($"count" > 1).count()
    assert(dupKeys == 0)
    // the kept event_id is the argmin-by-(ts, event_id) of its hour
    val raw = io.Tables.events(spark, sf)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"),
        hour($"ts").as("hr"), $"ts", $"event_id")
    val firsts = raw.groupBy($"event_type", $"day", $"hr")
      .agg(min(struct($"ts", $"event_id")).as("f"))
      .select($"event_type", $"day", $"hr", $"f.event_id".as("event_id"))
    val mismatch = hourly.select($"event_type", $"day", $"hr", $"event_id")
      .exceptAll(firsts).count()
    assert(mismatch == 0)
  }

  test("point read agrees with the full hourly table at the same key") {
    val point = TimeSeriesOps.pointRead.run(spark, sf).collect()
    val full = TimeSeriesOps.hourlyDedup.run(spark, sf)
      .filter($"event_type" === "click" && $"day" === "2024-01-15" && $"hr" === 10)
      .select($"event_id", $"value").collect()
    assert(point.toSeq == full.toSeq)
  }

  test("prefix-digit filter returns only ids whose first digit is even") {
    val rows = KvOps.prefixDigitFilter.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val first = r.getLong(0).toString.head
      assert("2468".contains(first), s"custkey ${r.getLong(0)} first digit odd")
    }
  }

  test("leaderboard is a descending top-10 with resolved names") {
    val rows = KvOps.top10Leaderboard.run(spark, sf).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getString(1).startsWith("Customer#")))
  }

  test("funnel fold: strict ordering, same-µs ties don't count, partial depths") {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    val m = 1000000L
    val events = Seq(
      // user 1: clean full chain
      (1L, 10L * m, "signup"), (1L, 20L * m, "view"),
      (1L, 30L * m, "click"), (1L, 40L * m, "purchase"),
      // user 2: view BEFORE signup ignored; view at the signup µs not
      // counted (strict >); later view counts; no click so purchase@25
      // can't complete the chain
      (2L, 5L * m, "view"), (2L, 10L * m, "signup"), (2L, 10L * m, "view"),
      (2L, 20L * m, "view"), (2L, 25L * m, "purchase"),
      // user 3: activity but never signs up
      (3L, 7L * m, "click"), (3L, 9L * m, "purchase"),
    ).toDF("user_id", "tus", "event_type")
      .withColumn("ts", timestamp_micros($"tus"))
      .select($"user_id", $"ts", $"event_type")
    val out = TimeSeriesOps.funnelOf(events).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, Some(10L * m), Some(20L * m), Some(30L * m), Some(40L * m), 4L),
      (2L, Some(10L * m), Some(20L * m), None, None, 2L),
      (3L, None, None, None, None, 0L),
    ))
  }
}
