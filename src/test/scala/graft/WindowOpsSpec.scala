package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class WindowOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  import org.apache.spark.sql.Row

  /** Inline session fixture: user 1 has gaps 60 s / 1801 s / 10 s around four
    * events — the 1801 s gap (just over the 30-min threshold) must split the
    * stream into exactly two sessions; the 1800 s gap of user 2 (exactly the
    * threshold, NOT greater) must not. */
  private def fixture = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id LONG, event_id LONG, value DOUBLE, tus LONG")
    val m = 1000000L // µs per second
    spark.createDataFrame(
      Seq(
        Row(1L, 10L, 1.0, 0L * m),
        Row(1L, 11L, 2.0, 60L * m),
        Row(1L, 12L, 4.0, (60L + 1801L) * m),
        Row(1L, 13L, 8.0, (60L + 1801L + 10L) * m),
        Row(2L, 20L, 1.0, 0L * m),
        Row(2L, 21L, 1.0, 1800L * m),
      ).asJava, schema)
  }

  test("sessionize splits strictly-over-threshold gaps and keeps boundary gaps") {
    val rows = WindowOps.sessionizeOf(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1L, 1L, 2L, 60L * 1000000L, 3.0),   // events 10,11
      (1L, 2L, 2L, 10L * 1000000L, 12.0),  // events 12,13 after the 1801 s gap
      (2L, 1L, 2L, 1800L * 1000000L, 2.0), // exactly-1800 s gap does NOT split
    ))
  }

  test("sessionize covers every event exactly once on real data") {
    val total = graft.io.Tables.events(spark, sf).count()
    val sessions = WindowOps.sessionize.run(spark, sf)
    assert(sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0) == total)
  }

  test("ntile quartiles are balanced within every nation (sizes differ by ≤1)") {
    val rows = WindowOps.ntileQuartiles.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (nation, qs) =>
      assert(qs.map(_._2).sorted.toSeq == (1L to qs.length).toSeq,
        s"nation $nation quartiles not contiguous from 1")
      val sizes = qs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"nation $nation unbalanced: ${sizes.toSeq}")
    }
  }

  test("percent_rank spans [0,1] and cume_dist ends at 1 per segment") {
    val rows = WindowOps.percentRank.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      assert(rs.map(_._2).min == 0.0 && rs.map(_._2).max == 1.0, s"segment $seg pr range")
      assert(rs.map(_._3).max == 1.0, s"segment $seg cume_dist must reach 1")
      assert(rs.forall(r => r._3 > 0.0 && r._3 <= 1.0))
    }
  }

  test("lag/lead gaps are inverse views of the same adjacency") {
    val df = WindowOps.lagLead.run(spark, sf)
    // sum of gap_prev over all rows equals sum of gap_next: each adjacent
    // pair contributes the same gap once to each column.
    val Array(p, n) = df
      .agg(org.apache.spark.sql.functions.sum("gap_prev_us"),
        org.apache.spark.sql.functions.sum("gap_next_us"))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(p == n && p > 0)
  }

  test("built-in session_window assembles the same sessions as the manual form") {
    // The two formulations may only diverge on a gap of EXACTLY 30 minutes
    // (built-in: >= closes, manual: > keeps) — absent on µs-grained data,
    // so per-user session counts and total event accounting must agree.
    val manual = WindowOps.sessionize.run(spark, sf)
      .groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val builtin = WindowOps.sessionWindow.run(spark, sf)
      .groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manual == builtin)
  }

  test("ewma: seed row passes through, decay weights blend, horizon truncates") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // user 1: two events — first is its own EWMA; second blends 0.6-decayed
    //   (2·1.0 + 1·0.6)/1.6 = 1.625
    // user 2: twelve identical values — the 10-term horizon renormalizes to
    //   exactly the constant
    val e = (Seq((1L, 101L, 1.00, 1000L), (1L, 102L, 2.00, 2000L)) ++
      (1 to 12).map(i => (2L, 200L + i, 5.00, i.toLong * 1000)))
      .toDF("user_id", "event_id", "value", "tus")
    val out = WindowOps.ewmaOf(e).collect()
      .map(r => r.getLong(1) -> r.getAs[Double]("ewma")).toMap
    assert(out(101L) == 1.0, "no history: EWMA is the value itself")
    assert(out(102L) == 1.625, s"decay blend: ${out(102L)}")
    assert((1 to 12).forall(i => out(200L + i) == 5.0),
      "constant series is a fixed point at any history depth")
    // weight table is the 1e-6-rounded geometric sequence it claims to be
    WindowOps.EwmaWts.zipWithIndex.foreach { case (w, k) =>
      assert(w == math.round(math.pow(0.6, k) * 1e6), s"weight $k")
    }
    // real data: monotone-bounded between each user's running min/max
    val rows = WindowOps.ewma.run(spark, sf).collect()
    val vals = graft.io.Tables.events(spark, sf)
      .select($"event_id", $"value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lo: Double = vals.values.min
    val hi: Double = vals.values.max
    assert(rows.forall { r =>
      val x = r.getAs[Double]("ewma"); x >= lo - 0.01 && x <= hi + 0.01
    }, "EWMA is a convex combination: stays inside the global value range")
  }

  test("bounce rate: singleton sessions bounce, midnight spans count on start day") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val us = 1000000L
    def t(day: Int, h: Int, m: Int): Long = // 2024-01-(day) h:m UTC in µs
      (1704067200L + (day - 1) * 86400L + h * 3600L + m * 60L) * us
    val e = Seq(
      // user 1: two events 10 min apart = ONE 2-event session on day 1
      (1L, 1L, 0.0, t(1, 10, 0)), (1L, 2L, 0.0, t(1, 10, 10)),
      // user 1 again 2h later: singleton session -> bounce on day 1
      (1L, 3L, 0.0, t(1, 12, 30)),
      // user 2: session STARTS 23:50 day 1, continues 00:10 day 2 (20-min
      // gap, same session) -> counts once, on day 1, not a bounce
      (2L, 4L, 0.0, t(1, 23, 50)), (2L, 5L, 0.0, t(2, 0, 10)),
      // user 3: singleton on day 2 -> bounce
      (3L, 6L, 0.0, t(2, 9, 0)),
    ).toDF("user_id", "event_id", "value", "tus")
    val rows = WindowOps.bounceRateOf(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows == Map(
      "2024-01-01" -> ((3L, 1L, 333333L)),
      "2024-01-02" -> ((1L, 1L, 1000000L))), s"got $rows")
  }

  test("coverage union: overlap merges, duplicates add nothing, touch splits") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val M = 1000000L
    val e = Seq(
      (1L, 1L, 0L), (1L, 2L, 0L),        // duplicate instant: second adds 0
      (1L, 3L, 100L * M),                // overlaps -> extends by 100s
      (1L, 4L, 400L * M),                // touches [0,400) exactly -> NEW interval
      (1L, 5L, 2000L * M),               // far away -> new interval
      (2L, 6L, 0L),                      // isolated singleton user
    ).map { case (u, id, t) => (u, id, 0.0, t) }
      .toDF("user_id", "event_id", "value", "tus")
    val got = WindowOps.coverageUnionOf(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((3L, 1000L * M)), // [0,400)+[400,700)+[2000,2300) = 1000 s
      2L -> ((1L, 300L * M))), s"got $got")
  }

  test("cume_dist/nth_value: exact ppm matches a driver-side recompute") {
    val rows = BigQueryOps.cumeDistNth.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    for ((brand, grp) <- rows.groupBy(_._2)) {
      val cents = grp.map(_._3).sorted
      val n = cents.length.toLong
      val secondLowest = grp.sortBy(p => (p._3, p._1)).apply(1)._3
      for ((pk, _, c, cume, second) <- grp) {
        assert(cume == cents.count(_ <= c) * 1000000L / n, s"$brand part $pk")
        assert(second == secondLowest, s"$brand nth_value(2)")
      }
      assert(grp.map(_._4).max == 1000000L, s"$brand max cume is exactly 1e6")
    }
  }

  test("rolling median is the lower median of each trailing 7-day window") {
    import org.apache.spark.sql.functions.{col, count, lit, to_date}
    val rows = WindowOps.rollingMedian.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
    for ((t, day, n, med) <- rows) {
      val d = java.time.LocalDate.parse(day)
      val window = daily(t)
        .filter(e => !e._2.isAfter(d) && !e._2.isBefore(d.minusDays(6)))
        .sortBy(e => (e._3, e._2.toEpochDay))
      assert(n == window.length.toLong, s"$t $day window size")
      assert(med == window((window.length + 1) / 2 - 1)._3, s"$t $day median")
    }
    // exactly one row per (type, day)
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }
}
