package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class RangeJoinOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("range join catches cross-bucket pairs and rejects out-of-window ones") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val win = 60L * 1000000 // 1 minute in micros
    val left = Seq(
      (1L, ts("2024-01-01 10:00:59"), 1L), // pair at 10:01:30 is cross-bucket
      (1L, ts("2024-01-01 10:05:00"), 2L), // nothing within a minute
      (2L, ts("2024-01-01 10:00:30"), 3L), // same key other side missing
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 10:01:30"), 10L), // 31s after lid=1 (adjacent bucket)
      (1L, ts("2024-01-01 10:02:30"), 11L), // 91s after lid=1 → outside
      (3L, ts("2024-01-01 10:00:30"), 12L),
    ).toDF("k", "t", "rid")
    val got = RangeJoinOps.rangeJoin(left, right, "k", "t", win)
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 10L)))
  }

  test("registered range query pairs are all within the window, no dups") {
    val rows = RangeJoinOps.errorNearClick.run(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getLong(3)) <= 21600000000L))
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("sessions: gap splits, tight run merges, bounds and counts exact") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val gap = 3600L * 1000000 // 1 hour
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 10:30:00"), 1L, "click", 0.0), // 30 min -> same
      (3L, ts("2024-01-01 11:30:00"), 1L, "click", 0.0), // exactly 1h -> same (>gap splits)
      (4L, ts("2024-01-01 13:30:01"), 1L, "click", 0.0), // 2h1s -> new session
      (5L, ts("2024-01-01 10:00:00"), 2L, "click", 0.0), // other user isolated
      (6L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),  // other type ignored
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = RangeJoinOps.sessionsOf(ev, "click", gap).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess"),
        r.getAs[Long]("n_events")))
    assert(rows.toSet == Set((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 1L)),
      s"got ${rows.toSeq}")
  }

  test("interval overlap join: bucket-spanning pairs found, disjoint same-bucket pairs rejected") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val bucket = 86400L * 1000000 // 1 day
    def iv(user: Long, sess: Long, a: String, b: String) =
      (user, sess, ts(a), ts(b), 1L)
    val as = Seq(
      iv(1L, 1L, "2024-01-01 00:00:00", "2024-01-03 12:00:00"), // spans 3 buckets
      iv(1L, 2L, "2024-01-10 00:00:00", "2024-01-10 01:00:00"),
      iv(2L, 1L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"), // other-key twin
    ).toDF("user_id", "sess", "s_start", "s_end", "n_events")
    val bs = Seq(
      iv(1L, 1L, "2024-01-03 06:00:00", "2024-01-04 00:00:00"), // overlaps a1 by 6h
      iv(1L, 2L, "2024-01-10 01:00:00", "2024-01-10 02:00:00"), // touches a2 endpoint
      iv(1L, 3L, "2024-01-10 02:00:01", "2024-01-10 03:00:00"), // same bucket, disjoint
      iv(3L, 1L, "2024-01-01 00:00:00", "2024-01-05 00:00:00"), // key never matches
    ).toDF("user_id", "sess", "s_start", "s_end", "n_events")
    val got = RangeJoinOps.intervalOverlapJoin(as, bs, "user_id", bucket)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("a_sess"),
        r.getAs[Long]("b_sess")))
    assert(got.toSet == Set((1L, 1L, 1L), (1L, 2L, 2L)), s"got ${got.toSeq}")
    assert(got.length == 2, "multi-bucket co-span must not duplicate the pair")
  }

  test("session overlap registered query: symmetric bounds hold at sf0.01") {
    val rows = RangeJoinOps.sessionOverlap.run(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty, "48h-gap sessions must overlap at sf0.01 density")
    rows.foreach { r =>
      assert(r.getAs[Long]("overlap_us") >= 0L,
        "overlap filter must exclude negative (disjoint) spans")
    }
  }

  test("value band join equals the quadratic |delta| <= $1 ground truth") {
    import org.apache.spark.sql.functions.{col, round => rnd}
    // sf0.01: the $1 band is empty at sf0.001's density (150×10 balances
    // over a $11k range); here the quadratic ground truth is 225k pairs —
    // still trivial driver-side — and yields a non-degenerate 30-pair set.
    val sf = "/root/testdata/sf0.01"
    val cust = graft.io.Tables.customer(spark, sf)
      .select(col("c_custkey"), rnd(col("c_acctbal") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val supp = graft.io.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), rnd(col("s_acctbal") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ck, cc) <- cust; (sk, sc) <- supp if math.abs(sc - cc) <= 100
    } yield (ck, sk, cc, sc, sc - cc)).sortBy(p => (p._1, p._2)).toSeq
    val got = RangeJoinOps.bandBalance.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"band join: got ${got.size}, want ${want.size}")
    assert(want.nonEmpty, "some customer-supplier balance pair within $1")
  }
}
