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
}
