package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class SketchOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("HLL distinct counts are within 5% of exact per group") {
    val approx = SketchOps.approxDistinct.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = io.Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx $a vs exact $n")
    }
  }

  test("approximate percentiles bracket the exact quantiles") {
    val rows = SketchOps.approxPercentiles.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p95) = (r.getDouble(1), r.getDouble(2))
      assert(p50 < p95)
      val vals = io.Tables.events(spark, sf)
        .filter($"event_type" === r.getString(0))
        .select($"value").collect().map(_.getDouble(0)).sorted
      val exact50 = vals((vals.length * 0.5).toInt)
      assert(math.abs(p50 - exact50) < math.max(1.0, exact50 * 0.05))
    }
  }
}
