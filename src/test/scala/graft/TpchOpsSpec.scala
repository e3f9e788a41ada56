package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  // One shared session for the whole test run; tests only read testdata.
  lazy val spark: SparkSession = Sessions.local("4")
}

class TpchOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every registered query runs and returns a stable schema") {
    SparkEntry.defs.foreach { d =>
      val df = d.run(spark, sf)
      assert(df.columns.nonEmpty, s"${d.name}: no columns")
      assert(df.count() >= 0, s"${d.name}: count failed")
    }
  }

  test("every oracle references at least one known table") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      assert(tables.exists(lower.contains), s"$name oracle references no known table")
    }
  }

  test("entry (flagship redshift_q1) returns rows, most recent first") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 10)
    // testdata timestamps are parquet isAdjustedToUTC=false → TIMESTAMP_NTZ
    // in Spark 4, surfaced as java.time.LocalDateTime in Rows.
    val dates = rows.map(_.getAs[java.time.LocalDateTime](2))
    assert(dates.sliding(2).forall(p => !p(0).isBefore(p(1))), "not sorted desc by o_orderdate")
  }

  test("redshift_q2 restricts to the single largest market segment") {
    val df = ops.TpchOps.redshiftQ2.run(spark, sf)
    assert(df.count() > 0)
  }

  test("rds_q3 keeps customers with no matching order (left-join semantics)") {
    val df = ops.TpchOps.rdsQ3.run(spark, sf)
    val withNull = df.filter(df("o_orderkey").isNull).count()
    assert(withNull > 0, "expected BUILDING customers without an order on the literal date")
  }

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
