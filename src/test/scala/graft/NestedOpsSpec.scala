package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class NestedOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("custorders embeds every order exactly once (flat vs nested row count)") {
    val nested = NestedOps.custorders(spark, sf)
    val embedded = nested
      .select(coalesce(size($"orders_arr"), lit(0)).as("n"))
      .agg(sum($"n")).head.getLong(0)
    val flat = io.Tables.orders(spark, sf).count()
    assert(embedded == flat, s"embedded $embedded != flat $flat orders")
  }

  test("custorders keeps customers with zero orders (left-join semantics)") {
    val nested = NestedOps.custorders(spark, sf)
    val customers = io.Tables.customer(spark, sf).count()
    assert(nested.count() == customers)
  }

  test("flat and nested top-5 pipelines agree (MongoDB query4 vs query4Nest)") {
    val flat = NestedOps.top5Customers.run(spark, sf).collect().toSeq
    val nested = NestedOps.top5Nested.run(spark, sf).collect().toSeq
    assert(flat == nested)
  }

  test("a7_nest per-customer totals agree with a flat group-by") {
    val viaArray = NestedOps.nest.run(spark, sf)
    val c = io.Tables.customer(spark, sf)
    val o = io.Tables.orders(spark, sf)
    val flat = c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(count($"o_orderkey").as("num_orders"),
        round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spent"))
      .orderBy($"c_custkey")
    assert(viaArray.collect().toSeq == flat.collect().toSeq)
  }

  test("a7_point_nested finds exactly the one order with the probed key") {
    val rows = NestedOps.pointNested.run(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 1000L)
  }
}
