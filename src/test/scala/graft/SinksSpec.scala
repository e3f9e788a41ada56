package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Sinks, SqlDump, Tables}
import graft.ops._

class SinksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("partitioned write prunes to one partition directory on keyed read") {
    val out = Files.createTempDirectory("graft_part").toString
    Sinks.writePartitioned(
      Tables.events(spark, sf).withColumn("day", to_date($"ts")),
      out, "event_type")
    val read = spark.read.parquet(out).filter($"event_type" === "click")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"no partition pruning in:\n$plan")
    val expected = Tables.events(spark, sf)
      .filter($"event_type" === "click").count()
    assert(read.count() == expected)
  }

  test("compaction rewrites a many-small-files layout into the target file count") {
    val smallDir = Files.createTempDirectory("graft_small").toString
    val bigDir = Files.createTempDirectory("graft_compact").toString
    // simulate a streaming/append layout: 64 tiny files
    Tables.events(spark, sf).repartition(64).write
      .mode("overwrite").parquet(smallDir)
    def parquetFiles(d: String): Array[java.io.File] =
      new java.io.File(d).listFiles.filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(smallDir).length == 64)
    val totalBytes = parquetFiles(smallDir).map(_.length).sum
    val n = Sinks.compact(spark, smallDir, bigDir, targetBytes = totalBytes / 4)
    assert(parquetFiles(bigDir).length == n && n <= 8)
    // content survives the rewrite exactly
    val before = Tables.events(spark, sf).count()
    assert(spark.read.parquet(bigDir).count() == before)
  }

  test("bucketed tables join and aggregate without a shuffle exchange") {
    Sinks.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
    Sinks.writeBucketed(
      Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity"),
      "b_lineitem", "l_orderkey", 8)
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val o = spark.table("b_orders")
        val l = spark.table("b_lineitem")
        val joined = o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(o("o_orderkey")).agg(sum($"l_quantity").as("q"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        // and it computes the right thing
        val expect = Tables.orders(spark, sf).join(
            Tables.lineitem(spark, sf),
            $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderkey").agg(sum($"l_quantity").as("q"))
        assert(joined.exceptAll(expect).count() == 0 &&
          expect.exceptAll(joined).count() == 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("SQL-dump INSERT statements parse into typed rows") {
    val dump = Files.createTempDirectory("graft_dump").resolve("data.sql")
    Files.writeString(dump,
      """INSERT INTO company VALUES (1, 'Apple', 'AAPL', 365817.0, 154000);
        |INSERT INTO company VALUES (2, 'O''Reilly Auto', 'ORLY', 14409.0, 86000);
        |INSERT INTO other VALUES (9, 'skip me');
        |CREATE TABLE company (id INT);
        |INSERT INTO company VALUES (3, 'Microsoft', 'MSFT', 198270.0, 221000);
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("ticker", StringType),
      StructField("annual_revenue", DoubleType),
      StructField("num_employees", IntegerType)))
    val df = SqlDump.inserts(spark, dump.toString, "company", schema)
      .orderBy($"id")
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(rows(0).getString(1) == "Apple")
    assert(rows(2).getDouble(3) == 198270.0)
    assert(rows(1).getInt(4) == 86000)
  }
}
