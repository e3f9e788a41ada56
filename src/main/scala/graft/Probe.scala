package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main: schema/behavior probes against the testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val orders = graft.io.Tables.orders(spark, dir)
    val money = $"o_totalprice".cast("decimal(15,2)")
    orders
      .groupBy($"o_orderpriority")
      .agg(sum(money).cast("decimal(15,2)").as("total_money"),
        min(money).cast("decimal(15,2)").as("min_money"),
        max(money).cast("decimal(15,2)").as("max_money"))
      .orderBy($"o_orderpriority")
      .show(10, truncate = false)
    spark.stop()
  }
}
