package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema/behavior probes against the testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = "/root/testdata/sf0.001"
    val ev = graft.io.Tables.events(spark, dir)
    ev.printSchema()
    ev.show(3, truncate = false)
    val q = SparkEntry.entry(spark)
    q.show(10, truncate = false)
    spark.stop()
  }
}
