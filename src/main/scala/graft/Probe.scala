package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema/behavior probes against the testdata.
  * Probes run the SHIPPED registered queries (not hand-copied twins, which
  * silently drift from the registry — round-5 advice). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = "/root/testdata/sf0.01"
    Seq("graph_adamic_adar_capped", "llm_ann_ivf_trained").foreach { name =>
      println(s"=== $name ===")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
