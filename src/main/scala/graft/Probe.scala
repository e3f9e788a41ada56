package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema/behavior probes against the testdata.
  * Probes run the SHIPPED registered queries (not hand-copied twins, which
  * silently drift from the registry — round-5 advice). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    Seq("geo_msf", "geo_cluster", "llm_dedup_cluster").foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[probe] $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      Caches.release()
    }
    spark.stop()
  }
}
