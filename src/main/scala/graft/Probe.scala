package graft

/** Dev scratch main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.queries("llm_exact_dedup")(spark, dir).count()
    Caches.release()
    for (q <- Seq("llm_dedup_cluster", "llm_dedup_cluster_ls", "llm_dedup_cluster_ls", "mm_neardup_cluster",
                  "llm_embed_dedup_cluster", "graph_components", "geo_cluster", "geo_msf")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"PROBE $q rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Caches.release()
    }
    spark.stop()
  }
}
