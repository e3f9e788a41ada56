package graft

/** Dev scratch main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    graft.SparkEntry.queries("llm_exact_dedup")(spark, dir).count()
    Caches.release()
    for (q <- sys.env.getOrElse("PROBE_QS", "a1_recommend_m2").split(",")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"PROBE $q rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Caches.release()
    }
    spark.stop()
  }
}
