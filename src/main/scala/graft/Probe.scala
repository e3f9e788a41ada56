package graft

/** Dev scratch main — not part of the library surface.
  *
  * Default mode: time each registry query named in `PROBE_QS` (comma list)
  * against `PROBE_DIR`, after one warm-up query to absorb JIT/codegen.
  * `PROBE_MODE=spine` instead runs the round-14 date-spine recursion
  * microbenchmark (kept opt-in — round-14 ADVICE: replacing the generic
  * prober silently broke PROBE_QS invocations).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    if (sys.env.get("PROBE_MODE").contains("spine")) spine(spark, dir)
    else {
      graft.SparkEntry.queries("llm_exact_dedup")(spark, dir).count()
      Caches.release()
      for (q <- sys.env.getOrElse("PROBE_QS", "a1_recommend_m2").split(",")) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        println(f"PROBE $q rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
        Caches.release()
      }
    }
    spark.stop()
  }

  /** The recursion-state-bound A/B from round 14: the original spine
    * recursion re-aggregates `orders` per step; the shipped form carries
    * the bound in the recursion state. */
  private def spine(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    graft.io.Tables.orders(spark, dir).createOrReplaceTempView("orders")
    def time(tag: String, sql: String): Unit = {
      val t0 = System.nanoTime()
      val n = spark.sql(sql).count()
      println(f"PROBE $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val orig =
      """WITH RECURSIVE spine(m) AS (
        |  SELECT to_date(date_trunc('MONTH', min(o_orderdate))) FROM orders
        |  UNION ALL
        |  SELECT add_months(m, 1) FROM spine
        |  WHERE m < (SELECT to_date(date_trunc('MONTH', max(o_orderdate))) FROM orders))
        |SELECT * FROM spine""".stripMargin
    val bounds =
      """WITH RECURSIVE b AS (
        |  SELECT to_date(date_trunc('MONTH', min(o_orderdate))) AS lo,
        |         to_date(date_trunc('MONTH', max(o_orderdate))) AS hi
        |  FROM orders),
        |spine(m, hi) AS (
        |  SELECT lo, hi FROM b
        |  UNION ALL
        |  SELECT add_months(m, 1), hi FROM spine WHERE m < hi)
        |SELECT m FROM spine""".stripMargin
    time("orig", orig)
    time("bounds", bounds)
    time("orig2", orig)
    time("bounds2", bounds)
  }
}
