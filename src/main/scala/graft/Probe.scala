package graft

/** Dev scratch main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
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
    spark.stop()
  }
}
