package graft

/** Dev scratch main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.01")
    graft.io.Tables.orders(spark, dir).createOrReplaceTempView("orders")
    val df = spark.sql(
      """WITH RECURSIVE spine(m) AS (
        |  SELECT to_date(date_trunc('MONTH', min(o_orderdate))) FROM orders
        |  UNION ALL
        |  SELECT add_months(m, 1) FROM spine
        |  WHERE m < (SELECT to_date(date_trunc('MONTH', max(o_orderdate))) FROM orders)),
        |mo AS (SELECT to_date(date_trunc('MONTH', o_orderdate)) AS m,
        |              count(*) AS n_rich
        |       FROM orders
        |       WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
        |       GROUP BY 1)
        |SELECT date_format(spine.m, 'yyyy-MM') AS month,
        |       CAST(coalesce(mo.n_rich, 0) AS BIGINT) AS n_rich
        |FROM spine LEFT JOIN mo ON mo.m = spine.m
        |ORDER BY month""".stripMargin)
    val rows = df.collect()
    println(s"PROBE spine rows=${rows.length} zeros=${rows.count(_.getLong(1) == 0L)} first=${rows.head} last=${rows.last}")
    spark.stop()
  }
}
