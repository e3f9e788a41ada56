package graft.ops

import org.apache.spark.sql.SparkSession

import graft.QueryDef
import graft.io.Tables

/** SQL-string entry surface. The reference drives EVERY backend with SQL
  * text (`AmazonRedshift.java:465-479` archetype; `SQLonRDS.java:238-264`;
  * the A1 notebook's `runSql`): build a SQL string → ship it → cursor over
  * rows. Here the same lifecycle is `spark.sql(text)` over temp views —
  * Catalyst parses/plans/optimizes exactly as it does for the DataFrame
  * builders, so both entry styles share one engine (SURVEY.md §3 E1).
  *
  * Views are (re-)registered per invocation against the sfDir the query is
  * asked to run on; registration is cheap (no data is read until an action).
  */
object SqlOps {

  private val tableNames = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a session temp view (DDL surface —
    * `SQLonRDS.java:100-140` create/drop analog). `events` goes through the
    * same nanos-normalizing loader the DataFrame ops use. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { n =>
      val df =
        if (n == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  private def sqlQuery(name: String, text: String, oracle: String): QueryDef =
    QueryDef(name, oracle) { (spark, dir) =>
      registerViews(spark, dir)
      spark.sql(text)
    }

  /** Flagship analytics query via SQL text (`AmazonRedshift.java:465-479`):
    * 4-way join, region filter, latest-orders top-k with tiebreak. One
    * string, valid in both Spark SQL and DuckDB. */
  val topOrders: QueryDef = {
    val text =
      """SELECT o.o_orderkey, c.c_name, n.n_name, o.o_totalprice
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |ORDER BY o.o_orderdate DESC, o.o_orderkey LIMIT 10""".stripMargin
    sqlQuery("sql_top_orders", text, text)
  }

  /** Pricing-summary aggregate via SQL (TPC-H Q1 shape, date-bounded scan —
    * `AmazonRedshift.java:520-531` family). */
  val aggPricing: QueryDef = {
    val text =
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) < DATE '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    sqlQuery("sql_agg_pricing", text, text)
  }

  /** CREATE TEMPORARY VIEW → query it → DROP — the reference's DDL+query
    * lifecycle (`SQLonRDS.java:100-140` createTables/dropTables around every
    * run). The result plan inlines the view at analysis time, so dropping
    * after building the DataFrame is safe. */
  val ddlView: QueryDef = QueryDef(
    "sql_ddl_view",
    """SELECT o_orderstatus, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM (SELECT * FROM orders WHERE o_totalprice > 400000) t
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  ) { (spark, dir) =>
    registerViews(spark, dir)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW high_value_orders AS
        |SELECT * FROM orders WHERE o_totalprice > 400000""".stripMargin)
    val out = spark.sql(
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total
        |FROM high_value_orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    spark.catalog.dropTempView("high_value_orders")
    out
  }

  /** Catalog enumeration (`ExampleMongo.java:48-63` listCollectionNames):
    * SHOW TABLES filtered to the engine's table set. */
  val catalogTables: QueryDef = QueryDef(
    "sql_catalog_tables",
    tableNames.sorted.map(n => s"('$n')")
      .mkString("SELECT * FROM (VALUES ", ", ", ") t(table_name) ORDER BY table_name"),
  ) { (spark, dir) =>
    registerViews(spark, dir)
    spark.sql("SHOW TABLES")
      .filter($"tableName".isin(tableNames: _*))
      .select($"tableName".as("table_name"))
      .orderBy($"table_name")
  }

  /** The native `md5hash60` expression invoked FROM SQL TEXT — proving the
    * `SparkSessionExtensions` registration reaches the SQL surface, not
    * just the Column API (`call_function`). The oracle spells the same
    * 60-bit value in DuckDB's md5/substr form, so the cross-engine hash
    * contract is re-verified through the SQL entry path end-to-end. */
  val nativeFunction: QueryDef = QueryDef(
    "sql_native_function",
    """SELECT c_custkey,
      |       ('0x' || substr(md5(c_name), 1, 15))::BIGINT AS h,
      |       ('0x' || substr(md5(c_name), 1, 15))::BIGINT % 100 AS bucket
      |FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""".stripMargin,
  ) { (spark, dir) =>
    registerViews(spark, dir)
    spark.sql(
      """SELECT c_custkey, md5hash60(c_name) AS h, md5hash60(c_name) % 100 AS bucket
        |FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated EXISTS / NOT EXISTS — the subquery form the `a1_*` family
    * doesn't cover (it has IN / NOT-IN / scalar-MAX): big spenders who
    * never placed an urgent order. One SQL string, valid in both engines;
    * Catalyst rewrites the pair into a semi-join + anti-join on
    * `o_custkey` — the planner-visible proof that textual EXISTS costs the
    * same as the hand-built joins. */
  val existsCorrelated: QueryDef = {
    val text =
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin
    sqlQuery("sql_exists_correlated", text, text)
  }

  /** Correlated SCALAR subqueries in the SELECT list — per-customer order
    * count and max ticket inline, no explicit join written. COUNT over an
    * empty correlation is 0 and MAX is NULL in both engines (the two
    * edge semantics that differ across lesser SQL dialects, pinned here).
    * Catalyst plans each as an aggregate + left join keyed o_custkey. */
  val scalarCorrelated: QueryDef = {
    val text =
      """SELECT c_custkey,
        |       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |       (SELECT round(max(o_totalprice), 2) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS max_order
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin
    sqlQuery("sql_scalar_correlated", text, text)
  }

  /** LATERAL correlated subquery — the per-row "top-1 of my children"
    * idiom that outer-references the left table INSIDE an ordered LIMIT
    * (not expressible as a plain join; the window alternative ranks every
    * child). One SQL string, valid verbatim in Spark 4 and DuckDB; Spark
    * plans it as a rewritten join under `LateralJoin`, so the lane proves
    * the SQL surface, not a new executor. 20 nations with ≥1 customer
    * keep the output bounded. */
  val lateralTopN: QueryDef = {
    val text =
      """SELECT n.n_name, t.c_custkey AS top_custkey, t.bal_cents
        |FROM nation n, LATERAL (
        |  SELECT c.c_custkey, CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer c WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 1
        |) t
        |ORDER BY n.n_name""".stripMargin
    sqlQuery("sql_lateral_topn", text, text)
  }

  /** Recursive CTE through the SQL-string surface (Spark 4's
    * `WITH RECURSIVE`, SPARK-24497): generate a month SPINE from the
    * order-date bounds and left-join a sparse monthly aggregate onto it —
    * the calendar-gap-fill pattern every reporting layer needs, and the
    * one monthly-rollup shape a plain GROUP BY cannot produce (months
    * with zero qualifying orders must still appear; at sf0.01 the filter
    * genuinely leaves a gap month, so the zero row is exercised). The
    * dialects differ only in date arithmetic spelling (`add_months` /
    * `date_format` vs `+ INTERVAL` / `strftime`); the recursion shape is
    * identical. Scale: the recursion materializes one row per MONTH —
    * driver-trivial — while the aggregate stays a keyed count over the
    * fact table. */
  val recursiveSpine: QueryDef = QueryDef(
    "sql_recursive_spine",
    """WITH RECURSIVE spine(m) AS (
      |  SELECT date_trunc('month', min(o_orderdate)) FROM orders
      |  UNION ALL
      |  SELECT m + INTERVAL 1 MONTH FROM spine
      |  WHERE m < (SELECT date_trunc('month', max(o_orderdate)) FROM orders)),
      |mo AS (SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_rich
      |       FROM orders
      |       WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
      |       GROUP BY 1)
      |SELECT strftime(spine.m, '%Y-%m') AS month,
      |       CAST(coalesce(mo.n_rich, 0) AS BIGINT) AS n_rich
      |FROM spine LEFT JOIN mo ON mo.m = spine.m
      |ORDER BY month""".stripMargin,
  ) { (spark, dir) =>
    registerViews(spark, dir)
    // the upper bound rides the recursion STATE (spine carries `hi`):
    // a scalar subquery in the recursive term would re-aggregate orders
    // once per iteration — 80 full scans, measured 12.3 s vs 0.5 s at
    // sf0.1 — because each recursion step plans and runs as its own job
    spark.sql(
      """WITH RECURSIVE b AS (
        |  SELECT to_date(date_trunc('MONTH', min(o_orderdate))) AS lo,
        |         to_date(date_trunc('MONTH', max(o_orderdate))) AS hi
        |  FROM orders),
        |spine(m, hi) AS (
        |  SELECT lo, hi FROM b
        |  UNION ALL
        |  SELECT add_months(m, 1), hi FROM spine WHERE m < hi),
        |mo AS (SELECT to_date(date_trunc('MONTH', o_orderdate)) AS m,
        |              count(*) AS n_rich
        |       FROM orders
        |       WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
        |       GROUP BY 1)
        |SELECT date_format(spine.m, 'yyyy-MM') AS month,
        |       CAST(coalesce(mo.n_rich, 0) AS BIGINT) AS n_rich
        |FROM spine LEFT JOIN mo ON mo.m = spine.m
        |ORDER BY month""".stripMargin)
  }

  val all: Seq[QueryDef] =
    Seq(topOrders, aggPricing, ddlView, catalogTables, nativeFunction,
      existsCorrelated, scalarCorrelated, lateralTopN, recursiveSpine)
}
