package graft.ops

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** OLAP grouping extensions — ROLLUP / CUBE / PIVOT. The reference never
  * uses them (SURVEY §2.4 "not present"), but they're core warehouse
  * surface and free on Spark's hash-aggregate: grouping sets evaluate as
  * one pass with a grouping-id expansion, not N scans.
  *
  * Cross-engine determinism: subtotal rows carry NULL group keys, and NULL
  * ordering/compare behavior differs between engines — so every grouping
  * key is emitted `coalesce(key, 'ALL')` and the grouping id is output
  * explicitly, making rows plain strings/ints with a total order.
  */
object OlapOps {

  /** ROLLUP (year → priority → grand total) over orders. */
  val rollupOrders: QueryDef = QueryDef(
    "olap_rollup_orders",
    """SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       CAST(grouping(year(o_orderdate)) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
      |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
      |ORDER BY gid, yr, priority""".stripMargin,
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .withColumn("y", year($"o_orderdate")) // pre-project: grouping() must
      .rollup($"y", $"o_orderpriority")      // reference a plain attribute
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"),
        (grouping($"y") * 2 + grouping($"o_orderpriority")).cast("long").as("gid"))
      .select(
        coalesce($"y".cast("string"), lit("ALL")).as("yr"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"gid", $"n_orders", $"total")
      .orderBy($"gid", $"yr", $"priority")
  }

  /** CUBE (all subtotal combinations) over customer segments × nations. */
  val cubeCustomers: QueryDef = QueryDef(
    "olap_cube_customers",
    """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
      |       coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
      |       CAST(grouping(c_mktsegment) * 2 + grouping(c_nationkey) AS BIGINT) AS gid,
      |       count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |GROUP BY CUBE(c_mktsegment, c_nationkey)
      |ORDER BY gid, segment, nation""".stripMargin,
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .cube($"c_mktsegment", $"c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        round(sum($"c_acctbal"), 2).as("total_bal"),
        (grouping($"c_mktsegment") * 2 + grouping($"c_nationkey"))
          .cast("long").as("gid"))
      .select(
        coalesce($"c_mktsegment", lit("ALL")).as("segment"),
        coalesce($"c_nationkey".cast("string"), lit("ALL")).as("nation"),
        $"gid", $"n_customers", $"total_bal")
      .orderBy($"gid", $"segment", $"nation")
  }

  /** PIVOT: order counts per year, one column per priority. Pivot values
    * are pinned explicitly (never inferred from data — an inference scan is
    * both nondeterministic in column order and an extra pass at scale). */
  val pivotPriorities: QueryDef = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    QueryDef(
      "olap_pivot_priorities",
      "SELECT year(o_orderdate) AS yr, " +
        prios.zipWithIndex.map { case (p, i) =>
          s"CAST(count(CASE WHEN o_orderpriority = '$p' THEN 1 END) AS BIGINT) AS p$i"
        }.mkString(", ") +
        " FROM orders GROUP BY 1 ORDER BY yr",
    ) { (spark, dir) =>
      Tables.orders(spark, dir)
        .groupBy(year($"o_orderdate").as("yr"))
        .pivot("o_orderpriority", prios)
        .count()
        .select($"yr" +: prios.indices.map(i =>
          coalesce(col(prios(i)), lit(0L)).as(s"p$i")): _*)
        .orderBy($"yr")
    }
  }

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE above are sugar
    * for: per-year totals and per-priority totals in ONE aggregate pass
    * (no grand-total set, which neither ROLLUP nor CUBE can express alone).
    */
  val groupingSetsOrders: QueryDef = QueryDef(
    "olap_grouping_sets",
    """SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       CAST(grouping(year(o_orderdate)) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
      |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority))
      |ORDER BY gid, yr, priority""".stripMargin,
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .withColumn("y", year($"o_orderdate"))
      .groupingSets(Seq(Seq($"y"), Seq($"o_orderpriority")),
        $"y", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"),
        (grouping($"y") * 2 + grouping($"o_orderpriority")).cast("long").as("gid"))
      .select(
        coalesce($"y".cast("string"), lit("ALL")).as("yr"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"gid", $"n_orders", $"total")
      .orderBy($"gid", $"yr", $"priority")
  }

  /** UNPIVOT — the inverse of the PIVOT above: the four lineitem measures
    * melted to (measure, value) long form, keys scoped to bound the output.
    * Pure row-local expansion (a generator, no shuffle); measure names
    * become values identically in both engines (lineitem measures are
    * non-null, so DuckDB's NULL-dropping UNPIVOT default can't diverge). */
  val unpivotMeasures: QueryDef = QueryDef(
    "olap_unpivot",
    """SELECT l_orderkey, l_linenumber, measure, value
      |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
      |      FROM lineitem WHERE l_orderkey <= 100)
      |UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
      |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin,
  ) { (spark, dir) =>
    // `value` tiebreak: the synthetic lineitem does NOT keep l_linenumber
    // unique per order, so (orderkey, linenumber, measure) alone ties
    // across distinct source rows and the as-ordered compare flaps.
    Tables.lineitem(spark, dir)
      .filter($"l_orderkey" <= 100)
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        "measure", "value")
      .orderBy($"l_orderkey", $"l_linenumber", $"measure", $"value")
  }

  /** INTERSECT (distinct) — parts both cheap and ordered-in-quantity
    * (set-op family completion; reference only ever uses UNION). */
  val intersectParts: QueryDef = QueryDef(
    "setop_intersect",
    """SELECT p_partkey FROM part WHERE p_retailprice < 1200
      |INTERSECT
      |SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 40
      |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    Tables.part(spark, dir).filter($"p_retailprice" < 1200).select($"p_partkey")
      .intersect(Tables.lineitem(spark, dir)
        .filter($"l_quantity" >= 40).select($"l_partkey".as("p_partkey")))
      .orderBy($"p_partkey")
  }

  /** EXCEPT (distinct) — cheap parts never shipped in bulk. */
  val exceptParts: QueryDef = QueryDef(
    "setop_except",
    """SELECT p_partkey FROM part WHERE p_retailprice < 1200
      |EXCEPT
      |SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 40
      |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    Tables.part(spark, dir).filter($"p_retailprice" < 1200).select($"p_partkey")
      .except(Tables.lineitem(spark, dir)
        .filter($"l_quantity" >= 40).select($"l_partkey".as("p_partkey")))
      .orderBy($"p_partkey")
  }

  /** RFM segmentation — the classic customer-value cut: per customer,
    * Recency (days since last order, against the corpus max date so the
    * result is reproducible), Frequency (order count) and Monetary (exact
    * lifetime cents), each quartiled by `ntile(4)` with the customer key as
    * tiebreak so bucket edges are deterministic in both engines. Quartile 1
    * is best on every axis (most recent / most orders / most spend);
    * `segment` concatenates the three digits.
    *
    * Scale: the metrics are one orders-keyed aggregate; the three
    * quartile assignments run via [[ParallelRank.withNtile]] (range
    * shuffle + partition-parallel ranking + broadcast rank offsets) over
    * the AGGREGATED per-customer frame — one row per customer, which is
    * itself corpus-scale at 100 TB, so no single-partition window
    * anywhere (round-11 verdict sweep); output is bit-identical to the
    * oracle's global `ntile(4)`. */
  val rfmSegments: QueryDef = QueryDef(
    "olap_rfm",
    """WITH m AS (SELECT o_custkey,
      |                  date_diff('day', max(o_orderdate), (SELECT max(o_orderdate) FROM orders)) AS rec_days,
      |                  CAST(count(*) AS BIGINT) AS freq,
      |                  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mon_cents
      |           FROM orders GROUP BY o_custkey)
      |SELECT o_custkey, CAST(rec_days AS BIGINT) AS rec_days, freq, mon_cents,
      |       CAST(ntile(4) OVER (ORDER BY rec_days, o_custkey) AS BIGINT) AS r_q,
      |       CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT) AS f_q,
      |       CAST(ntile(4) OVER (ORDER BY mon_cents DESC, o_custkey) AS BIGINT) AS m_q,
      |       CAST(ntile(4) OVER (ORDER BY rec_days, o_custkey) AS VARCHAR)
      |         || CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS VARCHAR)
      |         || CAST(ntile(4) OVER (ORDER BY mon_cents DESC, o_custkey) AS VARCHAR) AS segment
      |FROM m ORDER BY o_custkey""".stripMargin,
  ) { (spark, dir) =>
    val orders = Tables.orders(spark, dir)
    val maxDate = orders.agg(max($"o_orderdate").as("gmax"))
    val m = orders
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate").as("last_date"),
        count(lit(1)).as("freq"),
        sum(floor($"o_totalprice" * 100 + 0.5).cast("long")
          .cast("decimal(38,0)")).cast("long").as("mon_cents"))
      .crossJoin(broadcast(maxDate))
      .select($"o_custkey",
        datediff($"gmax", $"last_date").cast("long").as("rec_days"),
        $"freq", $"mon_cents")
    val b = ParallelRank.withNtile(
      ParallelRank.withNtile(
        ParallelRank.withNtile(m, 4, Seq($"rec_days", $"o_custkey"), "r_q"),
        4, Seq($"freq".desc, $"o_custkey"), "f_q"),
      4, Seq($"mon_cents".desc, $"o_custkey"), "m_q")
    b.select($"o_custkey", $"rec_days", $"freq", $"mon_cents",
        $"r_q", $"f_q", $"m_q",
        concat($"r_q".cast("string"), $"f_q".cast("string"),
          $"m_q".cast("string")).as("segment"))
      .orderBy($"o_custkey")
  }

  /** ABC / Pareto analysis of customer revenue: customers ranked by exact
    * lifetime cents (key tiebreak), classified A while the RUNNING revenue
    * share is within 80% of total, B within 95%, else C — "which fifth of
    * the customers carries four-fifths of the revenue". The class boundary
    * compares `100·cum ≤ threshold·total` in pure integers, so no float
    * share ever decides a row. Output is the 3-row class summary (count,
    * revenue, exact basis-point share floor-quantized).
    *
    * Scale: per-customer aggregate, then the running revenue sum via
    * [[ParallelRank.withRunningSum]] (partition-parallel prefix sums with
    * broadcast per-partition offsets — no single-partition window; the
    * per-customer frame is corpus-scale at 100 TB) and the grand total as
    * a broadcast scalar — same rewrite family as [[rfmSegments]]. */
  val abcPareto: QueryDef = QueryDef(
    "olap_abc_pareto",
    """WITH m AS (SELECT o_custkey,
      |                  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |           FROM orders GROUP BY o_custkey),
      |c AS (SELECT o_custkey, cents,
      |             CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
      |                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |             CAST(sum(cents) OVER () AS BIGINT) AS total
      |      FROM m),
      |k AS (SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
      |                  WHEN cum * 100 <= total * 95 THEN 'B'
      |                  ELSE 'C' END AS abc_class,
      |             cents, total
      |      FROM c)
      |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST(sum(cents) AS BIGINT) AS revenue_cents,
      |       CAST(sum(cents) * 10000 // max(total) AS BIGINT) AS share_bps
      |FROM k GROUP BY abc_class ORDER BY abc_class""".stripMargin,
  ) { (spark, dir) =>
    val m = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")
        .cast("decimal(38,0)")).cast("long").as("cents"))
    val tot = m.agg(
      sum($"cents".cast("decimal(38,0)")).cast("long").as("total"))
    val c = ParallelRank.withRunningSum(m,
        Seq($"cents".desc, $"o_custkey"),
        $"cents".cast("decimal(38,0)"), "cumd")
      .crossJoin(broadcast(tot))
      .select($"o_custkey", $"cents", $"cumd".cast("long").as("cum"), $"total")
    c.select(
        when($"cum" * 100 <= $"total" * 80, "A")
          .when($"cum" * 100 <= $"total" * 95, "B")
          .otherwise("C").as("abc_class"),
        $"cents", $"total")
      .groupBy($"abc_class")
      .agg(count(lit(1)).as("n_customers"),
        sum($"cents".cast("decimal(38,0)")).cast("long").as("revenue_cents"),
        max($"total").as("total"))
      .select($"abc_class", $"n_customers", $"revenue_cents",
        expr("CAST(revenue_cents * 10000 DIV total AS BIGINT)").as("share_bps"))
      .orderBy($"abc_class")
  }

  /** 2-D skyline (Pareto frontier) over customers: the set not dominated
    * on (order count, account balance) — dominance = at-least-as-good on
    * both axes and strictly better on one, the standard maximal-vector
    * definition (Börzsönyi et al., ICDE 2001). Identical points are all
    * kept (neither dominates the other).
    *
    * Distributed shape — NOT the textbook sort-filter-scan, which needs a
    * global total order: first a per-x reduction (`max(bal) per n_orders`,
    * map-side combinable) collapses the frame to ≤|distinct n_orders| rows;
    * the monotone-staircase filter then runs as a window over THAT tiny
    * frame (the only unpartitioned window here, bounded by the x-domain,
    * not the row count); membership re-joins the staircase back by exact
    * (x, y) — a broadcast hash join. At 100 TB the full table is touched
    * only by the two keyed aggregates. */
  val skyline: QueryDef = QueryDef(
    "olap_skyline",
    """WITH m AS (SELECT c.c_custkey,
      |                  CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
      |                  CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
      |           FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |           GROUP BY 1, 2),
      |po AS (SELECT n_orders, max(bal_cents) AS bal_cents FROM m GROUP BY 1),
      |f AS (SELECT n_orders, bal_cents,
      |             max(bal_cents) OVER (ORDER BY n_orders DESC
      |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best
      |      FROM po)
      |SELECT m.c_custkey, m.n_orders, m.bal_cents
      |FROM m JOIN (SELECT n_orders, bal_cents FROM f
      |             WHERE best IS NULL OR bal_cents > best) fr
      |  USING (n_orders, bal_cents)
      |ORDER BY n_orders DESC, bal_cents DESC, c_custkey""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val m = Tables.customer(spark, dir)
      .select($"c_custkey", floor($"c_acctbal" * 100 + 0.5).cast("long").as("bal_cents"))
      .join(Tables.orders(spark, dir).select($"o_custkey", $"o_orderkey"),
        $"o_custkey" === $"c_custkey", "left")
      .groupBy($"c_custkey", $"bal_cents")
      .agg(count($"o_orderkey").as("n_orders"))
    val perO = m.groupBy($"n_orders").agg(max($"bal_cents").as("bal_cents"))
    val stair = Window.orderBy($"n_orders".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perO
      .withColumn("best", max($"bal_cents").over(stair))
      .filter($"best".isNull || $"bal_cents" > $"best")
      .select($"n_orders", $"bal_cents")
    m.join(broadcast(frontier), Seq("n_orders", "bal_cents"))
      .select($"c_custkey", $"n_orders", $"bal_cents")
      .orderBy($"n_orders".desc, $"bal_cents".desc, $"c_custkey")
  }

  /** Month-over-month market-share trend: revenue per (month, segment),
    * each segment's share of its month in exact basis points, and the
    * month-over-month share delta — the "who is gaining share" question a
    * revenue rollup alone can't answer.
    *
    * Scale shape: one custkey-keyed join (orders ⋈ customer), then the
    * frame collapses to |months|×|segments| rows; both windows (per-month
    * total, per-segment lag) run over that tiny aggregate, never the fact
    * table. Cents sum as DECIMAL(38,0) (order-insensitive), shares are
    * integer floor bps, and the delta is a difference of already-exact
    * integers — nothing floats. First month's delta is NULL by design
    * (lag has no predecessor; both engines emit NULL). */
  val momShare: QueryDef = QueryDef(
    "olap_mom_share",
    """WITH m AS (SELECT strftime(o.o_orderdate, '%Y-%m') AS month, c.c_mktsegment AS segment,
      |                  CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
      |           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |           GROUP BY 1, 2),
      |t AS (SELECT month, segment, revenue_cents,
      |             CAST(sum(revenue_cents) OVER (PARTITION BY month) AS BIGINT) AS month_total FROM m),
      |s AS (SELECT month, segment, revenue_cents,
      |             CAST(revenue_cents * 10000 // month_total AS BIGINT) AS share_bps FROM t)
      |SELECT month, segment, revenue_cents, share_bps,
      |       CAST(share_bps - lag(share_bps) OVER (PARTITION BY segment ORDER BY month) AS BIGINT) AS mom_delta_bps
      |FROM s ORDER BY month, segment""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val m = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"),
        $"c_mktsegment".as("segment"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("decimal(38,0)"))
        .cast("long").as("revenue_cents"))
    m.withColumn("month_total",
        sum($"revenue_cents").over(Window.partitionBy($"month")))
      .withColumn("share_bps", expr("revenue_cents * 10000 DIV month_total"))
      .withColumn("mom_delta_bps",
        $"share_bps" - lag($"share_bps", 1)
          .over(Window.partitionBy($"segment").orderBy($"month")))
      .select($"month", $"segment", $"revenue_cents", $"share_bps", $"mom_delta_bps")
      .orderBy($"month", $"segment")
  }

  /** Ratio-to-parent rollup (the MDX "percent of parent" staple): revenue
    * per nation as exact-bps share of its region, and each region's share
    * of the grand total — two hierarchy levels in one pass. The dimension
    * chain (customer→nation→region) folds in as broadcast joins; the
    * region share is a window partitioned by region over the 25-row
    * nation aggregate, and the grand total a broadcast scalar — no
    * unpartitioned window anywhere in the plan. */
  val pctOfParent: QueryDef = QueryDef(
    "olap_pct_of_parent",
    """WITH rev AS (SELECT r.r_name AS region, n.n_name AS nation,
      |                    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |             FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |                  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |                  JOIN region r ON n.n_regionkey = r.r_regionkey
      |             GROUP BY 1, 2),
      |w AS (SELECT region, nation, cents,
      |             CAST(sum(cents) OVER (PARTITION BY region) AS BIGINT) AS region_total,
      |             CAST(sum(cents) OVER () AS BIGINT) AS grand_total
      |      FROM rev)
      |SELECT region, nation, cents AS revenue_cents,
      |       CAST(cents * 10000 // region_total AS BIGINT) AS share_of_region_bps,
      |       CAST(region_total * 10000 // grand_total AS BIGINT) AS region_share_bps
      |FROM w ORDER BY region, nation""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name".as("region"), $"n_name".as("nation"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("decimal(38,0)"))
        .cast("long").as("cents"))
    val grand = rev.agg(sum($"cents").cast("long").as("grand_total"))
    rev
      .withColumn("region_total", sum($"cents").over(Window.partitionBy($"region")))
      .crossJoin(broadcast(grand))
      .select($"region", $"nation", $"cents".as("revenue_cents"),
        expr("cents * 10000 DIV region_total").as("share_of_region_bps"),
        expr("region_total * 10000 DIV grand_total").as("region_share_bps"))
      .orderBy($"region", $"nation")
  }

  /** Cohort LTV triangle: customers cohorted by FIRST-order month, revenue
    * accumulated by months-since-cohort — the retention-economics classic
    * next to [[momShare]]'s share view and `a4_retention`'s count view.
    * Month arithmetic stays on the linear index y·12+m (exact integers;
    * no date truncation crosses engines), the cumulative sum runs over the
    * tiny |cohorts|×|ages| aggregate, and per-customer LTV is one floor
    * division of cents. Scale: one custkey-keyed agg for first orders, one
    * custkey join to tag orders, then calendar-bounded state only. */
  val cohortLtv: QueryDef = QueryDef(
    "olap_cohort_ltv",
    """WITH o AS (SELECT o_custkey, o_orderdate,
      |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |                  year(o_orderdate) * 12 + month(o_orderdate) AS m12
      |           FROM orders),
      |c AS (SELECT o_custkey, CAST(min(m12) AS BIGINT) AS cm FROM o GROUP BY 1),
      |sz AS (SELECT cm, CAST(count(*) AS BIGINT) AS n_cust FROM c GROUP BY 1),
      |g AS (SELECT c.cm AS cm, CAST(o.m12 - c.cm AS BIGINT) AS age_months,
      |             CAST(sum(o.cents) AS BIGINT) AS rev
      |      FROM o JOIN c ON o.o_custkey = c.o_custkey GROUP BY 1, 2),
      |w AS (SELECT cm, age_months,
      |             CAST(sum(rev) OVER (PARTITION BY cm ORDER BY age_months) AS BIGINT) AS cum_rev
      |      FROM g)
      |SELECT CAST((w.cm - 1) // 12 * 100 + ((w.cm - 1) % 12 + 1) AS BIGINT) AS cohort_ym,
      |       w.age_months AS age_months, sz.n_cust AS n_cust,
      |       w.cum_rev AS cum_rev_cents,
      |       w.cum_rev // sz.n_cust AS ltv_cents
      |FROM w JOIN sz ON w.cm = sz.cm
      |ORDER BY cohort_ym, age_months""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .select($"o_custkey",
        round($"o_totalprice" * 100).cast("long").as("cents"),
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m12"))
    val c = o.groupBy($"o_custkey").agg(min($"m12").cast("long").as("cm"))
    val sz = c.groupBy($"cm").agg(count(lit(1)).as("n_cust"))
    val g = o.join(c, "o_custkey")
      .groupBy($"cm", ($"m12" - $"cm").cast("long").as("age_months"))
      .agg(sum($"cents").as("rev"))
    val w = g.select($"cm", $"age_months",
      sum($"rev").over(Window.partitionBy($"cm").orderBy($"age_months"))
        .as("cum_rev"))
    w.join(broadcast(sz), "cm")
      .select(expr("CAST((cm - 1) DIV 12 * 100 + ((cm - 1) % 12 + 1) AS BIGINT)")
          .as("cohort_ym"),
        $"age_months", $"n_cust", $"cum_rev".as("cum_rev_cents"),
        expr("cum_rev DIV n_cust").as("ltv_cents"))
      .orderBy($"cohort_ym", $"age_months")
  }

  /** INTERSECT ALL — bag semantics: a part id appears min(countA, countB)
    * times, so MULTIPLICITY survives (the distinct variant above erases
    * it). Sides are lineitem event streams, where duplicates are the
    * signal: "bulk-shipped AND discounted, as many times as both
    * happened". Spark plans `intersectAll` as one partkey-keyed aggregate
    * join — no distinct pre-pass. */
  val intersectAllShip: QueryDef = QueryDef(
    "setop_intersect_all",
    """SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 40
      |INTERSECT ALL
      |SELECT l_partkey AS p_partkey FROM lineitem WHERE l_discount >= 0.05
      |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    li.filter($"l_quantity" >= 40).select($"l_partkey".as("p_partkey"))
      .intersectAll(li.filter($"l_discount" >= 0.05)
        .select($"l_partkey".as("p_partkey")))
      .orderBy($"p_partkey")
  }

  /** EXCEPT ALL — bag difference: each id keeps countA − countB copies
    * (clamped at zero), the multiset complement of [[intersectAllShip]]. */
  val exceptAllShip: QueryDef = QueryDef(
    "setop_except_all",
    """SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 40
      |EXCEPT ALL
      |SELECT l_partkey AS p_partkey FROM lineitem WHERE l_discount >= 0.05
      |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    li.filter($"l_quantity" >= 40).select($"l_partkey".as("p_partkey"))
      .exceptAll(li.filter($"l_discount" >= 0.05)
        .select($"l_partkey".as("p_partkey")))
      .orderBy($"p_partkey")
  }

  val all: Seq[QueryDef] = Seq(rollupOrders, cubeCustomers, pivotPriorities,
    groupingSetsOrders, unpivotMeasures, intersectParts, exceptParts,
    rfmSegments, abcPareto, skyline, momShare, pctOfParent, cohortLtv,
    intersectAllShip, exceptAllShip)
}
