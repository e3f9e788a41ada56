package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Assignment 2 (BigQuery NCAA analytics, SQL in the .docx report) operator
  * shapes — string functions, CASE-WHEN percentage aggregates, ranking with
  * ties, pair self-joins deduped by key order with LEAST/GREATEST, COUNT
  * DISTINCT, HAVING on aggregates — re-targeted at the TPC-H testdata since
  * the NCAA public dataset isn't available (operator shape preserved, per
  * SURVEY §7.3).
  */
object BigQueryOps {

  /** String-position predicate (A2 Q3: `UPPER(SUBSTR(color,2,2)) = 'FF'`). */
  val substrUpper: QueryDef = QueryDef(
    "a2_substr_upper",
    """SELECT p_partkey, p_name, p_type FROM part
      |WHERE upper(substr(p_name, 2, 2)) = 'ED'
      |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    Tables.part(spark, dir)
      .filter(upper(substring($"p_name", 2, 2)) === "ED")
      .select($"p_partkey", $"p_name", $"p_type")
      .orderBy($"p_partkey")
  }

  /** CASE WHEN inside an aggregate + percentage arithmetic (A2 Q7:
    * `ROUND(100.0 * SUM(CASE WHEN ... THEN 1 ELSE 0 END) / COUNT(*), 2)`).
    * Numerator and denominator are exact integers, so the division is
    * bit-identical across engines. */
  val caseWhenPct: QueryDef = QueryDef(
    "a2_case_pct",
    """SELECT l_returnflag,
      |       round(100.0 * sum(CASE WHEN l_discount > l_tax THEN 1 ELSE 0 END)
      |             / count(*), 2) AS pct_disc_gt_tax
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin,
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(round(
        lit(100.0) * sum(when($"l_discount" > $"l_tax", 1).otherwise(0))
          / count(lit(1)), 2).as("pct_disc_gt_tax"))
      .orderBy($"l_returnflag")
  }

  /** RANK per partition, keep rank 1 including ties (A2 Q11: top performer
    * per season). Here: richest customer(s) per nation. */
  val rankTopPerGroup: QueryDef = QueryDef(
    "a2_rank_top_per_group",
    """SELECT n_name, c_custkey, c_acctbal FROM (
      |  SELECT n.n_name, c.c_custkey, c.c_acctbal,
      |         rank() OVER (PARTITION BY n.n_name ORDER BY c.c_acctbal DESC) AS rnk
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |) t WHERE rnk = 1
      |ORDER BY n_name, c_custkey""".stripMargin,
  ) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val w = Window.partitionBy($"n_name").orderBy(desc("c_acctbal"))
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select($"n_name", $"c_custkey", $"c_acctbal")
      .withColumn("rnk", rank().over(w))
      .filter($"rnk" === 1)
      .drop("rnk")
      .orderBy($"n_name", $"c_custkey")
  }

  /** Self-join pair dedup via `<` on the key + LEAST/GREATEST projection
    * (A2 Q8: same-color team pairs). Here: supplier pairs within a nation. */
  val pairsLeastGreatest: QueryDef = QueryDef(
    "a2_pairs_least_greatest",
    """SELECT s1.s_nationkey AS nationkey,
      |       least(s1.s_name, s2.s_name)    AS name_a,
      |       greatest(s1.s_name, s2.s_name) AS name_b
      |FROM supplier s1
      |JOIN supplier s2 ON s1.s_nationkey = s2.s_nationkey
      |                AND s1.s_suppkey < s2.s_suppkey
      |ORDER BY nationkey, name_a, name_b""".stripMargin,
  ) { (spark, dir) =>
    val s1 = Tables.supplier(spark, dir)
      .select($"s_suppkey", $"s_name", $"s_nationkey")
    val s2 = Tables.supplier(spark, dir).select(
      $"s_suppkey".as("r_suppkey"), $"s_name".as("r_name2"),
      $"s_nationkey".as("r_nationkey"))
    s1.join(s2, $"s_nationkey" === $"r_nationkey" && $"s_suppkey" < $"r_suppkey")
      .select($"s_nationkey".as("nationkey"),
        least($"s_name", $"r_name2").as("name_a"),
        greatest($"s_name", $"r_name2").as("name_b"))
      .orderBy($"nationkey", $"name_a", $"name_b")
  }

  /** COUNT(DISTINCT …) per group (A2 Q5/Q10). */
  val countDistinctSupp: QueryDef = QueryDef(
    "a2_count_distinct",
    """SELECT p.p_brand, count(DISTINCT l.l_suppkey) AS n_suppliers
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_brand
      |ORDER BY p.p_brand""".stripMargin,
  ) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy($"p_brand")
      .agg(countDistinct($"l_suppkey").as("n_suppliers"))
      .orderBy($"p_brand")
  }

  /** HAVING on aggregates (A2 Q10: `HAVING SUM(...) >= 15`). */
  val havingSum: QueryDef = QueryDef(
    "a2_having_sum",
    """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 15 AND round(sum(o_totalprice), 2) > 1000000
      |ORDER BY o_custkey""".stripMargin,
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"))
      .filter($"n_orders" >= 15 && $"total" > 1000000)
      .orderBy($"o_custkey")
  }

  /** CAST in aggregate output (A2 Q9: `CAST(SUM(points) AS INT64)`). Rounded
    * before the cast — Spark truncates double→long while DuckDB rounds, so
    * the value must already be integral when the cast happens. */
  val castBigint: QueryDef = QueryDef(
    "a2_cast_bigint",
    """SELECT l_returnflag, CAST(round(sum(l_quantity), 0) AS BIGINT) AS total_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin,
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity"), 0).cast("bigint").as("total_qty"))
      .orderBy($"l_returnflag")
  }

  /** Filtered golden count (A2 Q2's "7,269 games at Maples Pavilion 2013"
    * shape: COUNT(*) under venue+year predicates). */
  val goldenCount: QueryDef = QueryDef(
    "a2_golden_count",
    """SELECT count(*) AS n
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand = 'Brand#5' AND year(l.l_shipdate) = 1998""".stripMargin,
  ) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir).filter(year($"l_shipdate") === 1998)
    val p = Tables.part(spark, dir).filter($"p_brand" === "Brand#5")
    l.join(p, l("l_partkey") === p("p_partkey"))
      .agg(count(lit(1)).as("n"))
  }

  /** Cumulative distribution + nth lowest per group — the two §2.5 window
    * shapes not yet covered: CUME_DIST expressed as an exact integer
    * (`count ≤ current value` over a RANGE frame, ×10⁶ DIV group size — the
    * builtin returns a division whose float form needn't match across
    * engines) and NTH_VALUE(2) over the full partition with a (cents, key)
    * total order so ties can't flip the pick. One partition-keyed window
    * sort serves all three analytic columns. */
  val cumeDistNth: QueryDef = QueryDef(
    "a2_cume_dist_nth",
    """WITH p AS (SELECT p_partkey, p_brand, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents FROM part),
      |w AS (SELECT p_partkey, p_brand, cents,
      |             CAST(count(*) OVER (PARTITION BY p_brand ORDER BY cents
      |                                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_le,
      |             CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n,
      |             nth_value(cents, 2) OVER (PARTITION BY p_brand ORDER BY cents, p_partkey
      |                                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_lowest
      |      FROM p)
      |SELECT p_partkey, p_brand, cents, CAST(n_le * 1000000 // n AS BIGINT) AS cume_ppm, second_lowest
      |FROM w ORDER BY p_brand, cents, p_partkey""".stripMargin,
  ) { (spark, dir) =>
    val p = Tables.part(spark, dir)
      .select($"p_partkey", $"p_brand",
        floor($"p_retailprice" * 100 + 0.5).cast("long").as("cents"))
    val brand = Window.partitionBy($"p_brand")
    p.select($"p_partkey", $"p_brand", $"cents",
        count(lit(1)).over(brand.orderBy($"cents")
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)).as("n_le"),
        count(lit(1)).over(brand).as("n"),
        nth_value($"cents", 2).over(brand.orderBy($"cents", $"p_partkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("second_lowest"))
      .select($"p_partkey", $"p_brand", $"cents",
        expr("n_le * 1000000 DIV n").as("cume_ppm"), $"second_lowest")
      .orderBy($"p_brand", $"cents", $"p_partkey")
  }

  val all: Seq[QueryDef] = Seq(
    substrUpper, caseWhenPct, rankTopPerGroup, pairsLeastGreatest,
    countDistinctSupp, havingSum, castBigint, goldenCount, cumeDistNth,
  )
}
