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

  val all: Seq[QueryDef] = Seq(rollupOrders, cubeCustomers, pivotPriorities,
    groupingSetsOrders, unpivotMeasures, intersectParts, exceptParts)
}
