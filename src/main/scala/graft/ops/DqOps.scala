package graft.ops

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Data-quality audits — the referential-integrity checks a warehouse runs
  * before trusting a load. Each check is a plain aggregate or anti-join, so
  * the audit costs one pass per table at any scale (and the FK check rides
  * the same runtime bloom-filter/broadcast machinery as a production join).
  * Healthy testdata means every violation count is ZERO — which is exactly
  * what the oracle pins: a parser or join regression that duplicates or
  * drops keys flips a hash-checked zero.
  */
object DqOps {

  /** Primary-key uniqueness per table: total rows vs distinct PKs and the
    * number of violating key values. */
  val pkUnique: QueryDef = QueryDef(
    "dq_pk_unique",
    Seq(("customer", "c_custkey"), ("orders", "o_orderkey"),
      ("part", "p_partkey"), ("supplier", "s_suppkey"))
      .map { case (t, k) =>
        s"""SELECT '$t' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(count(DISTINCT $k) AS BIGINT) AS n_keys,
           |       CAST(count(*) - count(DISTINCT $k) AS BIGINT) AS n_dup_rows
           |FROM $t""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY tbl"),
  ) { (spark, dir) =>
    Seq(("customer", "c_custkey"), ("orders", "o_orderkey"),
      ("part", "p_partkey"), ("supplier", "s_suppkey"))
      .map { case (t, k) =>
        Tables.load(spark, dir, t).agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col(k)).as("n_keys"),
          (count(lit(1)) - countDistinct(col(k))).as("n_dup_rows"))
          .select(lit(t).as("tbl"), $"n_rows", $"n_keys", $"n_dup_rows")
      }.reduce(_ union _).orderBy($"tbl")
  }

  /** Foreign-key orphan counts: child keys with no parent row, per edge of
    * the schema graph — left-anti joins, the scale-right containment
    * check. */
  val fkOrphans: QueryDef = QueryDef(
    "dq_fk_orphans",
    """SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
      |FROM lineitem l WHERE NOT EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'orders->customer' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
      |FROM orders o WHERE NOT EXISTS
      |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'lineitem->part' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
      |FROM lineitem l WHERE NOT EXISTS
      |  (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      |ORDER BY fk""".stripMargin,
  ) { (spark, dir) =>
    def orphans(name: String, child: org.apache.spark.sql.DataFrame,
        ck: String, parent: org.apache.spark.sql.DataFrame, pk: String) =
      child.join(parent, col(ck) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("fk"), $"n_orphans")
    val (li, o, c, p) = (Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.part(spark, dir))
    Seq(
      orphans("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
      orphans("orders->customer", o, "o_custkey", c, "c_custkey"),
      orphans("lineitem->part", li, "l_partkey", p, "p_partkey"),
    ).reduce(_ union _).orderBy($"fk")
  }

  val all: Seq[QueryDef] = Seq(pkUnique, fkOrphans)
}
