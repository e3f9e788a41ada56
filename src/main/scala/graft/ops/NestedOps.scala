package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Assignment 7 (MongoDB Atlas, nested customer/orders documents) re-expressed
  * Spark-first. The reference materializes a `custorders` collection by
  * hand-grouping orders per customer in driver memory (`MongoDB.java:242-301`:
  * fetch-all → HashMap group by O_CUSTKEY → append ORDERS array) and then
  * queries it with match→unwind→match / unwind→group pipelines. Here the same
  * nesting is one distributed `groupBy(o_custkey).agg(collect_list(struct))`
  * shuffle plus a co-partitioned left join to customer — no driver-side
  * materialization, so it scales to any number of customers.
  *
  * All registered outputs are FLAT projections of the nested form (the
  * driver's DuckDB compare can't hash ArrayType columns portably); the nested
  * `ORDERS: array<struct>` column itself is exercised by `size`/`aggregate`
  * higher-order functions, `explode`, and the flat-vs-nested agreement spec
  * in NestedOpsSpec.
  *
  * Scale notes: the array per customer is bounded by orders-per-customer
  * (TPC-H ~10; any realistic skew still fits executor memory), and every
  * pipeline below keys its shuffle on `custkey`, so at 100 TB this is one
  * repartition of orders plus a same-key join — the classic nested-document
  * materialization plan. `explode` pipelines filter BEFORE the explode where
  * the predicate allows (the Mongo reference does the same double-match by
  * hand, `MongoDB.java:358-362`; Catalyst infers it via PushDownPredicates).
  */
object NestedOps {

  /** Nested custorders: customer columns + `orders_arr: array<struct<...>>`.
    * `array_sort` pins element order (collect_list is shuffle-order-dependent)
    * so any sequential fold over the array is deterministic; the struct's
    * first field `o_orderkey` is unique, which makes the sort total.
    * Mirrors `MongoDB.java:242-301` (loadNest). */
  def custorders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val byCust = o
      .groupBy($"o_custkey")
      .agg(array_sort(collect_list(struct(
        $"o_orderkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderdate", $"o_orderpriority"))).as("orders_arr"))
    val c = Tables.customer(spark, dir)
    c.join(byCust, c("c_custkey") === byCust("o_custkey"), "left")
      .drop("o_custkey")
  }

  /** Nested materialization check: per-customer order count + total from the
    * embedded array alone — `size` and a sequential `aggregate` fold, no
    * explode. Customers with no orders keep an empty/null array (Mongo's
    * `getOrDefault(..., new ArrayList<>())`, `MongoDB.java:286-287`). */
  val nest: QueryDef = QueryDef(
    "a7_nest",
    """SELECT c.c_custkey, c.c_name,
      |       count(o.o_orderkey) AS num_orders,
      |       round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
      |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY c.c_custkey""".stripMargin,
  ) { (spark, dir) =>
    custorders(spark, dir)
      .select(
        $"c_custkey", $"c_name",
        coalesce(size($"orders_arr"), lit(0)).cast("long").as("num_orders"),
        round(coalesce(
          aggregate($"orders_arr", lit(0.0),
            (acc, o) => acc + o.getField("o_totalprice")),
          lit(0.0)), 2).as("total_spent"))
      .orderBy($"c_custkey")
  }

  /** Point lookup in a nested array (`MongoDB.java:349-377` query2Nest):
    * match docs whose ORDERS contains the key → unwind → match again →
    * project the order date. The pre-explode `exists(...)` filter is the
    * Mongo pipeline's first `$match` — it prunes customers before the
    * generator runs, which at scale is the difference between exploding one
    * document and exploding the whole collection. */
  val pointNested: QueryDef = QueryDef(
    "a7_point_nested",
    """SELECT c.c_custkey, o.o_orderkey,
      |       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS order_date
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |WHERE o.o_orderkey = 1000
      |ORDER BY c.c_custkey""".stripMargin,
  ) { (spark, dir) =>
    val key = 1000L
    custorders(spark, dir)
      .filter(exists($"orders_arr", o => o.getField("o_orderkey") === key))
      .select($"c_custkey", explode($"orders_arr").as("o"))
      .filter($"o.o_orderkey" === key)
      .select($"c_custkey", $"o.o_orderkey".as("o_orderkey"),
        date_format($"o.o_orderdate", "yyyy-MM-dd").as("order_date"))
      .orderBy($"c_custkey")
  }

  /** Global count over the unwound array (`MongoDB.java:395-410` query3Nest:
    * unwind → group(null) → sum(1)). Explode drops empty/null arrays exactly
    * as `$unwind` drops orderless customers. */
  val unwindCount: QueryDef = QueryDef(
    "a7_unwind_count",
    "SELECT count(*) AS total_orders FROM orders",
  ) { (spark, dir) =>
    custorders(spark, dir)
      .select(explode($"orders_arr").as("o"))
      .agg(count(lit(1)).as("total_orders"))
  }

  /** Top-5 customers by total order amount, FLAT path (`MongoDB.java:432-468`
    * query4: $lookup → $unwind → $group{$sum,$first} → $sort → $limit 5).
    * `first(c_name)` inside the agg mirrors Mongo's `first` accumulator —
    * deterministic here because c_name is functionally dependent on the
    * grouping key. Tiebreak on c_custkey added (reference's sort is
    * tie-ambiguous). */
  val top5Customers: QueryDef = QueryDef(
    "a7_top5_customers",
    top5OracleSql,
  ) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey")) // lookup+unwind ≡ inner join
      .groupBy($"c_custkey")
      .agg(
        round(sum($"o_totalprice"), 2).as("total_order_amount"),
        first($"c_name").as("c_name"))
      .orderBy(desc("total_order_amount"), asc("c_custkey"))
      .limit(5)
      .select($"c_custkey", $"c_name", $"total_order_amount")
  }

  /** Same top-5, NESTED path (`MongoDB.java:470-505` query4Nest: unwind the
    * embedded ORDERS instead of a runtime lookup). Shares the oracle with the
    * flat path — the two being hash-identical IS the reference's flat-vs-nest
    * agreement check. */
  val top5Nested: QueryDef = QueryDef(
    "a7_top5_nested",
    top5OracleSql,
  ) { (spark, dir) =>
    custorders(spark, dir)
      .select($"c_custkey", $"c_name", explode($"orders_arr").as("o"))
      .groupBy($"c_custkey")
      .agg(
        round(sum($"o.o_totalprice"), 2).as("total_order_amount"),
        first($"c_name").as("c_name"))
      .orderBy(desc("total_order_amount"), asc("c_custkey"))
      .limit(5)
      .select($"c_custkey", $"c_name", $"total_order_amount")
  }

  private lazy val top5OracleSql: String =
    """SELECT c.c_custkey, c.c_name,
      |       round(sum(o.o_totalprice), 2) AS total_order_amount
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY total_order_amount DESC, c.c_custkey LIMIT 5""".stripMargin

  /** JSON property extraction (`MongoDB.java:317,373` emits documents as
    * JSON; the `events.props` column is the JSON surface in the testdata):
    * parse `{"k": N}` per event, aggregate per type. */
  val jsonProps: QueryDef = QueryDef(
    "a7_json_props",
    """SELECT event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  ) { (spark, dir) =>
    Tables.events(spark, dir)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"k").cast("long").as("sum_k"))
      .orderBy($"event_type")
  }

  /** JSON OUTPUT surface (`MongoDB.java:317,373`: results rendered via
    * `doc.toJson()`): project each row as a compact JSON document with
    * `to_json(struct(...))`. Field order is pinned by the struct; Spark and
    * DuckDB both render `{"k":v}` with no whitespace, ints bare, strings
    * quoted — only non-null fields are used since Spark's to_json drops
    * nulls where DuckDB emits `"k":null`. */
  val toJsonDoc: QueryDef = QueryDef(
    "a7_to_json",
    """SELECT c_custkey,
      |       to_json(struct_pack(c_custkey := c_custkey, c_name := c_name, c_mktsegment := c_mktsegment))::VARCHAR AS doc
      |FROM customer ORDER BY c_custkey""".stripMargin,
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .select($"c_custkey",
        to_json(struct($"c_custkey", $"c_name", $"c_mktsegment")).as("doc"))
      .orderBy($"c_custkey")
  }

  /** Plain int-array column with membership/range predicates
    * (`ExampleMongo.java:42-46` stores `vals: [i, i*10, i*20]` per doc;
    * line 67 queries with `$lt`): build `vals: array<int>` from the key,
    * filter with a higher-order `exists(vals, _ < 3)`, count the in-range
    * elements with `filter`. The array goes out joined to a string — the
    * driver's hash compare has no portable ArrayType encoding. */
  val intArrayOps: QueryDef = QueryDef(
    "a7_int_array",
    """WITH t AS (
      |  SELECT p_partkey AS num,
      |         [(p_partkey % 7 + 1)::INT,
      |          ((p_partkey % 7 + 1) * 10)::INT,
      |          ((p_partkey % 7 + 1) * 20)::INT] AS vals
      |  FROM part)
      |SELECT num, array_to_string(vals, ',') AS vals,
      |       len(list_filter(vals, x -> x < 30))::BIGINT AS n_small
      |FROM t
      |WHERE len(list_filter(vals, x -> x < 3)) > 0
      |ORDER BY num""".stripMargin,
  ) { (spark, dir) =>
    val base = ($"p_partkey" % 7 + 1).cast("int")
    Tables.part(spark, dir)
      .select($"p_partkey".as("num"),
        array(base, (base * 10).cast("int"), (base * 20).cast("int")).as("vals"))
      .filter(exists($"vals", _ < 3))
      .select($"num",
        concat_ws(",", transform($"vals", _.cast("string"))).as("vals"),
        size(filter($"vals", _ < 30)).cast("long").as("n_small"))
      .orderBy($"num")
  }

  val all: Seq[QueryDef] = Seq(
    nest, pointNested, unwindCount, top5Customers, top5Nested, jsonProps,
    toJsonDoc, intArrayOps,
  )
}
