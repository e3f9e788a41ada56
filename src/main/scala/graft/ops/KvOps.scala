package graft.ops

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Assignment 5 (Redis hashes + sorted sets, `redis_client.py`) re-targeted
  * at the customer/nation/events testdata: customer rows ≈ `user:N` hashes,
  * nation name ≈ the `country` tag field, c_acctbal ≈ the numeric index
  * field, and a per-user purchase-value sum over events ≈ the leaderboard
  * sorted set.
  *
  * The reference's client-side anti-patterns collapse into declarative plans
  * (SURVEY.md §3 E3): SCAN-cursor loops become partitioned scans with pushed
  * predicates, and per-member `hget` loops become a broadcast hash join —
  * the N+1 RPC pattern is exactly what a 100 TB engine must not do.
  */
object KvOps {

  /** hgetall — all fields of one key (`redis_client.py:148-169`). A point
    * lookup is a pushed-down equality predicate on the key column; parquet
    * row-group stats prune everything else. */
  val pointLookup: QueryDef = QueryDef(
    "a5_point_lookup",
    "SELECT * FROM customer WHERE c_custkey = 42",
  ) { (spark, dir) =>
    Tables.customer(spark, dir).filter($"c_custkey" === 42)
  }

  /** hmget — selected fields of one key (`redis_client.py:171-208`,
    * longitude/latitude → acctbal/mktsegment here). Column pruning plus the
    * key predicate: the scan reads exactly two columns. */
  val projLookup: QueryDef = QueryDef(
    "a5_proj_lookup",
    "SELECT c_acctbal, c_mktsegment FROM customer WHERE c_custkey = 42",
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .filter($"c_custkey" === 42)
      .select($"c_acctbal", $"c_mktsegment")
  }

  /** SCAN `user:*` keeping keys whose id's first digit is even
    * (`redis_client.py:239-252`), as pure built-in expressions — no UDF.
    * The id is parsed from the key string exactly as the reference splits
    * `user:N` (here `Customer#000000N`: split on '#', strip leading zeros,
    * test the first digit). */
  val prefixDigitFilter: QueryDef = QueryDef(
    "a5_prefix_digit_filter",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_name LIKE 'Customer#%'
      |  AND substr(regexp_replace(split_part(c_name, '#', 2), '^0+', ''), 1, 1)
      |      IN ('2', '4', '6', '8')
      |ORDER BY c_custkey""".stripMargin,
  ) { (spark, dir) =>
    val digit = substring(
      regexp_replace(element_at(split($"c_name", "#"), 2), "^0+", ""), 1, 1)
    Tables.customer(spark, dir)
      .filter($"c_name".like("Customer#%") && digit.isin("2", "4", "6", "8"))
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** RediSearch tag + numeric-range query (`redis_client.py:303-340`:
    * `(@country:{China}|@country:{Russia}) @latitude:[40 46]`): tag
    * membership on the joined nation name, BETWEEN on the numeric field.
    * The 25-row nation dim is broadcast — the "secondary index" is parquet
    * min/max plus a broadcast hash join, not a server-side index. */
  val searchTagRange: QueryDef = QueryDef(
    "a5_search_tag_range",
    """SELECT c.c_custkey, n.n_name, c.c_acctbal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE n.n_name IN ('NATION_3', 'NATION_7')
      |  AND c.c_acctbal BETWEEN 1000 AND 5000
      |ORDER BY c.c_custkey""".stripMargin,
  ) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
      .filter($"c_acctbal".between(1000, 5000))
    val n = Tables.nation(spark, dir)
      .filter($"n_name".isin("NATION_3", "NATION_7"))
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select($"c_custkey", $"n_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  /** Leaderboard top-10 with member→profile lookup (`redis_client.py:427-465`:
    * `zrevrange(lb, 0, 9, withscores=True)` then per-member `hget(email)`).
    * The sorted set is a purchase-value sum per user; the per-member RPC
    * loop becomes one broadcast join of the 10-row top-k against customer. */
  val top10Leaderboard: QueryDef = QueryDef(
    "a5_top10_leaderboard",
    """SELECT e.user_id, c.c_name, round(sum(e.value), 2) AS score
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |WHERE e.event_type = 'purchase'
      |GROUP BY e.user_id, c.c_name
      |ORDER BY score DESC, e.user_id LIMIT 10""".stripMargin,
  ) { (spark, dir) =>
    val scores = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(round(sum($"value"), 2).as("score"))
      .orderBy(desc("score"), asc("user_id"))
      .limit(10) // TakeOrderedAndProject — top-k before the join
    val c = Tables.customer(spark, dir)
    scores.join(c, scores("user_id") === c("c_custkey"))
      .select($"user_id", $"c_name", $"score")
      .orderBy(desc("score"), asc("user_id"))
  }

  /** Keyset (cursor) pagination — the declarative form of the reference's
    * SCAN cursor loop (`redis_client.py:248` `scan_iter`): resume strictly
    * after the last key seen, never OFFSET. The key predicate pushes into
    * the scan and the page is a `TakeOrderedAndProject` — constant work per
    * page at any table size, where OFFSET n re-reads n rows. */
  val keysetPage: QueryDef = QueryDef(
    "a5_keyset_page",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_name > 'Customer#000000042'
      |ORDER BY c_name LIMIT 20""".stripMargin,
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .filter($"c_name" > "Customer#000000042")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_name")
      .limit(20)
  }

  val all: Seq[QueryDef] = Seq(
    pointLookup, projLookup, prefixDigitFilter, searchTagRange,
    top10Leaderboard, keysetPage,
  )
}
