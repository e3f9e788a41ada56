package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Key-skew mitigation. AQE's runtime skew-join split
  * (`spark.sql.adaptive.enabled`, on in [[graft.Sessions]]) is the first
  * line of defense; explicit salting is the planned form for joins whose
  * skew is KNOWN up front (a hot customer, a hot day). `saltedJoin` is
  * semantics-preserving by construction — `skew_salted_join` runs it
  * through the DuckDB gate against a plain-join oracle to prove it.
  */
object SkewOps {

  /** Equi-join `probe ⋈ build` on `key`, with the probe side scattered
    * across `salts` sub-partitions per key and the build side replicated
    * `salts` ways. One hot key's partition becomes `salts` partitions at
    * the cost of a `salts`× blow-up of the (small) build side — the classic
    * trade. `scatter` must be a probe column that varies within a key
    * (a unique id) so rows actually spread. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int, scatter: Column): DataFrame = {
    val salted = probe.withColumn("__salt", pmod(xxhash64(scatter), lit(salts)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted join through the correctness gate: lineitem (probe, scattered
    * by line id) ⋈ orders (build, replicated 8×) on the order key, then an
    * aggregate whose answer must equal the plain join's. */
  val saltedJoinQuery: QueryDef = QueryDef(
    "skew_salted_join",
    """SELECT o.o_orderpriority, count(*) AS n_lines,
      |       round(sum(l.l_extendedprice), 2) AS total
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
  ) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("k"), $"l_linenumber", $"l_extendedprice")
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey".as("k"), $"o_orderpriority")
    saltedJoin(l, o, "k", salts = 8,
      scatter = struct($"k", $"l_linenumber"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice"), 2).as("total"))
      .orderBy($"o_orderpriority")
  }

  /** Key-skew diagnostic — the measurement that decides whether a join
    * needs the salted treatment (or AQE's runtime split) BEFORE it runs:
    * per join-key column, total rows, distinct keys, the heaviest key's
    * row count, and its corpus share in ppm (exact integer, no float
    * compare). One aggregate per key column; the heaviest-key extraction
    * is a max over the key-count table, not a sort. */
  val keySkew: QueryDef = QueryDef(
    "skew_key_diag",
    Seq(("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
      ("orders", "o_custkey"))
      .map { case (t, k) =>
        s"""SELECT '$t.$k' AS key_col,
           |       CAST(sum(cnt) AS BIGINT) AS n_rows,
           |       CAST(count(*) AS BIGINT) AS n_keys,
           |       CAST(max(cnt) AS BIGINT) AS max_key_rows,
           |       CAST(floor(max(cnt) * 1000000.0 / sum(cnt)) AS BIGINT) AS top_share_ppm
           |FROM (SELECT $k, count(*) AS cnt FROM $t GROUP BY $k)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY key_col"),
  ) { (spark, dir) =>
    Seq(("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
      ("orders", "o_custkey"))
      .map { case (t, k) =>
        Tables.load(spark, dir, t)
          .groupBy(col(k)).agg(count(lit(1)).as("cnt"))
          .agg(sum($"cnt").as("n_rows"), count(lit(1)).as("n_keys"),
            max($"cnt").as("max_key_rows"))
          .select(lit(s"$t.$k").as("key_col"), $"n_rows", $"n_keys",
            $"max_key_rows",
            floor($"max_key_rows" * 1000000.0 / $"n_rows")
              .cast("long").as("top_share_ppm"))
      }.reduce(_ union _).orderBy($"key_col")
  }

  val all: Seq[QueryDef] = Seq(saltedJoinQuery, keySkew)
}
