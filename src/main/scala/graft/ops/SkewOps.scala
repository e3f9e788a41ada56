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

  val all: Seq[QueryDef] = Seq(saltedJoinQuery)
}
