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

  /** Bloom geometry: m bits, k probe positions per key. m = 2^12 keeps
    * the whole filter one broadcast array; k = 3 gives fpp ≈ (1-e^(-kn/m))^k
    * — ~2% at n = 400 build keys. */
  private val BloomBits = 4096
  private val BloomK = 3

  /** k bit positions of one key: disjoint 12-bit slices of the portable
    * 60-bit digest (md5hash60 — DuckDB replays it exactly), extracted
    * with integer SHIFTS (never a division through double, which would
    * corrupt bits above 2^53), so the positions are independent uniform
    * draws without extra hashing. */
  private def bloomPositions(key: Column): Column = {
    val h = call_function("md5hash60", key.cast("string"))
    array((0 until BloomK).map(i =>
      pmod(shiftrightunsigned(h, 12 * i), lit(BloomBits.toLong))): _*)
  }

  /** Bloom-filter semi-join readout — the RUNTIME-FILTER technique that
    * makes big-probe/small-build joins cheap at 100 TB (Spark's own
    * `spark.sql.optimizer.runtimeFilter.bloomFilter` does this inside the
    * engine; here it is expressed as an operator so the gate can measure
    * it): the build side's key set (suppliers of one nation) compresses
    * to a [[BloomBits]]-bit position set, broadcast to the probe side
    * (lineitem), and only probe rows whose [[BloomK]] positions ALL hit
    * survive to the exact join. The readout reports, per return flag,
    * the probe count, bloom-pass count, true-match count, and the false
    * positives the exact join then discards — the fpp the geometry
    * formula predicts, measured.
    *
    * Determinism: bit positions are integer slices of the portable
    * digest; membership is exact integer set containment — no float
    * anywhere, so the approximate DATA STRUCTURE is still exactly
    * hash-verifiable cross-engine. Scale shape: the filter is ≤ m
    * distinct positions regardless of build size (collect_set bounded by
    * [[BloomBits]]), broadcast once; the probe never shuffles until
    * after the bloom prunes it. */
  val bloomJoin: QueryDef = QueryDef(
    "skew_bloom_join",
    s"""WITH bld AS (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3),
       |pos AS (SELECT DISTINCT
       |          unnest([(('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)), 1, 15))::BIGINT >> (12 * g)) % $BloomBits
       |                  for g in range(0, $BloomK)]) AS p
       |        FROM bld),
       |pr AS (SELECT l.l_suppkey, l.l_returnflag,
       |              [(('0x' || substr(md5(CAST(l.l_suppkey AS VARCHAR)), 1, 15))::BIGINT >> (12 * g)) % $BloomBits
       |               for g in range(0, $BloomK)] AS ps
       |       FROM lineitem l),
       |posl AS (SELECT list(p) AS bits FROM pos),
       |pr2 AS (SELECT pr.l_returnflag,
       |               CASE WHEN list_has_all(posl.bits, pr.ps) THEN 1 ELSE 0 END AS pass,
       |               CASE WHEN pr.l_suppkey IN (SELECT s_suppkey FROM bld) THEN 1 ELSE 0 END AS hit
       |        FROM pr, posl)
       |SELECT l_returnflag,
       |       CAST(count(*) AS BIGINT) AS n_probe,
       |       CAST(sum(pass) AS BIGINT) AS n_pass,
       |       CAST(sum(hit) AS BIGINT) AS n_true,
       |       CAST(sum(CASE WHEN pass = 1 AND hit = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
       |FROM pr2 GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin,
  ) { (spark, dir) =>
    val build = Tables.supplier(spark, dir)
      .filter($"s_nationkey" === 3).select($"s_suppkey")
    // filter state: the distinct SET bits, bounded by m no matter how many
    // build keys fold in — the broadcastable summary a bloom IS
    val bits = build
      .select(explode(bloomPositions($"s_suppkey")).as("p"))
      .agg(collect_set($"p").as("bits"))
    val probe = Tables.lineitem(spark, dir)
      .select($"l_suppkey", $"l_returnflag",
        bloomPositions($"l_suppkey").as("ps"))
      .crossJoin(broadcast(bits))
      .withColumn("pass",
        forall($"ps", q => array_contains($"bits", q)).cast("long"))
    val exact = probe
      .join(broadcast(build.select($"s_suppkey".as("l_suppkey"),
        lit(1L).as("hit"))), Seq("l_suppkey"), "left")
    exact.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_probe"),
        sum($"pass").as("n_pass"),
        sum(when($"hit" === 1L, 1L).otherwise(0L)).as("n_true"),
        sum(when($"pass" === 1L && $"hit".isNull, 1L).otherwise(0L))
          .as("n_false_pos"))
      .orderBy($"l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(saltedJoinQuery, keySkew, bloomJoin)
}
