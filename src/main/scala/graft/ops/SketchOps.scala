package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Sketch aggregates — the sub-linear-memory path for 100 TB cardinality
  * and quantile questions (driver north-star room noted in SURVEY.md §2.4).
  * Registered rows-only: the estimates are algorithm-specific (HLL++ /
  * KLL), so no cross-engine oracle exists; SketchOpsSpec bounds them
  * against exact answers instead. At scale these are THE form of these
  * queries — an exact count-distinct over 10^11 keys shuffles every key,
  * a HLL sketch merges a few KB per partition.
  */
object SketchOps {

  /** Per-type distinct users via HyperLogLog++ (2% target rsd). */
  val approxDistinct: QueryDef =
    QueryDef.rowsOnly("sketch_approx_distinct") { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"))
        .orderBy($"event_type")
    }

  /** Per-type value quantiles via the approximate percentile sketch. */
  val approxPercentiles: QueryDef =
    QueryDef.rowsOnly("sketch_approx_percentiles") { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(percentile_approx($"value",
          array(lit(0.5), lit(0.95)), lit(10000)).as("p50_p95"))
        .select($"event_type",
          element_at($"p50_p95", 1).as("p50"),
          element_at($"p50_p95", 2).as("p95"))
        .orderBy($"event_type")
    }

  /** Exact interpolated percentiles per group — the ground truth the
    * sketches above are bounded against, itself oracle-checked: Spark's
    * `percentile` and DuckDB's `quantile_cont` both compute the standard
    * linear interpolation over the sorted group, and the raw doubles are
    * bit-identical (verified; `round()` is NOT applied because the two
    * engines' decimal rounding diverges on half-cent boundaries while the
    * unrounded values agree exactly).
    *
    * Scale note: exact percentile buffers every group value — fine for
    * bounded groups (3 return flags), the reason the KLL sketch twin above
    * is the 100 TB form for high-cardinality groups. */
  val percentileExact: QueryDef = QueryDef(
    "sketch_percentile_exact",
    """SELECT l_returnflag,
      |       quantile_cont(l_extendedprice, 0.25) AS q25,
      |       quantile_cont(l_extendedprice, 0.50) AS q50,
      |       quantile_cont(l_extendedprice, 0.75) AS q75,
      |       quantile_cont(l_extendedprice, 0.90) AS q90,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      // ONE percentile aggregate with an array of quantiles: four scalar
      // percentile() calls would each buffer the full group independently
      // (measured 4× slower at sf0.1 — 7.2 s vs 1.8 s).
      .agg(
        percentile($"l_extendedprice",
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.9))).as("qs"),
        count(lit(1)).as("n"))
      .select($"l_returnflag",
        element_at($"qs", 1).as("q25"),
        element_at($"qs", 2).as("q50"),
        element_at($"qs", 3).as("q75"),
        element_at($"qs", 4).as("q90"),
        $"n")
      .orderBy($"l_returnflag")
  }

  /** Count-min sketch heavy hitters over the document token stream —
    * d=4 hash rows × w=1024 counters, estimate = min over rows of the
    * hashed bucket (Cormode & Muthukrishnan 2005). Built DECLARATIVELY:
    * the sketch is just `GROUP BY (row, bucket)` over hashed token counts,
    * so — unusually for a sketch — it is exactly reproducible cross-engine
    * via the portable 60-bit md5 hash and ships ORACLE-BACKED, overcount
    * and all (`est >= cnt` by construction; equality when no collision).
    *
    * Scale path: here the exact per-token counts feed the sketch (the
    * corpus vocabulary is small); at 100 TB you feed raw occurrences
    * straight into the same (row, bucket) aggregate — identical result by
    * associativity, 4·1024 counters of state instead of a vocabulary-sized
    * shuffle — and estimate only a candidate set (per-partition top-k)
    * rather than every distinct token. */
  val cmsTopk: QueryDef = QueryDef(
    "sketch_cms_topk",
    """WITH tok AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
      |             FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |             GROUP BY w),
      |cells AS (SELECT i, w, cnt,
      |                 ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || w), 1, 15))::BIGINT % 1024 AS j
      |          FROM tok, (SELECT unnest([0, 1, 2, 3]) AS i)),
      |sketch AS (SELECT i, j, sum(cnt) AS bucket FROM cells GROUP BY i, j),
      |est AS (SELECT c.w, min(c.cnt) AS cnt, min(s.bucket) AS est
      |        FROM cells c JOIN sketch s ON s.i = c.i AND s.j = c.j
      |        GROUP BY c.w)
      |SELECT w, CAST(cnt AS BIGINT) AS cnt, CAST(est AS BIGINT) AS est
      |FROM est ORDER BY est DESC, w LIMIT 20""".stripMargin,
  ) { (spark, dir) =>
    val toks = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
    val cells = toks
      .select($"w", $"cnt", explode(array((0 to 3).map(lit(_)): _*)).as("i"))
      .withColumn("j",
        call_function("md5hash60",
          concat($"i".cast("string"), lit(":"), $"w")) % 1024)
    val sketch = cells.groupBy($"i", $"j").agg(sum($"cnt").as("bucket"))
    cells.join(sketch, Seq("i", "j"))
      .groupBy($"w").agg(min($"cnt").as("cnt"), min($"bucket").as("est"))
      .orderBy($"est".desc, $"w")
      .limit(20)
  }

  /** Register count (2^6) for [[hllRegisters]] / [[hllUnion]]. */
  private val HllM = 64

  /** Power table for the HLL harmonic sum, scaled by 2^55 so EVERY term
    * is an exact integer: register value m contributes 2^(55−m). m ranges
    * 0..55 (ρ = 1 + leading zeros of a 54-bit suffix, so ρ ≤ 55), and the
    * all-zero-suffix case m = 55 contributes exactly 1 — round-13 ADVICE
    * fix: the previous 2^54 scaling truncated that (rare) register's
    * 0.5 term to 0, deviating slightly from textbook HLL. Max possible
    * sum = 64·2^55 = 2^61, comfortably inside BIGINT. */
  private val HllTerms: IndexedSeq[Long] = (0 to 55).map(k => 1L << (55 - k))

  /** The final estimate expression over the 2^55-scaled harmonic sum:
    * α₆₄·m²·2^55 / Σ, quantized to millis — textually identical in both
    * engines (the repo's one-float-expression-at-the-end rule). */
  private val HllEstSql = "floor(0.7213 / (1 + 1.079 / 64) * 4096 * " +
    "36028797018963968.0 / sum_t * 1000 + 0.5)"

  /** HLL UNION over the exact-register sketches — the store-now,
    * merge-later pattern that makes distinct-count dashboards O(sketch
    * bytes) instead of O(data) at 100 TB: per-type register arrays are
    * built once ([[hllRegisterAgg]], the identical object `stream_hll`
    * maintains incrementally), and the global ("ALL") sketch is their
    * per-register MAX — no second pass over the raw data. Because the
    * registers are exact integer objects under the portable md5 hash,
    * the WHOLE readout including the unioned estimate is ORACLE-BACKED
    * (round-13: re-routed from the opaque DataSketches `hll_union_agg`
    * binary, which DuckDB cannot replay — SketchOpsSpec still checks
    * this estimate against the DataSketches one within HLL error).
    * `exact_users` rides along as test-SF instrumentation (it shuffles
    * every key — drop it at scale).
    *
    * Scale shape: one corpus pass builds ≤ 64 rows per type; the union
    * is a 64-row aggregate; everything downstream is type-domain-sized. */
  val hllUnion: QueryDef = QueryDef(
    "sketch_hll_union",
    s"""WITH h AS (SELECT event_type,
       |                  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |           FROM events),
       |jw AS (SELECT event_type, h % $HllM AS j, h // $HllM AS w FROM h),
       |r AS (SELECT event_type, j,
       |             max(1 + list_sum(list_transform(${(0 to 53).map(1L << _).mkString("[", ", ", "]")},
       |                   p -> CASE WHEN w < p THEN 1 ELSE 0 END))) AS m
       |      FROM jw GROUP BY 1, 2),
       |ra AS (SELECT * FROM r
       |       UNION ALL
       |       SELECT 'ALL' AS event_type, j, max(m) AS m FROM r GROUP BY j),
       |tn AS (SELECT DISTINCT event_type FROM events
       |       UNION ALL SELECT 'ALL'),
       |reg AS (SELECT tn.event_type, g.j, coalesce(ra.m, 0) AS m
       |        FROM tn
       |        CROSS JOIN (SELECT unnest(range(0, $HllM)) AS j) g
       |        LEFT JOIN ra ON ra.event_type = tn.event_type AND ra.j = g.j),
       |s AS (SELECT event_type,
       |             sum(${HllTerms.mkString("[", ", ", "]")}[CAST(m AS INT) + 1]) AS sum_t,
       |             sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS n_zero
       |      FROM reg GROUP BY 1),
       |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
       |      FROM events GROUP BY 1
       |      UNION ALL
       |      SELECT 'ALL', count(DISTINCT user_id) FROM events)
       |SELECT s.event_type, CAST(s.sum_t AS BIGINT) AS sum_t,
       |       CAST(s.n_zero AS BIGINT) AS n_zero,
       |       CAST($HllEstSql AS BIGINT) AS est_milli,
       |       CAST(x.exact_users AS BIGINT) AS exact_users
       |FROM s JOIN x USING (event_type) ORDER BY s.event_type""".stripMargin,
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir).select($"event_type", $"user_id")
    val regs = graft.Caches.persist(hllRegisterAgg(ev))
    val sparse = regs.unionByName(
      regs.groupBy($"j").agg(max($"m").as("m"))
        .select(lit("ALL").as("event_type"), $"j", $"m"))
    val names = ev.select($"event_type").distinct()
      .unionByName(spark.range(1).select(lit("ALL").as("event_type")))
    val full = names
      .select($"event_type", explode(sequence(lit(0L), lit(HllM - 1L))).as("j"))
      .join(sparse, Seq("event_type", "j"), "left")
      .withColumn("m", coalesce($"m", lit(0L)))
    val s = full.groupBy($"event_type")
      .agg(
        sum(element_at(array(HllTerms.map(lit): _*), ($"m" + 1).cast("int")))
          .as("sum_t"),
        sum(when($"m" === 0, 1L).otherwise(0L)).as("n_zero"))
    val x = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
      .unionByName(ev.agg(countDistinct($"user_id").as("exact_users"))
        .select(lit("ALL").as("event_type"), $"exact_users"))
    s.join(x, "event_type")
      .select($"event_type", $"sum_t", $"n_zero",
        expr(s"CAST($HllEstSql AS BIGINT)").as("est_milli"), $"exact_users")
      .orderBy($"event_type")
  }

  /** The DataSketches form of the same union (Spark 4's `hll_sketch_agg`
    * / `hll_union_agg` / `hll_sketch_estimate`) — kept as the spec's
    * cross-check: SketchOpsSpec asserts [[hllUnion]]'s register-exact
    * estimates agree with these opaque-binary ones within HLL error. */
  private[graft] def hllUnionDatasketches(events: DataFrame): DataFrame = {
    val perType = events
      .groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id", lit(14)).as("sk"))
    val global = perType
      .agg(hll_union_agg($"sk").as("sk"))
      .select(lit("ALL").as("event_type"),
        hll_sketch_estimate($"sk").as("est_users"))
    perType
      .select($"event_type", hll_sketch_estimate($"sk").as("est_users"))
      .unionByName(global)
      .orderBy($"event_type")
  }

  /** Textbook HyperLogLog (Flajolet et al. 2007) built DECLARATIVELY and
    * — like [[cmsTopk]], unusually for a sketch — ORACLE-BACKED: under
    * the portable md5 hash the register array is an exact integer object
    * (register j = max over hashed keys with low bits j of the
    * leading-zero rank of the remaining 54 bits), so both engines compute
    * it bit-identically. The harmonic-mean denominator Σ 2^−M[j] is
    * rescaled by 2^55 into an exact BIGINT sum ([[HllTerms]] — every term
    * is a register lookup in a 56-entry power table, no float before the
    * shuffle, the repo-wide quantize-then-sum rule), and the one float
    * expression — α·m²·2^55/Σ, quantized to millis ([[HllEstSql]]) — sits
    * at the very end, textually identical in both engines. Emitted next to the exact distinct count
    * so the row is its own error readout; `n_zero` is the input to the
    * linear-counting small-range correction a production deployment
    * layers on below 2.5m.
    *
    * Scale shape: ONE pass, state = 64 longs per group (vs
    * [[approxDistinct]]'s opaque HLL++ binary) — the 100 TB distinct-count
    * form; the register join is against a 5×64-row frame. The exact
    * count column is test-SF-only instrumentation (it shuffles every
    * key); drop it at scale. */
  val hllRegisters: QueryDef = {
    val powers = (0 to 53).map(1L << _)
    val terms = HllTerms
    val estSql = HllEstSql
    QueryDef(
      "sketch_hll_registers",
      s"""WITH h AS (SELECT event_type,
         |                  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |           FROM events),
         |jw AS (SELECT event_type, h % $HllM AS j, h // $HllM AS w FROM h),
         |r AS (SELECT event_type, j,
         |             max(1 + list_sum(list_transform(${powers.mkString("[", ", ", "]")},
         |                   p -> CASE WHEN w < p THEN 1 ELSE 0 END))) AS m
         |      FROM jw GROUP BY 1, 2),
         |reg AS (SELECT t.event_type, g.j, coalesce(r.m, 0) AS m
         |        FROM (SELECT DISTINCT event_type FROM events) t
         |        CROSS JOIN (SELECT unnest(range(0, $HllM)) AS j) g
         |        LEFT JOIN r ON r.event_type = t.event_type AND r.j = g.j),
         |s AS (SELECT event_type,
         |             sum(${terms.mkString("[", ", ", "]")}[CAST(m AS INT) + 1]) AS sum_t,
         |             sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS n_zero
         |      FROM reg GROUP BY 1),
         |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
         |      FROM events GROUP BY 1)
         |SELECT s.event_type, CAST(s.sum_t AS BIGINT) AS sum_t,
         |       CAST(s.n_zero AS BIGINT) AS n_zero,
         |       CAST($estSql AS BIGINT) AS est_milli,
         |       CAST(x.exact_users AS BIGINT) AS exact_users
         |FROM s JOIN x USING (event_type) ORDER BY s.event_type""".stripMargin,
    ) { (spark, dir) =>
      val ev = Tables.events(spark, dir).select($"event_type", $"user_id")
      val regs = hllRegisterAgg(ev)
      val full = ev.select($"event_type").distinct()
        .select($"event_type", explode(sequence(lit(0L), lit(HllM - 1L))).as("j"))
        .join(regs, Seq("event_type", "j"), "left")
        .withColumn("m", coalesce($"m", lit(0L)))
      val s = full.groupBy($"event_type")
        .agg(
          sum(element_at(array(terms.map(lit): _*), ($"m" + 1).cast("int")))
            .as("sum_t"),
          sum(when($"m" === 0, 1L).otherwise(0L)).as("n_zero"))
      val x = ev.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("exact_users"))
      s.join(x, "event_type")
        .select($"event_type", $"sum_t", $"n_zero",
          expr(s"CAST($estSql AS BIGINT)").as("est_milli"), $"exact_users")
        .orderBy($"event_type")
    }
  }

  /** Sketch size for [[kmvIntersect]]. */
  private val KmvK = 64

  /** K-minimum-values (theta-style) set-intersection sketch between the
    * per-event-type user sets (Beyer et al. 2007 / the DataSketches theta
    * family): each type keeps its [[KmvK]] SMALLEST portable-md5 user
    * hashes; for a pair, the k smallest of the merged sketch form the
    * union sample U, and `|{h ∈ U : h in both sketches}| / |U|` estimates
    * the Jaccard similarity — the store-now-intersect-later pattern
    * ([[hllUnion]]'s union sibling; HLL can union but cannot intersect).
    * Like [[cmsTopk]]/[[hllRegisters]], the sketch is an exact integer
    * object under the portable hash, so — unusually for a sketch — the
    * whole row including the estimate is ORACLE-BACKED; the exact Jaccard
    * rides along as test-SF instrumentation (it shuffles every key — drop
    * it at scale).
    *
    * Scale shape: per-type k-mins are computed in two bounded phases —
    * local top-k per (type, 32 hash shards), then top-k of the ≤ 32·k
    * survivors — so no window ever sees more than max(shard, 32·k) rows
    * per partition no matter the corpus size; pair expansion is over the
    * bounded type domain (10 pairs), each carrying ≤ 2k sketch rows. */
  val kmvIntersect: QueryDef = QueryDef(
    "sketch_kmv_intersect",
    s"""WITH h AS (SELECT DISTINCT event_type AS t,
       |                  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |           FROM events),
       |k AS (SELECT t, h FROM (SELECT t, h,
       |              row_number() OVER (PARTITION BY t ORDER BY h) AS rk FROM h)
       |      WHERE rk <= $KmvK),
       |tp AS (SELECT a.t AS t1, b.t AS t2
       |       FROM (SELECT DISTINCT t FROM h) a JOIN (SELECT DISTINCT t FROM h) b ON a.t < b.t),
       |m AS (SELECT tp.t1, tp.t2, k.h,
       |             max(CASE WHEN k.t = tp.t1 THEN 1 ELSE 0 END) AS in_a,
       |             max(CASE WHEN k.t = tp.t2 THEN 1 ELSE 0 END) AS in_b
       |      FROM tp JOIN k ON k.t = tp.t1 OR k.t = tp.t2
       |      GROUP BY 1, 2, 3),
       |u AS (SELECT t1, t2, in_a, in_b FROM (SELECT t1, t2, in_a, in_b,
       |             row_number() OVER (PARTITION BY t1, t2 ORDER BY h) AS rk FROM m)
       |      WHERE rk <= $KmvK),
       |est AS (SELECT t1, t2, CAST(sum(in_a * in_b) AS BIGINT) AS n_common_kmin,
       |               CAST(count(*) AS BIGINT) AS n_u,
       |               CAST(sum(in_a * in_b) * 1000000 // count(*) AS BIGINT) AS est_jaccard_ppm
       |        FROM u GROUP BY 1, 2),
       |e AS (SELECT DISTINCT event_type AS t, user_id FROM events),
       |du AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY t),
       |ix AS (SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS inter
       |       FROM e a JOIN e b ON a.user_id = b.user_id AND a.t < b.t
       |       GROUP BY 1, 2)
       |SELECT est.t1, est.t2, est.n_common_kmin, est.n_u, est.est_jaccard_ppm,
       |       CAST(coalesce(ix.inter, 0) * 1000000 //
       |            (da.n + db.n - coalesce(ix.inter, 0)) AS BIGINT) AS exact_jaccard_ppm
       |FROM est LEFT JOIN ix ON ix.t1 = est.t1 AND ix.t2 = est.t2
       |     JOIN du da ON da.t = est.t1 JOIN du db ON db.t = est.t2
       |ORDER BY est.t1, est.t2""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val h = Tables.events(spark, dir)
      .select($"event_type".as("t"),
        call_function("md5hash60", $"user_id".cast("string")).as("h"))
      .distinct()
    // bounded two-phase per-type top-k: shard-local k-mins, then k of those
    val local = h.withColumn("shard", $"h" % 32)
      .withColumn("rk", row_number().over(
        Window.partitionBy($"t", $"shard").orderBy($"h")))
      .filter($"rk" <= KmvK).drop("shard", "rk")
    val k = local
      .withColumn("rk", row_number().over(Window.partitionBy($"t").orderBy($"h")))
      .filter($"rk" <= KmvK).drop("rk")
    val types = h.select($"t").distinct()
    val tp = types.as("a").join(types.as("b"), $"a.t" < $"b.t")
      .select($"a.t".as("t1"), $"b.t".as("t2"))
    val m = tp.join(k, $"t" === $"t1" || $"t" === $"t2")
      .groupBy($"t1", $"t2", $"h")
      .agg(max(when($"t" === $"t1", 1L).otherwise(0L)).as("in_a"),
        max(when($"t" === $"t2", 1L).otherwise(0L)).as("in_b"))
    val u = m.withColumn("rk", row_number().over(
        Window.partitionBy($"t1", $"t2").orderBy($"h")))
      .filter($"rk" <= KmvK)
    val est = u.groupBy($"t1", $"t2")
      .agg(sum($"in_a" * $"in_b").as("n_common_kmin"),
        count(lit(1)).as("n_u"))
      .withColumn("est_jaccard_ppm",
        expr("n_common_kmin * 1000000 DIV n_u"))
    val e = Tables.events(spark, dir)
      .select($"event_type".as("t"), $"user_id").distinct()
    val du = e.groupBy($"t").agg(count(lit(1)).as("n"))
    val ix = e.as("a").join(e.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.t" < $"b.t")
      .groupBy($"a.t".as("t1"), $"b.t".as("t2"))
      .agg(count(lit(1)).as("inter"))
    est.join(ix, Seq("t1", "t2"), "left")
      .join(du.select($"t".as("t1"), $"n".as("na")), "t1")
      .join(du.select($"t".as("t2"), $"n".as("nb")), "t2")
      .withColumn("i", coalesce($"inter", lit(0L)))
      .select($"t1", $"t2", $"n_common_kmin", $"n_u", $"est_jaccard_ppm",
        expr("i * 1000000 DIV (na + nb - i)").as("exact_jaccard_ppm"))
      .orderBy($"t1", $"t2")
  }

  /** Sparse HLL register table — per-(type, register) max leading-zero
    * rank, the MERGEABLE integer state behind [[hllRegisters]], extracted
    * so the streaming twin (`stream_hll`) aggregates the identical object
    * across micro-batches (max is associative, so stream ≡ batch). */
  private[graft] def hllRegisterAgg(events: DataFrame): DataFrame = {
    val rho = (0 to 53)
      .map(k => when($"w" < lit(1L << k), 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    events
      .select($"event_type", $"user_id")
      .withColumn("h", call_function("md5hash60", $"user_id".cast("string")))
      .select($"event_type", ($"h" % HllM).as("j"), expr(s"h DIV $HllM").as("w"))
      .groupBy($"event_type", $"j").agg(max(rho).as("m"))
  }

  val all: Seq[QueryDef] =
    Seq(approxDistinct, approxPercentiles, percentileExact, cmsTopk, hllUnion,
      hllRegisters, kmvIntersect)
}
