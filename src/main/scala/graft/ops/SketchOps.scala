package graft.ops

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

  /** Mergeable HLL sketch COLUMNS (Apache DataSketches via Spark 4's
    * `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`): per-type
    * user sketches built once, then UNIONED into a global distinct
    * estimate without touching the raw data again — the store-now,
    * merge-later pattern that makes distinct-count dashboards O(sketch
    * bytes) instead of O(data) at 100 TB. Rows-only (sketch estimates have
    * no ANSI oracle); the spec bounds per-type and unioned estimates
    * against exact counts. */
  val hllUnion: QueryDef = QueryDef.rowsOnly("sketch_hll_union") { (spark, dir) =>
    val perType = Tables.events(spark, dir)
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

  /** Register count (2^6) for [[hllRegisters]]. */
  private val HllM = 64

  /** Textbook HyperLogLog (Flajolet et al. 2007) built DECLARATIVELY and
    * — like [[cmsTopk]], unusually for a sketch — ORACLE-BACKED: under
    * the portable md5 hash the register array is an exact integer object
    * (register j = max over hashed keys with low bits j of the
    * leading-zero rank of the remaining 54 bits), so both engines compute
    * it bit-identically. The harmonic-mean denominator Σ 2^−M[j] is
    * rescaled by 2^54 into an exact BIGINT sum (every term is a register
    * lookup in a 56-entry power table — no float before the shuffle, the
    * repo-wide quantize-then-sum rule), and the one float expression —
    * α·m²·2^54/Σ, quantized to millis — sits at the very end, textually
    * identical in both engines. Emitted next to the exact distinct count
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
    val terms = (0 to 54).map(k => 1L << (54 - k)) :+ 0L
    val estSql = "floor(0.7213 / (1 + 1.079 / 64) * 4096 * " +
      "18014398509481984.0 / sum_t * 1000 + 0.5)"
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
      val rho = (0 to 53)
        .map(k => when($"w" < lit(1L << k), 1L).otherwise(0L))
        .reduce(_ + _) + 1L
      val regs = ev
        .withColumn("h", call_function("md5hash60", $"user_id".cast("string")))
        .select($"event_type", ($"h" % HllM).as("j"), expr(s"h DIV $HllM").as("w"))
        .groupBy($"event_type", $"j").agg(max(rho).as("m"))
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

  val all: Seq[QueryDef] =
    Seq(approxDistinct, approxPercentiles, percentileExact, cmsTopk, hllUnion,
      hllRegisters)
}
