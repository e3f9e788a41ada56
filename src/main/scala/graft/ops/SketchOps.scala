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

  val all: Seq[QueryDef] =
    Seq(approxDistinct, approxPercentiles, percentileExact, cmsTopk, hllUnion)
}
