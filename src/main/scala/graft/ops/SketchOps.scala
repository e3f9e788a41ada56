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

  val all: Seq[QueryDef] = Seq(approxDistinct, approxPercentiles)
}
