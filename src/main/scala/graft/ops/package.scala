package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object ops {
  /** `$"name"` column sugar usable without a SparkSession-bound
    * `spark.implicits._` import (ops are session-agnostic builders). */
  implicit class ColumnInterp(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Shuffle width for ITERATIVE vertex/state loops: the input frame's
    * materialized partition count — for memo/checkpoint leaves, what AQE
    * actually produced, a data-size signal that costs no job — capped at
    * the session shuffle width. Round-17 finding: at bench SF the mined
    * co-occurrence graph is one or two blocks, and running every
    * half-round join/aggregate at the session-wide 32 partitions is pure
    * task-launch overhead (graph_hits measured 16 s → ~6 s at sf0.1 from
    * this alone — ~45 stages × 32 near-empty tasks); on a cluster-sized
    * graph the leaf arrives in many blocks and the loop keeps the full
    * width, so the 100 TB plan shape is unchanged. A LAZY input (fixture
    * seams) plans its final stage at the session width, so the cap makes
    * this a no-op there — never wrong, only unoptimized. */
  def loopParts(df: org.apache.spark.sql.DataFrame): Int = {
    val conf = scala.util.Try(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt).getOrElse(32)
    math.max(1, math.min(conf, df.rdd.getNumPartitions))
  }

  /** [[loopParts]] from a MEASURED row count instead of a materialized
    * leaf — for loops that already pay a convergence count() per round
    * (star contraction), where the loop state is freshly-shuffled every
    * round and the cached-plan partition count would just echo the
    * session conf. ~256k edge-sized rows per task keeps tasks milliseconds
    * cheap at bench SF and the width grows linearly with the frame. */
  def loopPartsFor(spark: org.apache.spark.sql.SparkSession,
      rows: Long, rowsPerPart: Long = 1L << 18): Int = {
    val conf = scala.util.Try(spark.conf
      .get("spark.sql.shuffle.partitions").toLong).getOrElse(32L)
    math.max(1L, math.min(conf, rows / rowsPerPart + 1L)).toInt
  }

  /** Run an ITERATIVE loop body with `spark.sql.shuffle.partitions`
    * scoped to [[loopParts]]' width, restoring the session value after.
    * Every eager action inside the body (the loop's localCheckpoints)
    * plans its shuffles at the scoped width; frames RETURNED lazily
    * execute later at the restored session width, which is exactly
    * right — the loop state is input-sized, the final readout joins the
    * session's world again. Sound because every execution surface here
    * (Bench, Verify, the driver, forked tests) runs queries
    * SEQUENTIALLY on the session; a concurrently-planning query would
    * observe the scoped width, so callers are loop bodies only, never
    * long-lived builders. */
  def withLoopWidth[T](spark: org.apache.spark.sql.SparkSession, p: Int)(
      body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, p.toString)
    try body finally spark.conf.set(key, old)
  }
}
