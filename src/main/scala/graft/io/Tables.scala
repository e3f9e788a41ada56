package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (`TESTDATA.md`).
  *
  * All operators go through this object so the scan layer is one seam: on a
  * real cluster the same names would resolve to catalog tables (bucketed /
  * partitioned), while here they are plain parquet directories. Keeping the
  * reads declarative (`spark.read.parquet`) means Catalyst retains predicate
  * pushdown, column pruning, and partition pruning on every query built on
  * top — nothing below this point materializes data eagerly.
  *
  * Dimension tables (`region` 5 rows, `nation` 25 rows) are broadcast at the
  * join sites, not here, so the hint sits next to the join that needs it.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalizes `events.ts` to a plain `TimestampType` event-time column no
    * matter which parquet encoding a given testdata generation used, so every
    * downstream operator (`unix_micros`, window frames, watermarks) sees one
    * uniform type:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]); Sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` so it arrives as
    *    nanos-since-epoch LongType. Integer arithmetic (not `/`, which is
    *    double and loses precision above 2^53) keeps the truncation exact,
    *    and the `pmod` adjustment makes it a true FLOOR division so pre-epoch
    *    (negative) nanos round down to the earlier microsecond.
    *  - timestamp[us] without isAdjustedToUTC: Spark reads TIMESTAMP_NTZ.
    *    The session timezone is pinned UTC ([[graft.Sessions]]), so casting
    *    to TimestampType reinterprets the same wall-clock micros as the same
    *    UTC instant — bit-identical to what DuckDB (naive-UTC) computes on
    *    the same file, keeping the oracles aligned.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000L)) DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
