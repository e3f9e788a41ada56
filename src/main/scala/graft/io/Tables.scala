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

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[graft.Sessions]]), so
    * the raw column arrives as nanos-since-epoch LongType; normalize it here
    * to a microsecond TimestampType every downstream operator can treat as a
    * plain event-time column. Integer arithmetic (not `/`, which is double
    * and loses precision above 2^53) keeps the truncation exact, and the
    * `pmod` adjustment makes it a true FLOOR division so pre-epoch (negative)
    * nanos round down to the earlier microsecond rather than toward zero.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts",
        timestamp_micros(expr("(ts - pmod(ts, 1000L)) DIV 1000")))
    else raw
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
