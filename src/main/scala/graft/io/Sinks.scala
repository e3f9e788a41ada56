package graft.io

import org.apache.spark.sql.DataFrame

/** Write-side surface. The reference's three sink families — JDBC batched
  * INSERT (`SQLonRDS.java:156-205`), multi-row INSERT rewriting
  * (`AmazonRedshift.java:298-446`), and Mongo `insertMany`
  * (`MongoDB.java:171-176,228-233`) — are all throughput workarounds for
  * row-at-a-time protocols. Spark's columnar writers subsume them: one
  * `df.write` is the bulk path, and the knobs that matter at 100 TB are
  * LAYOUT, not batch size:
  *
  *  - `partitionBy(keys)` → directory-level partition pruning for keyed
  *    reads (the Bigtable rowkey-range model: a (station, day) read touches
  *    one directory);
  *  - `bucketBy(n, key)` + `sortBy` → co-located, pre-sorted tables whose
  *    equi-joins and aggregations plan WITHOUT a shuffle exchange
  *    (SinksSpec asserts the shuffle-free join plan).
  */
object Sinks {

  /** Plain bulk write — the `insertMany` / batched-INSERT replacement. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Hive-style partitioned layout for keyed/range reads. */
  def writePartitioned(df: DataFrame, path: String, keys: String*): Unit =
    df.write.mode("overwrite").partitionBy(keys: _*).parquet(path)

  /** Bucketed + sorted managed table: equi-joins and group-bys on `key`
    * between tables sharing `buckets` skip the shuffle entirely. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
