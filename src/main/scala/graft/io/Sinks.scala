package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Small-file compaction — the maintenance pass every long-lived ingest
    * layout needs (streaming sinks and partitioned appends produce
    * per-micro-batch / per-task files; at 100 TB the resulting
    * millions-of-small-files kill scan throughput via open/seek overhead
    * and NameNode/listing pressure). Rewrites `inPath` into
    * ceil(bytes / targetBytes) files at `outPath` using `coalesce` —
    * a shuffle-free narrow rewrite (each output task concatenates input
    * splits; use `repartition` instead only when output files must also be
    * size-balanced). Returns the output file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    // The scan packs small files (openCostInBytes), so it may already plan
    // fewer partitions than n — then an even redistribution needs a shuffle.
    // Read the planned partition count off the physical scan node, not
    // `df.rdd` (which wraps the whole plan in a row-conversion RDD lineage
    // just to read one int).
    val planned = df.queryExecution.executedPlan.collectLeaves().map {
      case scan: org.apache.spark.sql.execution.FileSourceScanExec =>
        scan.inputRDD.getNumPartitions
      case other => other.execute().getNumPartitions
    }.sum
    val sized = if (planned >= n) df.coalesce(n) else df.repartition(n)
    sized.write.mode("overwrite").parquet(outPath)
    n
  }
}
