package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Write-side of the streaming surface (the batch counterpart lives in
  * [[graft.io.Sinks]]). Two exactly-once delivery mechanisms:
  *
  *  - **File sink + checkpoint** (`parquetSink`): Spark's file sink records
  *    committed files in a checkpointed sink log and committed source
  *    offsets in the WAL, so a query restarted from the same checkpoint
  *    resumes AFTER the last committed micro-batch — already-written data
  *    is neither lost nor duplicated (StreamingOpsSpec kills and restarts a
  *    query mid-stream to prove it). This is the 100 TB ingest path: each
  *    micro-batch lands as immutable parquet files, compacted later by
  *    [[graft.io.Sinks.compact]].
  *
  *  - **Idempotent foreachBatch** (`idempotentBatchSink`): for sinks without
  *    a transactional log, exactly-once degrades to at-least-once replay of
  *    a failed micro-batch — made effectively-once by keying the write on
  *    `batchId` (a deterministic replay re-writes the same `batch=<id>`
  *    directory instead of appending a duplicate). The same pattern carries
  *    to JDBC upserts / MERGE targets: batchId is the idempotence key.
  */
object StreamingSinks {

  /** Append-mode parquet file sink with exactly-once checkpointing. */
  def parquetSink(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** batchId-keyed overwrite: replaying a micro-batch rewrites its own
    * directory, so retries cannot duplicate rows. */
  def idempotentBatchSink(df: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
