package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._
import graft.streaming.StreamingOps

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Batch ≡ stream equality on a bounded slice: the same transform function
  * (StreamingOps.tumblingAgg / dedupCount) is driven once as a batch plan
  * and once through MemoryStream + a memory sink, and the final answers must
  * match row-for-row. */
class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def boundedSlice(): Seq[Ev] = {
    import spark.implicits.newLongEncoder // no $-interpolator clash
    io.Tables.events(spark, sf)
      .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00")))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getAs[Timestamp](1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .toSeq
  }

  test("streaming tumbling agg with watermark equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice()
    assert(slice.nonEmpty)

    val stream = MemoryStream[Ev]
    stream.addData(slice)
    val agg = StreamingOps.tumblingAgg(
      stream.toDF().withWatermark("ts", "2 hours"))
    val q = agg.writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("tumbling_out")
      .orderBy($"window_start", $"event_type").collect().toSeq
    val batch = StreamingOps.tumblingAgg(
      io.Tables.events(spark, sf)
        .filter($"ts" < to_timestamp(lit("2024-01-03 00:00:00"))))
      .orderBy($"window_start", $"event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dropDuplicates discards replayed events exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.newProductEncoder
    val slice = boundedSlice().take(200)
    val stream = MemoryStream[Ev]
    stream.addData(slice)
    stream.addData(slice.take(50)) // replay a prefix — must be dropped
    val deduped = StreamingOps.dedupCount(
      stream.toDF().withWatermark("ts", "1 hour"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("complete")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }

    val row = spark.table("dedup_out").collect().head
    assert(row.getLong(0) == slice.length.toLong)
  }
}
