package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class FormatOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("jsonl lane: re-read rows are byte-identical to the source table") {
    import org.apache.spark.sql.types._
    val docs = io.Tables.documents(spark, sf)
    val path = s"${sys.props("java.io.tmpdir")}/graft_jsonl_spec"
    docs.write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.schema(schema).json(path)
      .select(docs.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
    assert(back.count() == docs.count())
  }

  test("jsonl read surfaces corrupt lines without poisoning good rows") {
    import org.apache.spark.sql.types._
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_jsonl_corrupt")
    Files.writeString(Paths.get(dir.toString, "part.json"),
      """{"doc_id": 1, "text": "good row"}
        |{"doc_id": 2, "text": "also good"}
        |{"doc_id": 3, "text": "broken
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (default): bad line lands in _corrupt_record, good rows parse
    val permissive = spark.read.schema(schema).json(dir.toString)
      .cache() // required before filtering on the corrupt column
    assert(permissive.where("_corrupt_record IS NULL").count() == 2)
    assert(permissive.where("_corrupt_record IS NOT NULL").count() == 1)
    permissive.unpersist()
    // DROPMALFORMED: the lane yields only the parseable rows
    val dropped = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").json(dir.toString)
      .select("doc_id", "text")
    assert(dropped.count() == 2)
  }

  test("csv lane: decimal money survives the text round trip at scale 2") {
    val out = FormatOps.csvRoundtrip.run(spark, sf).collect()
    assert(out.length == 5)
    // canonical scale-2 render: always a '.' with exactly two decimals
    assert(out.forall(_.getString(2).matches("""\d+\.\d\d""")))
    // totals must equal the decimal aggregate computed straight off parquet
    val direct = io.Tables.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(org.apache.spark.sql.functions.sum(
        $"o_totalprice".cast("decimal(15,2)")).cast("string").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getString(2) == direct(r.getString(0)),
        s"${r.getString(0)}: csv lane ${r.getString(2)} != ${direct(r.getString(0))}")
    }
  }
}
