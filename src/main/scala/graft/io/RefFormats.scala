package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parsers for the reference repo's own on-disk formats, re-expressed as
  * distributed reads (every one is `spark.read` + built-in expressions — no
  * UDFs, no driver-side iteration, so they scale like any other scan).
  *
  * These take explicit paths (the reference bundles the files; tests point
  * at `/root/reference/...` read-only) and are exercised by RefFormatsSpec
  * goldens rather than the DuckDB oracle, which only sees the sfDir tables.
  */
object RefFormats {

  /** Pipe-delimited TPC-H `.tbl` (`MongoDB.java:121-176` loadCustomers):
    * split on `|`, skip malformed rows with fewer than `minFields` fields
    * (the reference logs-and-skips), type the first `schema.length` fields.
    * Implemented as a text scan + split so the arity filter matches the
    * reference's `split("\\|").length < n` semantics exactly (a CSV reader
    * would instead null-fill short rows). */
  def pipeTbl(spark: SparkSession, path: String, schema: StructType,
      minFields: Int): DataFrame = {
    val arr = split(col("value"), "\\|")
    val typed = schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      element_at(arr, i + 1).cast(f.dataType).as(f.name)
    }
    spark.read.text(path)
      .filter(size(arr) >= minFields)
      .select(typed: _*)
  }

  /** TPC-H customer.tbl schema (8 fields, `MongoDB.java:144-160`). */
  val customerTblSchema: StructType = StructType(Seq(
    StructField("c_custkey", IntegerType),
    StructField("c_name", StringType),
    StructField("c_address", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_phone", StringType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType),
    StructField("c_comment", StringType)))

  /** TPC-H order.tbl schema (9 fields, `MongoDB.java:196-221`; order date
    * deliberately kept a STRING exactly as the reference stores it). */
  val orderTblSchema: StructType = StructType(Seq(
    StructField("o_orderkey", IntegerType),
    StructField("o_custkey", IntegerType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", StringType),
    StructField("o_orderpriority", StringType),
    StructField("o_clerk", StringType),
    StructField("o_shippriority", IntegerType),
    StructField("o_comment", StringType)))

  def customerTbl(spark: SparkSession, path: String): DataFrame =
    pipeTbl(spark, path, customerTblSchema, minFields = 8)

  def orderTbl(spark: SparkSession, path: String): DataFrame =
    pipeTbl(spark, path, orderTblSchema, minFields = 9)

  /** Weather CSV (`Bigtable.java:95-113` spec + `vancouver.csv:1-2` shape):
    * a station banner line and a header line precede the data, the
    * missing-value sentinel is `M`, and ingest keeps only the FIRST reading
    * of each hour. Banner/header are dropped by a data-shaped predicate
    * (first field starts with a digit) rather than by line number, which is
    * the order-independent form a distributed text scan needs. */
  def weatherCsv(spark: SparkSession, path: String, station: String): DataFrame = {
    def m2null(c: String): org.apache.spark.sql.Column =
      when(col(c) === "M" || col(c) === "", lit(null)).otherwise(col(c))
        .cast(DoubleType).as(c)
    val raw = spark.read
      .schema(StructType(
        Seq("pjd", "date", "time", "temperature", "dewpoint", "relhum",
          "speed", "gust", "pressure").map(StructField(_, StringType))))
      .csv(path)
      .filter(col("pjd").rlike("^[0-9]")) // drops banner + header lines
    // Times are `H:MM` (no hour zero-padding, `vancouver.csv:3`), so the
    // hour must be split out, not substringed; readings order within an hour
    // by the monotonic pseudo-Julian timestamp.
    val typed = raw.select(
      lit(station).as("station"),
      to_date(col("date")).as("date"),
      split(col("time"), ":").getItem(0).cast(IntegerType).as("hour"),
      col("pjd").cast(DoubleType).as("pjd"),
      m2null("temperature"), m2null("dewpoint"), m2null("relhum"),
      m2null("speed"), m2null("gust"), m2null("pressure"))
    val w = Window.partitionBy(col("station"), col("date"), col("hour"))
      .orderBy(col("pjd"))
    typed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "pjd")
  }

  /** Quoted-KV user lines (`redis_client.py:52-99`): every line is
    * `"user:N" "field" "value" ...` — extract the quoted strings, fold the
    * alternating tail into a MapType column (the Redis-hash raw form,
    * SURVEY.md §1.6), then project the typed wide row the reference's
    * `hset(mapping=...)` builds, with float lon/lat and epoch last_login. */
  def usersKv(spark: SparkSession, path: String): DataFrame = {
    val arr = regexp_extract_all(col("value"), lit("\"([^\"]*)\""), lit(1))
    val nPairs = ((size(col("kv")) - 1) / 2).cast(IntegerType)
    spark.read.text(path)
      .filter(size(arr) >= 3) // key + at least one field/value pair
      .select(arr.as("kv"))
      .select(
        element_at(col("kv"), 1).as("key"),
        map_from_arrays(
          transform(sequence(lit(1), nPairs), i => element_at(col("kv"), i * 2)),
          transform(sequence(lit(1), nPairs), i => element_at(col("kv"), i * 2 + 1))
        ).as("fields"))
      .select(
        split(col("key"), ":").getItem(1).cast(IntegerType).as("user_id"),
        col("fields")("first_name").as("first_name"),
        col("fields")("last_name").as("last_name"),
        col("fields")("email").as("email"),
        col("fields")("gender").as("gender"),
        col("fields")("ip_address").as("ip_address"),
        col("fields")("country").as("country"),
        col("fields")("country_code").as("country_code"),
        col("fields")("city").as("city"),
        col("fields")("longitude").cast(DoubleType).as("longitude"),
        col("fields")("latitude").cast(DoubleType).as("latitude"),
        col("fields")("last_login").cast(LongType).as("last_login"))
      // epoch seconds → event-time timestamp (the from_unixtime family;
      // `users.txt:1` stores last_login as a unix epoch string)
      .withColumn("last_login_ts",
        timestamp_seconds(col("last_login")))
  }

  /** Scores CSV (`redis_client.py:101-145`): header `user:id,score,
    * leaderboard`, int-cast score, member id parsed from `user:N`. */
  def scoresCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(
        split(col("user:id"), ":").getItem(1).cast(IntegerType).as("user_id"),
        col("score").cast(IntegerType).as("score"),
        // the file is CRLF-terminated; strip any carried \r from the last col
        regexp_replace(col("leaderboard"), "\r", "").as("leaderboard"))
}
