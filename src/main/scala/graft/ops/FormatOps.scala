package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef
import graft.io.Tables

/** Source/sink format lanes beyond parquet. Each lane round-trips real
  * data through the engine's own writer and reader, then aggregates the
  * re-read table while the oracle computes identical values from the
  * original parquet — so any fidelity loss anywhere in the lane (encode,
  * escaping, type mapping, re-read) breaks the hash compare. Same proof
  * shape as the decimal storage lane (`rds_decimal_stored`).
  */
object FormatOps {

  /** Staging dirs this JVM created, deleted on exit — the applicationId
    * suffix makes every session's staging unique (no overwrite races), so
    * without cleanup each run would leak full table copies under tmpdir. */
  private val stagedDirs = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      stagedDirs.keySet.forEach { d =>
        try {
          val root = java.nio.file.Paths.get(d)
          if (java.nio.file.Files.exists(root)) {
            val walk = java.nio.file.Files.walk(root)
            try walk
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
            finally walk.close()
          }
        } catch { case _: Throwable => () } // exit-path cleanup is best-effort
      }))

  /** Staging directory for a round-trip lane: keyed on the SANITIZED full
    * source path (not its hashCode — two different dirs must never collide)
    * and suffixed with the session's applicationId so concurrent runners
    * over the same testdata (e.g. a parallel Verify + Bench) each stage in
    * their own directory instead of racing `mode("overwrite")` against each
    * other mid-read. Within one session the path is stable, so repeated
    * runs of a lane reuse it via mode(overwrite); every path is registered
    * for JVM-exit deletion so sessions don't accumulate staged copies. */
  private def stagePath(
      spark: org.apache.spark.sql.SparkSession, dir: String, fmt: String): String = {
    val safeDir = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val app = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft_stage_${fmt}_${safeDir}_$app"
    cleanupHook
    stagedDirs.put(path, true)
    path
  }

  /** JSON-lines round trip of the documents table. The read side supplies
    * an EXPLICIT schema — schema inference over JSONL is a full extra pass
    * of the data at scale (and type-unstable on partial data), so the
    * engine treats it as an anti-pattern; a production lane always pins
    * the schema. */
  val jsonlRoundtrip: QueryDef = QueryDef(
    "src_jsonl_roundtrip",
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc,
      |       CAST(sum(length(text)) AS BIGINT) AS sum_text_len
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
  ) { (spark, dir) =>
    val path = stagePath(spark, dir, "jsonl")
    Tables.documents(spark, dir)
      .write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.schema(schema).json(path)
    back.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"),
        sum(length($"text")).cast("long").as("sum_text_len"))
      .orderBy($"lang")
  }

  /** CSV round trip of the orders table — header on, explicit schema and
    * timestamp format back in, money column carried as DECIMAL(15,2)
    * through the text form (CSV has no types; the decimal render is the
    * canonical '1013.70' string, so the lane also re-proves scale-2
    * fidelity text-side). */
  val csvRoundtrip: QueryDef = QueryDef(
    "src_csv_roundtrip",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS VARCHAR) AS total_money,
      |       CAST(min(o_orderdate) AS DATE) AS first_day
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  ) { (spark, dir) =>
    val path = stagePath(spark, dir, "csv")
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice".cast("decimal(15,2)").as("o_totalprice"),
        $"o_orderdate", $"o_orderpriority")
      .write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DecimalType(15, 2)),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType)))
    val back = spark.read.schema(schema).option("header", "true").csv(path)
    back.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice").cast("string").as("total_money"),
        min($"o_orderdate").cast("date").as("first_day"))
      .orderBy($"o_orderpriority")
  }

  /** ORC round trip of lineitem's pricing columns — the third columnar
    * format Spark ships natively. Unlike the text lanes the schema rides
    * in the file, so the lane proves type fidelity (DECIMAL(15,2) logical
    * type included) through a different writer/reader stack than parquet. */
  val orcRoundtrip: QueryDef = QueryDef(
    "src_orc_roundtrip",
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS VARCHAR) AS total_price,
      |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  ) { (spark, dir) =>
    val path = stagePath(spark, dir, "orc")
    Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        $"l_extendedprice".cast("decimal(15,2)").as("l_extendedprice"),
        round($"l_quantity").cast("long").as("l_quantity"))
      .write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    require(back.schema("l_extendedprice").dataType ==
      DecimalType(15, 2), "ORC lane lost the decimal logical type")
    back.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_extendedprice").cast("string").as("total_price"),
        sum($"l_quantity").as("total_qty"))
      .orderBy($"l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(jsonlRoundtrip, csvRoundtrip, orcRoundtrip)
}
