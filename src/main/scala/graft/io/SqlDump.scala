package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SQL-dump ingest (`AmazonRedshift.java:298-446` / `RedshiftDataManager
  * .java:281-418`): the reference reads `INSERT INTO t VALUES (...);`
  * statement dumps and rewrites them into large multi-row INSERTs for
  * throughput. Under Spark the equivalent capability is parsing the dump
  * straight into a DataFrame (after which `df.write` subsumes all the batch
  * size heuristics — the vectorized parquet writer IS the bulk path).
  *
  * Distributed design: statements are record-split on `;` by the text
  * reader itself (`lineSep`), so a multi-gigabyte dump parallelizes by
  * input split like any text scan; per-statement parsing is then pure
  * column expressions — table name via regex, the VALUES tuple via
  * `from_csv` with single-quote strings, against a caller-provided schema.
  */
object SqlDump {

  /** Parse every `INSERT INTO <table> VALUES (...)` in the dump targeting
    * `table`, returning typed rows. Statements for other tables and
    * non-INSERT statements are filtered out, mirroring the reference's
    * skip-and-log behavior. */
  def inserts(spark: SparkSession, path: String, table: String,
      schema: StructType): DataFrame = {
    val csvSchema = schema.fields
      .map(f => s"${f.name} ${f.dataType.simpleString}").mkString(", ")
    spark.read.option("lineSep", ";").text(path)
      // trim() strips spaces only — records carry the newline that followed
      // the previous ';', so strip ALL leading/trailing whitespace
      .select(regexp_replace(col("value"), "^\\s+|\\s+$", "").as("stmt"))
      .filter(upper(col("stmt")).startsWith("INSERT") &&
        upper(col("stmt")).rlike(s"INSERT\\s+INTO\\s+${table.toUpperCase}\\s"))
      // the tuple between the outermost parens after VALUES
      .select(regexp_extract(col("stmt"),
        "(?is)VALUES\\s*\\((.*)\\)\\s*$", 1).as("tuple"))
      .filter(col("tuple") =!= "")
      .select(from_csv(col("tuple"), schema,
        Map("quote" -> "'", "escape" -> "'", // SQL '' quote-escape
          "ignoreLeadingWhiteSpace" -> "true")).as("r"))
      .select(schema.fieldNames.toSeq.map(n => col(s"r.$n").as(n)): _*)
  }
}
