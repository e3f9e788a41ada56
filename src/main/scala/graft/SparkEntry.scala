package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a named
  * `(SparkSession, sfDir) => DataFrame` plus, when ANSI-SQL-expressible, a
  * DuckDB oracle over the same parquet tables. Column names and row order are
  * aligned on both sides (unique-key ORDER BY everywhere; floating aggregates
  * rounded identically so accumulation order can't flip the hash compare).
  */
object SparkEntry {

  /** All registered operator definitions, grouped by reference assignment /
    * extension family. */
  def defs: Seq[QueryDef] =
    TpchOps.all ++ MusicOps.all ++ BigQueryOps.all ++ NestedOps.all ++
      LlmTextOps.all ++ EmbeddingOps.all ++ KvOps.all ++ TimeSeriesOps.all ++
      SqlOps.all ++ graft.streaming.StreamingOps.all ++ MultimodalOps.all ++
      RefDataOps.all ++ SkewOps.all ++ TypedOps.all ++ SketchOps.all ++
      AsofOps.all ++ RangeJoinOps.all ++ OlapOps.all ++ SamplingOps.all ++
      WindowOps.all ++ PackingOps.all ++ RankingOps.all ++ StatsOps.all ++
      GraphOps.all ++ FormatOps.all ++ DqOps.all ++ PerplexityOps.all ++
      CompositionOps.all ++ ClassifierOps.all ++ CurationOps.all ++
      SelectionOps.all ++ SeqOps.all ++ GeoOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchOps.redshiftQ1.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. A duplicate
    * name would silently shadow the earlier query in this Map (later key
    * wins) and shrink the registry by one — fail loudly instead. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val dupes = defs.groupBy(_.name).filter(_._2.sizeIs > 1).keys
    require(dupes.isEmpty,
      s"duplicate registered query names: ${dupes.mkString(", ")}")
    defs.map(d => d.name -> d.run).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
