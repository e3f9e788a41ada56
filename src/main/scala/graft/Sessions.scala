package graft

import org.apache.spark.sql.SparkSession

/** Session factory shared by Verify / Bench / tests so every entry point runs
  * with the same semantics-relevant configs:
  *
  *  - UTC session timezone (oracle parity with DuckDB);
  *  - `nanosAsLong` so the events table's TIMESTAMP(NANOS) parquet column is
  *    readable (normalized back to TimestampType in [[graft.io.Tables.events]]);
  *  - AQE on (runtime shuffle coalescing + skew-join splitting — the configs
  *    that matter at cluster scale, harmless at sf0.1);
  *  - shuffle partitions sized to the local core count, not the 200 default
  *    (on a real cluster this would be executors × cores, or left to AQE).
  */
object Sessions {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.install)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
