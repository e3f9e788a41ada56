package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: one JSON line with per-query + total wall seconds.
  *
  * Fidelity notes (round-1 verdict findings):
  *  - each query is executed once as WARM-UP before the timed run, so JIT /
  *    codegen compilation noise doesn't dominate the first query measured;
  *  - the timed action is a `noop`-format write, which executes the COMPLETE
  *    physical plan — including final sorts and computed projections that a
  *    bare `.count()` lets Catalyst eliminate (`EliminateSorts`, pruning);
  *  - the core count is recorded in the output so rounds on different
  *    machines aren't silently compared.
  */
object Bench {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val cores = spark.sparkContext.defaultParallelism
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        force(fn(spark, sfDir)) // warm-up: JIT + codegen + file-footer caches
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => name -> -1.0 }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cores":$cores}""")
    spark.stop()
  }
}
