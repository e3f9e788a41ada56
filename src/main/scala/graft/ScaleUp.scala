package graft

import org.apache.spark.sql.functions._

/** Dev/bench utility: scale a testdata directory N× by unioning key-shifted
  * copies of each table — `ScaleUp <inDir> <outDir> <factor>`.
  *
  * Purpose: the driver generates sf0.001/0.01/0.1 only; the verdict's scale
  * rehearsal wants one Bench run at ~sf1 to surface superlinear operators
  * the graded scale hides. Every copy shifts all PRIMARY and FOREIGN key
  * columns by the same offset, so join fan-outs stay exactly those of the
  * source data between copies while point-filter predicates (key = 42,
  * orderkey <= 100) keep matching only copy 0 — the selectivity profile a
  * real scale-up has. Fixed dimension tables (region, nation) keep their
  * one copy, like TPC-H itself. Text/embedding payloads duplicate as-is:
  * that turns each document into an exact-duplicate clique across copies,
  * which is a realistic (and deliberately adversarial) corpus shape for
  * the dedup/near-dup family. The offset is divisible by 120 so the
  * key-modulus fixtures baked into queries (doc_id % {2,3,4,5,8},
  * o_orderkey % 5) hold identically in every copy. */
object ScaleUp {
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq(),
    "nation" -> Seq(),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id", "user_id"),
  )
  private val Offset = 12000000L

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    val spark = Sessions.local()
    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$inDir/$t.parquet")
      val copies = if (keys.isEmpty) 1 else factor
      val scaled = (0 until copies).map { k =>
        keys.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(k * Offset)))
      }.reduce(_ union _)
      scaled.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scaleup] $t: ${copies}x")
    }
    spark.stop()
  }
}
