package graft

/** Analysis-only registry sweep (round-9 verdict item 4): builds every
  * registered query against the given testdata dir and forces Catalyst
  * ANALYSIS (`queryExecution.analyzed`) without executing anything — a
  * seconds-long gate that catches schema/type drift in the testdata (the
  * round-9 TIMESTAMP_NTZ break reddened 15 queries that only crashed when
  * the driver ran them) at commit time instead of at verify time.
  *
  * Usage: `sbt "runMain graft.Analyze [sfDir]"` (default sf0.001).
  * Exit 0 = every query analyzes; exit 1 = failures, each printed.
  */
object Analyze {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local()
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          println(s"[analyze] FAIL $name: ${e.toString.linesIterator.next()}")
          Some(name)
        } finally Caches.release()
    }
    println(s"[analyze] ${SparkEntry.queries.size - failures.size}/" +
      s"${SparkEntry.queries.size} queries analyze cleanly against $sfDir")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
