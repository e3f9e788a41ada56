package graft

/** Dev scratch main — not part of the library surface.
  *
  * Default mode: time each registry query named in `PROBE_QS` (comma list)
  * against `PROBE_DIR`, after one warm-up query to absorb JIT/codegen.
  * `PROBE_MODE=spine` instead runs the round-14 date-spine recursion
  * microbenchmark (kept opt-in — round-14 ADVICE: replacing the generic
  * prober silently broke PROBE_QS invocations).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    if (sys.env.get("PROBE_MODE").contains("spine")) spine(spark, dir)
    else if (sys.env.get("PROBE_MODE").contains("hits")) hitsAb(spark, dir)
    else if (sys.env.get("PROBE_MODE").contains("geocluster")) geoCl(spark, dir)
    else if (sys.env.get("PROBE_MODE").contains("plans")) {
      // dump explain("formatted") for each named registry query — the
      // round-17 plans/r17/<q>_{before,after}.txt evidence files
      val outDir = sys.env.getOrElse("PROBE_OUT", "/tmp/plans")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      val suffix = sys.env.getOrElse("PROBE_SUFFIX", "")
      for (q <- sys.env.getOrElse("PROBE_QS", "").split(",")
          .map(_.trim).filter(_.nonEmpty)) {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, q + suffix + ".txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        println(s"PROBE plan written: $q")
        Caches.release()
      }
    }
    else {
      graft.SparkEntry.queries("llm_exact_dedup")(spark, dir).count()
      Caches.release()
      for (q <- sys.env.getOrElse("PROBE_QS", "a1_recommend_m2").split(",")) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        println(f"PROBE $q rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
        Caches.release()
      }
    }
    spark.stop()
  }

  /** The recursion-state-bound A/B from round 14: the original spine
    * recursion re-aggregates `orders` per step; the shipped form carries
    * the bound in the recursion state. */
  /** Cost split for geo_cluster: pair mining vs star-contraction loop. */
  private def geoCl(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for (run <- 1 to 2) {
      var t = System.nanoTime()
      def tick(label: String): Unit = {
        val now = System.nanoTime()
        println(f"PROBE   $label ${(now - t) / 1e9}%.2f s")
        t = now
      }
      val pts = Caches.persist(graft.ops.GeoOps.points(spark, dir))
      pts.count(); tick("points")
      val pairs = Caches.localCheckpoint(
        graft.ops.GeoOps.pairsOf(pts)
          .select($"k1".as("doc_a"), $"k2".as("doc_b")))
      println(s"PROBE   npairs=${pairs.count()}"); tick("pairs")
      val cl = graft.ops.LlmTextOps.clusterLsOf(
        pairs, pts.select($"id".as("doc_id")))
      tick("clusterLsOf construct (loop runs eagerly)")
      val n = cl.count(); tick(s"label readout rows=$n")
      Caches.release()
    }
  }

  /** Fixed-vs-marginal cost split for the iterative HITS lane: time the
    * fixed point at 1/2/4/8 rounds on the same checkpointed edge frame —
    * the slope is the true per-round cost, the intercept is setup
    * (edge repartition+persist, node derivation). */
  private def hitsAb(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edgesCp = Caches.localCheckpoint(
      graft.ops.GraphOps.cooccurEdges(
        graft.io.Tables.lineitem(spark, dir)))
    println(s"PROBE edges=${edgesCp.count()}")
    def tick(label: String, t0: Long): Long = {
      val t = System.nanoTime()
      println(f"PROBE   $label ${(t - t0) / 1e9}%.2f s")
      t
    }
    for (run <- 1 to 2) {
      val edges = edgesCp.select($"p1".as("src"), $"p2".as("dst"))
      var t = System.nanoTime()
      val eSrc = Caches.persist(
        edges.select($"src", $"dst").repartition($"src"))
      eSrc.count()
      t = tick("eSrc", t)
      val eDst = Caches.persist(
        edges.select($"src", $"dst").repartition($"dst"))
      eDst.count()
      t = tick("eDst", t)
      val nodes = Caches.persist(
        eSrc.select($"src".as("id")).union(eSrc.select($"dst".as("id"))).distinct())
      nodes.count()
      t = tick("nodes", t)
      val nn = nodes.agg(count(lit(1)).as("nn"))
      var hub = nodes.select($"id", lit(1.0).as("h"))
      var auth: org.apache.spark.sql.DataFrame = null
      for (i <- 1 to 8) {
        val aq = eSrc.join(hub.select($"id".as("src"), $"h"), "src")
          .select($"dst".as("id"), round($"h" * 1e9).cast("long").as("cq"))
          .groupBy($"id").agg(sum($"cq").as("q"))
        val at = aq.agg(sum($"q").as("t"))
        auth = Caches.localCheckpoint(
          nodes.join(aq, Seq("id"), "left")
            .crossJoin(broadcast(at)).crossJoin(broadcast(nn))
            .select($"id",
              (coalesce($"q", lit(0L)).cast("double") * $"nn" / $"t").as("a")))
        t = tick(s"round$i auth", t)
        val hq = eDst.join(auth.select($"id".as("dst"), $"a"), "dst")
          .select($"src".as("id"), round($"a" * 1e9).cast("long").as("cq"))
          .groupBy($"id").agg(sum($"cq").as("q"))
        val ht = hq.agg(sum($"q").as("t"))
        hub = Caches.localCheckpoint(
          nodes.join(hq, Seq("id"), "left")
            .crossJoin(broadcast(ht)).crossJoin(broadcast(nn))
            .select($"id",
              (coalesce($"q", lit(0L)).cast("double") * $"nn" / $"t").as("h")))
        t = tick(s"round$i hub", t)
      }
      val n = hub.join(auth, "id").count()
      t = tick(s"final join rows=$n", t)
    }
    // variant B: one checkpoint per ROUND (hub only; auth lazy within),
    // and the two scalar factors (t, nn) fused into ONE broadcast frame
    for (run <- 1 to 2) {
      val edges = edgesCp.select($"p1".as("src"), $"p2".as("dst"))
      var t = System.nanoTime()
      val eSrc = Caches.persist(
        edges.select($"src", $"dst").repartition($"src"))
      val eDst = Caches.persist(
        edges.select($"src", $"dst").repartition($"dst"))
      val nodes = Caches.persist(
        eSrc.select($"src".as("id")).union(eSrc.select($"dst".as("id"))).distinct())
      val nn = nodes.agg(count(lit(1)).as("nn"))
      var hub = nodes.select($"id", lit(1.0).as("h"))
      var auth: org.apache.spark.sql.DataFrame = null
      t = tick("B setup", t)
      for (i <- 1 to 8) {
        val aq = eSrc.join(hub.select($"id".as("src"), $"h"), "src")
          .select($"dst".as("id"), round($"h" * 1e9).cast("long").as("cq"))
          .groupBy($"id").agg(sum($"cq").as("q"))
        val at = aq.agg(sum($"q").as("t")).crossJoin(nn)
        auth =
          nodes.join(aq, Seq("id"), "left")
            .crossJoin(broadcast(at))
            .select($"id",
              (coalesce($"q", lit(0L)).cast("double") * $"nn" / $"t").as("a"))
        val hq = eDst.join(auth.select($"id".as("dst"), $"a"), "dst")
          .select($"src".as("id"), round($"a" * 1e9).cast("long").as("cq"))
          .groupBy($"id").agg(sum($"cq").as("q"))
        val ht = hq.agg(sum($"q").as("t")).crossJoin(nn)
        hub = Caches.localCheckpoint(
          nodes.join(hq, Seq("id"), "left")
            .crossJoin(broadcast(ht))
            .select($"id",
              (coalesce($"q", lit(0L)).cast("double") * $"nn" / $"t").as("h")))
        t = tick(s"B round$i", t)
      }
      val authCp = Caches.localCheckpoint(auth)
      val n = hub.join(authCp, "id").count()
      t = tick(s"B final join rows=$n", t)
    }
    // variant C: A's shape, but the q-frame is checkpointed per half-round
    // so the scalar total reads the materialized 6k rows instead of
    // re-running the edge join, and nn is a checkpointed leaf
    for (run <- 1 to 2) {
      val edges = edgesCp.select($"p1".as("src"), $"p2".as("dst"))
      var t = System.nanoTime()
      val eSrc = Caches.persist(
        edges.select($"src", $"dst").repartition($"src"))
      val eDst = Caches.persist(
        edges.select($"src", $"dst").repartition($"dst"))
      val nodes = Caches.persist(
        eSrc.select($"src".as("id")).union(eSrc.select($"dst".as("id"))).distinct())
      val nn = Caches.localCheckpoint(nodes.agg(count(lit(1)).as("nn")))
      var hub = nodes.select($"id", lit(1.0).as("h"))
      var auth: org.apache.spark.sql.DataFrame = null
      t = tick("C setup", t)
      def halfRound(e: org.apache.spark.sql.DataFrame, key: String,
          out: String, score: org.apache.spark.sql.DataFrame,
          scoreCol: String): org.apache.spark.sql.DataFrame = {
        val aq = Caches.localCheckpoint(
          e.join(score.select($"id".as(key), col(scoreCol)), key)
            .select(col(out).as("id"),
              round(col(scoreCol) * 1e9).cast("long").as("cq"))
            .groupBy($"id").agg(sum($"cq").as("q")))
        val at = aq.agg(sum($"q").as("t"))
        Caches.localCheckpoint(
          nodes.join(aq, Seq("id"), "left")
            .crossJoin(broadcast(at)).crossJoin(broadcast(nn))
            .select($"id",
              (coalesce($"q", lit(0L)).cast("double") * $"nn" / $"t")
                .as(scoreCol)))
      }
      for (i <- 1 to 8) {
        auth = halfRound(eSrc, "src", "dst", hub, "h")
          .withColumnRenamed("h", "a")
        hub = halfRound(eDst, "dst", "src", auth, "a")
          .withColumnRenamed("a", "h")
        t = tick(s"C round$i", t)
      }
      val n = hub.join(auth, "id").count()
      t = tick(s"C final join rows=$n", t)
    }
    // partition-count sensitivity: variant A with shuffle.partitions=8
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    for (run <- 1 to 2) {
      var t = System.nanoTime()
      val n = graft.ops.GraphOps.hitsOf(
        edgesCp.select($"p1".as("src"), $"p2".as("dst")), 8).count()
      t = tick(s"A@8parts rows=$n", t)
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
  }

  private def spine(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    graft.io.Tables.orders(spark, dir).createOrReplaceTempView("orders")
    def time(tag: String, sql: String): Unit = {
      val t0 = System.nanoTime()
      val n = spark.sql(sql).count()
      println(f"PROBE $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val orig =
      """WITH RECURSIVE spine(m) AS (
        |  SELECT to_date(date_trunc('MONTH', min(o_orderdate))) FROM orders
        |  UNION ALL
        |  SELECT add_months(m, 1) FROM spine
        |  WHERE m < (SELECT to_date(date_trunc('MONTH', max(o_orderdate))) FROM orders))
        |SELECT * FROM spine""".stripMargin
    val bounds =
      """WITH RECURSIVE b AS (
        |  SELECT to_date(date_trunc('MONTH', min(o_orderdate))) AS lo,
        |         to_date(date_trunc('MONTH', max(o_orderdate))) AS hi
        |  FROM orders),
        |spine(m, hi) AS (
        |  SELECT lo, hi FROM b
        |  UNION ALL
        |  SELECT add_months(m, 1), hi FROM spine WHERE m < hi)
        |SELECT m FROM spine""".stripMargin
    time("orig", orig)
    time("bounds", bounds)
    time("orig2", orig)
    time("bounds2", bounds)
  }
}
