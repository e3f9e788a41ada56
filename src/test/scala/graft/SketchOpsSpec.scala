package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class SketchOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("HLL distinct counts are within 5% of exact per group") {
    val approx = SketchOps.approxDistinct.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = io.Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx $a vs exact $n")
    }
  }

  test("approximate percentiles bracket the exact quantiles") {
    val rows = SketchOps.approxPercentiles.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p95) = (r.getDouble(1), r.getDouble(2))
      assert(p50 < p95)
      val vals = io.Tables.events(spark, sf)
        .filter($"event_type" === r.getString(0))
        .select($"value").collect().map(_.getDouble(0)).sorted
      val exact50 = vals((vals.length * 0.5).toInt)
      assert(math.abs(p50 - exact50) < math.max(1.0, exact50 * 0.05))
    }
  }

  test("register-exact HLL union tracks exact counts and the DataSketches estimate") {
    val rows = SketchOps.hllUnion.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val exactAll = io.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(rows("ALL")._2 == exactAll, "instrumented exact union count")
    // m=64 raw HLL: rsd ~ 1.04/8 = 13%; allow 3 sigma per row
    rows.foreach { case (t, (estMilli, exact)) =>
      val est = estMilli / 1000.0
      assert(math.abs(est - exact) <= 0.4 * exact,
        s"$t union-lane estimate $est too far from exact $exact")
    }
    // TRUE invariant of register-max union: every union register dominates
    // the corresponding register of each part, and the harmonic-mean
    // estimator is monotone in the registers, so est(ALL) >= est(part) for
    // every part. (est(ALL) <= sum of part estimates is NOT an invariant —
    // complementary per-type register patterns can push the union estimate
    // past the sum — so asserting it could fail spuriously on a testdata
    // regeneration; round-13 ADVICE.)
    val partsMax = (rows - "ALL").values.map(_._1).max
    assert(rows("ALL")._1 >= partsMax,
      s"union estimate ${rows("ALL")._1} below a part estimate $partsMax")
    // and the register-exact estimates agree with the opaque DataSketches
    // union (lgK=14, rsd ~0.8%) within the COMBINED error — dominated by
    // our m=64 sketch's 13% rsd; 3 sigma again
    val ds = SketchOps.hllUnionDatasketches(
      io.Tables.events(spark, sf).select($"event_type", $"user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ds.keySet == rows.keySet)
    ds.foreach { case (t, dsEst) =>
      val ours = rows(t)._1 / 1000.0
      assert(math.abs(ours - dsEst) <= 0.4 * math.max(dsEst, 1L),
        s"$t: register estimate $ours vs DataSketches $dsEst")
    }
  }

  test("count-min estimates never undercount and bound the overcount") {
    import org.apache.spark.sql.functions._
    // full-vocabulary estimates (not just the registered top-20): CMS can
    // only overcount, and with 31 tokens in 4x1024 counters collisions are
    // rare — the total overcount across the vocabulary stays tiny relative
    // to the stream.
    val docs = io.Tables.documents(spark, sf)
    val toks = docs.select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
    val cells = toks
      .select($"w", $"cnt", explode(array((0 to 3).map(lit(_)): _*)).as("i"))
      .withColumn("j", call_function("md5hash60",
        concat($"i".cast("string"), lit(":"), $"w")) % 1024)
    val sketch = cells.groupBy($"i", $"j").agg(sum($"cnt").as("bucket"))
    val est = cells.join(sketch, Seq("i", "j"))
      .groupBy($"w").agg(min($"cnt").as("cnt"), min($"bucket").as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    est.foreach { case (w, cnt, e) =>
      assert(e >= cnt, s"CMS undercounted $w: $e < $cnt")
    }
    val stream = est.map(_._2).sum
    val overcount = est.map(t => t._3 - t._2).sum
    assert(overcount <= stream / 100,
      s"overcount $overcount too large for stream $stream")
  }

  test("declarative HLL registers replay exactly; estimate tracks exact counts") {
    // replay the register build in plain JVM code with the same md5 hash
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val pairs = graft.io.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = pairs.groupBy(_._1).map { case (t, rs) =>
      val regs = Array.fill(64)(0L)
      rs.foreach { case (_, u) =>
        val h = h60(u.toString)
        val j = (h % 64).toInt
        val w = h / 64
        val rho = 1L + (0 to 53).count(k => w < (1L << k))
        if (rho > regs(j)) regs(j) = rho
      }
      // 2^55 scaling: every register value m in 0..55 contributes the
      // exact integer 2^(55-m) — including m = 55 (the all-zero-suffix
      // case), whose term the old 2^54 table truncated to 0
      val sumT = regs.map(m => 1L << (55 - m)).sum
      t -> (sumT, regs.count(_ == 0).toLong, rs.map(_._2).distinct.size.toLong)
    }
    val rows = SketchOps.hllRegisters.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == expected.keys.toSeq.sorted)
    for ((t, sumT, nZero, estMilli, exact) <- rows) {
      val (eSum, eZero, eExact) = expected(t)
      assert(sumT == eSum, s"$t register denominator must replay exactly")
      assert(nZero == eZero, s"$t zero-register count")
      assert(exact == eExact, s"$t exact distinct")
      // m=64 raw HLL: rsd ~ 1.04/8 = 13%; allow 3 sigma
      val est = estMilli / 1000.0
      assert(math.abs(est - exact) <= 0.4 * exact,
        s"$t estimate $est too far from exact $exact")
    }
  }

  test("KMV intersect: estimate brackets the exact Jaccard, sketch rows bounded") {
    val rows = SketchOps.kmvIntersect.run(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    // 5 event types -> 10 canonically-oriented pairs
    assert(rows.length == 10, s"expected 10 type pairs, got ${rows.length}")
    assert(rows.forall { case ((a, b), _) => a < b }, "canonical orientation")
    for (((a, b), (common, nU, est, exact)) <- rows) {
      assert(nU >= 1 && nU <= 64, s"($a,$b): union sample size bounded by k")
      assert(common >= 0 && common <= nU, s"($a,$b): common within the sample")
      assert(est == common * 1000000L / nU, s"($a,$b): estimate arithmetic")
      // k=64 KMV: rsd ~ 1/sqrt(64) = 12.5% of the UNION; Jaccard here is
      // large (same user population drives every type), so 3.5 sigma in
      // absolute ppm of the union is a safe determinism-preserving bracket
      assert(math.abs(est - exact) <= 440000L,
        s"($a,$b): estimate $est vs exact $exact beyond 3.5 sigma")
    }
    val rerun = SketchOps.kmvIntersect.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4)))
    assert(rerun.toSeq == rows.map { case ((a, _), (c, _, e, _)) => (a, c, e) }.toSeq,
      "sketch is a deterministic integer object")
  }
}
