package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class ClassifierOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("calibration: buckets partition the corpus, gap replays the bin arithmetic") {
    val rows = ClassifierOps.clfCalibration.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to 10L),
      "rank-decile binning always resolves all ten bins")
    // bucket rows partition the scored corpus exactly, in near-equal bins
    val nDocs = graft.io.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs, "every document lands in one bucket")
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1,
      "ntile bins differ by at most one row")
    for ((b, n, pos, rate, mean, gap) <- rows) {
      assert(pos >= 0 && pos <= n, s"bucket $b: positives within the bin")
      assert(rate == pos * 1000000L / n, s"bucket $b: rate is exact ppm")
      assert(gap == math.abs(mean - rate), s"bucket $b: gap = |mean - rate|")
    }
    // rank binning ⇒ per-bin mean scores are non-decreasing
    assert(rows.map(_._5).sliding(2).forall(s => s.head <= s.last),
      "mean score must be monotone across rank deciles")
    val rerun = ClassifierOps.clfCalibration.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(rerun.toSeq == rows.map(t => (t._1, t._2, t._6)).toSeq,
      "training + binning is deterministic")
  }
}
