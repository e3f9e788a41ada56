package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.HilbertCurve

class HilbertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("hilbertKey is a bijective unit-step walk over the full order-4 grid") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val n = 16 // 2^4
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val cells = HilbertCurve.withHilbertKey(grid, col("x"), col("y"), 4, "d")
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    // bijection onto 0 .. n²−1
    assert(cells.map(_._1).toSeq == (0L until (n * n).toLong).toSeq,
      "keys must be a permutation of the full range")
    // the Hilbert hallmark z-order lacks: every curve step is a UNIT grid
    // step, which is why equal-count files get compact bounding boxes
    cells.sliding(2).foreach {
      case Array((_, x1, y1), (d2, x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"non-unit step into d=$d2: ($x1,$y1) -> ($x2,$y2)")
      case _ =>
    }
  }

  test("native hilbertkey expression equals the per-bit projection fold") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // full 64x64 grid at 6 bits, plus out-of-range coords that must mask
    val n = 64
    val grid = ((for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)) ++ Seq((64L, 1L), (200L, 300L)))
      .toDF("x", "y")
    val native = HilbertCurve.withHilbertKey(grid, col("x"), col("y"), 6, "d")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fold = HilbertCurve.withHilbertKeyFold(grid, col("x"), col("y"), 6, "d")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(native == fold, "native expression must replay the fold exactly")
    // and it resolves from SQL text (the extension registration)
    val viaSql = spark.sql("SELECT hilbertkey(3L, 5L, 6)").collect().head.getLong(0)
    assert(viaSql == fold((3L, 5L)))
  }

  test("hilbert prune readout is internally consistent and layout-invariant") {
    // sf0.01: the 40-49 user band is empty at sf0.001 (only ~15 users)
    val rows = ops.TimeSeriesOps.hilbertPrune.run(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 6, "3 layouts x 2 predicates")
    assert(rows.forall(_._3 == 64L), "64 files per layout")
    // matched rows are a property of the DATA, not the layout
    rows.groupBy(_._2).foreach { case (pred, g) =>
      assert(g.map(_._6).distinct.length == 1,
        s"$pred matched-count must be layout-invariant") }
    // a pruned file can never hide a matching row
    rows.foreach { case (layout, pred, _, _, scanned, matched) =>
      assert(scanned >= matched, s"$layout/$pred scans fewer rows than match") }
    // curve layouts must beat time order on the non-leading dimension:
    // every time-ordered file spans the whole user domain
    val scanned = rows.map(r => (r._1, r._2) -> r._5).toMap
    assert(scanned(("hilbert", "user_40_49")) < scanned(("time", "user_40_49")))
    assert(scanned(("zorder", "user_40_49")) < scanned(("time", "user_40_49")))
  }
}
