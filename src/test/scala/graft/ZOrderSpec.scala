package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.ZOrder
import graft.ops._

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Straight-line Scala interleave — the spec for mortonKey. */
  private def ref(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits)
      z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    z
  }

  test("mortonKey matches the reference interleave over a value grid") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val grid = for (x <- 0L to 40L; y <- 0L to 40L) yield (x, y)
    val rows = grid.toDF("x", "y")
      .select($"x", $"y", ZOrder.mortonKey($"x", $"y", 10).as("z"))
      .collect()
    rows.foreach(r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 10)))
  }

  /** The property the layout exists for: per-file min/max footprints.
    * A linear layout sorted on user_id spans the full doy domain in every
    * file, so a doy-only box overlaps ALL files; the z-ordered layout
    * clusters both dimensions, so the same box overlaps only a fraction —
    * which is precisely what parquet min/max stats can then skip. */
  test("a doy-range query-box overlaps every linear file but few z-ordered files") {
    val events = graft.io.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        dayofyear($"ts").cast("long").as("doy"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val linDir = s"$base/linear"
    val zDir = s"$base/zorder"
    val files = 16

    // linear: range-partitioned + sorted on user_id only
    events.repartitionByRange(files, $"user_id")
      .sortWithinPartitions($"user_id")
      .write.mode("overwrite").parquet(linDir)
    ZOrder.writeZOrdered(events, zDir, $"user_id", $"doy", bits = 10,
      files = files)

    def footprints(dir: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .toSeq
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min($"doy"), max($"doy")).head()
          (r.getLong(0), r.getLong(1))
        }

    val (lo, hi) = (10L, 13L) // a ~4-day query box on the SECOND dimension
    def touched(fp: Seq[(Long, Long)]): Int =
      fp.count { case (mn, mx) => mn <= hi && mx >= lo }

    // repartitionByRange may materialize fewer files when the key has few
    // distinct values (15 user_ids here) — compare against actual counts
    val lin = footprints(linDir)
    val zo = footprints(zDir)
    assert(lin.size >= files / 2 && zo.size >= files / 2)
    assert(touched(lin) == lin.size,
      s"linear layout should span doy everywhere, touched ${touched(lin)}")
    assert(touched(zo) <= zo.size / 2,
      s"z-order should cluster doy, touched ${touched(zo)} of ${zo.size}")
    assert(touched(zo) < touched(lin))
  }

  /** zorderPrune's 2x2 readout on a planted uniform grid: time order must
    * prune NOTHING for a user-only band (every file spans all users),
    * z-order must prune most files for BOTH single-dimension bands, and
    * the matched row counts are layout-invariant. */
  test("a4_zorder_prune: planted grid prunes both dimensions only under the curve") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // 128 users x 30 days (Jan 2024), one event per cell; within each day
    // the minute scrambles the user order (37 is coprime to 60) so the
    // time layout genuinely interleaves users — a fixture whose event_id
    // or intra-day time correlated with user would hand the linear layout
    // accidental user clustering
    val rows = for (u <- 0L until 128L; d <- 1L to 30L)
      yield (u * 100 + d, u, f"2024-01-$d%02d 12:${(u * 37 + d) % 60}%02d:${(u * 53) % 60}%02d")
    val ev = rows.toDF("event_id", "user_id", "s")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"))
    val out = TimeSeriesOps.zorderPruneOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.size == 4)
    val total = 128L * 30L
    val (_, tuPruned, tuScanned, tuMatched) = out(("time", "user_40_49"))
    val (_, zuPruned, zuScanned, zuMatched) = out(("zorder", "user_40_49"))
    val (_, tdPruned, _, tdMatched) = out(("time", "day_10_12"))
    val (_, zdPruned, _, zdMatched) = out(("zorder", "day_10_12"))
    // layout-invariant ground truth
    assert(tuMatched == 10L * 30L && zuMatched == tuMatched)
    assert(tdMatched == 128L * 3L && zdMatched == tdMatched)
    // time order: user band prunes nothing (each file spans all users)
    assert(tuPruned == 0L && tuScanned == total)
    // time order prunes the day band (its leading dimension)
    assert(tdPruned > 32L)
    // the curve prunes BOTH bands and scans less than time order on user
    assert(zuPruned > 32L && zdPruned > 16L)
    assert(zuScanned < tuScanned / 2)
  }
}
