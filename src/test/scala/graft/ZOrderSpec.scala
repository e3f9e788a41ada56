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
}
