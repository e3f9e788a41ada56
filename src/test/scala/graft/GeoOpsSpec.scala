package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class GeoOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("knn returns 10 ascending exact-integer distances") {
    val rows = GeoOps.knn.run(spark, sf).collect()
    assert(rows.length == 10)
    val d2 = rows.map(_.getLong(3))
    assert(d2.sorted.sameElements(d2), "distance-ascending")
    assert(rows.forall(r =>
      r.getLong(3) == r.getLong(1) * r.getLong(1) + r.getLong(2) * r.getLong(2)),
      "d2 is exactly lon² + lat²")
  }

  test("grid-bucketed pairs equal the naive quadratic radius join") {
    val pts = graft.io.Tables.customer(spark, sf)
      .select($"c_custkey".as("id"),
        (call_function("md5hash60",
          concat(lit("lon|"), $"c_custkey".cast("string"))) % 360000000L).as("ux"),
        (call_function("md5hash60",
          concat(lit("lat|"), $"c_custkey".cast("string"))) % 180000000L).as("uy"))
    val naive = pts.as("a").join(pts.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("k1"), col("b.id").as("k2"),
        ((col("a.ux") - col("b.ux")) * (col("a.ux") - col("b.ux"))
          + (col("a.uy") - col("b.uy")) * (col("a.uy") - col("b.uy"))).as("d2"))
      .filter($"d2" <= 2000000L * 2000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val grid = GeoOps.gridPairs.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(grid == naive, s"grid join must lose no pair: ${grid.size} vs ${naive.size}")
    assert(naive.nonEmpty, "fixture scale produces at least one pair")
  }

  test("spatial clusters are single-linkage components labeled by their minimum") {
    val labels = GeoOps.cluster.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = GeoOps.gridPairs.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every linked pair shares a label
    assert(pairs.forall { case (a, b) => labels(a) == labels(b) })
    // each label is the minimum member of its cluster
    val members = labels.groupBy(_._2).view.mapValues(_.keys.min)
    assert(members.forall { case (cid, minId) => cid == minId })
    // vertex set is complete: one label per customer
    val n = graft.io.Tables.customer(spark, sf).count()
    assert(labels.size == n)
  }

  test("Boruvka forest equals driver-side Kruskal under the same total order") {
    val got = GeoOps.msf.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same candidate edges the operator consumed, via the oracled pair op
    val edges = GeoOps.gridPairs.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (k1, k2, d2)
      .sortBy(e => (e._3, e._1, e._2)) // the (w, a, b) total order
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(v => v -> v): _*)
    def find(v: Long): Long = { // path-halving union-find
      var x = v
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    val want = edges.filter { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) false else { parent(ra) = rb; true }
    }.toSet
    assert(got.toSet == want, "unique MSF under lexicographic perturbation")
    val nComponents = nodes.map(find).distinct.length
    assert(got.length == nodes.length - nComponents, "|V| - |components| edges")
    // forest weight can never exceed the candidate set's: spot sanity
    assert(got.map(_._3).sum <= edges.map(_._3).sum)
  }

  test("tile heatmap: every zoom counts every point, children roll up to parents") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // four points in distinct quadrants plus one duplicate location
    val pts = Seq(
      (1L, 10000000L, 10000000L), (2L, 200000000L, 20000000L),
      (3L, 30000000L, 100000000L), (4L, 350000000L, 170000000L),
      (5L, 10000000L, 10000000L)).toDF("id", "ux", "uy")
    val rows = GeoOps.tileHeatmapOf(pts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byZoom = rows.groupBy(_._1)
    assert(byZoom.keySet == Set(2L, 4L, 6L))
    // completeness: each level accounts for all 5 points
    assert(byZoom.values.forall(_.map(_._3).sum == 5L))
    // drill-down identity: a zoom-6 tile's parent two levels up is
    // tile >> 4; rolled-up counts must equal the zoom-4 histogram (and
    // zoom-4 >> 4 the zoom-2 one)
    def rollup(z: Long) = byZoom(z).groupBy(t => t._2 >> 4)
      .map { case (p, ts) => p -> ts.map(_._3).sum }
    assert(rollup(6L) == byZoom(4L).map(t => t._2 -> t._3).toMap)
    assert(rollup(4L) == byZoom(2L).map(t => t._2 -> t._3).toMap)
    // co-located points share a tile at every zoom
    assert(byZoom(6L).exists(_._3 == 2L), "duplicate location counted together")
  }
}
