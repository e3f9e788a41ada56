package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cooccur edges: support threshold, canonical orientation, set semantics") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // orders 1,2 share {10,20}; order 3 adds (10,30) once (below support);
    // order 4 repeats part 10 twice (set semantics: no self-pair, one count)
    val li = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L), (4L, 10L), (4L, 10L), (4L, 20L),
    ).toDF("l_orderkey", "l_partkey")
    val e = GraphOps.cooccurEdges(li).collect()
    assert(e.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 20L, 3L)))
  }

  test("triangles: enumerated once in a<b<c orientation") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // parts 1,2,3 pairwise co-occur in >=2 orders => one triangle; part 4
    // reaches support 2 with part 1 but co-occurs with part 2 only once,
    // so (1,2,4) must NOT close
    def basket(o: Long, ps: Long*) = ps.map((o, _))
    val li = (basket(1, 1, 2, 3) ++ basket(2, 1, 2, 3) ++
      basket(3, 1, 4) ++ basket(4, 1, 2, 4))
      .toDF("l_orderkey", "l_partkey")
    val e = GraphOps.cooccurEdges(li).select("p1", "p2")
    val tri = e.as("e1")
      .join(e.as("e2"), org.apache.spark.sql.functions.col("e1.p2") ===
        org.apache.spark.sql.functions.col("e2.p1"))
      .join(e.as("e3"),
        org.apache.spark.sql.functions.col("e3.p1") === org.apache.spark.sql.functions.col("e1.p1") &&
          org.apache.spark.sql.functions.col("e3.p2") === org.apache.spark.sql.functions.col("e2.p2"))
      .select(org.apache.spark.sql.functions.col("e1.p1"),
        org.apache.spark.sql.functions.col("e1.p2"),
        org.apache.spark.sql.functions.col("e2.p2"))
      .collect()
    assert(tri.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 3L)))
  }

  test("degree distribution sums nodes and counts both endpoints") {
    val e = GraphOps.cooccurEdges(io.Tables.lineitem(spark, sf))
    val nEdges = e.count()
    val dist = GraphOps.degreeDist.run(spark, sf).collect()
    // sum(degree * n_nodes) = 2 * |E| (handshake lemma)
    assert(dist.map(r => r.getLong(0) * r.getLong(1)).sum == 2 * nEdges)
  }

  test("pattern match: tie-broken ordering and no-error constraint") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import org.apache.spark.sql.functions._
    // user 1: v..c..p clean -> match; user 2: error between c and p -> no
    // match; user 3: same-microsecond tie ordered by event_id (view before
    // click at t=5) -> still matches
    val rows = Seq(
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "purchase"),
      (4L, 2L, 10L, "view"), (5L, 2L, 20L, "click"), (6L, 2L, 25L, "error"),
      (7L, 2L, 30L, "purchase"),
      (9L, 3L, 5L, "view"), (10L, 3L, 5L, "click"), (11L, 3L, 6L, "purchase"),
    ).toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros($"us"))
    val out = rows
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        substring($"event_type", 1, 1).as("c"))
      .groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"tus", $"event_id", $"c"))).as("evs"))
      .select($"user_id",
        array_join(transform($"evs", e => e.getField("c")), "").as("seq"))
      .select($"user_id", $"seq",
        when($"seq".rlike("v[^e]*c[^e]*p"), 1L).otherwise(0L).as("matched"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("vcp", 1L))
    assert(out(2L) == ("vcep", 0L))
    assert(out(3L) == ("vcp", 1L), "same-µs tie must order by event_id")
  }
}
