package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class MusicBigQueryOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("a1_union_distinct deduplicates names present in both branches") {
    val df = MusicOps.unionDistinct.run(spark, sf)
    val names = df.collect().map(_.getString(0))
    assert(names.distinct.length == names.length, "UNION must be distinct")
  }

  test("a1_recommend never recommends a part the customer already bought") {
    import org.apache.spark.sql.functions._
    val recs = MusicOps.recommend.run(spark, sf)
    val o = io.Tables.orders(spark, sf)
    val l = io.Tables.lineitem(spark, sf)
    val owned = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(o("o_custkey"), l("l_partkey").as("rec_part")).distinct()
    val overlap = recs.join(owned, Seq("o_custkey", "rec_part"), "left_semi").count()
    assert(overlap == 0, s"$overlap recommendations were already owned")
  }

  test("a1_cooccur_pairs is symmetric (pair (a,b) implies (b,a))") {
    val pairs = MusicOps.cooccurPairs.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => pairs.contains((b, a)) })
  }

  test("a1_idgen ids are dense and start above current max order key") {
    val rows = MusicOps.idGen.run(spark, sf).collect()
    val maxKey = io.Tables.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.max("o_orderkey")).head.getLong(0)
    val ids = rows.map(_.getLong(0))
    assert(ids.head == maxKey + 1)
    assert(ids.toSeq == (maxKey + 1 to maxKey + rows.length).toSeq)
  }

  test("a2_rank_top_per_group keeps exactly the max acctbal rows per nation") {
    import org.apache.spark.sql.functions._
    val got = BigQueryOps.rankTopPerGroup.run(spark, sf)
    val c = io.Tables.customer(spark, sf)
    val n = io.Tables.nation(spark, sf)
    val maxes = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name").agg(max($"c_acctbal").as("c_acctbal"))
    val bad = got.join(maxes, Seq("n_name", "c_acctbal"), "left_anti").count()
    assert(bad == 0)
  }

  test("a2_pairs_least_greatest emits each unordered pair once, sorted") {
    val rows = BigQueryOps.pairsLeastGreatest.run(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getString(1) <= r.getString(2), s"name_a > name_b in $r")
    }
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getString(2))).distinct.length == rows.length)
  }
}
