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

  // ----- Method-1 vs Method-2 NULL-semantics divergence, on the reference's
  // exact inline fixture (ipynb cell 5: 9 listens, 4 with NULL listen_time).
  // The Assignment 1 docx records: Method 1 → two recommendations for Minnie
  // (user 2: Evermore=1, Yesterday=6); Method 2 → ZERO rows, because every
  // timestamped listen falls on a different day once the NULLs are dropped.

  private def fixtureListens = {
    import java.sql.Date
    val rows = Seq[(Long, Long, String)](
      (1L, 1L, "2024-08-30"), (1L, 2L, null), (1L, 6L, "2024-08-29"),
      (2L, 2L, null), (2L, 7L, "2024-08-28"), (2L, 8L, "2024-08-27"),
      (3L, 1L, null), (3L, 2L, "2024-08-26"), (3L, 6L, null))
    import org.apache.spark.sql.functions.{col, to_date}
    import spark.implicits.{newLongEncoder, newProductEncoder, newStringEncoder, localSeqToDatasetHolder}
    rows.toDF("user_id", "song_id", "day_str")
      .select(col("user_id"), col("song_id"),
        to_date(col("day_str")).as("listen_day"))
  }

  test("Method-1 recommender finds Minnie's two recommendations on the reference fixture") {
    val recs = MusicOps.recommendM1(fixtureListens)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recs == Set((2L, 1L), (2L, 6L)),
      s"expected Minnie→{Evermore, Yesterday}, got $recs")
  }

  test("Method-2 recommender returns zero rows on the same fixture (NULL listen times discarded)") {
    assert(MusicOps.recommendM2(fixtureListens).count() == 0)
  }

  test("Method-1 and Method-2 diverge on the testdata-derived nulled listens") {
    val m1 = MusicOps.recommendMethod1.run(spark, sf).count()
    val m2 = MusicOps.recommendMethod2.run(spark, sf).count()
    assert(m1 > 0)
    assert(m1 != m2, "the planted NULL listen days must change the result")
  }
}
