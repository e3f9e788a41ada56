package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class SkewTypedOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join equals the plain join on heavily skewed keys") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // one hot key (90% of probe rows) plus a long tail
    val probe = ((1 to 9000).map(i => (1L, i)) ++ (1 to 1000).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val build = (1L to 1001L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salted = SkewOps.saltedJoin(probe, build, "k", salts = 8, scatter = col("payload"))
    val plain = probe.join(build, "k")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("typed Aggregator partial-merges to the same answer as SQL") {
    val typed = TypedOps.typedAvg.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sql = io.Tables.customer(spark, sf)
      .groupBy($"c_mktsegment")
      .agg((round(sum($"c_acctbal"), 2) / count(lit(1))).as("avg_bal"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed == sql)
  }

  test("top-k aggregator: cap, tie order, and cross-partition merge") {
    val agg = new TypedOps.TopKOrders(3)
    val full = Seq((9.0, 5L), (9.0, 2L), (7.0, 1L)) // sorted, at cap
    // insert below the floor: dropped; above: pushes the floor out
    assert(agg.merge(TypedOps.TopKBuf(full), agg.reduce(agg.zero, (8L, 1.0))).items == full)
    assert(agg.merge(TypedOps.TopKBuf(full), agg.reduce(agg.zero, (8L, 8.0))).items ==
      Seq((9.0, 5L), (9.0, 2L), (8.0, 8L)))
    // equal score: lower id wins the tie
    assert(agg.reduce(TypedOps.TopKBuf(Seq((9.0, 5L))), (2L, 9.0)).items ==
      Seq((9.0, 2L), (9.0, 5L)))
    // merging two partial buffers = aggregating the union
    val left = Seq((5.0, 1L), (3.0, 2L))
    val right = Seq((4.0, 3L), (2.0, 4L))
    assert(agg.merge(TypedOps.TopKBuf(left), TypedOps.TopKBuf(right)).items ==
      Seq((5.0, 1L), (4.0, 3L), (3.0, 2L)))
  }

  test("bloom join: no false negatives, real pruning, counts reconcile") {
    val rows = SkewOps.bloomJoin.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (probe, pass, tru, fp) = (r.getAs[Long]("n_probe"),
        r.getAs[Long]("n_pass"), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_false_pos"))
      assert(tru <= pass, "a bloom filter must never drop a true member")
      assert(pass - tru == fp, "false positives = passed minus true")
      assert(pass <= probe)
      assert(pass * 2 < probe,
        s"filter must actually prune the probe side: $pass of $probe")
    }
  }

  test("incremental aggregate merge equals the full recompute on every group") {
    val rows = TpchOps.incrAgg.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("consistent") == 1L,
        s"partial-sum merge diverged for ${r.getString(0)}")
      assert(r.getAs[Long]("n_total") ==
        r.getAs[Long]("n_base") + r.getAs[Long]("n_delta"))
      assert(r.getAs[Long]("n_base") > 0L && r.getAs[Long]("n_delta") > 0L,
        "cutoff must split the data or the test proves nothing")
    }
  }

  test("typed joinWith + lambda pipeline equals the DataFrame twin") {
    val typed = TypedOps.typedJoinWith.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val df = graft.io.Tables.customer(spark, sf)
      .join(graft.io.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == df, "typed and DataFrame paths must agree")
    assert(typed.values.sum > 0, "urgent orders exist in testdata")
  }

  test("LATERAL top-1 picks each nation's max-balance customer") {
    val rows = SqlOps.lateralTopN.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "one row per nation")
    // replay driver-side: the lateral row is the (raw-bal DESC, key ASC)
    // argmax — order on the DOUBLE like the SQL does, cents only as output
    val cust = graft.io.Tables.customer(spark, sf).collect()
      .map(r => (r.getInt(2), r.getLong(0), r.getDouble(3),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val nations = graft.io.Tables.load(spark, sf, "nation").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val want = cust.groupBy(_._1).map { case (nk, cs) =>
      val best = cs.maxBy(c => (c._3, -c._2))
      nations(nk) -> ((best._2, best._4))
    }
    assert(rows.map(r => r._1 -> ((r._2, r._3))).toMap == want,
      "lateral subquery must pick the per-nation argmax")
  }
}
