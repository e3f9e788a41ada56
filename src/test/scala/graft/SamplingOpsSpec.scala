package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class SamplingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("hash sample is deterministic and close to its 10% rate") {
    val total = graft.io.Tables.documents(spark, sf).count()
    val a = SamplingOps.sampleHash.run(spark, sf).collect().toSeq
    val b = SamplingOps.sampleHash.run(spark, sf).collect().toSeq
    assert(a == b, "re-running the sample must reproduce membership AND order")
    val rate = a.size.toDouble / total
    assert(rate > 0.05 && rate < 0.15, s"rate $rate far from 1/10")
  }

  test("hash order is a non-trivial permutation of the kept ids") {
    val ids = SamplingOps.sampleHash.run(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted != ids, "hash order should not degenerate to id order")
    assert(ids.distinct.size == ids.size)
  }

  test("stratified sample caps every stratum at its quota, deterministically") {
    val rows = SamplingOps.sampleStratified.run(spark, sf).collect()
    val perBucket = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perBucket.values.forall(_ <= 20))
    assert(perBucket.values.exists(_ == 20),
      "at least one stratum should be capped at sf0.001")
    val again = SamplingOps.sampleStratified.run(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("train/valid/test split is disjoint, exhaustive, and ~80/10/10") {
    val total = graft.io.Tables.documents(spark, sf).count()
    val rows = SamplingOps.trainSplit.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "valid", "test"))
    // split is a total function of doc_id -> sizes sum exactly to the corpus
    assert(rows.values.sum == total)
    assert(rows("train").toDouble / total > 0.7)
    assert(rows("valid") > 0 && rows("test") > 0)
  }

  test("A/B arms partition all users, assignment is rerun-stable") {
    val out = SamplingOps.abConversion.run(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val totalUsers = io.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum == totalUsers, "arms partition users")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "converted <= users per arm")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // hash bucketing -> identical arms on rerun (rand() could never)
    val again = SamplingOps.abConversion.run(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("welch t: near zero on null data, decisive on a planted uplift") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import org.apache.spark.sql.functions._
    // 2000 purchases over 200 users, value cycling independently of the
    // user, so under the null both arms draw from the same distribution
    val base = (1 to 2000).map(i => (i.toLong, (i % 200).toLong + 1L,
      "purchase", 10.0 + (i % 5) * 0.5))
      .toDF("event_id", "user_id", "event_type", "value")
    val tNull = SamplingOps.welchT(base).collect().head
    assert(math.abs(tNull.getDouble(4)) < 5.0,
      s"null data should not reject: t=${tNull.getDouble(4)}")
    // +5.0 planted on arm-1 users (same hash assignment the op uses)
    val uplifted = base.withColumn("value",
      $"value" + when(call_function("md5hash60",
        $"user_id".cast("string")) % 2 === 1, 5.0).otherwise(0.0))
    val tUp = SamplingOps.welchT(uplifted).collect().head
    assert(tUp.getDouble(3) > tUp.getDouble(2), "arm 1 mean must be lifted")
    assert(tUp.getDouble(4) < -10.0,
      s"planted uplift must be decisive: t=${tUp.getDouble(4)}")
    assert(tUp.getString(6) == "reject_h0", "uplift must flip the decision")
  }

  test("welch df: Satterthwaite bounds min(n0,n1)-1 <= df <= n0+n1-2") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val base = (1 to 2000).map(i => (i.toLong, (i % 200).toLong + 1L,
      "purchase", 10.0 + (i % 7) * 0.5))
      .toDF("event_id", "user_id", "event_type", "value")
    val r = SamplingOps.welchT(base).collect().head
    val (n0, n1) = (r.getLong(0), r.getLong(1))
    val df = r.getDouble(5)
    assert(df >= math.min(n0, n1) - 1.0 && df <= n0 + n1 - 2.0,
      s"Welch–Satterthwaite df out of range: df=$df n0=$n0 n1=$n1")
    assert(r.getString(6) == "fail_to_reject",
      "null data must not reject at the 5% level")
  }

  test("weighted sample: 50 rows, rerun-stable, quality-tilted vs uniform") {
    val rows = SamplingOps.weightedSample.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.length == 50)
    // keys are valid E-S draws and the output is sorted by them
    assert(rows.forall { case (_, q, k) =>
      q > 0.0 && q <= 1.0 && k >= 0L && k <= 1000000L })
    assert(rows.map(_._3).sliding(2).forall(s => s.head >= s.last),
      "descending key order")
    val rerun = SamplingOps.weightedSample.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rerun.toSeq == rows.toSeq, "seedless determinism")
    // the tilt: sampled docs should average higher quality than the corpus
    val corpusQ = LlmTextOps.quality.run(spark, sf).collect().map(_.getDouble(3))
    val corpusMean = corpusQ.sum / corpusQ.length
    val sampleMean = rows.map(_._2).sum / rows.length
    assert(sampleMean > corpusMean,
      s"weighting must tilt the sample toward quality: $sampleMean <= $corpusMean")
  }

  test("SRM: healthy hash split passes, a planted 60/40 skew fires") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import org.apache.spark.sql.functions.col
    // real assignment on testdata: the chi-square accounting must close
    // (n_a + n_b = distinct users) and the detector must NOT fire
    val row = SamplingOps.abSrm.run(spark, sf).collect().head
    val (na, nb, chi2, flag) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val users = io.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(na + nb == users, "every user assigned to exactly one arm")
    assert(chi2 == (na - nb) * (na - nb) * 1000000L / (na + nb))
    assert(flag == 0L, s"healthy 50/50 hashing must pass SRM: chi2_ppm=$chi2")
    // planted skew: 600 vs 400 -> chi2 = 200^2/1000 = 40 >> 3.841 -> fires
    val skew = (Seq.fill(600)(0) ++ Seq.fill(400)(1)).map(v => Tuple1(v.toLong))
      .toDF("variant")
    val fired = SamplingOps.srmOf(skew).collect().head
    assert(fired.getLong(2) == 40000000L && fired.getLong(3) == 1L,
      s"planted 60/40 split must fire: $fired")
    // borderline: 520 vs 480 -> chi2 = 1.6 < 3.841 -> passes
    val ok = (Seq.fill(520)(0) ++ Seq.fill(480)(1)).map(v => Tuple1(v.toLong))
      .toDF("variant")
    assert(SamplingOps.srmOf(ok).collect().head.getLong(3) == 0L)
  }
}
