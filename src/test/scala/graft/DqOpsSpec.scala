package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class DqOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("healthy testdata audits clean: zero dup PKs, zero FK orphans") {
    val pk = DqOps.pkUnique.run(spark, sf).collect()
    assert(pk.length == 4)
    assert(pk.forall(_.getLong(3) == 0L), s"dup PKs: ${pk.mkString(",")}")
    val fk = DqOps.fkOrphans.run(spark, sf).collect()
    assert(fk.length == 3)
    assert(fk.forall(_.getLong(1) == 0L), s"orphans: ${fk.mkString(",")}")
  }

  test("the checks DETECT planted violations, not just bless clean data") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import org.apache.spark.sql.functions._
    // planted duplicate key: 2 rows share PK 7 -> n_dup_rows = 1
    val t = Seq(7L, 7L, 8L, 9L).map(Tuple1(_)).toDF("k")
    val dup = t.agg((count(lit(1)) - countDistinct($"k")).as("d"))
      .collect().head.getLong(0)
    assert(dup == 1L)
    // planted orphan: child 99 has no parent -> 1 orphan
    val child = Seq(1L, 2L, 99L).map(Tuple1(_)).toDF("ck")
    val parent = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("pk")
    val orphans = child.join(parent, $"ck" === $"pk", "left_anti").count()
    assert(orphans == 1L)
  }

  test("snapshot diff tags every change kind and excludes unchanged rows") {
    val rows = DqOps.snapshotDiff.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.nonEmpty)
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byStatus.keySet == Set("added", "removed", "changed"))
    assert(byStatus("added").forall(_ % 10 == 7), "added = keys missing old")
    assert(byStatus("removed").forall(_ % 10 == 3), "removed = keys missing new")
    assert(byStatus("changed").forall(k => k % 5 == 0 && k % 10 != 3),
      "changed = bumped keys present in both")
    // unchanged keys never appear
    assert(rows.map(_._1).forall(k =>
      k % 10 == 7 || k % 10 == 3 || k % 5 == 0))
  }

  test("PSI crosses the action bar on a planted shift and stays near 0 without one") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // identical distributions → psi ≈ 0 (smoothing noise only)
    val same = ((1 to 400).map(i => (i % 4, 1)) ++
      (1 to 400).map(i => (i % 4, 0))).map { case (b, a) => (b.toLong, a) }
      .toDF("bucket", "in_a")
    val psiSame = DqOps.psiOf(same).collect().head.getDouble(4)
    assert(math.abs(psiSame) < 0.01, s"no drift planted but psi=$psiSame")
    // hard shift: A mass on buckets {0,1}, B mass on buckets {2,3}
    val shifted = ((1 to 400).map(i => (i % 2, 1)) ++
      (1 to 400).map(i => (2 + i % 2, 0))).map { case (b, a) => (b.toLong, a) }
      .toDF("bucket", "in_a")
    val psiShift = DqOps.psiOf(shifted).collect().head.getDouble(4)
    assert(psiShift > 0.25, s"planted full shift must trip the bar: $psiShift")
  }
  test("k-anonymity: small equivalence classes are flagged, large ones pass") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // class (1, BUILDING): 12 rows (>= k=10, passes); (2, AUTO): 3 rows
    // (violates); (3, MACHINERY): exactly 10 rows (boundary, passes)
    val rows =
      (1 to 12).map(i => (i.toLong, 1L, "BUILDING")) ++
        (1 to 3).map(i => (100L + i, 2L, "AUTO")) ++
        (1 to 10).map(i => (200L + i, 3L, "MACHINERY"))
    val customer = rows.toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val out = DqOps.kAnonymityOf(customer).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((1L, "BUILDING")) == ((12L, 0L, 0.48)))
    assert(out((2L, "AUTO")) == ((3L, 1L, 0.12)), "3 < k flags")
    assert(out((3L, "MACHINERY")) == ((10L, 0L, 0.4)), "exactly k passes")
  }
}
