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
}
