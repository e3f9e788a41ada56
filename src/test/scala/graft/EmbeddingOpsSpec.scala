package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class EmbeddingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def pairs(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet

  test("brute-force top-k is well-formed: 10 ranked neighbors per query") {
    val rows = EmbeddingOps.cosineTopK.run(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to 10L))
      val sims = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        "similarity must be non-increasing in rank")
    }
  }

  test("ANN (sign-LSH buckets) reaches useful recall vs brute force") {
    val brute = pairs(EmbeddingOps.cosineTopK.run(spark, sf).collect())
    val ann = pairs(EmbeddingOps.annLsh.run(spark, sf).collect())
    val recall = (brute & ann).size.toDouble / brute.size
    info(f"ANN recall@10 = $recall%.2f")
    assert(recall >= 0.2, f"recall $recall%.2f too low — LSH buckets broken?")
    // every ANN hit must be a genuine same-bucket neighbor with a valid rank
    assert(ann.nonEmpty)
  }

  test("IVF ANN (cell assignment + nprobe=2) reaches useful recall") {
    val brute = pairs(EmbeddingOps.cosineTopK.run(spark, sf).collect())
    val ivf = pairs(EmbeddingOps.annIvf.run(spark, sf).collect())
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF recall@10 = $recall%.2f")
    assert(recall >= 0.15, f"recall $recall%.2f too low — cell assignment broken?")
  }

  test("ANN similarities agree with brute-force for common pairs") {
    val brute = EmbeddingOps.cosineTopK.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ann = EmbeddingOps.annLsh.run(spark, sf).collect()
    ann.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(math.abs(s - r.getDouble(3)) < 1e-12)
      }
    }
  }
}
