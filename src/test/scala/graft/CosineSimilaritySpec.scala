package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("native cosine_sim is bit-identical to the higher-order-function form") {
    val e = io.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val a = e.select($"vec_id".as("ia"), $"v".as("va"))
    val b = e.select($"vec_id".as("ib"), $"v".as("vb"))
    val pairs = a.join(b, $"ia" < $"ib").limit(2000)
    val hof = (
      aggregate(zip_with($"va", $"vb", (x, y) => x * y), lit(0.0), (s, x) => s + x)
        / (sqrt(aggregate($"va", lit(0.0), (s, x) => s + x * x))
          * sqrt(aggregate($"vb", lit(0.0), (s, x) => s + x * x))))
    val diff = pairs
      .select(call_function("cosine_sim", $"va", $"vb").as("native"), hof.as("ref"))
      .filter(not($"native" === $"ref")) // exact equality, no epsilon
      .count()
    assert(diff == 0)
  }

  test("cosine_sim resolves from SQL text via the session extension") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS s").head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("null / empty / mismatched inputs yield null") {
    val rows = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)),
        |       cosine_sim(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)),
        |       cosine_sim(array(1.0d), array(1.0d, 2.0d)),
        |       cosine_sim(array(0.0d), array(1.0d))""".stripMargin).head
    (0 until 4).foreach(i => assert(rows.isNullAt(i), s"arg $i not null"))
  }

  test("interpreted eval agrees with codegen") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val factory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val r = spark.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(0.5d, 0.5d)) AS s").head
      assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(2)) < 1e-12)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      factory.foreach(spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("self-similarity of a real embedding vector is 1") {
    val r = io.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(1)
      .select(call_function("cosine_sim",
        transform($"embedding", x => x.cast("double")),
        transform($"embedding", x => x.cast("double"))).as("self"))
      .head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
  }
}
