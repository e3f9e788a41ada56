package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Typed `Dataset[T]` surface: case-class rows, lambda pipelines, and a
  * custom `Aggregator` (the typed UDAF seam, SURVEY.md §2.11). The
  * DataFrame ops elsewhere are the default — Catalyst sees through column
  * expressions but NOT through lambdas, so typed `map`/`filter` trade some
  * optimizer visibility for compile-time safety; these queries prove the
  * typed path produces oracle-identical answers where that trade is wanted.
  */
object TypedOps {

  final case class Customer(c_custkey: Long, c_name: String,
      c_nationkey: Int, c_acctbal: Double, c_mktsegment: String)

  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    implicit val enc: Encoder[Customer] = Encoders.product[Customer]
    Tables.customer(spark, dir).as[Customer]
  }

  /** Typed filter + map (lambdas, not Columns). The arithmetic matches the
    * oracle bit-for-bit: one double multiply per row, left unrounded —
    * identical operands and operation give identical IEEE doubles in both
    * engines, so no rounding-mode question even arises. */
  val filterMap: QueryDef = QueryDef(
    "typed_filter_map",
    """SELECT c_custkey, c_acctbal * 1.1 AS boosted
      |FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_custkey""".stripMargin,
  ) { (spark, dir) =>
    implicit val enc: Encoder[(Long, Double)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaDouble)
    customers(spark, dir)
      .filter((c: Customer) => c.c_acctbal > 5000)
      .map((c: Customer) => (c.c_custkey, c.c_acctbal * 1.1))
      .toDF("c_custkey", "boosted")
      .orderBy($"c_custkey")
  }

  /** Typed average as a custom `Aggregator[IN, BUF, OUT]` — the reduction
    * runs as partial aggregates (map-side combine) exactly like a built-in,
    * and `finish` applies the engine's float convention
    * (`round(sum,2)/count`). */
  object AvgAcctbal extends Aggregator[Customer, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), c: Customer): (Double, Long) =
      (b._1 + c.c_acctbal, b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      BigDecimal(b._1).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble / b._2
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** groupByKey + custom Aggregator, checked against the SQL convention. */
  val typedAvg: QueryDef = QueryDef(
    "typed_agg_avg",
    """SELECT c_mktsegment, round(sum(c_acctbal), 2) / count(*) AS avg_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  ) { (spark, dir) =>
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[(String, Double)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)
    customers(spark, dir)
      .groupByKey((c: Customer) => c.c_mktsegment)
      .agg(AvgAcctbal.toColumn.name("avg_bal"))
      .toDF("c_mktsegment", "avg_bal")
      .orderBy($"c_mktsegment")
  }

  /** Bounded top-k buffer for [[TopKOrders]] — a case class so
    * `Encoders.product` gives it a codegen'd ExpressionEncoder. Items are
    * (score, id) kept sorted by (score DESC, id ASC), capped at k. */
  final case class TopKBuf(items: Seq[(Double, Long)])

  /** Top-k-per-group as a custom Aggregator: each partial buffer holds at
    * most k rows, so the shuffle moves O(k · groups) instead of every row —
    * the bounded-heap alternative to `row_number() OVER (...) <= k`, whose
    * window form must co-locate and sort each group's FULL history. (Spark
    * ≥3.5 narrows the gap with WindowGroupLimit pushdown; the Aggregator
    * keeps the bound explicit and works inside any typed pipeline.) Pure
    * comparisons on stored values — no arithmetic, so cross-engine
    * determinism is just the (score DESC, id ASC) total order. */
  final class TopKOrders(k: Int)
      extends Aggregator[(Long, Double), TopKBuf, TopKBuf] {
    private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(items: Seq[(Double, Long)], x: (Double, Long)) = {
      val (before, after) = items.span(beats(_, x))
      (before ++ (x +: after)).take(k)
    }
    override def zero: TopKBuf = TopKBuf(Nil)
    override def reduce(b: TopKBuf, in: (Long, Double)): TopKBuf =
      TopKBuf(insert(b.items, (in._2, in._1)))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf(b.items.foldLeft(a.items)(insert))
    override def finish(b: TopKBuf): TopKBuf = b
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Top-3 orders per customer via the bounded-heap Aggregator, exploded
    * back to rows and checked against the window-rank oracle. */
  val typedTopK: QueryDef = QueryDef(
    "typed_topk_group",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) <= 3
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
  ) { (spark, dir) =>
    implicit val inEnc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)](Encoders.tuple(
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble))
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKOrders(3).toColumn.name("topk"))
      .toDF("o_custkey", "topk")
      .select($"o_custkey", explode($"topk.items").as("it"))
      .select($"o_custkey", $"it._2".as("o_orderkey"), $"it._1".as("o_totalprice"))
      .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey")
  }

  final case class Order(o_orderkey: Long, o_custkey: Long,
      o_orderpriority: String)

  /** `Dataset.joinWith` — the TYPED join that keeps both sides as whole
    * case-class values (a `Dataset[(Customer, Order)]`, no column-name
    * flattening or ambiguity), then a lambda filter and a typed
    * `groupByKey.count`. The lambda pipeline is opaque to Catalyst (the
    * trade this lane documents), but the JOIN itself is still a planned
    * equi-join — broadcast/shuffle selection, AQE, and codegen all apply;
    * only the post-join lambdas run interpreted. Counts only, so the
    * oracle compare is exact. */
  val typedJoinWith: QueryDef = QueryDef(
    "typed_joinwith",
    """SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_urgent
      |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY segment""".stripMargin,
  ) { (spark, dir) =>
    implicit val encO: Encoder[Order] = Encoders.product[Order]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val c = customers(spark, dir)
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority").as[Order]
    c.joinWith(o, c("c_custkey") === o("o_custkey"), "inner")
      .filter((t: (Customer, Order)) => t._2.o_orderpriority == "1-URGENT")
      .groupByKey((t: (Customer, Order)) => t._1.c_mktsegment)
      .count()
      .toDF("segment", "n_urgent")
      .orderBy($"segment")
  }

  val all: Seq[QueryDef] = Seq(filterMap, typedAvg, typedTopK, typedJoinWith)
}
