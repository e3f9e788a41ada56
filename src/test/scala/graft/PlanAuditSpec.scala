package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-registry physical-plan invariants: every registered query is
  * planned (analysis + optimization + physical strategy, no execution) and
  * checked for the scale-killers the engine promises to avoid. Catches
  * planning regressions across the entire surface in one cheap sweep.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.executedPlan.toString
    }

  test("no registered query plans a cartesian product") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("top-k queries plan as TakeOrderedAndProject, not global sorts") {
    val topK = Seq("redshift_q1", "a7_top5_customers", "a7_top5_nested",
      "a5_top10_leaderboard", "sql_top_orders")
    topK.foreach { n =>
      assert(plans(n).contains("TakeOrderedAndProject"),
        s"$n lost its top-k plan")
    }
  }

  test("dimension joins broadcast the small side") {
    Seq("redshift_q1", "a5_search_tag_range", "llm_cosine_topk").foreach { n =>
      assert(plans(n).contains("Broadcast"), s"$n lost its broadcast")
    }
  }

  test("point lookups push their key predicate into the parquet scan") {
    Seq("a5_point_lookup" -> "EqualTo(c_custkey,42)",
      "a5_proj_lookup" -> "EqualTo(c_custkey,42)").foreach { case (n, f) =>
      assert(plans(n).contains(f), s"$n does not push '$f'")
    }
  }

  test("every registered query resolves and plans without error") {
    assert(plans.size == SparkEntry.queries.size)
    assert(plans.values.forall(_.nonEmpty))
  }
}
