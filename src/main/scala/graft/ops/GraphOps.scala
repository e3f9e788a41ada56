package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Declarative graph analytics over the part co-occurrence graph (nodes =
  * parts, edge = two parts sharing >1 distinct order — the same support
  * threshold the reference's recommender mines, `a1_cooccur_pairs`).
  * Distributed connected components already live in `LlmTextOps.clusterOf`;
  * this adds the other two staples — triangle enumeration and degree
  * distribution — as plain relational plans.
  *
  * Scale shape: the edge set is the OUTPUT of support-threshold mining, so
  * it is orders of magnitude smaller than the input (classic itemset
  * pruning); the triangle join is edge-keyed equi-joins on that mined set
  * with the canonical a<b<c orientation, so each triangle is emitted
  * exactly once and no join side ever re-expands the raw lineitem table.
  */
object GraphOps {

  /** Canonically-oriented (p1 < p2) support-thresholded co-occurrence
    * edges. Basket expansion (one shuffle, per-order array algebra) instead
    * of the oracle's lineitem self-join — same rows, no quadratic join.
    * Extracted for the spec and shared by both queries. */
  private[graft] def cooccurEdges(lineitem: DataFrame): DataFrame =
    lineitem.select($"l_orderkey", $"l_partkey").distinct()
      .groupBy($"l_orderkey").agg(collect_set($"l_partkey").as("items"))
      .select(explode(flatten(transform($"items", x =>
        transform(filter($"items", y => x < y),
          y => struct(x.as("p1"), y.as("p2")))))).as("e"))
      .select($"e.p1".as("p1"), $"e.p2".as("p2"))
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("w"))
      .filter($"w" > 1)

  private val edgesSql =
    """bi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (SELECT b1.l_partkey AS p1, b2.l_partkey AS p2
      |          FROM bi b1 JOIN bi b2 ON b1.l_orderkey = b2.l_orderkey
      |                             AND b1.l_partkey < b2.l_partkey
      |          GROUP BY 1, 2 HAVING count(*) > 1)""".stripMargin

  /** Every triangle (a < b < c) in the mined co-occurrence graph — part
    * trios that pairwise co-occur, the depth-3 itemset the pairwise
    * recommender can't see. */
  val triangles: QueryDef = QueryDef(
    "graph_triangles",
    s"""WITH $edgesSql
       |SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
       |FROM pairs e1 JOIN pairs e2 ON e2.p1 = e1.p2
       |     JOIN pairs e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
       |ORDER BY a, b, c""".stripMargin,
  ) { (spark, dir) =>
    val e = cooccurEdges(Tables.lineitem(spark, dir)).select($"p1", $"p2")
    e.as("e1").join(e.as("e2"), col("e1.p2") === col("e2.p1"))
      .join(e.as("e3"),
        col("e3.p1") === col("e1.p1") && col("e3.p2") === col("e2.p2"))
      .select(col("e1.p1").as("a"), col("e1.p2").as("b"), col("e2.p2").as("c"))
      .orderBy($"a", $"b", $"c")
  }

  /** Degree distribution of the mined graph — how many parts have k
    * qualifying co-occurrence partners. */
  val degreeDist: QueryDef = QueryDef(
    "graph_degree_dist",
    s"""WITH $edgesSql,
       |deg AS (SELECT p, CAST(count(*) AS BIGINT) AS degree
       |        FROM (SELECT p1 AS p FROM pairs UNION ALL SELECT p2 AS p FROM pairs)
       |        GROUP BY p)
       |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
       |FROM deg GROUP BY degree ORDER BY degree""".stripMargin,
  ) { (spark, dir) =>
    val e = cooccurEdges(Tables.lineitem(spark, dir))
    e.select($"p1".as("p")).union(e.select($"p2".as("p")))
      .groupBy($"p").agg(count(lit(1)).as("degree"))
      .groupBy($"degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy($"degree")
  }

  /** PageRank over a directed edge list (undirected graphs pass both
    * orientations), fixed iteration count, damping 0.85.
    *
    * Determinism: per-edge contributions are quantized to 1e-9 BIGINTs
    * BEFORE the per-node sum (the `llm_embed_centroid` architecture), so
    * every iteration is bit-reproducible at any parallelism — rerunning
    * the op yields identical ranks, which the spec asserts. Each round is
    * one edge-keyed join + one node-keyed aggregate; lineage is truncated
    * per round with an eager localCheckpoint exactly as
    * `LlmTextOps.clusterOf` does (plan depth stays O(1), not O(rounds)).
    * Registered rows-only: fixed-point float iteration has no ANSI-SQL
    * oracle; GraphOpsSpec value-checks rank conservation, hub dominance,
    * and bit-stability instead. */
  private[graft] def pageRankOf(edges: DataFrame, iters: Int): DataFrame = {
    val e = graft.Caches.persist(
      edges.select($"src", $"dst").join(
        edges.select($"src").groupBy($"src").agg(count(lit(1)).as("deg")),
        "src"))
    val nodes = graft.Caches.persist(e.select($"src".as("id")).distinct())
    var ranks = nodes.select($"id", lit(1.0).as("rank"))
    for (iter <- 1 to iters) {
      val contribs = e
        .join(ranks.select($"id".as("src"), $"rank"), "src")
        .select($"dst".as("id"),
          round($"rank" / $"deg" * 1e9).cast("long").as("cq"))
      val summed = contribs.groupBy($"id").agg(sum($"cq").as("sq"))
      val next = nodes.join(summed, Seq("id"), "left")
        .select($"id",
          (lit(0.15) + lit(0.85) * (coalesce($"sq", lit(0L)) / 1e9)).as("rank"))
      // Unlike clusterOf (which references the previous labels three times a
      // round → exponential lineage), each PageRank round references the
      // previous ranks ONCE, so the plan grows linearly and an eager
      // materialization every round would pay 15 actions for nothing.
      // Checkpoint every 5th round: plan depth stays bounded, total actions
      // drop to iters/5 (measured 11.4 s → ~3 s at sf0.1).
      ranks = if (iter % 5 == 0 || iter == iters)
        graft.Caches.localCheckpoint(next)
      else next
    }
    ranks
  }

  /** Top-20 PageRank hubs of the co-occurrence graph (15 rounds). */
  val pageRank: QueryDef = QueryDef.rowsOnly("graph_pagerank") { (spark, dir) =>
    val und = cooccurEdges(Tables.lineitem(spark, dir))
    val edges = und.select($"p1".as("src"), $"p2".as("dst"))
      .union(und.select($"p2".as("src"), $"p1".as("dst")))
    pageRankOf(edges, 15)
      .select($"id".as("part"), round($"rank", 6).as("rank"))
      .orderBy($"rank".desc, $"part")
      .limit(20)
  }

  val all: Seq[QueryDef] = Seq(triangles, degreeDist, pageRank)
}
