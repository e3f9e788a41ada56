package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Ranked retrieval over the document corpus — TF-IDF cosine and BM25, the
  * two classic lexical relevance functions (Robertson & Zaragoza 2009). The
  * reference corpus queries stop at exact/near-dup matching; ranking is the
  * natural next surface a training-data pipeline needs (e.g. "pull the top-k
  * most on-topic documents per seed prompt").
  *
  * Scale shape — the part that matters at 100 TB:
  *   - Corpus statistics (df, N, avgdl) are token-keyed aggregates: one
  *     shuffle whose output is vocabulary-sized, then broadcast where joined.
  *   - The query side is tiny by construction (Q seed docs / literal terms),
  *     so scoring is a broadcast-hash join STREAMED over the corpus postings:
  *     linear in corpus size, no all-pairs expansion anywhere.
  *   - Top-k per query is a window over qid (bounded partitions of candidate
  *     rows, never the corpus) and the final ORDER BY is on ≤ Q·k rows.
  *
  * Cross-engine determinism: the only shuffled float sum (the dot product /
  * per-term BM25 contributions) is quantized to integers BEFORE the sum, the
  * same architecture as `llm_embed_centroid` — partial aggregation is exact
  * BIGINT math, immune to accumulation order. `ln` is guarded with
  * `round(..., 6)` exactly as `llm_idf` does.
  */
object RankingOps {

  /** TF-IDF cosine ranked retrieval: the first `nQueries` docs are the query
    * set; every corpus doc is scored against each query by cosine over
    * quantized tf·idf vectors; top `k` per query.
    *
    * Extracted so the spec can run it on a hand-built fixture.
    */
  def tfidfRankPlan(docs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    // Quantized weight: tf · round(ln((N+1)/(df+1)), 6) · 1e4 as BIGINT.
    // Exact-int norms/dots below make every shuffled sum order-free.
    val wt = tf.join(dfreq, "w").crossJoin(broadcast(n))
      .select($"doc_id", $"w",
        round($"tf" * round(log(($"n_docs" + 1.0) / ($"df" + 1.0)), 6) * 10000)
          .cast("long").as("wq"))
    val norms = wt.groupBy($"doc_id").agg(sum($"wq" * $"wq").as("nsq"))
    val q = wt.filter($"doc_id" < nQueries)
      .select($"doc_id".as("qid"), $"w", $"wq".as("qwq"))
    val dots = wt.join(broadcast(q), Seq("w"))
      .filter($"doc_id" =!= $"qid")
      .groupBy($"qid", $"doc_id")
      .agg(sum($"qwq" * $"wq").as("dot"))
      .select($"qid", $"doc_id".as("did"), $"dot")
    val scored = dots
      .join(broadcast(norms.select($"doc_id".as("qid"), $"nsq".as("nsq_q"))), "qid")
      .join(norms.select($"doc_id".as("did"), $"nsq".as("nsq_d")), "did")
      .select($"qid", $"did",
        round($"dot" / sqrt($"nsq_q".cast("double") * $"nsq_d".cast("double")), 6)
          .as("cosine"))
    val top = Window.partitionBy($"qid").orderBy($"cosine".desc, $"did".asc)
    scored
      .withColumn("rn", row_number().over(top)).filter($"rn" <= k).drop("rn")
      .orderBy($"qid", $"cosine".desc, $"did")
  }

  val tfidfRank: QueryDef = QueryDef(
    "llm_tfidf_rank",
    """WITH tf AS (SELECT doc_id, w, count(*) AS tf
      |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |            GROUP BY 1, 2),
      |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |wt AS (SELECT tf.doc_id, tf.w,
      |              CAST(round(tf.tf * round(ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) * 10000) AS BIGINT) AS wq
      |       FROM tf JOIN dfreq USING (w), n),
      |norms AS (SELECT doc_id, sum(wq * wq) AS nsq FROM wt GROUP BY 1),
      |dots AS (SELECT q.doc_id AS qid, d.doc_id AS did, sum(q.wq * d.wq) AS dot
      |         FROM wt q JOIN wt d ON q.w = d.w AND d.doc_id <> q.doc_id
      |         WHERE q.doc_id < 10
      |         GROUP BY 1, 2),
      |scored AS (SELECT qid, did,
      |                  round(dot / sqrt(CAST(nq.nsq AS DOUBLE) * CAST(nd.nsq AS DOUBLE)), 6) AS cosine
      |           FROM dots JOIN norms nq ON nq.doc_id = qid
      |                     JOIN norms nd ON nd.doc_id = did)
      |SELECT qid, did, cosine FROM scored
      |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, did) <= 10
      |ORDER BY qid, cosine DESC, did""".stripMargin,
  ) { (spark, dir) => tfidfRankPlan(Tables.documents(spark, dir), 10, 10) }

  /** BM25 scoring of the whole corpus against a literal term query
    * (k1 = 1.2, b = 0.75), top-20. Per-term contributions are computed from
    * exact integers (tf, dl, Σdl, N, df) with one identically-parenthesized
    * float expression on both engines, quantized to 1e-6 BIGINT before the
    * per-doc sum. Extracted for the spec. */
  def bm25Plan(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val tf = docs
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val dl = docs.select($"doc_id",
      size(split($"text", " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val dfreq = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    val contrib = tf
      .filter($"w".isin(terms: _*))
      .join(broadcast(dfreq.filter($"w".isin(terms: _*))), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"doc_id",
        round(
          round(log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)), 6)
            * ($"tf" * 2.2)
            / ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" * $"n_docs" / $"sum_dl".cast("double")))
            * 1000000).cast("long").as("cq"))
    contrib.groupBy($"doc_id")
      .agg(round(sum($"cq") / 1e6, 6).as("bm25"))
      .orderBy($"bm25".desc, $"doc_id")
      .limit(k)
  }

  val bm25Rank: QueryDef = QueryDef(
    "llm_bm25_rank",
    """WITH tf AS (SELECT doc_id, w, count(*) AS tf
      |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |            GROUP BY 1, 2),
      |dl AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl FROM documents),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      |q(term) AS (VALUES ('dup'), ('vector'), ('merge')),
      |contrib AS (
      |  SELECT tf.doc_id,
      |         CAST(round(
      |           round(ln(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)), 6)
      |           * (tf.tf * 2.2)
      |           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * s.n_docs / CAST(s.sum_dl AS DOUBLE)))
      |           * 1000000) AS BIGINT) AS cq
      |  FROM tf JOIN q ON tf.w = q.term
      |          JOIN dfreq ON dfreq.w = tf.w
      |          JOIN dl ON dl.doc_id = tf.doc_id, stats s)
      |SELECT doc_id, round(sum(cq) / 1e6, 6) AS bm25
      |FROM contrib GROUP BY 1
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
  ) { (spark, dir) =>
    bm25Plan(Tables.documents(spark, dir), Seq("dup", "vector", "merge"), 20)
  }

  val all: Seq[QueryDef] = Seq(tfidfRank, bm25Rank)
}
