package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Trained quality CLASSIFIER over hashed bag-of-words features — the
  * CCNet/fastText stage of a corpus pipeline: distill a quality signal
  * into a cheap linear model, then score every document with one
  * broadcast pass. Driver north-star extension; no reference-repo
  * counterpart. The heuristic scorers (`llm_quality`, `llm_perplexity`)
  * COMPUTE a signal; this operator LEARNS one — logistic regression by
  * full-batch gradient descent, weak labels from the corpus's own
  * quality-heuristic median split.
  *
  * Scale shape, per round (and why it survives 100 TB):
  *  - the feature stream is a (doc_id, bucket)-keyed grouped count over
  *    the token explode — linear, map-side combined, bounded by
  *    docs × [[NBuckets]];
  *  - the margin pass joins features against the BROADCAST weight vector
  *    ([[NBuckets]] + 1 rows — never a shuffle) and reduces per doc;
  *  - the gradient pass re-keys the same feature stream by bucket — a
  *    ([[NBuckets]])-keyed sum of quantized BIGINTs, output bounded by
  *    the model size, never the corpus;
  *  - the update joins two model-sized frames. Corpus passes per round:
  *    two. The corpus never joins itself.
  *
  * Cross-engine determinism (the quantize-before-sum architecture):
  *  - the margin is EXACT integer arithmetic end-to-end: weights live as
  *    1e-6-scaled BIGINTs, feature values are count ratios c/n, and the
  *    per-doc reduction sums `wq·c` (BIGINT) before a single final
  *    division by `1e6·n` — accumulation order cannot move it;
  *  - the bias is feature `j = -1` with constant value 1 (emitted as one
  *    `(doc_id, -1, n)` row per doc, so `c/n = 1`) — one update rule, no
  *    special case;
  *  - the sigmoid is the only libm call on the margin path and its
  *    argument is the identical rational in both engines; its result
  *    rounds to 6 dp immediately (the [[PerplexityOps]] convention);
  *  - per-(doc, bucket) gradient terms and per-doc log-loss terms
  *    quantize to 1e-9 / 1e-6 BIGINTs BEFORE their shuffled sums, via
  *    `floor(x·scale + 0.5)` rather than `round()`: floor on a double is
  *    the identical IEEE op in Spark and DuckDB, while their `round`s
  *    disagree by one ulp of the quantum on exact `.5` boundaries.
  */
object ClassifierOps {

  /** Hashed-feature dimensionality (the "hashing trick" — collisions are
    * intended and harmless at this model size). Tiny by design so the
    * weight vector broadcasts trivially; a deployment would raise it to
    * 2^18+ and the plan shape would not change. */
  private val NBuckets = 64

  /** Full-batch gradient-descent rounds. Like the k-means/BPE loops this
    * is a fixed unrollable count: the oracle replays every round, and the
    * train-curve readout shows the loss falling monotonically. */
  private val Rounds = 4

  /** Learning rate. Large because tf features are small (they sum to 2
    * per doc including the bias) and the batch gradient averages over the
    * corpus — the standard full-batch/L-BFGS-free regime. */
  private val Lr = 50.0

  /** Token→bucket assignment: the portable 60-bit digest mod [[NBuckets]]
    * (non-negative, so `%` agrees cross-engine). */
  private def bucketOf(w: Column): Column =
    call_function("md5hash60", w) % NBuckets

  /** `(doc_id, j, c, n)` hashed feature stream: per-doc token-bucket
    * counts `c`, doc token count `n`, plus the bias row `(doc_id, -1, n)`
    * so the bias trains like any other feature (its value c/n = 1). */
  private def featuresOf(docs: DataFrame): DataFrame = {
    val f0 = docs
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .select($"doc_id", bucketOf($"w").as("j"))
      .groupBy($"doc_id", $"j").agg(count(lit(1)).as("c"))
    val nn = f0.groupBy($"doc_id").agg(sum($"c").as("n"))
    f0.join(nn, "doc_id")
      .select($"doc_id", $"j", $"c", $"n")
      .unionAll(nn.select($"doc_id", lit(-1L).as("j"), $"n".as("c"), $"n"))
  }

  /** Weak labels: y = 1 iff the doc's heuristic quality score
    * (`llm_quality`'s exact formula) is at or above the corpus's exact
    * median — a balanced split by construction, the same
    * expensive-signal→cheap-model distillation arrangement CCNet uses
    * with its source classifier. */
  private def labelsOf(docs: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "of", "and")
    val q = docs.select($"doc_id", split($"text", " ").as("ts"))
      .select($"doc_id", size($"ts").as("n"),
        size(filter($"ts", t => t.isInCollection(stop))).as("hits"))
      .select($"doc_id",
        round(least($"n" / lit(50.0), lit(1.0)) * 0.5
          + (lit(1.0) - $"hits".cast("double") / $"n") * 0.5, 4).as("q"))
    val med = q.agg(percentile($"q", lit(0.5)).as("m"))
    q.crossJoin(broadcast(med))
      .select($"doc_id", ($"q" >= $"m").cast("long").as("y"))
  }

  /** Post-round per-doc scores under a weight frame `w (j, wq)`:
    * `(doc_id, s, y)` with `s` the 6-dp sigmoid of the exact-integer
    * margin. */
  private def scoresOf(feat: DataFrame, lab: DataFrame, w: DataFrame): DataFrame =
    feat.join(broadcast(w), "j")
      // group on doc_id ALONE (n is functionally dependent — max() carries
      // it): the cached feature stream is hash-partitioned on doc_id, so a
      // doc_id-keyed aggregation and the doc_id joins below all reuse that
      // partitioning instead of re-shuffling the corpus every round
      .groupBy($"doc_id").agg(sum($"wq" * $"c").as("mq"), max($"n").as("n"))
      .join(lab, "doc_id")
      .select($"doc_id",
        round(lit(1.0) / (lit(1.0)
          + exp(-($"mq".cast("double") / (lit(1000000.0) * $"n")))), 6).as("s"),
        $"y")

  /** The training loop: [[Rounds]] full-batch GD rounds from zero
    * weights. Returns (per-round train-curve frames for rounds
    * 0..[[Rounds]], final weight frame `(j, wq)`, final per-doc score
    * frame `(doc_id, s, y)`). Extracted so the fixture spec trains on
    * a planted corpus with the REAL plan. */
  private[graft] def clfTrainOf(spark: SparkSession, docs: DataFrame)
      : (Seq[DataFrame], DataFrame, DataFrame) = {
    // both corpus-sized frames cache HASH-PARTITIONED ON doc_id: every
    // round's per-doc margin aggregation, label join, and gradient join
    // key on doc_id, so aligning the cached partitioning once removes the
    // per-round corpus shuffles — each round then shuffles only the
    // model-sized (j)-keyed gradient. At cluster scale this is the
    // difference between 2 corpus shuffles per round and none.
    val feat = graft.Caches.persist(featuresOf(docs).repartition($"doc_id"))
    val lab = graft.Caches.persist(labelsOf(docs).repartition($"doc_id"))
    val nd = lab.agg(count(lit(1)).as("nd"))
    // s clamped away from {0, 1} so the log-loss stays finite even if a
    // margin saturates the 6-dp sigmoid
    val sc = least(greatest($"s", lit(0.000001)), lit(0.999999))
    var w = graft.Caches.localCheckpoint(
      spark.range(-1L, NBuckets.toLong)
        .select($"id".as("j"), lit(0L).as("wq")))
    val curve = scala.collection.mutable.Buffer.empty[DataFrame]
    var scores: DataFrame = null
    for (r <- 0 to Rounds) {
      scores = graft.Caches.persist(scoresOf(feat, lab, w))
      curve += scores
        .select($"y",
          floor((-($"y" * log(sc) + (lit(1.0) - $"y") * log(lit(1.0) - sc)))
            * 1000000 + lit(0.5)).cast("long").as("lq"),
          (($"s" >= 0.5).cast("long") === $"y").cast("long").as("ok"))
        .agg(sum($"lq").as("slq"), sum($"ok").as("n_correct"))
        .crossJoin(broadcast(nd))
        .select(lit(r.toLong).as("round"),
          round($"slq".cast("double") / $"nd" / 1000000.0, 6).as("logloss"),
          $"n_correct",
          round($"n_correct".cast("double") / $"nd", 6).as("accuracy"))
      if (r < Rounds) {
        val g = feat.join(scores, "doc_id")
          .select($"j",
            floor(($"s" - $"y") * $"c" / $"n" * 1000000000L + lit(0.5))
              .cast("long").as("gq"))
          .groupBy($"j").agg(sum($"gq").as("sgq"))
        w = graft.Caches.localCheckpoint(
          w.join(g, Seq("j"), "left").crossJoin(broadcast(nd))
            .select($"j",
              ($"wq" - floor(lit(Lr) * coalesce($"sgq", lit(0L))
                / (lit(1000.0) * $"nd") + lit(0.5)).cast("long")).as("wq")))
      }
    }
    (curve.toSeq, w, scores)
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle: the loop unrolled to chained CTEs (the kmeansTrain /
  // bpeTrain / graph_pagerank technique) — every round's exact-integer
  // margin, 6-dp sigmoid, quantized gradient and weight update replayed.
  // ---------------------------------------------------------------------

  private val baseCtes: String =
    s"""WITH tw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |f0 AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT % $NBuckets AS j,
       |              count(*) AS c
       |       FROM tw GROUP BY 1, 2),
       |nn AS (SELECT doc_id, sum(c) AS n FROM f0 GROUP BY 1),
       |feat AS (SELECT f0.doc_id, f0.j, f0.c, nn.n FROM f0 JOIN nn USING (doc_id)
       |         UNION ALL SELECT doc_id, -1, n, n FROM nn),
       |q AS (SELECT doc_id,
       |             round(least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.5
       |                   + (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
       |                            / len(string_split(text, ' '))) * 0.5, 4) AS q
       |      FROM documents),
       |med AS (SELECT quantile_cont(q, 0.5) AS m FROM q),
       |lab AS (SELECT doc_id, CAST(CASE WHEN q.q >= med.m THEN 1 ELSE 0 END AS BIGINT) AS y
       |        FROM q, med),
       |nd AS (SELECT count(*) AS nd FROM lab),
       |w0 AS (SELECT CAST(t.j AS BIGINT) AS j, CAST(0 AS BIGINT) AS wq
       |       FROM unnest(range(-1, $NBuckets)) AS t(j))""".stripMargin

  /** Margin + sigmoid CTE for round `r` (scores under weights `w{r}`). */
  private def sCte(r: Int): String =
    s""",
       |m$r AS (SELECT f.doc_id, f.n, sum(w.wq * f.c) AS mq
       |        FROM feat f JOIN w$r w USING (j) GROUP BY 1, 2),
       |s$r AS (SELECT m.doc_id,
       |               round(1.0 / (1.0 + exp(-(CAST(m.mq AS DOUBLE) / (1000000.0 * m.n)))), 6) AS s,
       |               lab.y, m.n
       |        FROM m$r m JOIN lab USING (doc_id))""".stripMargin

  /** Gradient + update CTEs producing `w{r+1}` from `s{r}`. */
  private def stepCte(r: Int): String =
    s""",
       |g${r + 1} AS (SELECT f.j,
       |              sum(CAST(floor((s.s - s.y) * f.c / f.n * 1000000000.0 + 0.5) AS BIGINT)) AS sgq
       |       FROM feat f JOIN s$r s USING (doc_id) GROUP BY 1),
       |w${r + 1} AS (SELECT w.j,
       |              w.wq - CAST(floor($Lr * coalesce(g.sgq, 0) / (1000.0 * nd.nd) + 0.5) AS BIGINT) AS wq
       |       FROM w$r w LEFT JOIN g${r + 1} g USING (j), nd)""".stripMargin

  /** CTE chain through `s{Rounds}` (all rounds trained and scored). */
  private def trainCtes: String =
    baseCtes + (0 until Rounds).map(r => sCte(r) + stepCte(r)).mkString + sCte(Rounds)

  private val clampSql =
    "least(greatest(s, 0.000001), 0.999999)"

  /** Train-curve readout: one row per round 0..[[Rounds]] with the
    * quantized mean log-loss and training accuracy under that round's
    * weights — the convergence certificate (round 0 is the zero-weight
    * baseline, log-loss ln 2). */
  val clfTrain: QueryDef = QueryDef(
    "llm_clf_train",
    trainCtes +
      (0 to Rounds).map { r =>
        s"""
           |SELECT CAST($r AS BIGINT) AS round,
           |       round(CAST(sum(CAST(floor(-(y * ln($clampSql) + (1 - y) * ln(1 - $clampSql)) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / nd.nd / 1000000.0, 6) AS logloss,
           |       CAST(sum(CASE WHEN CAST(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END AS BIGINT) = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           |       round(CAST(sum(CASE WHEN CAST(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END AS BIGINT) = y THEN 1 ELSE 0 END) AS DOUBLE) / nd.nd, 6) AS accuracy
           |FROM s$r, nd GROUP BY nd.nd""".stripMargin
      }.mkString("\nUNION ALL") + "\nORDER BY round",
  ) { (spark, dir) =>
    val (curve, _, _) = clfTrainOf(spark, Tables.documents(spark, dir))
    curve.reduce(_ unionAll _).orderBy($"round")
  }

  /** Per-document scores under the trained model: the cheap one-pass
    * corpus scorer the training exists to produce. Re-runs the training
    * lane (per-query independence, the registry convention — see
    * `EmbeddingOps.ivfTrainedTopK`). */
  val clfScore: QueryDef = QueryDef(
    "llm_clf_score",
    trainCtes +
      s"""
         |SELECT doc_id, s AS score,
         |       CAST(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred,
         |       y AS label,
         |       CAST(CASE WHEN CAST(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END AS BIGINT) = y THEN 1 ELSE 0 END AS BIGINT) AS correct
         |FROM s$Rounds ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) =>
    val (_, _, scores) = clfTrainOf(spark, Tables.documents(spark, dir))
    scores.select($"doc_id", $"s".as("score"),
      ($"s" >= 0.5).cast("long").as("pred"), $"y".as("label"),
      (($"s" >= 0.5).cast("long") === $"y").cast("long").as("correct"))
      .orderBy($"doc_id")
  }

  /** The learned weight vector itself ([[NBuckets]] hashed features + the
    * `j = -1` bias), in interpretable units — the model-inspection readout
    * (and the shape a model-export step would write). */
  val clfWeights: QueryDef = QueryDef(
    "llm_clf_weights",
    trainCtes +
      s"""
         |SELECT j, CAST(wq AS DOUBLE) / 1000000.0 AS weight
         |FROM w$Rounds ORDER BY j""".stripMargin,
  ) { (spark, dir) =>
    val (_, w, _) = clfTrainOf(spark, Tables.documents(spark, dir))
    w.select($"j", ($"wq".cast("double") / 1000000.0).as("weight"))
      .orderBy($"j")
  }

  /** CALIBRATION curve (reliability diagram) of the trained scorer over
    * score-RANK deciles — per bin, how many documents, how many actually
    * positive, and the gap between mean predicted score and observed
    * positive rate (the per-bin expected-calibration-error term): the
    * readout that decides whether `llm_clf_score`'s probabilities can
    * gate data by threshold or need recalibration first. Binning is by
    * QUANTILE, not equal width — the trained scores saturate into a
    * 0.0017-wide band at the top of the sigmoid, so equal-width bins
    * collapse to one; rank deciles always resolve ten bins (the standard
    * reliability-diagram treatment for concentrated scores).
    *
    * Determinism: the 6-dp sigmoid is already engine-identical, so its
    * exact-integer micro form (`round(s·1e6)`) ranks on the (micro,
    * doc_id) total order and averages without any new float crossing
    * engines; rate and mean are one exact integer division each.
    *
    * Scale shape: scoring is the (cached) training lane; the decile
    * assignment is [[ParallelRank.withNtile]] — a range shuffle plus
    * partition-parallel windows, NO single-partition exchange — and the
    * readout is one bounded (10-group) aggregate. */
  val clfCalibration: QueryDef = QueryDef(
    "llm_clf_calibration",
    trainCtes +
      s"""
         |, mic AS (SELECT doc_id, CAST(round(s * 1000000) AS BIGINT) AS micro, y
         |          FROM s$Rounds),
         |b AS (SELECT micro, y,
         |             CAST(ntile(10) OVER (ORDER BY micro, doc_id) AS BIGINT) AS bucket
         |      FROM mic)
         |SELECT bucket,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(y) AS BIGINT) AS n_pos,
         |       CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm,
         |       CAST(sum(micro) // count(*) AS BIGINT) AS mean_score_micro,
         |       CAST(abs(sum(micro) // count(*) - sum(y) * 1000000 // count(*)) AS BIGINT) AS gap_micro
         |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,
  ) { (spark, dir) =>
    val (_, _, scores) = clfTrainOf(spark, Tables.documents(spark, dir))
    val mic = scores.select($"doc_id",
      round($"s" * 1000000).cast("long").as("micro"), $"y")
    ParallelRank.withNtile(mic, 10, Seq($"micro", $"doc_id"), "bucket")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"y").as("n_pos"),
        expr("sum(y) * 1000000 DIV count(*)").as("pos_rate_ppm"),
        expr("sum(micro) DIV count(*)").as("mean_score_micro"))
      .select($"bucket", $"n_docs", $"n_pos", $"pos_rate_ppm",
        $"mean_score_micro",
        abs($"mean_score_micro" - $"pos_rate_ppm").as("gap_micro"))
      .orderBy($"bucket")
  }

  val all: Seq[QueryDef] = Seq(clfTrain, clfScore, clfWeights, clfCalibration)
}
