package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** LM-perplexity corpus-quality scoring (the CCNet / Gopher signal: score
  * every document against a language model and flag the least fluent) —
  * driver north-star extension; no reference-repo counterpart. The
  * heuristic quality suite (`LlmTextOps.quality` / `repetition` /
  * entropy) catches STRUCTURE (length, stopword ratio, repetition); a
  * perplexity score catches FLUENCY — gibberish with perfectly normal
  * lengths and no repetition sails through the heuristics but lights up
  * under an n-gram LM. The LM here is a bigram model with add-k
  * smoothing (k = 0.5) trained on the corpus itself, the CCNet
  * arrangement where the model and the scored data share a domain.
  *
  * Scale shape, stage by stage — all linear or vocabulary-bounded:
  *  - the bigram stream is a per-doc array expansion (no shuffle);
  *  - training is two grouped aggregates keyed on (w1, w2) and (w1) —
  *    map-side partial counts, output bounded by the observed-bigram
  *    vocabulary, never the corpus;
  *  - scoring re-joins the stream against the counts — equi-joins keyed
  *    on the bigram/context, the same posting-join shape as TF-IDF; the
  *    vocabulary size and the flag threshold are broadcast scalars;
  *  - the per-doc reduction is one (doc_id)-keyed sum of exact BIGINTs.
  *
  * Cross-engine determinism: each bigram's smoothed log-prob is
  * `round(ln((n2+0.5)/(n1+0.5·V)), 6)` — the log's argument is the same
  * exact rational on both engines and the 6-dp round absorbs the last-ulp
  * libm difference — then quantized to a 1e-6 BIGINT BEFORE the shuffled
  * per-doc sum (the `llm_embed_centroid` architecture), so accumulation
  * order cannot move the hash. The per-doc mean re-rounds to a 1e-6
  * BIGINT (`mq`), making the percentile-threshold comparison an exact
  * integer-vs-interpolated-double compare that both engines evaluate
  * identically (Spark `percentile` ≡ DuckDB `quantile_cont`, the
  * `sketch_percentile_exact` precedent).
  *
  * The decile flag uses an EXACT percentile, which buffers the per-doc
  * `mq` column on one aggregator — fine into the billions of docs (8
  * bytes each), and the oracle needs exactness; a 100 TB deployment that
  * can tolerate sketch error would swap `percentile` for
  * `percentile_approx` with no other change.
  */
object PerplexityOps {

  /** (doc_id, w1, w2) adjacent-token bigram stream; docs with fewer than
    * two tokens have no bigrams and are excluded by construction. */
  private def bigramsOf(docs: DataFrame): DataFrame =
    docs.select($"doc_id", split($"text", " ").as("ts"))
      .filter(size($"ts") >= 2)
      .select($"doc_id",
        explode(transform(sequence(lit(1), size($"ts") - 1),
          i => struct(element_at($"ts", i).as("w1"),
            element_at($"ts", i + 1).as("w2")))).as("b"))
      .select($"doc_id", $"b".getField("w1").as("w1"),
        $"b".getField("w2").as("w2"))

  /** Smoothed per-bigram log-prob, quantized: shared by the scorer and
    * the LM-head readout. `n2`/`n1` are exact counts, `vsz` the corpus
    * vocabulary size. */
  private def logpCol: org.apache.spark.sql.Column =
    round(log(($"n2" + 0.5) / ($"n1" + lit(0.5) * $"vsz")), 6)

  /** Per-doc perplexity frame `(doc_id, n_bigrams, mean_logp, ppl,
    * flag_high_ppl)` — extracted so the spec can score a hand-built
    * fixture corpus with the REAL plan. The flag marks the worst decile:
    * `mq` (the quantized mean log-prob) at or below the corpus's exact
    * 10th percentile, i.e. perplexity at or above the 90th. */
  private[graft] def perplexityOf(docs: DataFrame): DataFrame =
    perDocPpl(scoredBigrams(docs))

  /** Quantized per-bigram log-prob stream `(doc_id, lq)` under the
    * corpus-trained add-k LM — the scoring front both [[perplexity]] and
    * [[curriculum]] consume. */
  private def scoredBigrams(docs: DataFrame): DataFrame = {
    // the stream feeds training (two aggregates) AND scoring — persist so
    // the expansion runs once; released by the runner after the action
    val bi = graft.Caches.persist(bigramsOf(docs))
    val c2 = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("n2"))
    val c1 = bi.groupBy($"w1").agg(count(lit(1)).as("n1"))
    val v = docs.select(explode(split($"text", " ")).as("w"))
      .agg(countDistinct($"w").as("vsz"))
    bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select($"doc_id",
        round(logpCol * 1000000).cast("long").as("lq"))
  }

  /** Per-doc quantized mean log-prob `(doc_id, n_bigrams, mq)`. */
  private def pdOf(sc: DataFrame): DataFrame =
    sc.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"lq").as("slq"))
      .select($"doc_id", $"n_bigrams",
        round($"slq".cast("double") / $"n_bigrams").cast("long").as("mq"))

  /** Per-doc readout over a quantized log-prob stream `(doc_id, lq)` —
    * the tail both LM variants share ([[pdTailSql]]'s Spark twin). */
  private def perDocPpl(sc: DataFrame): DataFrame = {
    val pd = pdOf(sc)
    val th = pd.agg(percentile($"mq", lit(0.10)).as("t10"))
    pd.crossJoin(broadcast(th))
      .select($"doc_id", $"n_bigrams",
        ($"mq".cast("double") / 1000000.0).as("mean_logp"),
        round(exp(-($"mq".cast("double") / 1000000.0)), 4).as("ppl"),
        ($"mq".cast("double") <= $"t10").cast("long").as("flag_high_ppl"))
  }

  /** Two-fold CROSS-perplexity under a Jelinek–Mercer interpolated LM —
    * the arrangement CCNet actually uses (score against a model trained
    * on OTHER data): docs split by id parity, two LMs trained (one per
    * fold), every doc scored by the opposite fold's model with
    * p = λ·MLE-bigram + (1−λ)·add-k-unigram (λ = 0.7). Unseen bigrams
    * fall to the unigram floor, unseen words to the smoothing floor —
    * never zero, always finite.
    *
    * Why not score against a model trained on the whole corpus, as
    * [[perplexity]] does? Because an UNSMOOTHED MLE term memorizes:
    * measured on the gibberish fixture, a doc of singleton tokens scores
    * ppl ≈ 1.4 under a self-trained JM model — its one-off bigrams are
    * deterministic continuations — which inverts the quality signal.
    * Add-k survives self-training (the smoothing mass dominates rare
    * counts); an interpolated-MLE model needs held-out scoring, and the
    * parity split gives every doc a held-out score. Scale shape: the
    * count tables gain a fold key (same shuffles), scoring joins carry
    * the opposite-fold key — still bigram-keyed equi-joins; the two
    * (n_total, vsz) rows broadcast. */
  private[graft] def xvalPerplexityOf(docs: DataFrame): DataFrame = {
    val bp = graft.Caches.persist(bigramsOf(docs)
      .withColumn("par", $"doc_id" % 2))
    val c2 = bp.groupBy($"par", $"w1", $"w2").agg(count(lit(1)).as("n2"))
      .select($"par".as("p2"), $"w1".as("a1"), $"w2".as("a2"), $"n2")
    val c1 = bp.groupBy($"par", $"w1").agg(count(lit(1)).as("n1"))
      .select($"par".as("p1"), $"w1".as("b1"), $"n1")
    val tw = docs.select(($"doc_id" % 2).as("par"),
      explode(split($"text", " ")).as("w"))
    val u = tw.groupBy($"par", $"w").agg(count(lit(1)).as("cu"))
      .select($"par".as("pu"), $"w".as("uw2"), $"cu")
    val nt = tw.groupBy($"par").agg(count(lit(1)).as("n_total"),
      countDistinct($"w").as("vsz"))
      .select($"par".as("pn"), $"n_total", $"vsz")
    val p = lit(0.7) *
      when($"n1" > 0, coalesce($"n2", lit(0L)).cast("double") / $"n1")
        .otherwise(lit(0.0)) +
      lit(0.3) * ((coalesce($"cu", lit(0L)) + 0.5)
        / ($"n_total" + lit(0.5) * $"vsz"))
    val sc = bp.withColumn("opar", lit(1) - $"par")
      .join(c2, $"opar" === $"p2" && $"w1" === $"a1" && $"w2" === $"a2", "left")
      .join(c1, $"opar" === $"p1" && $"w1" === $"b1", "left")
      .join(u, $"opar" === $"pu" && $"w2" === $"uw2", "left")
      .join(broadcast(nt), $"opar" === $"pn")
      .select($"doc_id",
        round(round(log(p), 6) * 1000000).cast("long").as("lq"))
    perDocPpl(sc)
  }

  /** [[xvalPerplexityOf]] registered over the corpus. */
  val perplexityXval: QueryDef = QueryDef(
    "llm_perplexity_xval",
    biCtes +
      """,
        |bp AS (SELECT doc_id, doc_id % 2 AS par, w1, w2 FROM bi),
        |c2 AS (SELECT par, w1, w2, count(*) AS n2 FROM bp GROUP BY 1, 2, 3),
        |c1 AS (SELECT par, w1, count(*) AS n1 FROM bp GROUP BY 1, 2),
        |tw AS (SELECT doc_id % 2 AS par, unnest(string_split(text, ' ')) AS w FROM documents),
        |u AS (SELECT par, w AS w2, count(*) AS cu FROM tw GROUP BY 1, 2),
        |nt AS (SELECT par, count(*) AS n_total, count(DISTINCT w) AS vsz FROM tw GROUP BY 1),
        |sc AS (SELECT bp.doc_id,
        |              CAST(round(round(ln(
        |                0.7 * (CASE WHEN c1.n1 > 0 THEN CAST(coalesce(c2.n2, 0) AS DOUBLE) / c1.n1 ELSE 0 END)
        |              + 0.3 * ((coalesce(u.cu, 0) + 0.5) / (nt.n_total + 0.5 * nt.vsz))), 6) * 1000000) AS BIGINT) AS lq
        |       FROM bp
        |       LEFT JOIN c2 ON c2.par = 1 - bp.par AND c2.w1 = bp.w1 AND c2.w2 = bp.w2
        |       LEFT JOIN c1 ON c1.par = 1 - bp.par AND c1.w1 = bp.w1
        |       LEFT JOIN u ON u.par = 1 - bp.par AND u.w2 = bp.w2
        |       JOIN nt ON nt.par = 1 - bp.par)""".stripMargin +
      pdTailSql,
  ) { (spark, dir) =>
    xvalPerplexityOf(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  /** Shared oracle CTE prefix: the per-doc bigram stream. */
  private def biCtes: String =
    """WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |bi AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
      |       FROM ts, unnest(range(1, len(ts))) AS t(i)
      |       WHERE len(ts) >= 2)""".stripMargin

  /** Shared oracle CTE chain: bigram stream → counts → vocabulary →
    * quantized add-k log-probs (`sc`). `private[graft]` so
    * [[CompositionOps.qualityGate]] replays the identical LM. */
  private[graft] def lmCtes: String = biCtes +
    """,
      |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bi GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS n1 FROM bi GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS vsz
      |      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
      |sc AS (SELECT bi.doc_id,
      |              CAST(round(round(ln((c2.n2 + 0.5) / (c1.n1 + 0.5 * v.vsz)), 6) * 1000000) AS BIGINT) AS lq
      |       FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v)""".stripMargin

  /** Per-doc mean + decile-threshold CTEs over any `sc (doc_id, lq)` —
    * split from the readout so [[CompositionOps.qualityGate]] can reuse
    * the flag without the full perplexity projection. */
  private[graft] def pdCtes: String =
    """,
      |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |              CAST(round(CAST(sum(lq) AS DOUBLE) / count(*)) AS BIGINT) AS mq
      |       FROM sc GROUP BY doc_id),
      |th AS (SELECT quantile_cont(CAST(mq AS DOUBLE), 0.10) AS t10 FROM pd)""".stripMargin

  /** Shared oracle tail over any `sc (doc_id, lq)`: per-doc quantized
    * mean → decile threshold → perplexity readout. */
  private def pdTailSql: String = pdCtes +
    """
      |SELECT doc_id, n_bigrams,
      |       CAST(mq AS DOUBLE) / 1000000.0 AS mean_logp,
      |       round(exp(-(CAST(mq AS DOUBLE) / 1000000.0)), 4) AS ppl,
      |       CAST(CASE WHEN CAST(mq AS DOUBLE) <= th.t10 THEN 1 ELSE 0 END AS BIGINT) AS flag_high_ppl
      |FROM pd, th ORDER BY doc_id""".stripMargin

  /** Per-doc perplexity under the corpus bigram LM + worst-decile flag —
    * the canonical corpus-quality signal the heuristic suite lacks. */
  val perplexity: QueryDef = QueryDef(
    "llm_perplexity",
    lmCtes + pdTailSql,
  ) { (spark, dir) =>
    perplexityOf(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  /** Per-doc perplexity under an interpolated KNESER–NEY bigram LM
    * (Kneser & Ney 1995; the smoothing that won the n-gram era and the
    * one KenLM — the CCNet scorer — implements): absolute discount
    * D = 0.75 off every observed bigram, the freed mass backing off to
    * the CONTINUATION probability N1+(·,w₂)/N1+(··) — "how many contexts
    * does w₂ follow" rather than "how often does w₂ occur", which
    * correctly deflates high-count-single-context words. Third opinion
    * next to add-k ([[perplexity]]) and held-out JM ([[perplexityXval]]);
    * a doc the smoothers disagree on is exactly the doc worth auditing.
    *
    * Scale shape: identical to the add-k lane — two (and a half) count
    * aggregates bounded by the bigram vocabulary (c₂, c₁ with its
    * distinct-continuation fanout, the per-word context counts), posting
    * equi-joins to score, one doc-keyed BIGINT sum. Corpus-trained, so
    * every scored bigram is observed and n₂ − D ≥ 0.25 > 0 — the log is
    * always finite without a backoff-to-unseen branch.
    *
    * Determinism: the probability is one identically-parenthesized float
    * expression over exact integer counts, ln-rounded at 6 dp and
    * quantized to a 1e-6 BIGINT BEFORE the per-doc sum — the house LM
    * architecture. */
  val perplexityKn: QueryDef = QueryDef(
    "llm_perplexity_kn",
    biCtes +
      """,
        |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bi GROUP BY 1, 2),
        |c1k AS (SELECT w1, count(*) AS n1, count(DISTINCT w2) AS fanout
        |        FROM bi GROUP BY 1),
        |ctx AS (SELECT w2, count(DISTINCT w1) AS n_ctx FROM bi GROUP BY 1),
        |tt AS (SELECT count(*) AS n_types FROM c2),
        |sc AS (SELECT bi.doc_id,
        |              CAST(round(round(ln((c2.n2 - 0.75) / c1k.n1
        |                + 0.75 * c1k.fanout / c1k.n1
        |                  * (CAST(ctx.n_ctx AS DOUBLE) / tt.n_types)), 6)
        |                * 1000000) AS BIGINT) AS lq
        |       FROM bi JOIN c2 USING (w1, w2) JOIN c1k USING (w1)
        |                JOIN ctx USING (w2), tt)""".stripMargin +
      pdTailSql,
  ) { (spark, dir) =>
    knPerplexityOf(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  /** The KN scoring plan over any (doc_id, text) frame — extracted for
    * the continuation-probability fixture spec. */
  private[graft] def knPerplexityOf(docs: DataFrame): DataFrame = {
    val bi = graft.Caches.persist(bigramsOf(docs))
    val c2 = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("n2"))
    val c1k = bi.groupBy($"w1").agg(count(lit(1)).as("n1"),
      countDistinct($"w2").as("fanout"))
    val ctx = bi.groupBy($"w2").agg(countDistinct($"w1").as("n_ctx"))
    val tt = c2.agg(count(lit(1)).as("n_types"))
    val sc = bi.join(c2, Seq("w1", "w2")).join(c1k, Seq("w1"))
      .join(ctx, Seq("w2"))
      .crossJoin(broadcast(tt))
      .select($"doc_id",
        round(round(log(($"n2" - lit(0.75)) / $"n1"
          + lit(0.75) * $"fanout" / $"n1"
            * ($"n_ctx".cast("double") / $"n_types")), 6) * 1000000)
          .cast("long").as("lq"))
    perDocPpl(sc)
  }

  /** The LM head itself: top-50 bigrams by corpus count with their
    * smoothed log-probs — the readout a pipeline inspects to sanity-check
    * what the model learned (and the shape a distillation/export step
    * would write). Counts-desc with (w1, w2) tiebreak → TakeOrdered. */
  val bigramLm: QueryDef = QueryDef(
    "llm_bigram_lm",
    biCtes +
      """,
      |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bi GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS n1 FROM bi GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS vsz
      |      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents))
      |SELECT w1, w2, CAST(n2 AS BIGINT) AS n2, CAST(n1 AS BIGINT) AS n1,
      |       round(ln((n2 + 0.5) / (n1 + 0.5 * vsz)), 6) AS logp
      |FROM c2 JOIN c1 USING (w1), v
      |ORDER BY n2 DESC, w1, w2 LIMIT 50""".stripMargin,
  ) { (spark, dir) =>
    val bi = bigramsOf(Tables.documents(spark, dir))
    val c2 = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("n2"))
    val c1 = bi.groupBy($"w1").agg(count(lit(1)).as("n1"))
    val v = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .agg(countDistinct($"w").as("vsz"))
    c2.join(c1, Seq("w1")).crossJoin(broadcast(v))
      .select($"w1", $"w2", $"n2", $"n1", logpCol.as("logp"))
      .orderBy(desc("n2"), asc("w1"), asc("w2"))
      .limit(50)
  }

  /** Marginal n-gram novelty — for each document, the fraction of its
    * DISTINCT bigrams that no earlier document (by doc_id, the ingest
    * order) contains: the corpus-growth signal that tells a pipeline when
    * additional data stops adding new language ("novelty collapse" is the
    * classic diminishing-returns readout, and near-duplicate docs show up
    * as novelty ≈ 0). Shape: one distinct pass over the bigram stream,
    * one (w1, w2)-keyed min-aggregate for the global first-occurrence
    * table, and one equi-join of the stream back against it — never a
    * doc×doc comparison, so the cost is corpus-linear at any scale. The
    * fraction is a single division of exact ints, rounded identically on
    * both engines. */
  val ngramNovelty: QueryDef = QueryDef(
    "llm_ngram_novelty",
    biCtes +
      """,
        |db AS (SELECT DISTINCT doc_id, w1, w2 FROM bi),
        |fo AS (SELECT w1, w2, min(doc_id) AS first_doc FROM db GROUP BY 1, 2)
        |SELECT db.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_uniq_bigrams,
        |       CAST(sum(CASE WHEN fo.first_doc = db.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |       round(CAST(sum(CASE WHEN fo.first_doc = db.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS novelty
        |FROM db JOIN fo USING (w1, w2)
        |GROUP BY db.doc_id ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) => noveltyOf(Tables.documents(spark, dir)).orderBy($"doc_id") }

  /** The [[ngramNovelty]] plan, extracted for fixture specs. */
  private[graft] def noveltyOf(docs: DataFrame): DataFrame = {
    val db = bigramsOf(docs).distinct()
    val fo = db.groupBy($"w1", $"w2").agg(min($"doc_id").as("first_doc"))
    db.join(fo, Seq("w1", "w2"))
      .select($"doc_id", ($"first_doc" === $"doc_id").cast("long").as("novel"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_uniq_bigrams"), sum($"novel").as("n_novel"))
      .select($"doc_id", $"n_uniq_bigrams", $"n_novel",
        round($"n_novel".cast("double") / $"n_uniq_bigrams", 6).as("novelty"))
  }

  /** CURRICULUM phase assignment — order the corpus easy → hard by model
    * difficulty (curriculum learning, Bengio et al. 2009, as data
    * pipelines apply it: difficulty proxy = LM perplexity): docs in the
    * lowest-perplexity tercile are `easy`, the highest `hard`, the rest
    * `medium`; docs too short to score (< 2 tokens) come out `unscored`
    * rather than silently easy. Each row carries its phase's total token
    * budget — the number a training scheduler needs to plan phase
    * lengths.
    *
    * Terciles are RANK-based — `ntile(3)` over the total order
    * `(mq DESC, doc_id)` on the 1e-6-quantized mean log-probs — not
    * value-thresholds from an interpolated percentile: an interpolated
    * threshold is a float whose last ulp can differ cross-engine in the
    * ops-order of the interpolation, and one boundary doc flipping phase
    * drags `phase_tokens` for every row in two phases. Ranking integers
    * with a doc_id tiebreak has no such boundary. The tercile assignment
    * runs via [[ParallelRank.withNtile]] — range shuffle +
    * partition-parallel ranking + broadcast rank offsets, bit-identical
    * to the oracle's global `ntile(3)` with no single-partition window
    * (the per-doc frame is corpus-sized at 100 TB — round-11 verdict
    * weak-plan fix); the phase rollup is a 4-row broadcast join. Cost
    * is the LM scoring pass the perplexity query already prices. */
  val curriculum: QueryDef = QueryDef(
    "llm_curriculum",
    lmCtes + pdCtes +
      s""",
         |tc AS (SELECT doc_id, ntile(3) OVER (ORDER BY mq DESC, doc_id) AS tile FROM pd),
         |nt AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents),
         |ph AS (SELECT nt.doc_id, nt.n_tokens,
         |              CASE WHEN pd.mq IS NULL THEN 'unscored'
         |                   WHEN tc.tile = 1 THEN 'easy'
         |                   WHEN tc.tile = 3 THEN 'hard'
         |                   ELSE 'medium' END AS phase,
         |              CASE WHEN pd.mq IS NULL THEN NULL
         |                   ELSE round(exp(-(CAST(pd.mq AS DOUBLE) / 1000000.0)), 4) END AS ppl
         |       FROM nt LEFT JOIN pd ON nt.doc_id = pd.doc_id
         |                LEFT JOIN tc ON nt.doc_id = tc.doc_id),
         |pb AS (SELECT phase, CAST(sum(n_tokens) AS BIGINT) AS phase_tokens FROM ph GROUP BY 1)
         |SELECT ph.doc_id, ph.phase, ph.ppl, ph.n_tokens, pb.phase_tokens
         |FROM ph JOIN pb USING (phase) ORDER BY ph.doc_id""".stripMargin,
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val pd = pdOf(scoredBigrams(docs))
    val ranked = ParallelRank.withNtile(pd.select($"doc_id", $"mq"), 3,
      Seq($"mq".desc, $"doc_id".asc), "tile")
    val ph = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
      .join(ranked, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        when($"mq".isNull, "unscored")
          .when($"tile" === 1, "easy")
          .when($"tile" === 3, "hard")
          .otherwise("medium").as("phase"),
        when($"mq".isNull, lit(null).cast("double"))
          .otherwise(round(exp(-($"mq".cast("double") / 1000000.0)), 4))
          .as("ppl"))
    val pb = ph.groupBy($"phase").agg(sum($"n_tokens").as("phase_tokens"))
    ph.join(broadcast(pb), Seq("phase"))
      .select($"doc_id", $"phase", $"ppl", $"n_tokens", $"phase_tokens")
      .orderBy($"doc_id")
  }

  /** Moore–Lewis selection keeps this many top-scored pool docs. */
  private val MlSelK = 100

  /** The in-domain slice both selection lanes target. */
  private val MlTarget = "src1"

  /** Moore–Lewis intelligent selection (Moore & Lewis 2010, "Intelligent
    * Selection of Language Model Training Data") — the cross-entropy-
    * difference criterion: score every raw-pool document by
    * `log P_target(doc) − log P_pool(doc)` under two add-k bigram LMs,
    * one trained on the in-domain slice (`source = 'src1'`, the same
    * target `llm_dsir_select` uses), one on the pool itself, and keep the
    * top scorers. The n-gram-LM twin of hashed-feature DSIR: DSIR weighs
    * hashed unigram buckets, Moore–Lewis weighs real bigram context — the
    * two lanes answer the same "which raw docs look in-domain" question
    * from independent models, which is exactly what a curation pipeline
    * cross-checks before committing compute.
    *
    * Pool bigrams unseen in the target LM fall to the add-k floor
    * (n2 = 0, n1 = 0 → k/(k·V)) rather than −∞; both LMs share the
    * corpus-wide vocabulary V so the floors are comparable.
    *
    * Scale shape: two vocabulary-bounded LM trainings (grouped counts),
    * one posting-style scoring join over the pool's bigram stream, one
    * doc-keyed BIGINT sum; selection reuses the DSIR broadcast-cut (a
    * TakeOrderedAndProject boundary, never a global window over the
    * corpus). Determinism: per-bigram score difference quantizes each
    * side with the 6-dp-then-1e-6 double-round before the subtraction
    * and the shuffled sum. */
  val mooreLewis: QueryDef = QueryDef(
    "llm_moore_lewis",
    s"""WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
       |bi AS (SELECT doc_id, source, ts[i] AS w1, ts[i+1] AS w2
       |       FROM tok, unnest(range(1, len(ts))) AS t(i)
       |       WHERE len(ts) >= 2),
       |v AS (SELECT count(DISTINCT w) AS vsz
       |      FROM (SELECT unnest(ts) AS w FROM tok)),
       |c2t AS (SELECT w1, w2, count(*) AS n2 FROM bi WHERE source = '$MlTarget' GROUP BY 1, 2),
       |c1t AS (SELECT w1, count(*) AS n1 FROM bi WHERE source = '$MlTarget' GROUP BY 1),
       |c2p AS (SELECT w1, w2, count(*) AS n2 FROM bi WHERE source <> '$MlTarget' GROUP BY 1, 2),
       |c1p AS (SELECT w1, count(*) AS n1 FROM bi WHERE source <> '$MlTarget' GROUP BY 1),
       |sc AS (SELECT b.doc_id,
       |              CAST(round(round(ln((coalesce(t2.n2, 0) + 0.5) / (coalesce(t1.n1, 0) + 0.5 * v.vsz)), 6) * 1000000) AS BIGINT)
       |            - CAST(round(round(ln((p2.n2 + 0.5) / (p1.n1 + 0.5 * v.vsz)), 6) * 1000000) AS BIGINT) AS dq
       |       FROM bi b
       |       JOIN c2p p2 ON b.w1 = p2.w1 AND b.w2 = p2.w2
       |       JOIN c1p p1 ON b.w1 = p1.w1
       |       LEFT JOIN c2t t2 ON b.w1 = t2.w1 AND b.w2 = t2.w2
       |       LEFT JOIN c1t t1 ON b.w1 = t1.w1, v
       |       WHERE b.source <> '$MlTarget'),
       |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |              CAST(round(CAST(sum(dq) AS DOUBLE) / count(*)) AS BIGINT) AS mq
       |       FROM sc GROUP BY doc_id),
       |rk AS (SELECT doc_id, n_bigrams, mq,
       |              row_number() OVER (ORDER BY mq DESC, doc_id) AS r
       |       FROM pd)
       |SELECT doc_id, n_bigrams,
       |       round(CAST(mq AS DOUBLE) / 1000000.0, 6) AS ml_score,
       |       CAST(CASE WHEN r <= $MlSelK THEN 1 ELSE 0 END AS BIGINT) AS selected
       |FROM rk ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) => mooreLewisOf(Tables.documents(spark, dir)) }

  /** [[mooreLewis]] over any (doc_id, text, source) frame — fixture
    * seam. */
  private[graft] def mooreLewisOf(docs: DataFrame): DataFrame = {
    val withSrc = docs.select($"doc_id", $"source", split($"text", " ").as("ts"))
      .filter(size($"ts") >= 2)
      .select($"doc_id", $"source",
        explode(transform(sequence(lit(1), size($"ts") - 1),
          i => struct(element_at($"ts", i).as("w1"),
            element_at($"ts", i + 1).as("w2")))).as("b"))
      .select($"doc_id", $"source", $"b.w1".as("w1"), $"b.w2".as("w2"))
    val bi = graft.Caches.persist(withSrc)
    val tgt = bi.filter($"source" === MlTarget)
    val pool = bi.filter($"source" =!= MlTarget)
    val c2t = tgt.groupBy($"w1", $"w2").agg(count(lit(1)).as("n2t"))
    val c1t = tgt.groupBy($"w1").agg(count(lit(1)).as("n1t"))
    val c2p = pool.groupBy($"w1", $"w2").agg(count(lit(1)).as("n2p"))
    val c1p = pool.groupBy($"w1").agg(count(lit(1)).as("n1p"))
    val v = docs.select(explode(split($"text", " ")).as("w"))
      .agg(countDistinct($"w").as("vsz"))
    def lq(n2: org.apache.spark.sql.Column, n1: org.apache.spark.sql.Column) =
      round(round(log((n2 + 0.5) / (n1 + lit(0.5) * $"vsz")), 6) * 1000000)
        .cast("long")
    val scored = graft.Caches.persist(
      pool
        .join(c2p, Seq("w1", "w2")).join(c1p, Seq("w1"))
        .join(c2t, Seq("w1", "w2"), "left").join(c1t, Seq("w1"), "left")
        .crossJoin(broadcast(v))
        .select($"doc_id",
          (lq(coalesce($"n2t", lit(0L)), coalesce($"n1t", lit(0L)))
            - lq($"n2p", $"n1p")).as("dq"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum($"dq").cast("double") / count(lit(1))).cast("long").as("mq")))
    val cut = scored.orderBy($"mq".desc, $"doc_id".asc).limit(MlSelK)
      .agg(min(struct($"mq", (-$"doc_id").as("nid"))).as("c"))
      .select($"c.mq".as("cut_mq"), (-$"c.nid").as("cut_id"))
    scored.crossJoin(broadcast(cut))
      .select($"doc_id", $"n_bigrams",
        round($"mq".cast("double") / 1000000.0, 6).as("ml_score"),
        ($"mq" > $"cut_mq" || ($"mq" === $"cut_mq" && $"doc_id" <= $"cut_id"))
          .cast("long").as("selected"))
      .orderBy($"doc_id")
  }

  /** CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3), the
    * arrangement the released CommonCrawl snapshots actually ship in:
    * within each LANGUAGE, split scored documents into perplexity thirds
    * by two per-language thresholds — head (most fluent) trains first /
    * survives strictest filtering, tail is usually dropped. This is the
    * per-language twin of [[curriculum]]'s corpus-global phases: a
    * multilingual corpus bucketed globally drowns low-resource languages
    * in the tail because LM scores aren't comparable across languages;
    * CCNet's per-language thresholds are the fix, and the `lang` column
    * is exactly the partition that makes them computable.
    *
    * Buckets come from per-language QUANTILE THRESHOLDS (the paper's
    * arrangement), not a per-language ntile: at 100 TB a per-language
    * ranked window is a giant single-partition sort per language, while
    * two thresholds per language are a tiny aggregate broadcast back to a
    * map-only compare — the same exact-percentile caveat as
    * [[perplexity]]'s decile flag (per-doc 8-byte `mq`s buffer on one
    * aggregator; swap in `percentile_approx` at sketch-tolerant scale).
    * Determinism: thresholds interpolate over exact-integer `mq`s from
    * the identical 17-significant-digit fraction literals, so both
    * engines compare the same doubles (`sketch_percentile_exact`
    * precedent); docs with no bigrams are unscored and excluded by the
    * LM, same as every lane on this file. */
  val ccnetBuckets: QueryDef = QueryDef(
    "llm_ccnet_buckets",
    lmCtes + pdCtes +
      """,
        |pl AS (SELECT pd.doc_id, d.lang, pd.mq
        |       FROM pd JOIN documents d USING (doc_id)),
        |lt AS (SELECT lang,
        |              quantile_cont(CAST(mq AS DOUBLE), 0.6666666666666666) AS t_head,
        |              quantile_cont(CAST(mq AS DOUBLE), 0.3333333333333333) AS t_mid
        |       FROM pl GROUP BY lang),
        |lb AS (SELECT pl.doc_id, pl.lang,
        |              CASE WHEN CAST(pl.mq AS DOUBLE) >= lt.t_head THEN 'head'
        |                   WHEN CAST(pl.mq AS DOUBLE) >= lt.t_mid THEN 'middle'
        |                   ELSE 'tail' END AS bucket,
        |              round(exp(-(CAST(pl.mq AS DOUBLE) / 1000000.0)), 4) AS ppl
        |       FROM pl JOIN lt USING (lang)),
        |bc AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS bucket_docs
        |       FROM lb GROUP BY 1, 2)
        |SELECT lb.doc_id, lb.lang, lb.bucket, lb.ppl, bc.bucket_docs
        |FROM lb JOIN bc USING (lang, bucket) ORDER BY lb.doc_id""".stripMargin,
  ) { (spark, dir) => ccnetBucketsOf(Tables.documents(spark, dir)) }

  /** [[ccnetBuckets]] over any (doc_id, text, lang) frame — split out for
    * the planted-fluency spec. */
  private[graft] def ccnetBucketsOf(docs: DataFrame): DataFrame = {
    val pl = pdOf(scoredBigrams(docs))
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val lt = pl.groupBy($"lang").agg(
      percentile($"mq", lit(0.6666666666666666)).as("t_head"),
      percentile($"mq", lit(0.3333333333333333)).as("t_mid"))
    val lb = pl.join(broadcast(lt), "lang")
      .select($"doc_id", $"lang",
        when($"mq".cast("double") >= $"t_head", "head")
          .when($"mq".cast("double") >= $"t_mid", "middle")
          .otherwise("tail").as("bucket"),
        round(exp(-($"mq".cast("double") / 1000000.0)), 4).as("ppl"))
    val bc = lb.groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("bucket_docs"))
    lb.join(broadcast(bc), Seq("lang", "bucket"))
      .select($"doc_id", $"lang", $"bucket", $"ppl", $"bucket_docs")
      .orderBy($"doc_id")
  }

  val all: Seq[QueryDef] = Seq(perplexity, perplexityXval, perplexityKn,
    bigramLm, ngramNovelty, curriculum, mooreLewis, ccnetBuckets)
}
