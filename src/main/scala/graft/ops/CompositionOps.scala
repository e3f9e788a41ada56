package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Corpus COMPOSITION and HYGIENE readouts — the decisions a training-mix
  * owner makes before a run (how much of each domain to sample, which
  * domains drifted from the corpus distribution) and the compliance scan
  * every shipped dataset needs (PII pattern hits). Driver north-star
  * extension; no reference-repo counterpart.
  *
  * All three operators are domain- or vocabulary-keyed aggregates over
  * one corpus pass: per-domain token counts are a (lang)-keyed shuffle
  * with map-side partials, the unigram tables are (lang, w)- and
  * (w)-keyed shuffles bounded by vocabulary size, and the corpus-level
  * scalars (total tokens, quantized weight norms) broadcast back — so at
  * 100 TB every stage is linear in the data or bounded by the vocabulary,
  * never quadratic in either.
  *
  * Determinism: the two libm calls (`pow` for temperature scaling, `ln`
  * inside the KL terms) are rounded to 6 dp immediately — their arguments
  * are identical exact rationals cross-engine — and every shuffled float
  * sum is quantized to scaled BIGINTs first (1e-6 for mixture weights,
  * 1e-9 for KL terms, whose per-token magnitudes are small).
  */
object CompositionOps {

  /** Temperature exponent for mixture weights: the multilingual-sampling
    * convention (α = 0.3, Conneau & Lample 2019 / XLM-R) that upsamples
    * low-resource domains without letting them dominate. */
  private val Alpha = 0.3

  /** Temperature-scaled domain mixture weights — for each language
    * (domain), its token share p_d, the α-temperature sampling weight
    * w_d ∝ p_d^α, and the resulting up/down-sampling boost w_d / p_d the
    * data loader applies. The weight normalization sums 1e-6-quantized
    * BIGINTs, so even the normalized weights hash-match cross-engine. */
  val domainMix: QueryDef = QueryDef(
    "llm_domain_mix",
    s"""WITH nd AS (SELECT lang, sum(len(string_split(text, ' '))) AS n_toks
       |            FROM documents GROUP BY 1),
       |tot AS (SELECT sum(n_toks) AS n_total FROM nd),
       |qd AS (SELECT lang, n_toks,
       |              CAST(n_toks AS DOUBLE) / tot.n_total AS p,
       |              CAST(round(round(power(CAST(n_toks AS DOUBLE) / tot.n_total, $Alpha), 6) * 1000000) AS BIGINT) AS qq
       |       FROM nd, tot),
       |sq AS (SELECT sum(qq) AS sqq FROM qd)
       |SELECT lang, CAST(n_toks AS BIGINT) AS n_toks, round(p, 6) AS share,
       |       round(CAST(qq AS DOUBLE) / sq.sqq, 6) AS weight,
       |       round((CAST(qq AS DOUBLE) / sq.sqq) / p, 6) AS boost
       |FROM qd, sq ORDER BY lang""".stripMargin,
  ) { (spark, dir) => domainMixOf(Tables.documents(spark, dir)).orderBy($"lang") }

  /** The [[domainMix]] plan, extracted for fixture specs. */
  private[graft] def domainMixOf(docs: DataFrame): DataFrame = {
    val nd = docs.groupBy($"lang")
      .agg(sum(size(split($"text", " "))).as("n_toks"))
    val tot = nd.agg(sum($"n_toks").as("n_total"))
    val qd = nd.crossJoin(broadcast(tot))
      .select($"lang", $"n_toks",
        ($"n_toks".cast("double") / $"n_total").as("p"),
        round(round(pow($"n_toks".cast("double") / $"n_total", Alpha), 6) * 1000000)
          .cast("long").as("qq"))
    val sq = qd.agg(sum($"qq").as("sqq"))
    qd.crossJoin(broadcast(sq))
      .select($"lang", $"n_toks", round($"p", 6).as("share"),
        round($"qq".cast("double") / $"sqq", 6).as("weight"),
        round(($"qq".cast("double") / $"sqq") / $"p", 6).as("boost"))
  }

  /** Per-domain KL divergence KL(P_d ‖ P_corpus) between each language's
    * unigram distribution and the whole-corpus distribution — the
    * domain-drift diagnostic read next to [[domainMix]] (a domain with
    * high KL needs its own eval slice; one near zero is redundant with
    * the pool). Every (lang, token) term p·ln(p/q) is computed from exact
    * count ratios and quantized to a 1e-9 BIGINT before the (lang)-keyed
    * sum. Terms with c_dw ≥ 1 have q ≥ p·(n_d/N) > 0, so the log is
    * always finite. */
  val domainKl: QueryDef = QueryDef(
    "llm_domain_kl",
    """WITH tw AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      |cdw AS (SELECT lang, w, count(*) AS c FROM tw GROUP BY 1, 2),
      |ndt AS (SELECT lang, sum(c) AS n_d FROM cdw GROUP BY 1),
      |cw AS (SELECT w, sum(c) AS cg FROM cdw GROUP BY 1),
      |nt AS (SELECT sum(c) AS n_total FROM cdw),
      |terms AS (SELECT cdw.lang,
      |                 CAST(round((CAST(cdw.c AS DOUBLE) / ndt.n_d)
      |                   * round(ln((CAST(cdw.c AS DOUBLE) / ndt.n_d)
      |                              / (CAST(cw.cg AS DOUBLE) / nt.n_total)), 6)
      |                   * 1000000000) AS BIGINT) AS tq
      |          FROM cdw JOIN ndt USING (lang) JOIN cw USING (w), nt),
      |agg AS (SELECT lang, count(*) AS n_vocab, sum(tq) AS stq FROM terms GROUP BY 1)
      |SELECT a.lang, CAST(n.n_d AS BIGINT) AS n_toks,
      |       CAST(a.n_vocab AS BIGINT) AS n_vocab,
      |       round(CAST(a.stq AS DOUBLE) / 1000000000.0, 6) AS kl
      |FROM agg a JOIN ndt n USING (lang) ORDER BY lang""".stripMargin,
  ) { (spark, dir) => domainKlOf(Tables.documents(spark, dir)).orderBy($"lang") }

  /** The [[domainKl]] plan, extracted for fixture specs. */
  private[graft] def domainKlOf(docs: DataFrame): DataFrame = {
    // the (lang, token) count table feeds all four downstream aggregates
    val cdw = graft.Caches.persist(
      docs.select($"lang", explode(split($"text", " ")).as("w"))
        .groupBy($"lang", $"w").agg(count(lit(1)).as("c")))
    val ndt = cdw.groupBy($"lang").agg(sum($"c").as("n_d"))
    val cw = cdw.groupBy($"w").agg(sum($"c").as("cg"))
    val nt = cdw.agg(sum($"c").as("n_total"))
    val p = $"c".cast("double") / $"n_d"
    val q = $"cg".cast("double") / $"n_total"
    val terms = cdw.join(broadcast(ndt), "lang").join(cw, "w")
      .crossJoin(broadcast(nt))
      .select($"lang",
        round(p * round(log(p / q), 6) * 1000000000L).cast("long").as("tq"))
    terms.groupBy($"lang")
      .agg(count(lit(1)).as("n_vocab"), sum($"tq").as("stq"))
      .join(broadcast(ndt), "lang")
      .select($"lang", $"n_d".as("n_toks"), $"n_vocab",
        round($"stq".cast("double") / 1000000000.0, 6).as("kl"))
  }

  /** PII pattern families scanned per document. Kept simple enough that
    * the Java-regex (Spark, codegen'd) and RE2 (DuckDB) dialects agree
    * verbatim; counts are non-overlapping match counts in both. */
  private val PiiPatterns: Seq[(String, String)] = Seq(
    "n_emails" -> "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
    "n_urls" -> "https?://[^\\s]+",
    "n_phones" -> "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]",
    "n_ipv4" -> "([0-9]{1,3}\\.){3}[0-9]{1,3}")

  /** Per-document PII scan: match counts per pattern family plus an
    * any-hit flag — the compliance gate a shipped dataset runs last (and
    * the redaction step's work list). A clean corpus yields all-zero
    * counts, which is exactly the certificate the gate exists to produce;
    * the planted-PII behavior is pinned by the fixture spec. Map-only —
    * codegen'd regex counts, no shuffle, embarrassingly parallel. */
  val piiScan: QueryDef = QueryDef(
    "llm_pii_scan",
    s"""SELECT doc_id,
       |${PiiPatterns.map { case (n, p) =>
            s"       len(regexp_extract_all(text, '$p'))::BIGINT AS $n,"
          }.mkString("\n")}
       |       CAST(CASE WHEN ${PiiPatterns.map { case (_, p) =>
            s"len(regexp_extract_all(text, '$p')) > 0"
          }.mkString(" OR ")}
       |            THEN 1 ELSE 0 END AS BIGINT) AS flag_pii
       |FROM documents ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) => piiScanOf(Tables.documents(spark, dir)).orderBy($"doc_id") }

  /** The [[piiScan]] plan, extracted for fixture specs. */
  private[graft] def piiScanOf(docs: DataFrame): DataFrame = {
    val counts = PiiPatterns.map { case (n, p) =>
      size(regexp_extract_all($"text", lit(p), lit(0))).cast("long").as(n)
    }
    docs.select($"doc_id" +: counts: _*)
      .withColumn("flag_pii",
        (PiiPatterns.map { case (n, _) => $"$n" > 0L }.reduce(_ || _))
          .cast("long"))
  }

  /** Redaction placeholder per PII family — typed markers (not blank)
    * so downstream consumers can count/condition on what was removed. */
  private val PiiMarkers: Seq[(String, String, String)] = Seq(
    ("n_emails", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("n_urls", "https?://[^\\s]+", "<URL>"),
    ("n_phones", "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]", "<PHONE>"),
    ("n_ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"))

  /** PII REDACTION — the apply step after [[piiScan]]'s count: every
    * pattern family replaced by its typed marker, in a fixed family
    * order (emails → urls → phones → ips, so a URL containing an email
    * is consumed by the email rule first — the order is part of the
    * contract and the oracle replays it). Emits per-doc counts, the
    * redacted text's digest (text itself never needs to leave the
    * executor — the digest is the proof), and `clean_after`: a re-scan
    * of the REDACTED text proving no pattern survived its own redaction.
    * Map-only, codegen'd regex chain, no shuffle. */
  val piiRedact: QueryDef = QueryDef(
    "llm_pii_redact",
    s"""WITH r AS (SELECT doc_id,
       |${PiiMarkers.map { case (n, p, _) =>
            s"       len(regexp_extract_all(text, '$p'))::BIGINT AS $n,"
          }.mkString("\n")}
       |       ${PiiMarkers.foldLeft("text") { case (acc, (_, p, m)) =>
                  s"regexp_replace($acc, '$p', '$m', 'g')" }} AS red
       |FROM documents)
       |SELECT doc_id, ${PiiMarkers.map(_._1).mkString(", ")},
       |       md5(red) AS redacted_digest,
       |       CAST(CASE WHEN ${PiiMarkers.map { case (_, p, _) =>
                s"len(regexp_extract_all(red, '$p')) = 0"
              }.mkString(" AND ")}
       |            THEN 1 ELSE 0 END AS BIGINT) AS clean_after
       |FROM r ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) => piiRedactOf(Tables.documents(spark, dir)) }

  /** The [[piiRedact]] plan, extracted for the planted-PII spec. */
  private[graft] def piiRedactOf(docs: DataFrame): DataFrame = {
    val red = PiiMarkers.foldLeft($"text") { case (acc, (_, p, m)) =>
      regexp_replace(acc, p, m) }
    val counts = PiiMarkers.map { case (n, p, _) =>
      size(regexp_extract_all($"text", lit(p), lit(0))).cast("long").as(n) }
    docs.select(($"doc_id" +: counts) :+ red.as("red"): _*)
      .select($"doc_id" +: PiiMarkers.map(m => $"${m._1}") :+
        md5($"red").as("redacted_digest") :+
        PiiMarkers.map { case (_, p, _) =>
          size(regexp_extract_all($"red", lit(p), lit(0))) === 0 }
          .reduce(_ && _).cast("long").as("clean_after"): _*)
      .orderBy($"doc_id")
  }

  /** The corpus QUALITY GATE — the one verdict row per document a
    * pipeline acts on, fusing three independent signal families the
    * engine already computes: the bigram-LM worst-decile perplexity flag
    * ([[PerplexityOps.perplexityOf]] — fluency), the Gopher repetition
    * flag (`llm_repetition` — structure), and the PII flag
    * ([[piiScanOf]] — compliance). `keep` = no flag raised; `n_flags`
    * ranks the drops by severity for triage. Each signal is computed by
    * the SAME plan its standalone query ships (and the oracle replays
    * each family's exact SQL), so the gate can never drift from the
    * per-signal readouts. Missing rows (docs too short for a signal)
    * default to unflagged via left joins. Scale: three already-audited
    * linear pipelines plus (doc_id)-keyed joins of flag columns. */
  val qualityGate: QueryDef = QueryDef(
    "llm_quality_gate",
    PerplexityOps.lmCtes + PerplexityOps.pdCtes +
      s""",
         |pplf AS (SELECT pd.doc_id,
         |                CAST(CASE WHEN CAST(pd.mq AS DOUBLE) <= th.t10 THEN 1 ELSE 0 END AS BIGINT) AS flag_ppl
         |         FROM pd, th),
         |rep AS (SELECT doc_id,
         |               CAST(CASE WHEN top_cnt * 5 > n_ts
         |                           OR (n_tri - n_utri) * 10 > n_tri * 3
         |                         THEN 1 ELSE 0 END AS BIGINT) AS flag_rep
         |        FROM (SELECT doc_id, len(ts) AS n_ts,
         |                     list_max([len(list_filter(ts, x -> x = w)) for w in list_distinct(ts)]) AS top_cnt,
         |                     len([array_to_string(ts[i:i+2], ' ') for i in range(1, len(ts)-1)]) AS n_tri,
         |                     len(list_distinct([array_to_string(ts[i:i+2], ' ') for i in range(1, len(ts)-1)])) AS n_utri
         |              FROM ts WHERE len(ts) >= 3)),
         |pii AS (SELECT doc_id,
         |               CAST(CASE WHEN ${PiiPatterns.map { case (_, p) =>
                            s"len(regexp_extract_all(text, '$p')) > 0"
                          }.mkString(" OR ")}
         |                    THEN 1 ELSE 0 END AS BIGINT) AS flag_pii
         |        FROM documents)
         |SELECT d.doc_id,
         |       coalesce(pplf.flag_ppl, 0) AS flag_ppl,
         |       coalesce(rep.flag_rep, 0) AS flag_rep,
         |       coalesce(pii.flag_pii, 0) AS flag_pii,
         |       coalesce(pplf.flag_ppl, 0) + coalesce(rep.flag_rep, 0)
         |         + coalesce(pii.flag_pii, 0) AS n_flags,
         |       CAST(CASE WHEN coalesce(pplf.flag_ppl, 0) + coalesce(rep.flag_rep, 0)
         |                      + coalesce(pii.flag_pii, 0) = 0
         |                 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM documents d
         |LEFT JOIN pplf ON d.doc_id = pplf.doc_id
         |LEFT JOIN rep ON d.doc_id = rep.doc_id
         |LEFT JOIN pii ON d.doc_id = pii.doc_id
         |ORDER BY d.doc_id""".stripMargin,
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val ppl = PerplexityOps.perplexityOf(docs)
      .select($"doc_id", $"flag_high_ppl".as("flag_ppl"))
    val rep = LlmTextOps.repetition.run(spark, dir)
      .select($"doc_id", $"flagged".as("flag_rep"))
    val pii = piiScanOf(docs).select($"doc_id", $"flag_pii")
    docs.select($"doc_id")
      .join(ppl, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .join(pii, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"flag_ppl", lit(0L)).as("flag_ppl"),
        coalesce($"flag_rep", lit(0L)).as("flag_rep"),
        coalesce($"flag_pii", lit(0L)).as("flag_pii"))
      .withColumn("n_flags", $"flag_ppl" + $"flag_rep" + $"flag_pii")
      .withColumn("keep", ($"n_flags" === 0L).cast("long"))
      .orderBy($"doc_id")
  }

  /** Per-domain sampling boost in 1e-6 fixed point — [[domainMix]]'s
    * `boost` column before its display rounding, kept integer so the
    * resample decision below is exact integer arithmetic cross-engine. */
  private[graft] def domainBoostsE6(docs: DataFrame): DataFrame = {
    val nd = docs.groupBy($"lang")
      .agg(sum(size(split($"text", " "))).as("n_toks"))
    val tot = nd.agg(sum($"n_toks").as("n_total"))
    val qd = nd.crossJoin(broadcast(tot))
      .select($"lang",
        ($"n_toks".cast("double") / $"n_total").as("p"),
        round(round(pow($"n_toks".cast("double") / $"n_total", Alpha), 6) * 1000000)
          .cast("long").as("qq"))
    val sq = qd.agg(sum($"qq").as("sqq"))
    qd.crossJoin(broadcast(sq))
      .select($"lang",
        round(($"qq".cast("double") / $"sqq") / $"p" * 1000000)
          .cast("long").as("boost_e6"))
  }

  /** APPLY the α-temperature mixture: the deterministic resample a data
    * loader runs from [[domainMix]]'s weights. Each document's copy count
    * follows its domain's boost b in one integer rule —
    * `n_copies = ⌊b⌋ + (hash(doc_id) mod 1e6 < frac(b)·1e6)` — which
    * handles down-sampling (b < 1: keep with probability b) and
    * up-sampling (b > 1: ⌊b⌋ copies plus a stochastic extra) uniformly,
    * with NO random seed: the hash-uniform is a pure function of doc_id,
    * so every executor, every rerun, and the oracle agree row-for-row.
    * Output is the sampled manifest (dropped docs vanish, duplicated docs
    * carry their multiplicity).
    *
    * Scale shape: the boost table is one row per domain — broadcast onto
    * a map-only scan; no shuffle at all beyond [[domainMix]]'s tiny
    * domain aggregate. This is the op a 100 TB loader actually executes
    * every epoch, so it must cost one pass — and does. */
  val mixResample: QueryDef = QueryDef(
    "llm_mix_resample",
    s"""WITH nd AS (SELECT lang, sum(len(string_split(text, ' '))) AS n_toks
       |            FROM documents GROUP BY 1),
       |tot AS (SELECT sum(n_toks) AS n_total FROM nd),
       |qd AS (SELECT lang,
       |              CAST(n_toks AS DOUBLE) / tot.n_total AS p,
       |              CAST(round(round(power(CAST(n_toks AS DOUBLE) / tot.n_total, $Alpha), 6) * 1000000) AS BIGINT) AS qq
       |       FROM nd, tot),
       |sq AS (SELECT sum(qq) AS sqq FROM qd),
       |bt AS (SELECT lang,
       |              CAST(round((CAST(qq AS DOUBLE) / sq.sqq) / p * 1000000) AS BIGINT) AS boost_e6
       |       FROM qd, sq),
       |h AS (SELECT doc_id, lang,
       |             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS hv
       |      FROM documents),
       |m AS (SELECT h.doc_id, h.lang, bt.boost_e6,
       |             CAST(bt.boost_e6 // 1000000
       |                  + CASE WHEN h.hv < bt.boost_e6 % 1000000 THEN 1 ELSE 0 END
       |               AS BIGINT) AS n_copies
       |      FROM h JOIN bt USING (lang))
       |SELECT doc_id, lang, boost_e6, n_copies
       |FROM m WHERE n_copies >= 1 ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) => mixResampleOf(Tables.documents(spark, dir)) }

  /** The [[mixResample]] plan, extracted for the planted-skew spec. */
  private[graft] def mixResampleOf(docs: DataFrame): DataFrame =
    docs.select($"doc_id", $"lang",
        (call_function("md5hash60", $"doc_id".cast("string")) % 1000000L).as("hv"))
      .join(broadcast(domainBoostsE6(docs)), "lang")
      .withColumn("n_copies",
        expr("boost_e6 DIV 1000000")
          + when($"hv" < $"boost_e6" % 1000000L, 1L).otherwise(0L))
      .filter($"n_copies" >= 1)
      .select($"doc_id", $"lang", $"boost_e6", $"n_copies")
      .orderBy($"doc_id")

  /** Largest-remainder (Hamilton) apportionment of a fixed training-token
    * budget across (lang, source) domains, proportional to available
    * tokens — the integer allocation step after [[domainMix]] decides the
    * proportions: every domain gets ⌊B·avail/total⌋, and the seats the
    * floors left unfilled go to the largest integer REMAINDERS
    * (B·avail mod total), so the allocations sum to exactly B with no
    * domain off by more than one token.
    *
    * Shape: domain-keyed aggregate (bounded by domain count, not corpus
    * size), scalar-total broadcast, then the remainder ranking over the
    * ~|domains| rows via [[graft.ops.ParallelRank.withGlobalRank]] —
    * already tiny, but ranked partition-parallel anyway so no
    * unpartitioned window appears in any plan.
    *
    * Determinism: pure integer arithmetic end-to-end (DIV / mod, no
    * floats anywhere), remainder ties broken by (lang, source). BIGINT
    * holds B·avail up to ~9e18; past that the product needs the decimal
    * accumulator discipline. */
  val tokenBudget: QueryDef = QueryDef(
    "llm_token_budget",
    """WITH d AS (SELECT lang, source,
      |                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
      |           FROM documents GROUP BY 1, 2),
      |t AS (SELECT CAST(sum(avail) AS BIGINT) AS total FROM d),
      |q AS (SELECT lang, source, avail,
      |             CAST((100000 * avail) // t.total AS BIGINT) AS base,
      |             CAST((100000 * avail) % t.total AS BIGINT) AS rem
      |      FROM d, t),
      |l AS (SELECT CAST(100000 - sum(base) AS BIGINT) AS leftover FROM q),
      |r AS (SELECT lang, source, avail, base, rem,
      |             row_number() OVER (ORDER BY rem DESC, lang, source) AS rk
      |      FROM q)
      |SELECT r.lang, r.source, r.avail,
      |       CAST(r.base + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT)
      |         AS budget_toks
      |FROM r, l ORDER BY r.lang, r.source""".stripMargin,
  ) { (spark, dir) =>
    val d = Tables.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(sum(size(split($"text", " ")).cast("long")).as("avail"))
    val t = d.agg(sum($"avail").as("total"))
    val q = d.crossJoin(broadcast(t))
      .select($"lang", $"source", $"avail",
        expr("(100000L * avail) DIV total").as("base"),
        expr("(100000L * avail) % total").as("rem"))
    val l = q.agg((lit(100000L) - sum($"base")).as("leftover"))
    // |domains| rows, but ranked partition-parallel anyway so the sweep
    // invariant (zero unpartitioned windows in src/main outside documented
    // bounded sites) holds without an exemption here.
    val r = ParallelRank.withGlobalRank(q,
      Seq($"rem".desc, $"lang", $"source"), "rk")
    r.crossJoin(broadcast(l))
      .select($"lang", $"source", $"avail",
        ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L)).as("budget_toks"))
      .orderBy($"lang", $"source")
  }

  val all: Seq[QueryDef] = Seq(domainMix, domainKl, piiScan, piiRedact,
    qualityGate, mixResample, tokenBudget)
}
