package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Corpus CURATION filters the earlier llm lanes don't cover: the Gopher
  * repetition rules and benchmark decontamination. Driver north-star
  * extensions; no reference-repo counterpart (the reference's closest
  * surface is plain WHERE filtering, e.g. `redis_client.py` searches).
  *
  * - REPETITION (Rae et al. 2021, "Scaling Language Models: ... Gopher",
  *   appendix A1.1): excessively repetitive documents are a quality
  *   signal orthogonal to length/stopword heuristics (`llm_quality_gate`)
  *   and to cross-doc dedup — a doc can be unique corpus-wide yet be 40
  *   copies of one phrase. Gopher phrases its rules over lines and
  *   character fractions; this corpus is single-line whitespace-tokenized
  *   text, so the rules are expressed word-level (duplicate-word fraction,
  *   top-bigram fraction, duplicate-bigram fraction) — same signals, the
  *   corpus's natural unit.
  *
  * - DECONTAMINATION (Brown et al. 2020 GPT-3 §4 / Chowdhery et al. 2022
  *   PaLM §6.1 convention): before training, remove corpus documents that
  *   share a long n-gram with the evaluation set, else benchmark numbers
  *   measure memorization. Eval membership here is the deterministic
  *   `doc_id % EvalMod = 0` slice (the driver data ships no separate
  *   benchmark table); the overlap unit is the distinct 8-word shingle,
  *   inside the published 8–13-gram band.
  *
  * Scale shapes:
  *  - repetition is one per-doc array expansion → (doc_id, bigram)-keyed
  *    count → per-doc rollup; no join touches two big sides, nothing
  *    leaves its doc partition except doc-keyed aggregates.
  *  - decontamination joins the corpus shingle stream against the EVAL
  *    side only — benchmarks are KBs against a 100 TB corpus, so the eval
  *    shingle set is broadcast and the corpus is never shuffled at all;
  *    the per-(train, shingle) dedup and per-doc rollup key on doc_id.
  *    Shingles travel as 60-bit digests, never as text.
  *
  * Cross-engine determinism: every emitted fraction is a ratio of exact
  *   counts rounded to 6 dp for display; thresholds compare INTEGER
  *   cross-products (`top_n * 5 >= n_bigrams`), never rounded floats, so
  *   a boundary doc cannot flip its flag between engines.
  */
object CurationOps {

  /** Gopher-style flag thresholds, as exact rationals: top bigram covers
    * ≥ 1/5 of all bigram slots (Gopher's 0.20 top-2-gram bound), or ≥ 1/2
    * of bigram slots hold a bigram that occurs more than once. */
  private val TopFracNum = 1
  private val TopFracDen = 5
  private val DupFracNum = 1
  private val DupFracDen = 2

  /** Eval-set slice: `doc_id % EvalMod = 0` plays the benchmark. */
  private val EvalMod = 25

  /** Decontamination n-gram width (words). */
  private val NGram = 8

  private def tokens: Column = split($"text", " ")

  /** Adjacent-word bigram stream `(doc_id, w1, w2)` — docs with < 2
    * tokens have no bigrams and drop out (the repetition rules are
    * vacuous for them). */
  private def bigramsOf(docs: DataFrame): DataFrame =
    docs.select($"doc_id", tokens.as("ts"))
      .filter(size($"ts") >= 2)
      .select($"doc_id",
        explode(transform(sequence(lit(1), size($"ts") - 1),
          i => struct(element_at($"ts", i).as("w1"),
            element_at($"ts", i + 1).as("w2")))).as("b"))
      .select($"doc_id", $"b".getField("w1").as("w1"),
        $"b".getField("w2").as("w2"))

  /** The repetition readout over any (doc_id, text) frame — extracted so
    * the spec can run a planted "a b a b a b" fixture through the real
    * plan. */
  private[graft] def repetitionOf(docs: DataFrame): DataFrame = {
    val uni = docs.select($"doc_id", tokens.as("ts"))
      .filter(size($"ts") >= 2)
      .select($"doc_id", size($"ts").cast("long").as("n_words"),
        size(array_distinct($"ts")).cast("long").as("n_distinct_words"))
    val bc = bigramsOf(docs).groupBy($"doc_id", $"w1", $"w2")
      .agg(count(lit(1)).as("c"))
    // top bigram per doc: highest count, ties to the lexicographically
    // smallest (w1, w2) — a total order, so both engines pick the same row
    val top = bc.withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id")
          .orderBy($"c".desc, $"w1".asc, $"w2".asc)))
      .filter($"rk" === 1)
      .select($"doc_id", concat_ws(" ", $"w1", $"w2").as("top_bigram"),
        $"c".as("top_n"))
    val agg = bc.groupBy($"doc_id")
      .agg(sum($"c").as("n_bigrams"),
        sum(when($"c" > 1, $"c").otherwise(lit(0L))).as("dup_n"))
    uni.join(agg, "doc_id").join(top, "doc_id")
      .select($"doc_id", $"n_words", $"n_distinct_words",
        round(lit(1.0) - $"n_distinct_words".cast("double") / $"n_words", 6)
          .as("dup_word_frac"),
        $"n_bigrams", $"top_bigram", $"top_n",
        round($"top_n".cast("double") / $"n_bigrams", 6).as("top_bigram_frac"),
        round($"dup_n".cast("double") / $"n_bigrams", 6).as("dup_bigram_frac"),
        ($"top_n" * TopFracDen >= $"n_bigrams" * TopFracNum ||
          $"dup_n" * DupFracDen >= $"n_bigrams" * DupFracNum)
          .cast("long").as("flag_repetitive"))
      .orderBy($"doc_id")
  }

  /** Per-doc repetition profile + flag (Gopher A1.1, word-level). */
  val repetition: QueryDef = QueryDef(
    "llm_gopher_repetition",
    s"""WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |uni AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_words,
       |               CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct_words
       |        FROM ts WHERE len(ts) >= 2),
       |bi AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
       |       FROM ts, unnest(range(1, len(ts))) AS t(i)
       |       WHERE len(ts) >= 2),
       |bc AS (SELECT doc_id, w1, w2, count(*) AS c FROM bi GROUP BY 1, 2, 3),
       |top AS (SELECT doc_id, w1 || ' ' || w2 AS top_bigram, c AS top_n
       |        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |                          ORDER BY c DESC, w1 ASC, w2 ASC) AS rk FROM bc)
       |        WHERE rk = 1),
       |ag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |              CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_n
       |       FROM bc GROUP BY 1)
       |SELECT uni.doc_id, uni.n_words, uni.n_distinct_words,
       |       round(1.0 - CAST(uni.n_distinct_words AS DOUBLE) / uni.n_words, 6) AS dup_word_frac,
       |       ag.n_bigrams, top.top_bigram, top.top_n,
       |       round(CAST(top.top_n AS DOUBLE) / ag.n_bigrams, 6) AS top_bigram_frac,
       |       round(CAST(ag.dup_n AS DOUBLE) / ag.n_bigrams, 6) AS dup_bigram_frac,
       |       CAST(CASE WHEN top.top_n * $TopFracDen >= ag.n_bigrams * $TopFracNum
       |                   OR ag.dup_n * $DupFracDen >= ag.n_bigrams * $DupFracNum
       |                 THEN 1 ELSE 0 END AS BIGINT) AS flag_repetitive
       |FROM uni JOIN ag USING (doc_id) JOIN top USING (doc_id)
       |ORDER BY uni.doc_id""".stripMargin,
  ) { (spark, dir) => repetitionOf(Tables.documents(spark, dir)) }

  /** Distinct [[NGram]]-word shingle digests `(doc_id, h)` of any
    * (doc_id, text) frame; docs shorter than [[NGram]] words have none. */
  private def ngramHashesOf(docs: DataFrame): DataFrame =
    docs.select($"doc_id", tokens.as("ts"))
      .filter(size($"ts") >= NGram)
      .select($"doc_id", explode(array_distinct(
        transform(sequence(lit(0), size($"ts") - NGram),
          i => call_function("md5hash60",
            concat_ws(" ", slice($"ts", i + 1, lit(NGram))))))).as("h"))

  /** The decontamination readout — extracted for the planted-overlap
    * spec. */
  private[graft] def decontaminateOf(docs: DataFrame): DataFrame = {
    val train = docs.filter($"doc_id" % EvalMod =!= 0)
    val eval = docs.filter($"doc_id" % EvalMod === 0)
    val hits = ngramHashesOf(train)
      .join(broadcast(ngramHashesOf(eval)
        .select($"doc_id".as("eval_id"), $"h")), Seq("h"))
      .groupBy($"doc_id")
      .agg(countDistinct($"h").as("n_hits"),
        countDistinct($"eval_id").as("n_eval_docs"))
    train.select($"doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_hits", lit(0L)).as("n_hits"),
        coalesce($"n_eval_docs", lit(0L)).as("n_eval_docs"),
        (coalesce($"n_hits", lit(0L)) > 0).cast("long").as("contaminated"))
      .orderBy($"doc_id")
  }

  /** Per-training-doc benchmark-overlap readout: distinct shared 8-gram
    * count, eval docs touched, and the drop flag. */
  val decontaminate: QueryDef = QueryDef(
    "llm_decontaminate",
    s"""WITH ts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |sh AS (SELECT doc_id,
       |              unnest(list_distinct([('0x' || substr(md5(array_to_string(ts[i:i+${NGram - 1}], ' ')), 1, 15))::BIGINT
       |                                    for i in range(1, len(ts) - ${NGram - 2})])) AS h
       |       FROM ts WHERE len(ts) >= $NGram),
       |ev AS (SELECT doc_id AS eval_id, h FROM sh WHERE doc_id % $EvalMod = 0),
       |tr AS (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0),
       |hits AS (SELECT tr.doc_id, count(DISTINCT tr.h) AS n_hits,
       |                count(DISTINCT ev.eval_id) AS n_eval_docs
       |         FROM tr JOIN ev USING (h) GROUP BY 1)
       |SELECT d.doc_id, coalesce(hits.n_hits, 0) AS n_hits,
       |       coalesce(hits.n_eval_docs, 0) AS n_eval_docs,
       |       CAST(CASE WHEN coalesce(hits.n_hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
       |FROM (SELECT doc_id FROM documents WHERE doc_id % $EvalMod <> 0) d
       |LEFT JOIN hits USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin,
  ) { (spark, dir) => decontaminateOf(Tables.documents(spark, dir)) }

  val all: Seq[QueryDef] = Seq(repetition, decontaminate)
}
