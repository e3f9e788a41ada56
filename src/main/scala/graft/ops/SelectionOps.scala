package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Training-data SELECTION and pairwise-overlap EVALUATION — the two
  * readouts a curation pipeline runs after dedup/quality gating to decide
  * WHICH surviving documents to train on. Driver north-star extensions; no
  * reference-repo counterpart (the reference's closest surface is plain
  * filtered SELECTs).
  *
  * - DSIR (Xie et al. 2023, "Data Selection for Language Models via
  *   Importance Resampling"): score every raw-pool document by the
  *   log-likelihood ratio of a TARGET-domain hashed-unigram LM against the
  *   RAW-pool LM, then keep the top-k. Features are hashed n-gram buckets
  *   exactly as published (collisions are part of the method, not a bug).
  *   The target slice here is one source (`source = 'src1'`) playing the
  *   high-quality corpus, the rest of `documents` playing the raw pool.
  *
  * - ROUGE-style n-gram overlap (Lin 2004): clipped-count unigram and
  *   bigram precision/recall/F1 per near-duplicate pair — the eval that
  *   quantifies HOW MUCH two flagged documents overlap, where the dedup
  *   lanes only report THAT they do. Pairs come from the same exact
  *   Jaccard-0.8 similarity join the dedup lanes verify against
  *   ([[LlmTextOps.neardupPlan]]), so this rides on an already
  *   hash-verified candidate set.
  *
  * Scale shapes:
  *  - DSIR: both LMs are B-bucket aggregates (B = [[DsirBuckets]], fixed)
  *    — the learned state is B rows no matter the corpus size, broadcast
  *    back onto the token stream; the only corpus-sized shuffle keys on
  *    doc_id for the per-doc sum. Selection is one window over the scored
  *    docs (rank on the quantized weight).
  *  - ROUGE: token/bigram count tables are (doc, gram)-keyed; the pair
  *    scoring joins candidate pairs (dedup OUTPUT, orders of magnitude
  *    smaller than the corpus) to those tables gram-by-gram — never a
  *    corpus×corpus product.
  *
  * Cross-engine determinism: the per-bucket log-ratio argument is a ratio
  * of exact integer counts (identical in both engines), rounded to 6 dp
  * and then 1e-6-quantized to a BIGINT (the `PerplexityOps` double-round
  * convention — the 6-dp round aligns the value on the quantum, so the
  * scale-to-integer round is exact); per-doc sums add those BIGINTs, so
  * accumulation order can't flip a hash. ROUGE ratios divide exact integer
  * overlaps, rounded 6 dp.
  */
object SelectionOps {

  /** Hashed-feature bucket count (Xie et al. use 10⁴ for unigram+bigram
    * features at web scale; 256 keeps the broadcast LM tiny while still
    * exercising collisions on this corpus's vocabulary). */
  private val DsirBuckets = 256

  /** Target-domain slice: this source plays the high-quality corpus. */
  private val DsirTarget = "src1"

  /** Documents kept by the selection step. */
  private val SelK = 100

  private def tokens: Column = split($"text", " ")

  /** 60-bit portable hash → feature bucket, same digest convention as
    * `LlmTextOps.portableHash` (DuckDB: `('0x'||substr(md5(x),1,15))::BIGINT`). */
  private def bucketOf(c: Column): Column =
    pmod(call_function("md5hash60", c), lit(DsirBuckets.toLong))

  /** DSIR importance scoring + top-[[SelK]] selection over the raw pool.
    *
    * Per bucket b: lr(b) = ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B)) — the
    * add-one-smoothed target/raw log-likelihood ratio (difference form, so
    * no integer product can overflow at corpus-scale counts), quantized
    * once in the B-row LM table. Per doc: the sum of its token instances'
    * quantized ratios; `selected` marks the top-[[SelK]] by (weight,
    * doc_id) — the cut compares BIGINT weights, so the line is
    * integer-exact. */
  val dsirSelect: QueryDef = QueryDef(
    "llm_dsir_select",
    s"""WITH tok AS (SELECT doc_id, source,
       |                    ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15))::BIGINT % $DsirBuckets AS b
       |             FROM documents),
       |tc AS (SELECT b, count(*) AS ct FROM tok WHERE source = '$DsirTarget' GROUP BY b),
       |rc AS (SELECT b, count(*) AS cr FROM tok WHERE source <> '$DsirTarget' GROUP BY b),
       |nt AS (SELECT count(*) AS n FROM tok WHERE source = '$DsirTarget'),
       |nr AS (SELECT count(*) AS n FROM tok WHERE source <> '$DsirTarget'),
       |lm AS (SELECT rc.b,
       |              CAST(round(round(ln(CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE) / (nt.n + $DsirBuckets))
       |                               - ln(CAST(rc.cr + 1 AS DOUBLE) / (nr.n + $DsirBuckets)), 6) * 1000000) AS BIGINT) AS lrq
       |       FROM rc LEFT JOIN tc ON rc.b = tc.b, nt, nr),
       |sc AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |              sum(lm.lrq) AS wq
       |       FROM tok t JOIN lm ON t.b = lm.b
       |       WHERE t.source <> '$DsirTarget'
       |       GROUP BY t.doc_id),
       |rk AS (SELECT doc_id, n_tokens, wq,
       |              row_number() OVER (ORDER BY wq DESC, doc_id) AS r
       |       FROM sc)
       |SELECT doc_id, n_tokens,
       |       round(CAST(wq AS DOUBLE) / 1000000.0, 6) AS dsir_logratio,
       |       CAST(CASE WHEN r <= $SelK THEN 1 ELSE 0 END AS BIGINT) AS selected
       |FROM rk ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) => dsirSelectOf(Tables.documents(spark, dir)) }

  /** [[dsirSelect]] over any (doc_id, text, source) frame — fixture seam
    * for the planted-target-vocabulary spec. */
  private[graft] def dsirSelectOf(docs: DataFrame): DataFrame = {
    val tok = docs
      .select($"doc_id", $"source", explode(tokens).as("w"))
      .select($"doc_id", $"source", bucketOf($"w").as("b"))
    val tc = tok.filter($"source" === DsirTarget)
      .groupBy($"b").agg(count(lit(1)).as("ct"))
    val rc = tok.filter($"source" =!= DsirTarget)
      .groupBy($"b").agg(count(lit(1)).as("cr"))
    val nt = tok.filter($"source" === DsirTarget).agg(count(lit(1)).as("nt"))
    val nr = tok.filter($"source" =!= DsirTarget).agg(count(lit(1)).as("nr"))
    // B-row learned state: smoothed log-likelihood ratio per bucket,
    // 6-dp-rounded then 1e-6-quantized (see object doc) — broadcast below.
    val lm = rc.join(tc, Seq("b"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select($"b",
        round(round(log((coalesce($"ct", lit(0L)) + 1).cast("double") / ($"nt" + DsirBuckets))
          - log(($"cr" + 1).cast("double") / ($"nr" + DsirBuckets)), 6) * 1000000)
          .cast("long").as("lrq"))
    val scored = graft.Caches.persist(
      tok.filter($"source" =!= DsirTarget)
        .join(broadcast(lm), "b")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum($"lrq").as("wq")))
    // Selection WITHOUT a global window (which would single-partition the
    // corpus): the boundary (wq, doc_id) pair is the last row of a
    // TakeOrderedAndProject top-K — K·partitions rows ever leave the
    // executors — broadcast back as a scalar cut. struct-min picks the
    // smallest wq, ties to the LARGEST doc_id: exactly the K-th row of
    // (wq DESC, doc_id ASC).
    val cut = scored.orderBy($"wq".desc, $"doc_id".asc).limit(SelK)
      .agg(min(struct($"wq", (-$"doc_id").as("nid"))).as("c"))
      .select($"c.wq".as("cut_wq"), (-$"c.nid").as("cut_id"))
    scored.crossJoin(broadcast(cut))
      .select($"doc_id", $"n_tokens",
        round($"wq".cast("double") / 1000000.0, 6).as("dsir_logratio"),
        ($"wq" > $"cut_wq" || ($"wq" === $"cut_wq" && $"doc_id" <= $"cut_id"))
          .cast("long").as("selected"))
      .orderBy($"doc_id")
  }

  /** Clipped-count n-gram overlap (ROUGE-N, Lin 2004) for every exact
    * Jaccard-0.8 near-dup pair: per pair, overlap = Σ_g min(count_a(g),
    * count_b(g)) over unigrams and bigrams, with recall against doc_a,
    * precision against doc_b, and F1 = 2·ov/(n_a+n_b) — every ratio a
    * division of exact integers. */
  val rougePairs: QueryDef = QueryDef(
    "llm_rouge_pairs",
    LlmTextOps.shingleCte +
      s"""
         |, pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |         WHERE len(list_intersect(a.s, b.s)) * 5
         |               >= (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) * 4),
         |tk AS (SELECT doc_id, ts,
         |              [array_to_string(ts[i:i+1], ' ') for i in range(1, len(ts))] AS bg
         |       FROM toks),
         |sc AS (SELECT p.doc_a, p.doc_b,
         |              CAST(len(a.ts) AS BIGINT) AS n_a, CAST(len(b.ts) AS BIGINT) AS n_b,
         |              CAST(list_sum([least(len(list_filter(a.ts, x -> x = w)),
         |                                   len(list_filter(b.ts, x -> x = w)))
         |                             for w in list_distinct(a.ts)]) AS BIGINT) AS r1_overlap,
         |              CAST(list_sum([least(len(list_filter(a.bg, x -> x = g)),
         |                                   len(list_filter(b.bg, x -> x = g)))
         |                             for g in list_distinct(a.bg)]) AS BIGINT) AS r2_overlap
         |       FROM pr p JOIN tk a ON p.doc_a = a.doc_id
         |                 JOIN tk b ON p.doc_b = b.doc_id)
         |SELECT doc_a, doc_b, n_a, n_b, r1_overlap,
         |       round(CAST(r1_overlap AS DOUBLE) / n_b, 6) AS r1_p,
         |       round(CAST(r1_overlap AS DOUBLE) / n_a, 6) AS r1_r,
         |       round(2.0 * r1_overlap / (n_a + n_b), 6) AS r1_f,
         |       r2_overlap,
         |       round(CAST(r2_overlap AS DOUBLE) / (n_b - 1), 6) AS r2_p,
         |       round(CAST(r2_overlap AS DOUBLE) / (n_a - 1), 6) AS r2_r,
         |       round(2.0 * r2_overlap / (n_a + n_b - 2), 6) AS r2_f
         |FROM sc ORDER BY doc_a, doc_b""".stripMargin,
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    rougePairsOf(
      LlmTextOps.neardupPlan(LlmTextOps.docShinglesOf(docs))
        .select($"doc_a", $"doc_b"),
      docs)
  }

  /** [[rougePairs]] scoring over any (doc_a, doc_b) pair frame and
    * (doc_id, text) doc frame — fixture seam. Relational form: (doc, gram)
    * count tables joined pair-by-gram, so the work is keyed on the pair
    * list (dedup output), never all-pairs. */
  private[graft] def rougePairsOf(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val tk = docs.select($"doc_id", tokens.as("ts"))
    val uniC = tk.select($"doc_id", explode($"ts").as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
    val bigC = tk
      .select($"doc_id", explode(transform(sequence(lit(0), size($"ts") - 2),
        i => concat_ws(" ", slice($"ts", i + 1, lit(2))))).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
    val lens = tk.select($"doc_id", size($"ts").cast("long").as("n"))

    def overlap(counts: DataFrame, out: String): DataFrame =
      pairs
        .join(counts.select($"doc_id".as("doc_a"), $"g", $"c".as("ca")), "doc_a")
        .join(counts.select($"doc_id".as("doc_b"), $"g", $"c".as("cb")),
          Seq("doc_b", "g"))
        .groupBy($"doc_a", $"doc_b")
        .agg(sum(least($"ca", $"cb")).as(out))

    pairs
      .join(lens.select($"doc_id".as("doc_a"), $"n".as("n_a")), "doc_a")
      .join(lens.select($"doc_id".as("doc_b"), $"n".as("n_b")), "doc_b")
      .join(overlap(uniC, "r1_overlap"), Seq("doc_a", "doc_b"), "left")
      .join(overlap(bigC, "r2_overlap"), Seq("doc_a", "doc_b"), "left")
      .select($"doc_a", $"doc_b", $"n_a", $"n_b",
        coalesce($"r1_overlap", lit(0L)).as("r1_overlap"),
        round(coalesce($"r1_overlap", lit(0L)).cast("double") / $"n_b", 6).as("r1_p"),
        round(coalesce($"r1_overlap", lit(0L)).cast("double") / $"n_a", 6).as("r1_r"),
        round(lit(2.0) * coalesce($"r1_overlap", lit(0L)) / ($"n_a" + $"n_b"), 6).as("r1_f"),
        coalesce($"r2_overlap", lit(0L)).as("r2_overlap"),
        round(coalesce($"r2_overlap", lit(0L)).cast("double") / ($"n_b" - 1), 6).as("r2_p"),
        round(coalesce($"r2_overlap", lit(0L)).cast("double") / ($"n_a" - 1), 6).as("r2_r"),
        round(lit(2.0) * coalesce($"r2_overlap", lit(0L)) / ($"n_a" + $"n_b" - 2), 6).as("r2_f"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** EXACT longest common substring (in tokens) for every near-dup pair —
    * the contiguity readout completing the pair-eval picture next to
    * [[rougePairs]] (bag-of-grams overlap says HOW MUCH is shared;
    * this says the longest HOW-CONTIGUOUS run, i.e. verbatim quotation vs
    * scattered phrase reuse). Computed by the diagonal-run identity from
    * local alignment: a shared token run of length R ≥ 5 is exactly a
    * maximal run of R−4 consecutive shared-5-gram matches on one
    * alignment diagonal d = pos_a − pos_b, so LCS = 4 + the longest
    * consecutive-ia island per (pair, d) — an islands window, never a
    * quadratic token DP. Matching is on the portable 60-bit gram hash,
    * identical in the oracle, so collisions (≈ 2⁻⁶⁰) cannot cause a
    * cross-engine mismatch. Runs shorter than 5 tokens report 0 — the
    * gram floor is the minimum meaningful quotation, matching the
    * [[LlmTextOps.dupSpans]] granularity. Ties (equal length) resolve to
    * the smallest (start_a, start_b).
    *
    * Scale shape: gram emission is map-only; the match join is keyed on
    * (pair, gram hash) against the dedup OUTPUT pair list — never
    * corpus×corpus; the islands window partitions by (pair, diagonal),
    * bounded by the shorter document, never corpus-sized. */
  val lcsPairs: QueryDef = QueryDef(
    "llm_lcs_pairs",
    LlmTextOps.shingleCte +
      """
        |, pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |         WHERE len(list_intersect(a.s, b.s)) * 5
        |               >= (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) * 4),
        |g AS (SELECT doc_id, i,
        |             ('0x' || substr(md5(array_to_string(ts[i:i+4], ' ')), 1, 15))::BIGINT AS h
        |      FROM toks, unnest(range(1, len(ts) - 3)) AS t(i)
        |      WHERE len(ts) >= 5),
        |m AS (SELECT p.doc_a, p.doc_b, a.i AS ia, b.i AS ib, a.i - b.i AS d
        |      FROM pr p JOIN g a ON a.doc_id = p.doc_a
        |                JOIN g b ON b.doc_id = p.doc_b AND b.h = a.h),
        |r AS (SELECT doc_a, doc_b, d, ia, ib,
        |             CASE WHEN ia - lag(ia) OVER (PARTITION BY doc_a, doc_b, d
        |                                          ORDER BY ia) = 1
        |                  THEN 0 ELSE 1 END AS nr
        |      FROM m),
        |r2 AS (SELECT doc_a, doc_b, d, ia, ib,
        |              sum(nr) OVER (PARTITION BY doc_a, doc_b, d ORDER BY ia) AS rid
        |       FROM r),
        |runs AS (SELECT doc_a, doc_b, d, rid,
        |                min(ia) AS sa, min(ib) AS sb, count(*) AS c
        |         FROM r2 GROUP BY 1, 2, 3, 4),
        |best AS (SELECT doc_a, doc_b, c + 4 AS lcs_len, sa FROM (
        |           SELECT doc_a, doc_b, c, sa, sb,
        |                  row_number() OVER (PARTITION BY doc_a, doc_b
        |                                     ORDER BY c DESC, sa, sb) AS rk
        |           FROM runs) WHERE rk = 1),
        |ln AS (SELECT doc_id, len(ts) AS n FROM toks)
        |SELECT p.doc_a, p.doc_b,
        |       CAST(la.n AS BIGINT) AS n_a, CAST(lb.n AS BIGINT) AS n_b,
        |       CAST(coalesce(b.lcs_len, 0) AS BIGINT) AS lcs_len,
        |       coalesce(array_to_string(list_slice(ta.ts, b.sa, b.sa + b.lcs_len - 1), ' '), '') AS lcs_text,
        |       round(coalesce(b.lcs_len, 0) / least(la.n, lb.n), 6) AS lcs_frac
        |FROM pr p
        |JOIN ln la ON la.doc_id = p.doc_a
        |JOIN ln lb ON lb.doc_id = p.doc_b
        |JOIN toks ta ON ta.doc_id = p.doc_a
        |LEFT JOIN best b ON b.doc_a = p.doc_a AND b.doc_b = p.doc_b
        |ORDER BY p.doc_a, p.doc_b""".stripMargin,
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    lcsPairsOf(
      LlmTextOps.neardupPlan(LlmTextOps.docShinglesOf(docs))
        .select($"doc_a", $"doc_b"),
      docs)
  }

  /** [[lcsPairs]] over any (doc_a, doc_b) pair frame and (doc_id, text)
    * doc frame — fixture seam. */
  private[graft] def lcsPairsOf(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val tk = docs.select($"doc_id", tokens.as("ts"))
    val grams = tk.filter(size($"ts") >= 5)
      .select($"doc_id", explode(transform(sequence(lit(1), size($"ts") - 4),
        i => struct(i.as("i"),
          call_function("md5hash60", concat_ws(" ", slice($"ts", i, lit(5))))
            .as("h")))).as("g"))
      .select($"doc_id", $"g.i".as("i"), $"g.h".as("h"))
    val m = pairs
      .join(grams.select($"doc_id".as("doc_a"), $"i".as("ia"), $"h"), "doc_a")
      .join(grams.select($"doc_id".as("doc_b"), $"i".as("ib"), $"h"),
        Seq("doc_b", "h"))
      .withColumn("d", $"ia" - $"ib")
    val w = Window.partitionBy($"doc_a", $"doc_b", $"d").orderBy($"ia")
    val runs = m
      .withColumn("nr",
        when($"ia" - lag($"ia", 1).over(w) === 1, 0L).otherwise(1L))
      .withColumn("rid", sum($"nr").over(w))
      .groupBy($"doc_a", $"doc_b", $"d", $"rid")
      .agg(min($"ia").as("sa"), min($"ib").as("sb"), count(lit(1)).as("c"))
    val best = runs
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_a", $"doc_b").orderBy($"c".desc, $"sa", $"sb")))
      .filter($"rk" === 1)
      .select($"doc_a", $"doc_b", ($"c" + 4L).as("lcs_len"), $"sa")
    val lens = tk.select($"doc_id", size($"ts").cast("long").as("n"))
    pairs
      .join(lens.select($"doc_id".as("doc_a"), $"n".as("n_a")), "doc_a")
      .join(lens.select($"doc_id".as("doc_b"), $"n".as("n_b")), "doc_b")
      .join(tk.select($"doc_id".as("doc_a"), $"ts"), "doc_a")
      .join(best, Seq("doc_a", "doc_b"), "left")
      .select($"doc_a", $"doc_b", $"n_a", $"n_b",
        coalesce($"lcs_len", lit(0L)).as("lcs_len"),
        coalesce(concat_ws(" ", slice($"ts", $"sa", $"lcs_len")), lit(""))
          .as("lcs_text"),
        round(coalesce($"lcs_len", lit(0L)).cast("double")
          / least($"n_a", $"n_b"), 6).as("lcs_frac"))
      .orderBy($"doc_a", $"doc_b")
  }

  val all: Seq[QueryDef] = Seq(dsirSelect, rougePairs, lcsPairs)
}
