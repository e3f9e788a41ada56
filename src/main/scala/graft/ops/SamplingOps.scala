package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Deterministic sampling for training-data pipelines — the reproducible
  * alternative to `rand()` at corpus scale. Every operator keys its
  * keep/drop decision on the portable 60-bit hash of the document id
  * ([[graft.functions.Md5Hash60]], DuckDB-replayable), so:
  *
  *  - the sample is STABLE: re-running over 100 TB, adding partitions, or
  *    changing parallelism yields byte-identical membership (a `rand()`
  *    sample is unrepeatable and breaks the correctness oracle);
  *  - membership is a pure per-row predicate — no shuffle, no state, fully
  *    pushed into the scan's partition-parallel filter;
  *  - train/validation/test assignment is a total function of the key, so
  *    the splits are provably disjoint and exhaustive, and any later join
  *    against the same corpus re-derives membership instead of storing it.
  *
  * The hash-order ORDER BY doubles as the pipeline's deterministic global
  * shuffle: sorting by `h` is an unbiased, reproducible permutation of the
  * corpus (what a training job wants instead of `ORDER BY rand()`).
  */
object SamplingOps {

  /** Portable hash of the document key — the sampling coin. */
  private def docHash = call_function("md5hash60", $"doc_id".cast("string"))
  private val docHashSql = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"

  /** 10% Bernoulli sample by hash residue, emitted in hash order — the
    * deterministic sample + shuffle in one pass. */
  val sampleHash: QueryDef = QueryDef(
    "llm_sample_hash",
    s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
       |FROM documents
       |WHERE $docHashSql % 10 = 0
       |ORDER BY $docHashSql, doc_id""".stripMargin,
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .filter(docHash % 10 === 0)
      .orderBy(docHash, $"doc_id")
      .select($"doc_id", length($"text").cast("long").as("n_chars"))
  }

  /** Stratified sample: at most 20 docs per length-bucket stratum, chosen
    * by hash order — per-stratum quotas without a global sort (one shuffle
    * keyed on the stratum, `row_number` inside). */
  val sampleStratified: QueryDef = QueryDef(
    "llm_sample_stratified",
    s"""SELECT bucket, doc_id FROM (
       |  SELECT length(text) // 100 AS bucket, doc_id,
       |         row_number() OVER (PARTITION BY length(text) // 100
       |                            ORDER BY $docHashSql, doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= 20 ORDER BY bucket, doc_id""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, dir)
      .select((length($"text") / 100).cast("long").as("bucket"), $"doc_id",
        docHash.as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"bucket").orderBy($"h", $"doc_id")))
      .filter($"rn" <= 20)
      .select($"bucket", $"doc_id")
      .orderBy($"bucket", $"doc_id")
  }

  /** 80/10/10 train/validation/test split as a total function of the key:
    * per-split row count plus a membership checksum (sum of doc_ids mod a
    * prime) proving the assignment, not just the sizes, matches. */
  val trainSplit: QueryDef = QueryDef(
    "llm_train_split",
    s"""SELECT CASE WHEN $docHashSql % 10 < 8 THEN 'train'
       |            WHEN $docHashSql % 10 = 8 THEN 'valid'
       |            ELSE 'test' END AS split,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(doc_id) % 1000000007 AS BIGINT) AS member_sum
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select($"doc_id",
        when(docHash % 10 < 8, "train")
          .when(docHash % 10 === 8, "valid")
          .otherwise("test").as("split"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        (sum($"doc_id") % 1000000007L).cast("long").as("member_sum"))
      .orderBy($"split")
  }

  /** A/B experiment readout: variant assignment is the portable hash of
    * the user id mod 2 — the industry-standard deterministic bucketing
    * (same user always lands in the same arm, at any parallelism, with no
    * assignment table to store or join) — and conversion is "has any
    * purchase event". Distinct-user and converted-user sets are user-keyed
    * dedups; the readout is a 2-row aggregate. The conversion rate is one
    * identical division of exact counts on both engines. */
  val abConversion: QueryDef = QueryDef(
    "ab_conversion",
    """WITH v AS (SELECT DISTINCT user_id,
      |                  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS variant
      |           FROM events),
      |conv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT v.variant, CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(count(conv.user_id) AS BIGINT) AS n_converted,
      |       round(CAST(count(conv.user_id) AS DOUBLE) / count(*), 6) AS conv_rate
      |FROM v LEFT JOIN conv ON v.user_id = conv.user_id
      |GROUP BY v.variant ORDER BY v.variant""".stripMargin,
  ) { (spark, dir) =>
    val events = Tables.events(spark, dir)
    val v = events.select($"user_id").distinct()
      .select($"user_id",
        (call_function("md5hash60", $"user_id".cast("string")) % 2).as("variant"))
    val conv = events.filter($"event_type" === "purchase")
      .select($"user_id".as("conv_user")).distinct()
    v.join(conv, $"user_id" === $"conv_user", "left")
      .groupBy($"variant")
      .agg(count(lit(1)).as("n_users"), count($"conv_user").as("n_converted"))
      .select($"variant", $"n_users", $"n_converted",
        round($"n_converted".cast("double") / $"n_users", 6).as("conv_rate"))
      .orderBy($"variant")
  }

  /** Welch two-sample t test between the A/B arms on purchase values —
    * the readout that tells an experimenter whether the arms differ. Arms
    * are the same deterministic hash bucketing as [[abConversion]]; per-arm
    * moments are exact integer sums (values ×1000) so the shuffled
    * aggregation is order-free, and the t statistic, the
    * Welch–Satterthwaite degrees of freedom, and the decision are each ONE
    * identically-parenthesized float expression over those exact moments on
    * both engines (the `stats_corr_moments` architecture; the per-arm
    * standard-error terms u0/u1 are named columns so both engines reuse the
    * identical IEEE sub-expression). The decision compares the ROUNDED |t|
    * against the two-sided 5% normal critical value 1.96 — df is large here
    * (it is reported so a reader can check that), and deriving the verdict
    * from the 6-dp-rounded statistic keeps it hash-stable cross-engine.
    * Null-hypothesis data ⇒ |t| small, decision `fail_to_reject`; the spec
    * asserts a planted uplift flips both. */
  val abTTest: QueryDef = QueryDef(
    "ab_value_ttest",
    """WITH x AS (SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS variant,
      |                  CAST(round(value * 1000) AS BIGINT) AS xq
      |           FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |             CAST(count(*) AS DOUBLE) AS nd,
      |             CAST(sum(xq) AS DOUBLE) AS sx, CAST(sum(xq * xq) AS DOUBLE) AS sxx
      |      FROM x GROUP BY variant),
      |p AS (SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
      |             max(CASE WHEN variant = 1 THEN n END) AS n1,
      |             max(CASE WHEN variant = 0 THEN nd END) AS nd0,
      |             max(CASE WHEN variant = 1 THEN nd END) AS nd1,
      |             max(CASE WHEN variant = 0 THEN sx END) AS sx0,
      |             max(CASE WHEN variant = 1 THEN sx END) AS sx1,
      |             max(CASE WHEN variant = 0 THEN sxx END) AS sxx0,
      |             max(CASE WHEN variant = 1 THEN sxx END) AS sxx1
      |      FROM m),
      |u AS (SELECT *,
      |             (nd0 * sxx0 - sx0 * sx0) / (nd0 * (nd0 - 1.0)) / 1000000.0 / nd0 AS u0,
      |             (nd1 * sxx1 - sx1 * sx1) / (nd1 * (nd1 - 1.0)) / 1000000.0 / nd1 AS u1
      |      FROM p),
      |t AS (SELECT n0, n1,
      |             round(sx0 / 1000.0 / nd0, 6) AS mean0,
      |             round(sx1 / 1000.0 / nd1, 6) AS mean1,
      |             round((sx0 / 1000.0 / nd0 - sx1 / 1000.0 / nd1) / sqrt(u0 + u1), 6) AS t_welch,
      |             round((u0 + u1) * (u0 + u1)
      |                   / (u0 * u0 / (nd0 - 1.0) + u1 * u1 / (nd1 - 1.0)), 4) AS df_welch
      |      FROM u)
      |SELECT n0, n1, mean0, mean1, t_welch, df_welch,
      |       CASE WHEN abs(t_welch) > 1.96 THEN 'reject_h0' ELSE 'fail_to_reject' END AS decision
      |FROM t""".stripMargin,
  ) { (spark, dir) => welchT(Tables.events(spark, dir)) }

  /** Welch-t plan over any events frame — split out for the spec. */
  private[graft] def welchT(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val x = events
      .filter($"event_type" === "purchase")
      .select(
        (call_function("md5hash60", $"user_id".cast("string")) % 2).as("variant"),
        round($"value" * 1000).cast("long").as("xq"))
    val m = x.groupBy($"variant").agg(
      count(lit(1)).as("n"),
      sum($"xq".cast("decimal(38,0)")).as("sx_d"),
      sum(($"xq" * $"xq").cast("decimal(38,0)")).as("sxx_d"))
    def arm(v: Int, c: Column) = max(when($"variant" === v, c))
    val p = m.select(
      arm(0, $"n").as("n0"), arm(1, $"n").as("n1"),
      arm(0, $"n".cast("double")).as("nd0"), arm(1, $"n".cast("double")).as("nd1"),
      arm(0, $"sx_d".cast("double")).as("sx0"), arm(1, $"sx_d".cast("double")).as("sx1"),
      arm(0, $"sxx_d".cast("double")).as("sxx0"), arm(1, $"sxx_d".cast("double")).as("sxx1"))
    val u = p.select($"*",
      (($"nd0" * $"sxx0" - $"sx0" * $"sx0") / ($"nd0" * ($"nd0" - lit(1.0))) / 1000000.0 / $"nd0").as("u0"),
      (($"nd1" * $"sxx1" - $"sx1" * $"sx1") / ($"nd1" * ($"nd1" - lit(1.0))) / 1000000.0 / $"nd1").as("u1"))
    val t = u.select($"n0", $"n1",
      round($"sx0" / 1000.0 / $"nd0", 6).as("mean0"),
      round($"sx1" / 1000.0 / $"nd1", 6).as("mean1"),
      round(($"sx0" / 1000.0 / $"nd0" - $"sx1" / 1000.0 / $"nd1") / sqrt($"u0" + $"u1"), 6)
        .as("t_welch"),
      round(($"u0" + $"u1") * ($"u0" + $"u1")
        / ($"u0" * $"u0" / ($"nd0" - lit(1.0)) + $"u1" * $"u1" / ($"nd1" - lit(1.0))), 4)
        .as("df_welch"))
    t.select($"n0", $"n1", $"mean0", $"mean1", $"t_welch", $"df_welch",
      when(abs($"t_welch") > 1.96, "reject_h0").otherwise("fail_to_reject").as("decision"))
  }

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis 2006,
    * the A-ES "exponential jumps" key trick): each document draws the key
    * u^(1/w) from its hash-uniform u and weight w, and the global top-50
    * keys ARE a weighted sample without replacement — no rejection loop,
    * no sequential reservoir, one `orderBy().limit()` that plans as
    * TakeOrderedAndProject (per-partition heaps, never a global sort).
    * The weight is the `llm_quality` score (rounded to 4 dp BEFORE the
    * pow, so both engines exponentiate the identical double — the
    * `llm_domain_mix` libm rule), the uniform is the seedless portable
    * hash, and keys quantize to 1e-6 BIGINTs so ranking is integer. The
    * quality formula keeps w > 0 for any non-empty doc, so 1/w is always
    * finite. This is "sample better documents more often" as one
    * deterministic, rerun-stable pass — the quality-weighted cousin of
    * [[sampleHash]]'s uniform thinning. */
  val weightedSample: QueryDef = QueryDef(
    "llm_weighted_sample",
    s"""SELECT doc_id, quality, key_e6 FROM (
       |  SELECT doc_id, quality,
       |         CAST(round(pow(u, 1.0 / quality) * 1000000) AS BIGINT) AS key_e6
       |  FROM (SELECT doc_id,
       |               round(least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.5
       |                     + (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
       |                              / len(string_split(text, ' '))) * 0.5, 4) AS quality,
       |               ($docHashSql % 1000000 + 1) / 1000001.0 AS u
       |        FROM documents))
       |ORDER BY key_e6 DESC, doc_id LIMIT 50""".stripMargin,
  ) { (spark, dir) =>
    val stop = Seq("the", "a", "of", "and")
    Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("ts"),
        ((docHash % 1000000L + 1L) / lit(1000001.0)).as("u"))
      .select($"doc_id", $"u",
        round(least(size($"ts") / lit(50.0), lit(1.0)) * 0.5
          + (lit(1.0) - size(filter($"ts", t => t.isInCollection(stop)))
              .cast("double") / size($"ts")) * 0.5, 4).as("quality"))
      .select($"doc_id", $"quality",
        round(pow($"u", lit(1.0) / $"quality") * 1000000).cast("long").as("key_e6"))
      .orderBy($"key_e6".desc, $"doc_id")
      .limit(50)
  }

  /** Sample-ratio-mismatch (SRM) check on the A/B assignment — the
    * guardrail every experiment readout runs FIRST: if the 50/50 hash
    * split didn't land 50/50, the arms are biased and [[abConversion]] /
    * [[abTTest]] readouts are void. The one-df chi-square against equal
    * expected counts simplifies to `(n_a − n_b)² / (n_a + n_b)`, computed
    * in exact integer ppm (counts are BIGINTs, one integer division at the
    * end), compared against the 5% critical value 3.841 — so the verdict
    * hash-matches with no float crossing engines. Healthy hashing means
    * `srm_detected = 0`, which the oracle pins exactly ([[DqOps.pkUnique]]'s
    * tripwire design); the spec plants a skewed split and watches it fire.
    *
    * Scale shape: a user-keyed dedup then a 2-group count — the cheapest
    * query in the suite at any scale. */
  val abSrm: QueryDef = QueryDef(
    "ab_srm",
    """WITH v AS (SELECT DISTINCT user_id,
      |                  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS variant
      |           FROM events),
      |c AS (SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |      FROM v)
      |SELECT n_a, n_b,
      |       CAST((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) AS BIGINT) AS chi2_ppm,
      |       CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) > 3841000
      |            THEN 1 ELSE 0 END AS BIGINT) AS srm_detected
      |FROM c""".stripMargin,
  ) { (spark, dir) =>
    srmOf(Tables.events(spark, dir).select($"user_id").distinct()
      .select((call_function("md5hash60", $"user_id".cast("string")) % 2)
        .as("variant")))
  }

  /** The SRM aggregate over a pre-assigned `variant` column — extracted so
    * the spec can plant a skewed assignment and watch the flag fire. */
  private[graft] def srmOf(assigned: DataFrame): DataFrame =
    assigned
      .agg(sum(when($"variant" === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"variant" === 1, 1L).otherwise(0L)).as("n_b"))
      .select($"n_a", $"n_b",
        expr("(n_a - n_b) * (n_a - n_b) * 1000000 DIV (n_a + n_b)")
          .as("chi2_ppm"),
        (expr("(n_a - n_b) * (n_a - n_b) * 1000000 DIV (n_a + n_b)") > 3841000L)
          .cast("long").as("srm_detected"))

  val all: Seq[QueryDef] =
    Seq(sampleHash, sampleStratified, trainSplit, abConversion, abTTest,
      weightedSample, abSrm)
}
