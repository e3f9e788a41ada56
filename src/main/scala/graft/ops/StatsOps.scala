package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Descriptive-statistics surface — correlation/covariance from exact
  * moments, equi-width histograms, quantile bucketing, and per-column data
  * profiling. The reference stops at AVG/MIN/MAX; these are the next
  * statistics a warehouse (and any dataset-curation pipeline deciding what
  * to train on) asks for.
  *
  * Determinism architecture (same as `llm_embed_centroid`): every shuffled
  * sum is over EXACT integers — values are scaled to cents (×100, exact for
  * the 2-dp testdata) and summed as DECIMAL(38,0), so partial aggregation
  * order cannot change a bit. The float formulas (corr, covar, stddev) are
  * then one identically-parenthesized expression over those exact sums on
  * both engines.
  */
object StatsOps {

  /** Pearson correlation, sample covariance and stddev per return flag,
    * computed from exact integer moments in ONE pass (map-side combinable
    * decimal sums — the textbook single-pass moments form, scale-safe at
    * any row count; Spark's builtin `corr` would give the same value only
    * up to float accumulation order). */
  val corrMoments: QueryDef = QueryDef(
    "stats_corr_moments",
    """WITH s AS (SELECT l_returnflag,
      |                  CAST(round(l_quantity * 100) AS BIGINT) AS qx,
      |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS py
      |           FROM lineitem),
      |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |             CAST(count(*) AS DOUBLE) AS nd,
      |             CAST(sum(qx) AS DOUBLE) AS sx, CAST(sum(py) AS DOUBLE) AS sy,
      |             CAST(sum(qx * py) AS DOUBLE) AS sxy,
      |             CAST(sum(qx * qx) AS DOUBLE) AS sxx,
      |             CAST(sum(py * py) AS DOUBLE) AS syy
      |      FROM s GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |       round((nd * sxy - sx * sy) / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6) AS corr_qty_price,
      |       round((nd * sxy - sx * sy) / (nd * (nd - 1.0)) / 10000.0, 4) AS covar_qty_price,
      |       round(sqrt((nd * syy - sy * sy) / (nd * (nd - 1.0))) / 100.0, 4) AS sd_price
      |FROM m ORDER BY l_returnflag""".stripMargin,
  ) { (spark, dir) =>
    val dec = "decimal(38,0)"
    val s = Tables.lineitem(spark, dir).select($"l_returnflag",
      round($"l_quantity" * 100).cast("long").as("qx"),
      round($"l_extendedprice" * 100).cast("long").as("py"))
    val m = s.groupBy($"l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(($"qx" * $"py").cast(dec)).as("sxy_d"),
      sum(($"qx" * $"qx").cast(dec)).as("sxx_d"),
      sum(($"py" * $"py").cast(dec)).as("syy_d"),
      sum($"qx".cast(dec)).as("sx_d"), sum($"py".cast(dec)).as("sy_d"))
    val (nd, sx, sy) = ($"n".cast("double"), $"sx_d".cast("double"), $"sy_d".cast("double"))
    val (sxy, sxx, syy) = ($"sxy_d".cast("double"), $"sxx_d".cast("double"), $"syy_d".cast("double"))
    m.select($"l_returnflag", $"n",
      round((nd * sxy - sx * sy) / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6)
        .as("corr_qty_price"),
      round((nd * sxy - sx * sy) / (nd * (nd - lit(1.0))) / 10000.0, 4)
        .as("covar_qty_price"),
      round(sqrt((nd * syy - sy * sy) / (nd * (nd - lit(1.0)))) / 100.0, 4)
        .as("sd_price"))
      .orderBy($"l_returnflag")
  }

  /** OLS regression price = slope·qty + intercept per return flag, plus r²
    * — the modeling step after [[corrMoments]]: the SAME one-pass exact
    * integer moments (map-side combinable decimal sums, scale-safe at any
    * row count), with the textbook closed forms evaluated as one
    * identically-parenthesized float expression per output column on both
    * engines. The cents scaling cancels in the slope (both axes ×100);
    * the intercept divides back to currency. */
  val linreg: QueryDef = QueryDef(
    "stats_linreg",
    """WITH s AS (SELECT l_returnflag,
      |                  CAST(round(l_quantity * 100) AS BIGINT) AS qx,
      |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS py
      |           FROM lineitem),
      |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |             CAST(count(*) AS DOUBLE) AS nd,
      |             CAST(sum(qx) AS DOUBLE) AS sx, CAST(sum(py) AS DOUBLE) AS sy,
      |             CAST(sum(qx * py) AS DOUBLE) AS sxy,
      |             CAST(sum(qx * qx) AS DOUBLE) AS sxx,
      |             CAST(sum(py * py) AS DOUBLE) AS syy
      |      FROM s GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |       round((nd * sxy - sx * sy) / (nd * sxx - sx * sx), 6) AS slope,
      |       round((sy - (nd * sxy - sx * sy) / (nd * sxx - sx * sx) * sx) / nd / 100.0, 4) AS intercept,
      |       round((nd * sxy - sx * sy) * (nd * sxy - sx * sy) / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6) AS r2
      |FROM m ORDER BY l_returnflag""".stripMargin,
  ) { (spark, dir) =>
    val dec = "decimal(38,0)"
    val s = Tables.lineitem(spark, dir).select($"l_returnflag",
      round($"l_quantity" * 100).cast("long").as("qx"),
      round($"l_extendedprice" * 100).cast("long").as("py"))
    val m = s.groupBy($"l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(($"qx" * $"py").cast(dec)).as("sxy_d"),
      sum(($"qx" * $"qx").cast(dec)).as("sxx_d"),
      sum(($"py" * $"py").cast(dec)).as("syy_d"),
      sum($"qx".cast(dec)).as("sx_d"), sum($"py".cast(dec)).as("sy_d"))
    val (nd, sx, sy) = ($"n".cast("double"), $"sx_d".cast("double"), $"sy_d".cast("double"))
    val (sxy, sxx, syy) = ($"sxy_d".cast("double"), $"sxx_d".cast("double"), $"syy_d".cast("double"))
    val cov = nd * sxy - sx * sy
    val vx = nd * sxx - sx * sx
    m.select($"l_returnflag", $"n",
      round(cov / vx, 6).as("slope"),
      round((sy - cov / vx * sx) / nd / 100.0, 4).as("intercept"),
      round(cov * cov / (vx * (nd * syy - sy * sy)), 6).as("r2"))
      .orderBy($"l_returnflag")
  }

  /** Equi-width histogram of order totals (20 × 25k bins). Pure map-side
    * arithmetic + one tiny-key aggregate — the distribution profile that
    * costs one scan at any scale. */
  val histogram: QueryDef = QueryDef(
    "stats_histogram",
    """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
      |       CAST(CAST(floor(o_totalprice / 25000.0) AS BIGINT) * 25000 AS BIGINT) AS lo,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(floor($"o_totalprice" / 25000.0).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total"))
      .select($"bin", ($"bin" * 25000).cast("long").as("lo"), $"n_orders", $"total")
      .orderBy($"bin")
  }

  /** Quantile bucketing (quartile discretizer): exact interpolated quartile
    * thresholds computed once, broadcast as a 1-row scalar subquery, then a
    * pure comparison bucketing pass — the scale-right discretizer shape
    * (the thresholds are the only global state; the bucketing scan is
    * embarrassingly parallel). At 100 TB the exact percentile over one
    * group would buffer too much — swap the threshold subquery for the KLL
    * sketch twin (`sketch_approx_percentiles`); the bucketing pass is
    * unchanged. Raw quantile doubles are bit-identical cross-engine
    * (established by `sketch_percentile_exact`). */
  val quantileBucket: QueryDef = QueryDef(
    "feat_quantile_bucket",
    """WITH th AS (SELECT quantile_cont(o_totalprice, 0.25) AS q1,
      |                   quantile_cont(o_totalprice, 0.50) AS q2,
      |                   quantile_cont(o_totalprice, 0.75) AS q3 FROM orders)
      |SELECT CAST(CASE WHEN o_totalprice < th.q1 THEN 0
      |                 WHEN o_totalprice < th.q2 THEN 1
      |                 WHEN o_totalprice < th.q3 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders, th GROUP BY 1 ORDER BY bucket""".stripMargin,
  ) { (spark, dir) =>
    val orders = Tables.orders(spark, dir)
    val th = orders.agg(
      percentile($"o_totalprice", array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
      .select($"qs"(0).as("q1"), $"qs"(1).as("q2"), $"qs"(2).as("q3"))
    orders.crossJoin(broadcast(th))
      .select($"o_totalprice",
        when($"o_totalprice" < $"q1", 0L).when($"o_totalprice" < $"q2", 1L)
          .when($"o_totalprice" < $"q3", 2L).otherwise(3L).as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"),
        min($"o_totalprice").as("min_price"), max($"o_totalprice").as("max_price"),
        round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"bucket")
  }

  /** Per-column data profile of `orders`: null count, exact distinct count,
    * canonical min/max strings — the schema-dynamic profiling pass every
    * ingestion pipeline runs first. One single-column aggregate per column
    * (column pruning makes each pass read exactly one parquet column — N
    * pruned scans beat one N-way `count(distinct)` EXPAND pass, which
    * multiplies every row N-fold before the shuffle). Numeric/temporal
    * min/max are rendered through the canonical decimal/date string forms
    * (`rds_decimal_money` convention) so the comparator sees plain text. */
  val profileOrders: QueryDef = {
    // (name, null-safe count col, distinct col, min/max render)
    def renderNum(c: Column) = c.cast("decimal(18,2)").cast("string")
    def renderDate(c: Column) = c.cast("date").cast("string")
    def renderStr(c: Column) = c.cast("string")
    val cols: Seq[(String, Column => Column)] = Seq(
      ("o_orderkey", renderStr), ("o_custkey", renderStr),
      ("o_orderstatus", renderStr), ("o_totalprice", renderNum),
      ("o_orderdate", renderDate), ("o_orderpriority", renderStr))
    val sqlRender: Map[String, String => String] = Map(
      "o_totalprice" -> ((c: String) => s"CAST(CAST($c AS DECIMAL(18,2)) AS VARCHAR)"),
      "o_orderdate" -> ((c: String) => s"CAST(CAST($c AS DATE) AS VARCHAR)"),
    ).withDefaultValue((c: String) => s"CAST($c AS VARCHAR)")
    val oracle = cols.map { case (name, _) =>
      // min/max on the NATIVE value, rendered after — a lexicographic
      // string min would call '999.00' larger than '10000.00'.
      s"""SELECT '$name' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(count(*) - count($name) AS BIGINT) AS n_nulls,
         |       CAST(count(DISTINCT $name) AS BIGINT) AS n_distinct,
         |       ${sqlRender(name)(s"min($name)")} AS min_s,
         |       ${sqlRender(name)(s"max($name)")} AS max_s
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    QueryDef("profile_orders", oracle) { (spark, dir) =>
      val orders = Tables.orders(spark, dir)
      cols.map { case (name, render) =>
        val c = col(name)
        orders.agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(c)).as("n_nulls"),
          countDistinct(c).as("n_distinct"),
          render(min(c)).as("min_s"), render(max(c)).as("max_s"))
          .select(lit(name).as("col_name"), $"n_rows", $"n_nulls",
            $"n_distinct", $"min_s", $"max_s")
      }.reduce(_ union _).orderBy($"col_name")
    }
  }

  /** Robust outlier counts per event type via median/MAD (median absolute
    * deviation) — the z-score twin (`a4_zscore_outliers`) that heavy tails
    * can't poison: one extreme value shifts a mean/stddev threshold but
    * leaves the medians untouched. Two exact-percentile passes (median,
    * then median of |x − med|), thresholds broadcast between them; the
    * outlier test `|x − med| > 3·1.4826·mad` is a strict comparison of
    * identically-derived doubles on both engines. Exact percentiles buffer
    * per-group — 5 event types here; the KLL sketch is the 100 TB swap, as
    * with `feat_quantile_bucket`. */
  /** The median/MAD outlier plan over any (event_type, value) frame —
    * extracted (the `welchT` convention) so the fixture spec exercises the
    * same code path the registered query ships. */
  private[graft] def madOutliersOf(events: DataFrame): DataFrame = {
    val med = events.groupBy($"event_type")
      .agg(percentile($"value", lit(0.5)).as("med"))
    val withMed = events.join(broadcast(med), "event_type")
    val mad = withMed.groupBy($"event_type")
      .agg(percentile(abs($"value" - $"med"), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(abs($"value" - $"med") > lit(3) * 1.4826 * $"mad", 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy($"event_type")
  }

  val madOutliers: QueryDef = QueryDef(
    "stats_mad_outliers",
    """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
      |             FROM events GROUP BY event_type),
      |mad AS (SELECT e.event_type, quantile_cont(abs(e.value - med.med), 0.5) AS mad
      |        FROM events e JOIN med ON e.event_type = med.event_type
      |        GROUP BY e.event_type)
      |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CASE WHEN abs(e.value - med.med) > 3 * 1.4826 * mad.mad
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN med ON e.event_type = med.event_type
      |              JOIN mad ON e.event_type = mad.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
  ) { (spark, dir) =>
    madOutliersOf(Tables.events(spark, dir).select($"event_type", $"value"))
  }

  /** Chi-square independence test: event type × A/B arm over the full
    * event stream (are the arms balanced across behavior?). Observed
    * counts are exact; each cell's (o−e)²/e term is derived from exact
    * BIGINTs with one identical float expression and quantized to a 1e-6
    * BIGINT before the final 10-cell sum — the largest shuffled float sum
    * in the query is therefore exact integer math. Cells/marginals are
    * tiny keyed aggregates (2 arms × 5 types); everything after the first
    * groupBy is broadcast. */
  val chi2: QueryDef = QueryDef(
    "stats_chi2",
    """WITH cells AS (SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS variant,
      |                      event_type, CAST(count(*) AS BIGINT) AS o
      |               FROM events GROUP BY 1, 2),
      |rt AS (SELECT variant, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY variant),
      |ct AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY event_type),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS total FROM cells),
      |terms AS (SELECT CAST(round(
      |            (CAST(cells.o AS DOUBLE) - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(n.total AS DOUBLE))
      |            * (CAST(cells.o AS DOUBLE) - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(n.total AS DOUBLE))
      |            / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(n.total AS DOUBLE)) * 1000000) AS BIGINT) AS tq,
      |                 cells.variant, cells.event_type
      |          FROM cells JOIN rt USING (variant) JOIN ct USING (event_type), n)
      |SELECT round(CAST(sum(tq) AS DOUBLE) / 1e6, 4) AS chi2,
      |       CAST((count(DISTINCT variant) - 1) * (count(DISTINCT event_type) - 1) AS BIGINT) AS dof
      |FROM terms""".stripMargin,
  ) { (spark, dir) =>
    val cells = Tables.events(spark, dir)
      .groupBy(
        (call_function("md5hash60", $"user_id".cast("string")) % 2).as("variant"),
        $"event_type")
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy($"variant").agg(sum($"o").as("r"))
    val ct = cells.groupBy($"event_type").agg(sum($"o").as("c"))
    val n = cells.agg(sum($"o").as("total"))
    val e = $"r".cast("double") * $"c".cast("double") / $"total".cast("double")
    val d = $"o".cast("double") - e
    cells.join(broadcast(rt), "variant").join(broadcast(ct), "event_type")
      .crossJoin(broadcast(n))
      .select($"variant", $"event_type",
        round(d * d / e * 1000000).cast("long").as("tq"))
      .agg(
        round(sum($"tq").cast("double") / 1e6, 4).as("chi2"),
        ((countDistinct($"variant") - 1) * (countDistinct($"event_type") - 1))
          .as("dof"))
  }

  /** Two-sample Kolmogorov–Smirnov test — the distribution-drift readout
    * beyond [[DqOps.psiDrift]]'s binned PSI: D = max |F_a(v) − F_b(v)|
    * over the pooled empirical CDFs, sensitive to ANY distributional
    * difference, not just mass moved across preset bin edges. Samples
    * here are order totals split by key parity (same distribution → no
    * drift, which the oracle pins; the spec plants a real shift).
    *
    * Exactness: values are cents (exact BIGINTs), the CDF gap is kept as
    * the INTEGER cross-product |cna·Nb − cnb·Na| until the single final
    * division — no float ever enters the max. (The cross-product bounds
    * sample sizes to ~3·10⁹ per side before BIGINT overflow; past that
    * the same plan runs with the double-division form.) The running CDF
    * is a window over DISTINCT values — bounded by the value domain (cent
    * grid), not the row count; at extreme domains the same total order
    * range-partitions into a rank-offset pass (the `llm_curriculum`
    * note). The drift flag compares the 6-dp-rounded statistic against
    * the 6-dp-rounded α = 0.05 critical value, so both engines compare
    * identical doubles. */
  val ksTest: QueryDef = QueryDef(
    "stats_ks_test",
    """WITH s AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |                  CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS in_a
      |           FROM orders),
      |g AS (SELECT v, CAST(sum(in_a) AS BIGINT) AS na,
      |             CAST(sum(1 - in_a) AS BIGINT) AS nb
      |      FROM s GROUP BY v),
      |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb FROM g),
      |c AS (SELECT v, sum(na) OVER (ORDER BY v) AS cna,
      |             sum(nb) OVER (ORDER BY v) AS cnb
      |      FROM g),
      |d AS (SELECT CAST(max(abs(cna * t.tb - cnb * t.ta)) AS BIGINT) AS dnum FROM c, t)
      |SELECT t.ta AS n_a, t.tb AS n_b, d.dnum AS d_num,
      |       round(CAST(d.dnum AS DOUBLE) / (t.ta * t.tb), 6) AS d_stat,
      |       round(1.358 * sqrt(CAST(t.ta + t.tb AS DOUBLE) / (t.ta * t.tb)), 6) AS crit_005,
      |       CAST(CASE WHEN round(CAST(d.dnum AS DOUBLE) / (t.ta * t.tb), 6)
      |                      > round(1.358 * sqrt(CAST(t.ta + t.tb AS DOUBLE) / (t.ta * t.tb)), 6)
      |                 THEN 1 ELSE 0 END AS BIGINT) AS drift
      |FROM t, d""".stripMargin,
  ) { (spark, dir) =>
    val s = Tables.orders(spark, dir)
      .select(round($"o_totalprice" * 100).cast("long").as("v"),
        ($"o_orderkey" % 2 === 0).cast("long").as("in_a"))
    ksTestOf(s)
  }

  /** [[ksTest]] over any `(v: BIGINT, in_a: 0|1)` pooled-sample frame —
    * fixture seam for the planted-shift spec. */
  private[graft] def ksTestOf(s: DataFrame): DataFrame = {
    val g = graft.Caches.persist(
      s.groupBy($"v")
        .agg(sum($"in_a").as("na"), sum(lit(1L) - $"in_a").as("nb")))
    val t = g.agg(sum($"na").as("ta"), sum($"nb").as("tb"))
    // both empirical CDFs in one partition-parallel prefix pass — the
    // distinct-value frame is domain-bounded, but ranked via ParallelRank
    // anyway so no plan carries an unpartitioned window (round-12 sweep)
    val c = ParallelRank.withRunningSums(g, Seq($"v"),
      Seq($"na" -> "cna", $"nb" -> "cnb"))
      .select($"v", $"cna", $"cnb")
    val d = c.crossJoin(broadcast(t))
      .agg(max(abs($"cna" * $"tb" - $"cnb" * $"ta")).as("dnum"))
    d.crossJoin(broadcast(t))
      .select($"ta".as("n_a"), $"tb".as("n_b"), $"dnum".as("d_num"),
        round($"dnum".cast("double") / ($"ta" * $"tb"), 6).as("d_stat"),
        round(lit(1.358) * sqrt(($"ta" + $"tb").cast("double") / ($"ta" * $"tb")), 6)
          .as("crit_005"),
        (round($"dnum".cast("double") / ($"ta" * $"tb"), 6)
          > round(lit(1.358) * sqrt(($"ta" + $"tb").cast("double") / ($"ta" * $"tb")), 6))
          .cast("long").as("drift"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) two-sample test on the same pooled
    * A/B frame as [[ksTest]] — the rank-based location test that backs the
    * KS shape test: KS asks "same distribution?", U asks "is one sample
    * stochastically larger?". Identical scale shape to KS: group-by-value
    * compaction first (the window then runs over DISTINCT cents values, not
    * rows), one ordered cumulative sum, then closed-form moments.
    *
    * Determinism: tied ranks enter through the midrank identity
    * 2·avgrank(v) = 2·cum_below(v) + na + nb + 1 — an INTEGER — so the rank
    * sum is carried exactly as 2·R₁ in a decimal accumulator (order-proof;
    * BIGINT would hold ~1e9 rows, decimal holds any scale), and the
    * tie-corrected normal approximation is one identically-parenthesized
    * float expression over those exact sums on both engines. */
  val mannWhitney: QueryDef = QueryDef(
    "stats_mannwhitney",
    """WITH s AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |                  CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS in_a
      |           FROM orders),
      |g AS (SELECT v, CAST(sum(in_a) AS BIGINT) AS na,
      |             CAST(sum(1 - in_a) AS BIGINT) AS nb
      |      FROM s GROUP BY v),
      |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb,
      |             CAST(sum((na + nb) * (na + nb) * (na + nb) - (na + nb)) AS BIGINT) AS tie3
      |      FROM g),
      |c AS (SELECT v, na, nb, sum(na + nb) OVER (ORDER BY v) AS cum FROM g),
      |r AS (SELECT CAST(sum(na * (2 * (cum - na - nb) + na + nb + 1)) AS BIGINT) AS r2
      |      FROM c)
      |SELECT t.ta AS n_a, t.tb AS n_b,
      |       CAST(r.r2 - t.ta * (t.ta + 1) AS BIGINT) AS u2_a,
      |       round(CAST(r.r2 - t.ta * (t.ta + 1) AS DOUBLE) / 2.0
      |             / (CAST(t.ta AS DOUBLE) * t.tb), 6) AS auc_a,
      |       round((CAST(r.r2 - t.ta * (t.ta + 1) AS DOUBLE) - CAST(t.ta AS DOUBLE) * t.tb)
      |             / (2.0 * sqrt(CAST(t.ta AS DOUBLE) * t.tb
      |                 * ((t.ta + t.tb + 1.0)
      |                    - CAST(t.tie3 AS DOUBLE) / ((t.ta + t.tb) * (t.ta + t.tb - 1.0)))
      |                 / 12.0)), 6) AS z,
      |       CAST(CASE WHEN abs(round((CAST(r.r2 - t.ta * (t.ta + 1) AS DOUBLE) - CAST(t.ta AS DOUBLE) * t.tb)
      |             / (2.0 * sqrt(CAST(t.ta AS DOUBLE) * t.tb
      |                 * ((t.ta + t.tb + 1.0)
      |                    - CAST(t.tie3 AS DOUBLE) / ((t.ta + t.tb) * (t.ta + t.tb - 1.0)))
      |                 / 12.0)), 6)) > 1.96 THEN 1 ELSE 0 END AS BIGINT) AS shifted
      |FROM t, r""".stripMargin,
  ) { (spark, dir) =>
    val s = Tables.orders(spark, dir)
      .select(round($"o_totalprice" * 100).cast("long").as("v"),
        ($"o_orderkey" % 2 === 0).cast("long").as("in_a"))
    mannWhitneyOf(s)
  }

  /** [[mannWhitney]] over any `(v: BIGINT, in_a: 0|1)` pooled frame —
    * fixture seam for the planted-shift spec (same contract as
    * [[ksTestOf]]). */
  private[graft] def mannWhitneyOf(s: DataFrame): DataFrame = {
    val g = graft.Caches.persist(
      s.groupBy($"v")
        .agg(sum($"in_a").as("na"), sum(lit(1L) - $"in_a").as("nb")))
    val t = g.agg(sum($"na").as("ta"), sum($"nb").as("tb"),
      sum(($"na" + $"nb") * ($"na" + $"nb") * ($"na" + $"nb") - ($"na" + $"nb"))
        .as("tie3"))
    // pooled-rank prefix via ParallelRank — same rewrite as [[ksTestOf]]
    val c = ParallelRank.withRunningSum(g, Seq($"v"), $"na" + $"nb", "cum")
    val r = c.agg(
      sum(($"na" * (lit(2) * ($"cum" - $"na" - $"nb") + $"na" + $"nb" + 1))
        .cast("decimal(38,0)")).cast("long").as("r2"))
    val u2 = ($"r2" - $"ta" * ($"ta" + 1)).cast("double")
    val sg = sqrt($"ta".cast("double") * $"tb"
      * (($"ta" + $"tb" + lit(1.0))
         - $"tie3".cast("double") / (($"ta" + $"tb") * ($"ta" + $"tb" - lit(1.0))))
      / 12.0)
    val z = round((u2 - $"ta".cast("double") * $"tb") / (lit(2.0) * sg), 6)
    r.crossJoin(broadcast(t))
      .select($"ta".as("n_a"), $"tb".as("n_b"),
        ($"r2" - $"ta" * ($"ta" + 1)).cast("long").as("u2_a"),
        round(u2 / 2.0 / ($"ta".cast("double") * $"tb"), 6).as("auc_a"),
        z.as("z"),
        (abs(z) > 1.96).cast("long").as("shifted"))
  }

  /** Leave-one-out target encoding of `c_mktsegment` against account
    * balance — the leakage-safe categorical encoder a feature pipeline
    * derives before training (each row's code excludes its own target:
    * (Σ_seg − own)/(n_seg − 1)). Shape: one tiny per-segment aggregate
    * (5 groups) broadcast back onto the scan — a map-side join, no
    * customer-keyed shuffle at any scale.
    *
    * Determinism: segment sums are exact cents in a decimal accumulator;
    * the per-row quotient can be negative (acctbal is), so instead of
    * integer division (floor vs truncate diverges below zero) both engines
    * quantize the IDENTICAL double with `floor(x·1e4 + 0.5)` — the
    * half-up-on-a-shared-double pattern from the PQ/classifier lanes. */
  val targetEncode: QueryDef = QueryDef(
    "feat_target_encode",
    """WITH seg AS (SELECT c_mktsegment,
      |                    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS seg_cents,
      |                    CAST(count(*) AS BIGINT) AS n_seg
      |             FROM customer GROUP BY c_mktsegment)
      |SELECT c.c_custkey, c.c_mktsegment, seg.n_seg,
      |       CAST(floor((CAST(seg.seg_cents - CAST(round(c.c_acctbal * 100) AS BIGINT) AS DOUBLE)
      |                   / (seg.n_seg - 1)) * 100.0 + 0.5) AS BIGINT) AS enc_q,
      |       round(CAST(floor((CAST(seg.seg_cents - CAST(round(c.c_acctbal * 100) AS BIGINT) AS DOUBLE)
      |                   / (seg.n_seg - 1)) * 100.0 + 0.5) AS BIGINT) / 10000.0, 4) AS loo_avg_bal
      |FROM customer c JOIN seg ON c.c_mktsegment = seg.c_mktsegment
      |ORDER BY c.c_custkey""".stripMargin,
  ) { (spark, dir) =>
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment",
        round($"c_acctbal" * 100).cast("long").as("cents"))
    val seg = cust.groupBy($"c_mktsegment")
      .agg(sum($"cents".cast("decimal(38,0)")).cast("long").as("seg_cents"),
        count(lit(1)).as("n_seg"))
    val encQ = floor(
      (($"seg_cents" - $"cents").cast("double") / ($"n_seg" - 1)) * 100.0 + 0.5)
      .cast("long")
    cust.join(broadcast(seg), "c_mktsegment")
      .select($"c_custkey", $"c_mktsegment", $"n_seg", encQ.as("enc_q"),
        round(encQ / 10000.0, 4).as("loo_avg_bal"))
      .orderBy($"c_custkey")
  }

  /** Exact weighted median of extended price, weighted by quantity, per
    * return flag — the order statistic where half the QUANTITY mass sits at
    * or below the price, robust where the plain mean is skew-dominated.
    *
    * One pass: cumulative weight over a per-flag total order (price, then
    * the (orderkey, linenumber) PK so ties are deterministic), then the
    * smallest value whose doubled cumulative weight reaches the group
    * total. All weights are exact cent-integers summed in a decimal
    * accumulator — the shuffled prefix sums can't drift — and the median
    * itself is selected, never interpolated, so no float crosses engines.
    * Scale: the same per-group sort any percentile computation pays; group
    * count (3 flags) keeps the final aggregate tiny. */
  val weightedMedian: QueryDef = QueryDef(
    "stats_weighted_median",
    """WITH s AS (SELECT l_returnflag,
      |                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
      |                  CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS w,
      |                  l_orderkey, l_linenumber
      |           FROM lineitem),
      |c AS (SELECT l_returnflag, v, w,
      |             CAST(sum(w) OVER (PARTITION BY l_returnflag
      |                               ORDER BY v, l_orderkey, l_linenumber
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
      |             CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
      |      FROM s)
      |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |       CAST(max(tw) AS BIGINT) AS total_weight,
      |       CAST(min(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT) AS wmedian_cents
      |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val s = Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        floor($"l_extendedprice" * 100 + 0.5).cast("long").as("v"),
        floor($"l_quantity" * 100 + 0.5).cast("long").as("w"),
        $"l_orderkey", $"l_linenumber")
    val run = Window.partitionBy($"l_returnflag")
      .orderBy($"v", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy($"l_returnflag")
    val c = s.select($"l_returnflag", $"v",
      sum($"w".cast("decimal(38,0)")).over(run).cast("long").as("cw"),
      sum($"w".cast("decimal(38,0)")).over(tot).cast("long").as("tw"))
    c.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        max($"tw").as("total_weight"),
        min(when(lit(2) * $"cw" >= $"tw", $"v")).as("wmedian_cents"))
      .orderBy($"l_returnflag")
  }

  /** Rank-based winsorization: per return flag, prices are capped at the
    * exact order statistics of rank ⌈n/100⌉ from each end (the p1/p99
    * VALUES, selected not interpolated — the `llm_curriculum` lesson: an
    * interpolated percentile is a float boundary two engines can disagree
    * on by one ulp; a rank is not). Emits the caps and the winsorized mean
    * from an exact clamped-cents sum.
    *
    * Two passes over lineitem (rank pass → tiny 3-row cap table broadcast
    * back for the clamp), which is how it stays shaped at scale: the cap
    * table never grows with data, so the second pass is map-side. */
  val winsorize: QueryDef = QueryDef(
    "stats_winsorize",
    """WITH s AS (SELECT l_returnflag,
      |                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
      |                  l_orderkey, l_linenumber
      |           FROM lineitem),
      |r AS (SELECT l_returnflag, v,
      |             row_number() OVER (PARTITION BY l_returnflag
      |                                ORDER BY v, l_orderkey, l_linenumber) AS rk,
      |             count(*) OVER (PARTITION BY l_returnflag) AS n
      |      FROM s),
      |caps AS (SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
      |                CAST(max(CASE WHEN rk <= (n + 99) // 100 THEN v END) AS BIGINT) AS lo_cents,
      |                CAST(min(CASE WHEN rk >= n - (n + 99) // 100 + 1 THEN v END) AS BIGINT) AS hi_cents
      |         FROM r GROUP BY l_returnflag)
      |SELECT s.l_returnflag, caps.n, caps.lo_cents, caps.hi_cents,
      |       CAST(sum(least(greatest(s.v, caps.lo_cents), caps.hi_cents)) AS BIGINT) AS wsum_cents,
      |       CAST(sum(least(greatest(s.v, caps.lo_cents), caps.hi_cents)) // caps.n AS BIGINT) AS wmean_cents
      |FROM s JOIN caps ON s.l_returnflag = caps.l_returnflag
      |GROUP BY s.l_returnflag, caps.n, caps.lo_cents, caps.hi_cents
      |ORDER BY s.l_returnflag""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val s = Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        floor($"l_extendedprice" * 100 + 0.5).cast("long").as("v"),
        $"l_orderkey", $"l_linenumber")
    val byFlag = Window.partitionBy($"l_returnflag")
    val r = s.select($"l_returnflag", $"v",
      row_number().over(byFlag.orderBy($"v", $"l_orderkey", $"l_linenumber"))
        .cast("long").as("rk"),
      count(lit(1)).over(byFlag).as("n"))
    val k = expr("(n + 99) DIV 100") // ⌈n/100⌉ in exact integer arithmetic
    val caps = r.groupBy($"l_returnflag")
      .agg(max($"n").as("n"),
        max(when($"rk" <= k, $"v")).as("lo_cents"),
        min(when($"rk" >= $"n" - k + 1, $"v")).as("hi_cents"))
    val clamped = least(greatest($"v", $"lo_cents"), $"hi_cents")
    s.join(broadcast(caps), "l_returnflag")
      .groupBy($"l_returnflag", $"n", $"lo_cents", $"hi_cents")
      .agg(sum(clamped.cast("decimal(38,0)")).cast("long").as("wsum_cents"))
      .select($"l_returnflag", $"n", $"lo_cents", $"hi_cents", $"wsum_cents",
        expr("wsum_cents DIV n").as("wmean_cents"))
      .orderBy($"l_returnflag")
  }

  /** CUSUM changepoint detection over each event type's daily-count
    * series: the day where the cumulative deviation from the series mean
    * peaks — the standard single-changepoint estimator (Page 1954's CUSUM
    * statistic at its extremum), next to the distribution-drift tests
    * (`stats_ks_test`, `dq_psi_drift`) which say THAT a series changed but
    * not WHEN.
    *
    * Exactness: the running statistic is scaled through by `n_days` so the
    * mean never becomes a float — `S'_k = Σ_{i≤k} (n·c_i − total)` is
    * integer-identical to `n · Σ(c_i − mean)` and every term is a BIGINT.
    * Scale shape: the daily pre-aggregate collapses the event stream to
    * |types|×|days| rows (calendar-bounded, like [[graft.ops.SeqOps]]'s
    * islands), the per-type totals (≤5 rows) broadcast back, and the
    * running sum is one tiny per-type window — at 100 TB the only full
    * scan is the first map-side-combinable count. */
  val cusumChange: QueryDef = QueryDef(
    "stats_cusum_change",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days, CAST(sum(c) AS BIGINT) AS total
      |      FROM d GROUP BY 1),
      |s AS (SELECT d.event_type, d.day, t.n_days, t.total,
      |             CAST(sum(d.c * t.n_days - t.total)
      |                  OVER (PARTITION BY d.event_type ORDER BY d.day
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_run
      |      FROM d JOIN t USING (event_type)),
      |r AS (SELECT event_type, day, n_days, total, abs(s_run) AS cusum_peak,
      |             row_number() OVER (PARTITION BY event_type
      |                                ORDER BY abs(s_run) DESC, day) AS rk
      |      FROM s)
      |SELECT event_type, CAST(day AS VARCHAR) AS change_day, cusum_peak, n_days, total
      |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
    val t = d.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"c").as("total"))
    val run = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(t), "event_type")
      .select($"event_type", $"day", $"n_days", $"total",
        sum($"c" * $"n_days" - $"total").over(run).as("s_run"))
      .select($"event_type", $"day", $"n_days", $"total",
        abs($"s_run").as("cusum_peak"),
        row_number().over(Window.partitionBy($"event_type")
          .orderBy(abs($"s_run").desc, $"day")).as("rk"))
      .filter($"rk" === 1)
      .select($"event_type", date_format($"day", "yyyy-MM-dd").as("change_day"),
        $"cusum_peak", $"n_days", $"total")
      .orderBy($"event_type")
  }

  /** Lag-1/2/3 autocorrelation of each event type's daily-count series —
    * the seasonality probe (a weekly cycle shows as positive r₇, noise as
    * r_k ≈ 0) run before fitting any forecast. Same exact-moments
    * discipline as [[corrMoments]]: the (x_t, x_{t+k}) pairs come from
    * three leads over ONE per-type window sort, their integer sums are
    * shuffled exactly, and the Pearson formula is a single
    * identically-parenthesized float expression at the very end.
    * Scale: the window and all sums run over the |types|×|days|
    * calendar-bounded aggregate, never the event stream. */
  val autocorr: QueryDef = QueryDef(
    "stats_autocorr",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |l AS (SELECT event_type, c AS x,
      |             lead(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
      |             lead(c, 2) OVER (PARTITION BY event_type ORDER BY day) AS y2,
      |             lead(c, 3) OVER (PARTITION BY event_type ORDER BY day) AS y3
      |      FROM d),
      |p AS (SELECT event_type, 1 AS lag_k, x, y1 AS y FROM l WHERE y1 IS NOT NULL
      |      UNION ALL SELECT event_type, 2, x, y2 FROM l WHERE y2 IS NOT NULL
      |      UNION ALL SELECT event_type, 3, x, y3 FROM l WHERE y3 IS NOT NULL),
      |m AS (SELECT event_type, lag_k, CAST(count(*) AS BIGINT) AS n,
      |             CAST(count(*) AS DOUBLE) AS nd,
      |             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |             CAST(sum(x * y) AS DOUBLE) AS sxy,
      |             CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(y * y) AS DOUBLE) AS syy
      |      FROM p GROUP BY 1, 2)
      |SELECT event_type, lag_k, n,
      |       round((nd * sxy - sx * sy) / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6) AS autocorr
      |FROM m ORDER BY event_type, lag_k""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy($"event_type").orderBy($"day")
    val l = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
      .select($"event_type", $"c".as("x"),
        lead($"c", 1).over(seq).as("y1"),
        lead($"c", 2).over(seq).as("y2"),
        lead($"c", 3).over(seq).as("y3"))
    val p = (1 to 3).map { k =>
      l.filter(col(s"y$k").isNotNull)
        .select($"event_type", lit(k).as("lag_k"), $"x", col(s"y$k").as("y"))
    }.reduce(_ unionAll _)
    p.groupBy($"event_type", $"lag_k")
      .agg(count(lit(1)).as("n"), sum($"x").as("lsx"), sum($"y").as("lsy"),
        sum($"x" * $"y").as("lsxy"), sum($"x" * $"x").as("lsxx"),
        sum($"y" * $"y").as("lsyy"))
      .select($"event_type", $"lag_k", $"n",
        expr("""round((CAST(n AS DOUBLE) * CAST(lsxy AS DOUBLE)
                - CAST(lsx AS DOUBLE) * CAST(lsy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(lsxx AS DOUBLE)
                       - CAST(lsx AS DOUBLE) * CAST(lsx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(lsyy AS DOUBLE)
                         - CAST(lsy AS DOUBLE) * CAST(lsy AS DOUBLE))), 6)""")
          .as("autocorr"))
      .orderBy($"event_type", $"lag_k")
  }

  /** Theil–Sen robust trend slope per event type: the median of all
    * pairwise day-to-day slopes over the daily-count series — the
    * outlier-immune alternative to [[linreg]]'s least squares (one wild
    * day moves OLS, not the median of C(n,2) slopes). Slopes are exact
    * integer ppm (truncating division, identical for negatives in both
    * engines), the median is the LOWER median selected by rank — a real
    * order statistic, never interpolated (the `llm_curriculum` lesson),
    * with a (slope, d1, d2) total order so ties break identically.
    * Scale: pairs are calendar² per type — bounded by days, not events;
    * the event stream is touched only by the first keyed count. */
  val theilSen: QueryDef = QueryDef(
    "stats_theil_sen",
    """WITH d AS (SELECT event_type, datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
      |                  CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type, (b.c - a.c) * 1000000 // (b.dn - a.dn) AS slope_ppm,
      |             a.dn AS d1, b.dn AS d2
      |      FROM d a JOIN d b ON a.event_type = b.event_type AND a.dn < b.dn),
      |r AS (SELECT event_type, slope_ppm,
      |             row_number() OVER (PARTITION BY event_type ORDER BY slope_ppm, d1, d2) AS rk,
      |             count(*) OVER (PARTITION BY event_type) AS n FROM p)
      |SELECT event_type, CAST(n AS BIGINT) AS n_pairs, slope_ppm AS theil_sen_slope_ppm
      |FROM r WHERE rk = (n + 1) // 2 ORDER BY event_type""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.events(spark, dir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01").cast("date")).as("dn"))
      .agg(count(lit(1)).as("c"))
    val p = d.as("a")
      .join(d.as("b"),
        $"a.event_type" === $"b.event_type" && $"a.dn" < $"b.dn")
      .select($"a.event_type".as("event_type"),
        expr("(b.c - a.c) * 1000000 DIV (b.dn - a.dn)").as("slope_ppm"),
        $"a.dn".as("d1"), $"b.dn".as("d2"))
    p.select($"event_type", $"slope_ppm",
        row_number().over(Window.partitionBy($"event_type")
          .orderBy($"slope_ppm", $"d1", $"d2")).as("rk"),
        count(lit(1)).over(Window.partitionBy($"event_type")).as("n"))
      .filter($"rk" === expr("(n + 1) DIV 2"))
      .select($"event_type", $"n".as("n_pairs"),
        $"slope_ppm".as("theil_sen_slope_ppm"))
      .orderBy($"event_type")
  }

  /** Poisson(1) CDF steps k = 0..6, scaled to 2⁶⁰ and floored to exact
    * integer literals — the resample weights draw by comparing a 60-bit
    * hash against these, so NO float ever enters the randomization path
    * and both engines draw bit-identical weights. P(w > 6) ≈ 8·10⁻⁵
    * truncates to w = 7 (the standard bounded-tail cap). */
  private[graft] val PoissonCdf60: IndexedSeq[Long] = Vector(
    424136118829305344L, 848272237658610688L, 1060340297073263360L,
    1131029650211480960L, 1148701988496035328L, 1152236456152946176L,
    1152825534095764608L)

  /** Percentile-bootstrap 95% CI for the mean order value per priority via
    * the POISSON BOOTSTRAP (Chamandy et al., Google 2012) — the bootstrap
    * that scales: instead of materializing B resamples, every row draws B
    * independent Poisson(1) weights, so one pass computes all B resample
    * means and no resample ever needs the full dataset co-located.
    * Determinism: the "random" weight is the row's 60-bit md5 hash of
    * (orderkey | replicate) compared against integer CDF thresholds
    * ([[PoissonCdf60]]) — replayable, engine-exact, and still a faithful
    * Poisson(1) draw. CI bounds are REAL order statistics of the 50
    * resample means (ranks 2 and 49 ≈ 2.5/97.5%), never interpolated.
    * Scale: the explode is ×B on the priority-keyed aggregate path (all
    * sums map-side combinable); B bounds memory, not the data. */
  val bootstrapCi: QueryDef = QueryDef(
    "stats_bootstrap_ci", {
      val case60 = "CASE " + PoissonCdf60.zipWithIndex
        .map { case (t, k) => s"WHEN hv < $t THEN $k" }.mkString(" ") + " ELSE 7 END"
      s"""WITH base AS (SELECT o_orderpriority AS priority, o_orderkey,
         |                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
         |              FROM orders),
         |rep AS (SELECT priority, cents, b,
         |               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' || CAST(b AS VARCHAR)), 1, 15))::BIGINT AS hv
         |        FROM base, unnest(range(0, 50)) AS t(b)),
         |w AS (SELECT priority, b, $case60 AS w, cents FROM rep),
         |m AS (SELECT priority, b, CAST(sum(w * cents) // sum(w) AS BIGINT) AS mean_cents
         |      FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
         |r AS (SELECT priority, mean_cents,
         |             row_number() OVER (PARTITION BY priority ORDER BY mean_cents, b) AS rk
         |      FROM m),
         |pt AS (SELECT priority, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
         |       FROM base GROUP BY 1)
         |SELECT pt.priority AS priority, pt.n AS n, pt.mean_cents AS mean_cents,
         |       max(CASE WHEN r.rk = 2 THEN r.mean_cents END) AS ci_lo_cents,
         |       max(CASE WHEN r.rk = 49 THEN r.mean_cents END) AS ci_hi_cents
         |FROM pt JOIN r ON pt.priority = r.priority
         |GROUP BY 1, 2, 3 ORDER BY priority""".stripMargin
    },
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(spark, dir)
      .select($"o_orderpriority".as("priority"), $"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
    var wc: Column = when($"hv" < PoissonCdf60(0), 0L)
    for (k <- 1 until 7) wc = wc.when($"hv" < PoissonCdf60(k), k.toLong)
    val m = base
      .withColumn("b", explode(sequence(lit(0), lit(49))))
      .withColumn("hv", call_function("md5hash60",
        concat($"o_orderkey".cast("string"), lit("|"), $"b".cast("string"))))
      .select($"priority", $"b", wc.otherwise(7L).as("w"), $"cents")
      .groupBy($"priority", $"b")
      .agg(sum($"w" * $"cents").as("swx"), sum($"w").as("sw"))
      .filter($"sw" > 0)
      .select($"priority", $"b", expr("swx DIV sw").as("mean_cents"))
    val r = m.select($"priority", $"mean_cents",
      row_number().over(
        Window.partitionBy($"priority").orderBy($"mean_cents", $"b")).as("rk"))
    base.groupBy($"priority")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sc"))
      .select($"priority", $"n", expr("sc DIV n").as("mean_cents"))
      .join(broadcast(r.filter($"rk" === 2)
        .select($"priority", $"mean_cents".as("ci_lo_cents"))), "priority")
      .join(broadcast(r.filter($"rk" === 49)
        .select($"priority", $"mean_cents".as("ci_hi_cents"))), "priority")
      .orderBy($"priority")
  }

  /** One-way ANOVA effect size (η², ppm) of WEEKDAY on each event type's
    * daily counts — "is there a weekly cycle" asked as variance explained,
    * the grouped complement of [[autocorr]]'s lag view. The weekday labels
    * differ across engines (Spark 1–7, DuckDB 0–6) but only the PARTITION
    * they induce matters, and that is identical. η² = (n·Σsg²/ng − s²) /
    * (n·Σc² − s²): every sum is an exact integer; the per-group
    * `sg²·n DIV ng` term floors deterministically (identical in both
    * engines, error < k counts per sum), and the final ratio is one
    * integer floor division. Scale: runs entirely on the |types|×|days|
    * calendar aggregate. */
  val weekdayAnova: QueryDef = QueryDef(
    "stats_weekday_anova",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |dw AS (SELECT event_type, dayofweek(day) AS wd, c FROM d),
      |g AS (SELECT event_type, wd, CAST(count(*) AS BIGINT) AS ng, CAST(sum(c) AS BIGINT) AS sg
      |      FROM dw GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
      |             CAST(sum(c * c) AS BIGINT) AS ss
      |      FROM dw GROUP BY 1),
      |b AS (SELECT g.event_type AS event_type,
      |             CAST(sum(g.sg * g.sg * t.n // g.ng) AS BIGINT) AS between_scaled,
      |             CAST(count(*) AS BIGINT) AS k
      |      FROM g JOIN t ON g.event_type = t.event_type GROUP BY 1)
      |SELECT t.event_type AS event_type, t.n AS n_days, b.k AS k_groups,
      |       CAST((b.between_scaled - t.s * t.s) * 1000000 // (t.n * t.ss - t.s * t.s) AS BIGINT) AS eta2_ppm
      |FROM t JOIN b ON t.event_type = b.event_type
      |ORDER BY event_type""".stripMargin,
  ) { (spark, dir) =>
    val dw = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
      .select($"event_type", dayofweek($"day").as("wd"), $"c")
    val g = dw.groupBy($"event_type", $"wd")
      .agg(count(lit(1)).as("ng"), sum($"c").as("sg"))
    val t = dw.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"), sum($"c" * $"c").as("ss"))
    val b = g.join(broadcast(t), "event_type")
      .groupBy($"event_type")
      .agg(sum(expr("sg * sg * n DIV ng")).as("between_scaled"),
        count(lit(1)).as("k"))
    t.join(broadcast(b), "event_type")
      .select($"event_type", $"n".as("n_days"), $"k".as("k_groups"),
        expr("(between_scaled - s * s) * 1000000 DIV (n * ss - s * s)").as("eta2_ppm"))
      .orderBy($"event_type")
  }

  /** Kendall's τ-b between every PAIR of event types' daily-count series —
    * the rank-concordance complement to [[corrMoments]]'s linear view and
    * [[spearman]]'s rank-linear one. Concordant/discordant/tied pair counts
    * are exact integers from a day-pair self-join (calendar-bounded like
    * [[theilSen]]: days² pairs per type-pair, never events²); τ-b itself is
    * the one identically-parenthesized float at the end. */
  val kendallTau: QueryDef = QueryDef(
    "stats_kendall_tau",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |s AS (SELECT a.event_type AS ta, b.event_type AS tb, a.day AS day, a.c AS x, b.c AS y
      |      FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type),
      |p AS (SELECT s1.ta AS ta, s1.tb AS tb,
      |             CASE WHEN (s1.x - s2.x) * (s1.y - s2.y) > 0 THEN 1 ELSE 0 END AS conc,
      |             CASE WHEN (s1.x - s2.x) * (s1.y - s2.y) < 0 THEN 1 ELSE 0 END AS disc,
      |             CASE WHEN s1.x = s2.x THEN 1 ELSE 0 END AS tiex,
      |             CASE WHEN s1.y = s2.y THEN 1 ELSE 0 END AS tiey
      |      FROM s s1 JOIN s s2 ON s1.ta = s2.ta AND s1.tb = s2.tb AND s1.day < s2.day),
      |m AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n0,
      |             CAST(sum(conc) AS BIGINT) AS nc, CAST(sum(disc) AS BIGINT) AS nd,
      |             CAST(sum(tiex) AS BIGINT) AS n1, CAST(sum(tiey) AS BIGINT) AS n2
      |      FROM p GROUP BY 1, 2)
      |SELECT ta, tb, n0 AS n_pairs, nc AS concordant, nd AS discordant,
      |       round((CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
      |             / sqrt((CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE)) * (CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE))), 6) AS tau_b
      |FROM m ORDER BY ta, tb""".stripMargin,
  ) { (spark, dir) =>
    val d = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
    val s = d.as("a")
      .join(d.as("b"), $"a.day" === $"b.day" && $"a.event_type" < $"b.event_type")
      .select($"a.event_type".as("ta"), $"b.event_type".as("tb"),
        $"a.day".as("day"), $"a.c".as("x"), $"b.c".as("y"))
    val p = s.as("s1")
      .join(s.as("s2"),
        $"s1.ta" === $"s2.ta" && $"s1.tb" === $"s2.tb" && $"s1.day" < $"s2.day")
      .select($"s1.ta".as("ta"), $"s1.tb".as("tb"),
        when(($"s1.x" - $"s2.x") * ($"s1.y" - $"s2.y") > 0, 1).otherwise(0).as("conc"),
        when(($"s1.x" - $"s2.x") * ($"s1.y" - $"s2.y") < 0, 1).otherwise(0).as("disc"),
        when($"s1.x" === $"s2.x", 1).otherwise(0).as("tiex"),
        when($"s1.y" === $"s2.y", 1).otherwise(0).as("tiey"))
    p.groupBy($"ta", $"tb")
      .agg(count(lit(1)).as("n0"), sum($"conc").as("nc"), sum($"disc").as("nd"),
        sum($"tiex").as("n1"), sum($"tiey").as("n2"))
      .select($"ta", $"tb", $"n0".as("n_pairs"),
        $"nc".as("concordant"), $"nd".as("discordant"),
        expr("""round((CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
               / sqrt((CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE)) * (CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE))), 6)""")
          .as("tau_b"))
      .orderBy($"ta", $"tb")
  }

  /** Spearman rank correlation for the same type-pair daily series — ranks
    * are `row_number` under the (value, day) TOTAL order (a deterministic
    * permutation rank both engines replay bit-for-bit; average-rank tie
    * handling would put a float in the shuffle), so ρ = 1 − 6Σd²/(n(n²−1))
    * is exact integer arithmetic all the way to the ppm emit. */
  val spearman: QueryDef = QueryDef(
    "stats_spearman",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |s AS (SELECT a.event_type AS ta, b.event_type AS tb, a.day AS day, a.c AS x, b.c AS y
      |      FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type),
      |r AS (SELECT ta, tb,
      |             row_number() OVER (PARTITION BY ta, tb ORDER BY x, day) AS rx,
      |             row_number() OVER (PARTITION BY ta, tb ORDER BY y, day) AS ry
      |      FROM s),
      |m AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
      |      FROM r GROUP BY 1, 2)
      |SELECT ta, tb, n AS n_days, sum_d2,
      |       (n * (n * n - 1) - 6 * sum_d2) * 1000000 // (n * (n * n - 1)) AS rho_ppm
      |FROM m ORDER BY ta, tb""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
    val s = d.as("a")
      .join(d.as("b"), $"a.day" === $"b.day" && $"a.event_type" < $"b.event_type")
      .select($"a.event_type".as("ta"), $"b.event_type".as("tb"),
        $"a.day".as("day"), $"a.c".as("x"), $"b.c".as("y"))
    val byPair = Window.partitionBy($"ta", $"tb")
    val r = s.select($"ta", $"tb",
      row_number().over(byPair.orderBy($"x", $"day")).as("rx"),
      row_number().over(byPair.orderBy($"y", $"day")).as("ry"))
    r.groupBy($"ta", $"tb")
      .agg(count(lit(1)).as("n"),
        sum(($"rx" - $"ry") * ($"rx" - $"ry")).as("sum_d2"))
      .select($"ta", $"tb", $"n".as("n_days"), $"sum_d2",
        expr("(n * (n * n - 1) - 6 * sum_d2) * 1000000 DIV (n * (n * n - 1))")
          .as("rho_ppm"))
      .orderBy($"ta", $"tb")
  }

  /** Wald–Wolfowitz runs test per event type: is the daily series random
    * around its median, or trending/cyclic? The LOWER median (a real order
    * statistic under the (count, day) total order, same discipline as
    * [[theilSen]]'s pair-slope median) splits days into above/below;
    * equal-to-median days drop (the textbook rule); runs/n1/n2 are exact
    * integers off one per-type lag window, and the normal-approximation z
    * is the single float emit. */
  val runsTest: QueryDef = QueryDef(
    "stats_runs_test",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, day, c,
      |             row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS rk,
      |             count(*) OVER (PARTITION BY event_type) AS cnt
      |      FROM d),
      |med AS (SELECT event_type, c AS m FROM r WHERE rk = (cnt + 1) // 2),
      |s AS (SELECT d.event_type AS event_type, d.day AS day,
      |             CASE WHEN d.c > med.m THEN 1 ELSE 0 END AS sgn
      |      FROM d JOIN med ON d.event_type = med.event_type WHERE d.c <> med.m),
      |q AS (SELECT event_type, sgn,
      |             lag(sgn) OVER (PARTITION BY event_type ORDER BY day) AS prev
      |      FROM s),
      |m2 AS (SELECT event_type,
      |              CAST(sum(CASE WHEN prev IS NULL OR sgn <> prev THEN 1 ELSE 0 END) AS BIGINT) AS runs,
      |              CAST(sum(sgn) AS BIGINT) AS n1, CAST(sum(1 - sgn) AS BIGINT) AS n2
      |       FROM q GROUP BY 1)
      |SELECT event_type, n1 AS n_above, n2 AS n_below, runs,
      |       round((CAST(runs AS DOUBLE) - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
      |             / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
      |                    / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0))), 6) AS z_score
      |FROM m2 WHERE n1 > 0 AND n2 > 0 ORDER BY event_type""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy($"event_type")
    val d = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
    val r = d.select($"event_type", $"day", $"c",
      row_number().over(byType.orderBy($"c", $"day")).as("rk"),
      count(lit(1)).over(byType).as("cnt"))
    val med = r.filter($"rk" === expr("(cnt + 1) DIV 2"))
      .select($"event_type", $"c".as("m"))
    val s = d.join(broadcast(med), "event_type")
      .filter($"c" =!= $"m")
      .select($"event_type", $"day", when($"c" > $"m", 1).otherwise(0).as("sgn"))
    val q = s.select($"event_type", $"sgn",
      lag($"sgn", 1).over(byType.orderBy($"day")).as("prev"))
    q.groupBy($"event_type")
      .agg(sum(when($"prev".isNull || $"sgn" =!= $"prev", 1).otherwise(0)).as("runs"),
        sum($"sgn").as("n1"), sum(lit(1) - $"sgn").as("n2"))
      .filter($"n1" > 0 && $"n2" > 0)
      .select($"event_type", $"n1".as("n_above"), $"n2".as("n_below"), $"runs",
        expr("""round((CAST(runs AS DOUBLE) - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
               / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                      / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0))), 6)""")
          .as("z_score"))
      .orderBy($"event_type")
  }

  /** Gini coefficient of customer-spend concentration per market segment —
    * the inequality metric every revenue dashboard wants next to ABC/Pareto
    * ([[OlapOps]]). Sorted-rank form G = Σ(2i−n−1)xᵢ/(nΣx) with i a
    * `row_number` under the (cents, custkey) total order: equal-spend
    * blocks contribute order-independently (the coefficient sums telescope
    * within a tie block), so the permutation rank is tie-safe, and every
    * shuffled sum is exact (Spark DECIMAL(38,0) / DuckDB's native HUGEINT
    * sum). Scale: per-customer agg keyed o_custkey, one customer-keyed
    * join, then per-segment rank windows — the sort is range-partitionable
    * by (segment, cents) on a cluster, never a global single sort. */
  val giniSegment: QueryDef = QueryDef(
    "stats_gini",
    """WITH x AS (SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      |           FROM orders GROUP BY 1),
      |j AS (SELECT c.c_mktsegment AS segment, x.cents, x.o_custkey
      |      FROM x JOIN customer c ON x.o_custkey = c.c_custkey),
      |r AS (SELECT segment, cents,
      |             row_number() OVER (PARTITION BY segment ORDER BY cents, o_custkey) AS i,
      |             count(*) OVER (PARTITION BY segment) AS n
      |      FROM j),
      |m AS (SELECT segment, CAST(max(n) AS BIGINT) AS n_cust,
      |             CAST(sum(cents) AS HUGEINT) AS total,
      |             CAST(sum(CAST(2 * i - n - 1 AS HUGEINT) * cents) AS HUGEINT) AS gnum
      |      FROM r GROUP BY 1)
      |SELECT segment, n_cust, CAST(total AS BIGINT) AS total_cents,
      |       CAST(gnum * 1000000 // (n_cust * total) AS BIGINT) AS gini_ppm
      |FROM m ORDER BY segment""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val x = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    val j = x.join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("segment"), $"cents", $"o_custkey")
    val bySeg = Window.partitionBy($"segment")
    val r = j.select($"segment", $"cents",
      row_number().over(bySeg.orderBy($"cents", $"o_custkey")).as("i"),
      count(lit(1)).over(bySeg).as("n"))
    r.groupBy($"segment")
      .agg(max($"n").as("n_cust"),
        sum($"cents".cast(dec)).as("total"),
        sum((lit(2) * $"i" - $"n" - 1).cast(dec) * $"cents").as("gnum"))
      .select($"segment", $"n_cust", $"total".cast("long").as("total_cents"),
        expr("CAST(gnum * 1000000 DIV (n_cust * total) AS BIGINT)").as("gini_ppm"))
      .orderBy($"segment")
  }

  /** Ljung–Box portmanteau statistic per event type — "are the first three
    * autocorrelations JOINTLY significant", the hypothesis-test summary of
    * [[autocorr]]'s per-lag view. Each lag's r is the same exact-moment
    * Pearson expression [[autocorr]] emits (documented convention: r over
    * the n−k aligned pairs); the three lags then pivot into COLUMNS so
    * Q = n(n+2)·Σ rₖ²/(n−k) evaluates in one fixed left-to-right float
    * expression — a float SUM aggregate across lags would let partial-agg
    * order flip the last bit. */
  val ljungBox: QueryDef = QueryDef(
    "stats_ljung_box",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |len AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      |l AS (SELECT event_type, c AS x,
      |             lead(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
      |             lead(c, 2) OVER (PARTITION BY event_type ORDER BY day) AS y2,
      |             lead(c, 3) OVER (PARTITION BY event_type ORDER BY day) AS y3
      |      FROM d),
      |p AS (SELECT event_type, 1 AS lag_k, x, y1 AS y FROM l WHERE y1 IS NOT NULL
      |      UNION ALL SELECT event_type, 2, x, y2 FROM l WHERE y2 IS NOT NULL
      |      UNION ALL SELECT event_type, 3, x, y3 FROM l WHERE y3 IS NOT NULL),
      |m AS (SELECT event_type, lag_k, CAST(count(*) AS BIGINT) AS np,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * y) AS BIGINT) AS sxy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
      |      FROM p GROUP BY 1, 2),
      |rr AS (SELECT event_type, lag_k,
      |              (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |              / sqrt((CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                     * (CAST(np AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
      |       FROM m),
      |w AS (SELECT event_type,
      |             max(CASE WHEN lag_k = 1 THEN r END) AS r1,
      |             max(CASE WHEN lag_k = 2 THEN r END) AS r2,
      |             max(CASE WHEN lag_k = 3 THEN r END) AS r3
      |      FROM rr GROUP BY 1)
      |SELECT w.event_type AS event_type, len.n AS n_days,
      |       round(CAST(len.n AS DOUBLE) * (CAST(len.n AS DOUBLE) + 2.0)
      |             * (r1 * r1 / (CAST(len.n AS DOUBLE) - 1.0)
      |                + r2 * r2 / (CAST(len.n AS DOUBLE) - 2.0)
      |                + r3 * r3 / (CAST(len.n AS DOUBLE) - 3.0)), 6) AS q_stat
      |FROM w JOIN len ON w.event_type = len.event_type
      |ORDER BY event_type""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy($"event_type").orderBy($"day")
    val d = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
    val len = d.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val l = d.select($"event_type", $"day", $"c".as("x"),
      lead($"c", 1).over(seq).as("y1"),
      lead($"c", 2).over(seq).as("y2"),
      lead($"c", 3).over(seq).as("y3"))
    val p = (1 to 3).map { k =>
      l.filter(col(s"y$k").isNotNull)
        .select($"event_type", lit(k).as("lag_k"), $"x", col(s"y$k").as("y"))
    }.reduce(_ unionAll _)
    val m = p.groupBy($"event_type", $"lag_k")
      .agg(count(lit(1)).as("np"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
    val rr = m.select($"event_type", $"lag_k",
      expr("""(CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(np AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))""")
        .as("r"))
    val w = rr.groupBy($"event_type")
      .agg(max(when($"lag_k" === 1, $"r")).as("r1"),
        max(when($"lag_k" === 2, $"r")).as("r2"),
        max(when($"lag_k" === 3, $"r")).as("r3"))
    w.join(broadcast(len), "event_type")
      .select($"event_type", $"n".as("n_days"),
        expr("""round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
               * (r1 * r1 / (CAST(n AS DOUBLE) - 1.0)
                  + r2 * r2 / (CAST(n AS DOUBLE) - 2.0)
                  + r3 * r3 / (CAST(n AS DOUBLE) - 3.0)), 6)""").as("q_stat"))
      .orderBy($"event_type")
  }

  /** One-day-ahead forecast per event type by BROWN'S double exponential
    * smoothing (α = ½) — the trend-aware forecaster one step past
    * `a4_ewma`'s level-only smoother, with its error measured against the
    * realized next day. The α=½ kernel TRUNCATES to 8 taps so both
    * smoothing stages are exact integer dot products with power-of-two
    * weights (S1 = Σ yₜ₋ᵢ·2⁷⁻ⁱ/255, S2 the same over S1): the recurrence
    * that normally forces sequential state becomes two 8-lag window
    * expressions over ONE per-type sort, and the forecast
    * F = 3S1 − 2S2 = (3·s1num·255 − 2·s2num)/255² ships as exact
    * milli-units via integer floor division. Warm-up rows (fewer than 15
    * prior days) drop via lag-null propagation. */
  val desForecast: QueryDef = {
    def taps(c: String): String = (0 to 7)
      .map(i => s"lag($c, $i) OVER (PARTITION BY event_type ORDER BY day) * ${1 << (7 - i)}")
      .mkString(" + ")
    QueryDef(
      "stats_des_forecast",
      s"""WITH d AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         |                  CAST(count(*) AS BIGINT) AS c
         |           FROM events GROUP BY 1, 2),
         |w1 AS (SELECT event_type, day, c, ${taps("c")} AS s1num FROM d),
         |w2 AS (SELECT event_type, day, c, s1num, ${taps("s1num")} AS s2num,
         |              lead(day) OVER (PARTITION BY event_type ORDER BY day) AS target_day,
         |              lead(c) OVER (PARTITION BY event_type ORDER BY day) AS actual
         |       FROM w1)
         |SELECT event_type, target_day,
         |       (3 * s1num * 255 - 2 * s2num) * 1000 // 65025 AS forecast_milli,
         |       actual,
         |       abs((3 * s1num * 255 - 2 * s2num) * 1000 // 65025 - actual * 1000) AS abs_err_milli
         |FROM w2 WHERE s2num IS NOT NULL AND actual IS NOT NULL
         |ORDER BY event_type, target_day""".stripMargin,
    ) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy($"event_type").orderBy($"day")
      val d = Tables.events(spark, dir)
        .groupBy($"event_type", to_date($"ts").cast("string").as("day"))
        .agg(count(lit(1)).as("c"))
      val w1 = d.select($"event_type", $"day", $"c",
        (0 to 7).map(i => lag($"c", i).over(seq) * lit(1L << (7 - i)))
          .reduce(_ + _).as("s1num"))
      val w2 = w1.select($"event_type", $"day", $"c", $"s1num",
        (0 to 7).map(i => lag($"s1num", i).over(seq) * lit(1L << (7 - i)))
          .reduce(_ + _).as("s2num"),
        lead($"day", 1).over(seq).as("target_day"),
        lead($"c", 1).over(seq).as("actual"))
      w2.filter($"s2num".isNotNull && $"actual".isNotNull)
        .select($"event_type", $"target_day",
          expr("(3 * s1num * 255 - 2 * s2num) * 1000 DIV 65025").as("forecast_milli"),
          $"actual",
          expr("abs((3 * s1num * 255 - 2 * s2num) * 1000 DIV 65025 - actual * 1000)")
            .as("abs_err_milli"))
        .orderBy($"event_type", $"target_day")
    }
  }

  /** STL-lite SEASONAL DECOMPOSITION per event type: trend (centered 7-day
    * moving total — the classical decomposition's MA, kept as the ×7 SUM
    * so it stays integer), weekly seasonal (mean detrended value per
    * weekday, in exact milli), residual = the rest. Ties [[weekdayAnova]]
    * ("how much variance is weekly") to an actual per-day additive model
    * (`c ≈ trend7/7 + seasonal/7000 + residual/7000`). Weekday LABELS
    * differ across engines but are never emitted — only the partition they
    * induce is used, the weekdayAnova rule. Edge days (incomplete centered
    * window) drop by the cnt7 = 7 filter. */
  val seasonalDecompose: QueryDef = QueryDef(
    "stats_seasonal_decompose",
    """WITH d AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |                  dayofweek(CAST(ts AS DATE)) AS wd,
      |                  datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
      |                  CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2, 3, 4),
      |t AS (SELECT event_type, day, wd, c,
      |             sum(c) OVER (PARTITION BY event_type ORDER BY dn
      |                          RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend7,
      |             count(*) OVER (PARTITION BY event_type ORDER BY dn
      |                            RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
      |      FROM d),
      |f AS (SELECT event_type, day, wd, c, CAST(trend7 AS BIGINT) AS trend7,
      |             CAST(7 * c - trend7 AS BIGINT) AS det_x7
      |      FROM t WHERE cnt7 = 7),
      |sea AS (SELECT event_type, wd,
      |               CAST(sum(det_x7) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT) AS seasonal_x7_milli
      |        FROM f GROUP BY 1, 2)
      |SELECT f.event_type AS event_type, f.day AS day, f.c AS c, f.trend7 AS trend7_sum,
      |       sea.seasonal_x7_milli AS seasonal_x7_milli,
      |       CAST(f.det_x7 * 1000 - sea.seasonal_x7_milli AS BIGINT) AS residual_x7_milli
      |FROM f JOIN sea ON f.event_type = sea.event_type AND f.wd = sea.wd
      |ORDER BY event_type, day""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val frame = Window.partitionBy($"event_type").orderBy($"dn")
      .rangeBetween(-3, 3)
    val d = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").cast("string").as("day"),
        dayofweek(to_date($"ts")).as("wd"),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date")).as("dn"))
      .agg(count(lit(1)).as("c"))
    val f = d
      .select($"event_type", $"day", $"wd", $"c",
        sum($"c").over(frame).as("trend7"),
        count(lit(1)).over(frame).as("cnt7"))
      .filter($"cnt7" === 7)
      .select($"event_type", $"day", $"wd", $"c", $"trend7",
        (lit(7) * $"c" - $"trend7").as("det_x7"))
    val sea = f.groupBy($"event_type", $"wd")
      .agg(expr("sum(det_x7) * 1000 DIV count(*)").as("seasonal_x7_milli"))
    f.join(broadcast(sea), Seq("event_type", "wd"))
      .select($"event_type", $"day", $"c", $"trend7".as("trend7_sum"),
        $"seasonal_x7_milli",
        ($"det_x7" * 1000 - $"seasonal_x7_milli").as("residual_x7_milli"))
      .orderBy($"event_type", $"day")
  }

  /** Empirical-Bayes SHRINKAGE of per-customer urgent-order rates toward
    * the global rate (beta-binomial posterior mean with prior strength
    * k = 20): the denoising step every per-entity rate dashboard needs —
    * a 2-order customer at 50% urgent must not outrank a 40-order one at
    * 45%. shrunk = (x·10⁶ + k·m_ppm) DIV (n + k), all exact integers; the
    * 1-row global rate re-enters by broadcast. The Bayesian sibling of
    * [[targetEncode]]'s leave-one-out encoding. */
  val ebShrinkage: QueryDef = QueryDef(
    "stats_eb_shrinkage",
    """WITH per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
      |                    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS x
      |             FROM orders GROUP BY 1),
      |g AS (SELECT CAST(sum(x) AS BIGINT) * 1000000 // CAST(sum(n) AS BIGINT) AS m_ppm FROM per)
      |SELECT o_custkey, n, x,
      |       x * 1000000 // n AS raw_ppm,
      |       (x * 1000000 + 20 * g.m_ppm) // (n + 20) AS shrunk_ppm
      |FROM per CROSS JOIN g
      |ORDER BY o_custkey""".stripMargin,
  ) { (spark, dir) =>
    val per = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L)).as("x"))
    val g = per.agg(expr("sum(x) * 1000000 DIV sum(n)").as("m_ppm"))
    per.crossJoin(broadcast(g))
      .select($"o_custkey", $"n", $"x",
        expr("x * 1000000 DIV n").as("raw_ppm"),
        expr("(x * 1000000 + 20 * m_ppm) DIV (n + 20)").as("shrunk_ppm"))
      .orderBy($"o_custkey")
  }

  /** Hashing-trick CROSSED feature (nation × segment → 64 buckets via the
    * portable 60-bit md5): the feature-engineering staple that makes
    * high-cardinality crosses trainable without a vocabulary — the bucket
    * id IS the feature index, no fit step, no dictionary to ship. The
    * readout is the collision diagnostic a pipeline checks before trusting
    * the hash width: rows and DISTINCT raw crosses per bucket (>1 cross in
    * a bucket = a collision the model cannot tell apart).
    *
    * Scale shape: map-side hash, one bounded (≤64-group) aggregate; the
    * distinct-cross count is bounded by the true cross cardinality (125),
    * never the row count. Same plan at any SF. */
  val hashedCross: QueryDef = QueryDef(
    "feat_hashed_cross",
    """WITH x AS (SELECT ('0x' || substr(md5(CAST(c_nationkey AS VARCHAR) || ':' || c_mktsegment), 1, 15))::BIGINT % 64 AS bucket,
      |                  CAST(c_nationkey AS VARCHAR) || ':' || c_mktsegment AS cross_key
      |           FROM customer)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(DISTINCT cross_key) AS BIGINT) AS n_crosses,
      |       CAST(CASE WHEN count(DISTINCT cross_key) > 1 THEN 1 ELSE 0 END AS BIGINT) AS collided
      |FROM x GROUP BY bucket ORDER BY bucket""".stripMargin,
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .select(concat($"c_nationkey".cast("string"), lit(":"), $"c_mktsegment")
        .as("cross_key"))
      .withColumn("bucket", call_function("md5hash60", $"cross_key") % 64)
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"cross_key").as("n_crosses"))
      .select($"bucket", $"n_rows", $"n_crosses",
        ($"n_crosses" > 1).cast("long").as("collided"))
      .orderBy($"bucket")
  }

  /** Weight-of-evidence (WOE) encoding of order priority against the
    * `o_orderstatus = 'F'` target, with each category's information-value
    * term — the credit-scoring-style categorical encoder (Siddiqi 2006)
    * next to the leave-one-out mean ([[targetEncode]]): WOE is the
    * log-odds of the category's positive share vs its negative share, so
    * the encoded value is monotone in the category's lift and 0 for an
    * uninformative category.
    *
    * Determinism: counts are exact BIGINTs; the ×2+1 smoothing (the
    * standard ±0.5 Laplace shift kept integral by doubling) makes the
    * odds-ratio argument an exact integer ratio, and the single `ln` is
    * the repo's double-rounded log pattern (`round(round(ln(x),6)·1e6)`),
    * bit-stable cross-engine. The IV term multiplies two already-exact
    * integers (share gap in ppm × woe in micros), so the shuffled sum a
    * full IV would take is exact too.
    *
    * Scale shape: one 5-group aggregate + a broadcast totals row; the
    * encoder table is category-sized at any SF. */
  val woeEncode: QueryDef = {
    val woeMicro =
      "CAST(round(round(ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)), 6) * 1000000) AS BIGINT)"
    QueryDef(
      "feat_woe",
      s"""WITH c AS (SELECT o_orderpriority AS cat,
         |                  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         |                  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS neg
         |           FROM orders GROUP BY 1),
         |t AS (SELECT CAST(sum(pos) AS BIGINT) AS pos_tot, CAST(sum(neg) AS BIGINT) AS neg_tot FROM c),
         |r AS (SELECT c.cat, c.pos, c.neg,
         |             (2 * c.pos + 1) * (2 * t.neg_tot + 1) AS num,
         |             (2 * c.neg + 1) * (2 * t.pos_tot + 1) AS den,
         |             c.pos * 1000000 // t.pos_tot - c.neg * 1000000 // t.neg_tot AS gap_ppm
         |      FROM c, t)
         |SELECT cat, pos, neg, $woeMicro AS woe_micro,
         |       CAST(gap_ppm * $woeMicro AS BIGINT) AS iv_term_scaled
         |FROM r ORDER BY cat""".stripMargin,
    ) { (spark, dir) =>
      val c = Tables.orders(spark, dir)
        .groupBy($"o_orderpriority".as("cat"))
        .agg(sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("pos"),
          sum(when($"o_orderstatus" === "F", 0L).otherwise(1L)).as("neg"))
      val t = c.agg(sum($"pos").as("pos_tot"), sum($"neg").as("neg_tot"))
      c.crossJoin(broadcast(t))
        .select($"cat", $"pos", $"neg",
          ((lit(2) * $"pos" + 1) * (lit(2) * $"neg_tot" + 1)).as("num"),
          ((lit(2) * $"neg" + 1) * (lit(2) * $"pos_tot" + 1)).as("den"),
          (expr("pos * 1000000 DIV pos_tot") - expr("neg * 1000000 DIV neg_tot"))
            .as("gap_ppm"))
        .select($"cat", $"pos", $"neg",
          expr(woeMicro).as("woe_micro"),
          (expr("gap_ppm") * expr(woeMicro)).cast("long").as("iv_term_scaled"))
        .orderBy($"cat")
    }
  }

  /** Label shuffles drawn by [[permTest]]. */
  private val PermB = 16

  /** EXACT permutation test (Fisher 1935 randomization form) for "do
    * urgent orders carry more money than chance?": the observed statistic
    * is the total price (in exact cents) of the URGENT group; each of
    * [[PermB]] deterministic permutations re-deals the SAME group sizes
    * by ranking rows under a per-permutation md5 hash and labeling the
    * first n_a ranks "urgent". Unlike [[bootstrapCi]] (row resampling,
    * one group) this is the two-group LABEL shuffle — the
    * distribution-free significance test for a group contrast, reported
    * as one row per permutation (stat_cents, ge_obs) so the p-value is
    * (1 + Σ ge_obs) / (B + 1) at the reader.
    *
    * Scale shape: the only heavy operation is ONE [[ParallelRank]] range
    * shuffle over the ×B-exploded fact rows — per-permutation ranks fall
    * out of the single global order (rank − perm·n) because each
    * permutation's block is contiguous and exactly n rows — never a
    * B-partition window (a 16-way fan-out cap is precisely the
    * anti-pattern the rank machinery exists to avoid); group sizes and
    * the observed statistic ride a broadcast 1-row frame. */
  val permTest: QueryDef = QueryDef(
    "stats_perm_test",
    s"""WITH pbase AS (SELECT o_orderkey,
       |                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       |                     (o_orderpriority = '1-URGENT') AS is_a
       |              FROM orders),
       |pst AS (SELECT count(*) AS n,
       |               sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
       |               sum(CASE WHEN is_a THEN cents ELSE 0 END) AS obs
       |        FROM pbase),
       |pex AS (SELECT b.o_orderkey, b.cents, p.perm,
       |               ('0x' || substr(md5(CAST(p.perm AS VARCHAR) || ':' || CAST(b.o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
       |        FROM pbase b, unnest(range(0, $PermB)) AS p(perm)),
       |prk AS (SELECT perm, cents,
       |               row_number() OVER (PARTITION BY perm ORDER BY h, o_orderkey) AS r
       |        FROM pex)
       |SELECT perm, CAST(sum(cents) AS BIGINT) AS stat_cents,
       |       CAST(CASE WHEN sum(cents) >= (SELECT obs FROM pst) THEN 1 ELSE 0 END AS BIGINT) AS ge_obs
       |FROM prk, pst WHERE r <= pst.n_a
       |GROUP BY perm ORDER BY perm""".stripMargin,
  ) { (spark, dir) => permTestOf(Tables.orders(spark, dir)) }

  /** [[permTest]] over any (o_orderkey, o_totalprice, o_orderpriority)
    * frame — fixture seam. */
  private[graft] def permTestOf(orders: DataFrame): DataFrame = {
    val base = graft.Caches.persist(orders.select($"o_orderkey",
      round($"o_totalprice" * 100).cast("long").as("cents"),
      ($"o_orderpriority" === "1-URGENT").as("is_a")))
    val st = base.agg(count(lit(1)).as("n"),
      sum(when($"is_a", 1L).otherwise(0L)).as("n_a"),
      sum(when($"is_a", $"cents").otherwise(0L)).as("obs"))
    val exploded = base.select($"o_orderkey", $"cents",
      explode(sequence(lit(0L), lit(PermB - 1L))).as("perm"))
      .withColumn("h", call_function("md5hash60",
        concat($"perm".cast("string"), lit(":"),
          $"o_orderkey".cast("string"))))
    ParallelRank.withGlobalRank(exploded,
        Seq($"perm", $"h", $"o_orderkey"), "grk")
      .crossJoin(broadcast(st))
      .filter($"grk" - $"perm" * $"n" <= $"n_a")
      .groupBy($"perm")
      .agg(sum($"cents").as("stat_cents"), max($"obs").as("obs"))
      .select($"perm", $"stat_cents",
        when($"stat_cents" >= $"obs", 1L).otherwise(0L).as("ge_obs"))
      .orderBy($"perm")
  }

  val all: Seq[QueryDef] =
    Seq(corrMoments, linreg, histogram, quantileBucket, profileOrders,
      madOutliers, chi2, ksTest, mannWhitney, targetEncode,
      weightedMedian, winsorize, cusumChange, autocorr, theilSen,
      bootstrapCi, weekdayAnova, kendallTau, spearman, runsTest,
      giniSegment, ljungBox, desForecast, seasonalDecompose, ebShrinkage,
      hashedCross, woeEncode, permTest)
}
