package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Behavioral sequence analytics over the events stream — the "what do
  * users do, in what order, and which touches drive outcomes" family a
  * product warehouse asks right after the windowed basics (`a4_*`) are in
  * place. The reference's closest analog is the recommender's co-occurrence
  * mining (ipynb:1476-1530), which ignores order; these operators are the
  * ORDER-aware counterparts: Markov transitions, frequent sub-sequences,
  * and touch attribution (last-touch and linear/multi-touch).
  *
  * Scale shape shared by all four: one shuffle on `user_id`, a per-user
  * time-ordered window (state linear in the user's events, no self-join),
  * then a tiny aggregate over event-type keys (≤5 distinct types, ≤125
  * trigrams). Nothing here re-expands the events table; the per-user sort
  * is the same partitioning every `a4_*` window op already pays, so on a
  * cluster these pipeline over the identical exchange.
  *
  * Determinism: sequence order is (`ts`, `event_id`) — a total order, so
  * lead/lag picks are engine-independent; all money/value math is quantized
  * to exact integers (`floor(x*100 + 0.5)` cents, floor-division
  * allocation) BEFORE any shuffled sum, the repo-wide oracle discipline.
  */
object SeqOps {

  private val SevenDaysUs = 604800000000L // 7 days in µs

  /** First-order Markov transition matrix over per-user event-type
    * sequences: for each (current, next) pair the transition count and the
    * per-row-exact probability in parts-per-million (integer floor
    * division — no float ever crosses an engine boundary). */
  val transitionProbs: QueryDef = QueryDef(
    "seq_transition_probs",
    """WITH s AS (SELECT event_type AS cur,
      |                  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      |           FROM events),
      |t AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n_trans
      |      FROM s WHERE nxt IS NOT NULL GROUP BY cur, nxt)
      |SELECT cur, nxt, n_trans,
      |       CAST(n_trans * 1000000 // sum(n_trans) OVER (PARTITION BY cur) AS BIGINT) AS prob_ppm
      |FROM t ORDER BY cur, nxt""".stripMargin,
  ) { (spark, dir) =>
    val seq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val t = Tables.events(spark, dir)
      .select($"event_type".as("cur"),
        lead($"event_type", 1).over(seq).as("nxt"))
      .filter($"nxt".isNotNull)
      .groupBy($"cur", $"nxt").agg(count(lit(1)).as("n_trans"))
    t.withColumn("prob_ppm",
        expr("n_trans * 1000000 DIV sum(n_trans) OVER (PARTITION BY cur)"))
      .orderBy($"cur", $"nxt")
  }

  /** Top-20 most frequent event-type trigrams (ordered sub-sequences of
    * length 3 within a user's stream) — the sequential-pattern head a
    * next-action model trains on. Two leads over the same per-user window
    * (one sort), then a ≤125-key aggregate. */
  val trigramTopk: QueryDef = QueryDef(
    "seq_trigram_topk",
    """WITH s AS (SELECT event_type AS t1,
      |                  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
      |                  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
      |           FROM events)
      |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
      |FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY t1, t2, t3
      |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin,
  ) { (spark, dir) =>
    val seq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"event_type".as("t1"),
        lead($"event_type", 1).over(seq).as("t2"),
        lead($"event_type", 2).over(seq).as("t3"))
      .filter($"t2".isNotNull && $"t3".isNotNull)
      .groupBy($"t1", $"t2", $"t3").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"t1", $"t2", $"t3")
      .limit(20)
  }

  /** Last-touch attribution summary: each purchase credits its user's most
    * recent prior (or simultaneous) marketing touch — click or view —
    * within a 7-day lookback; revenue rolls up per winning channel, with
    * an explicit `(none)` row for unattributed purchases.
    *
    * Composes [[AsofOps.asofJoin]] (purchases = left, touches = right
    * carrying their channel) — the backward as-of is exactly "latest prior
    * touch", so this is operator reuse, not a new join. The horizon is
    * applied AFTER the match (a too-old touch nulls the attribution rather
    * than yielding the next-older one), matching `asof_click_next_purchase`'s
    * attribution-window convention. */
  val lastTouch: QueryDef = QueryDef(
    "attr_last_touch",
    """WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
      |t0 AS (SELECT user_id, ts, event_id, event_type,
      |              row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |       FROM events WHERE event_type IN ('click', 'view')),
      |t AS (SELECT user_id, ts, event_type AS channel FROM t0 WHERE rn = 1),
      |j AS (SELECT p.event_id, p.value,
      |             CASE WHEN epoch_us(p.ts) - epoch_us(t.ts) <= 604800000000
      |                  THEN t.channel END AS channel
      |      FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND t.ts <= p.ts)
      |SELECT coalesce(channel, '(none)') AS channel,
      |       CAST(count(*) AS BIGINT) AS n_purchases,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM j GROUP BY 1 ORDER BY channel""".stripMargin,
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    // one touch per (user, ts): max event id wins, same rule both engines
    val touches = ev.filter($"event_type".isin("click", "view"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"ts").orderBy(desc("event_id"))))
      .filter($"rn" === 1)
      .select($"user_id", $"ts", $"event_type".as("channel"),
        unix_micros($"ts").as("t_us"))
    AsofOps.asofJoin(purchases, touches, "user_id", "ts",
      payload = Seq("channel", "t_us"))
      .select($"event_id", $"value",
        when(unix_micros($"ts") - $"asof_t_us" <= SevenDaysUs,
          $"asof_channel").as("channel"))
      .groupBy(coalesce($"channel", lit("(none)")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(floor($"value" * 100 + 0.5).cast("long")).as("revenue_cents"))
      .orderBy($"channel")
  }

  /** Linear (multi-touch) attribution: each purchase's value is split
    * EQUALLY across every click/view the user made in the preceding 7
    * days, and the shares roll up per channel — the fractional-credit
    * model next to [[lastTouch]]'s winner-takes-all.
    *
    * No purchase×touch join materializes: touches and purchases union into
    * one per-user stream and two conditional counts over a RANGE frame
    * (7 days preceding → current row, on the µs axis) give each purchase
    * its per-channel touch counts in a single sort — the same
    * one-shuffle-per-user shape as every window op here, immune to the
    * quadratic blowup an interval join would risk on a heavy user.
    * Allocation is exact integer floor division of cents (remainder cents
    * are dropped deterministically, recorded via the total), so the final
    * per-channel sums are engine-exact. */
  val linearAttribution: QueryDef = QueryDef(
    "attr_linear",
    """WITH u AS (SELECT user_id, ts, event_id, event_type, value,
      |                  CAST(epoch_us(ts) AS BIGINT) AS us,
      |                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c,
      |                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v
      |           FROM events WHERE event_type IN ('purchase', 'click', 'view')),
      |w AS (SELECT user_id, event_id, event_type, value,
      |             sum(is_c) OVER (PARTITION BY user_id ORDER BY us
      |                             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS n_c,
      |             sum(is_v) OVER (PARTITION BY user_id ORDER BY us
      |                             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS n_v
      |      FROM u),
      |p AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, n_c, n_v
      |      FROM w WHERE event_type = 'purchase'),
      |alloc AS (
      |  SELECT 'click' AS channel,
      |         CASE WHEN n_c > 0 THEN cents * n_c // (n_c + n_v) ELSE 0 END AS a,
      |         CASE WHEN n_c > 0 THEN 1 ELSE 0 END AS touched
      |  FROM p
      |  UNION ALL
      |  SELECT 'view' AS channel,
      |         CASE WHEN n_v > 0 THEN cents * n_v // (n_c + n_v) ELSE 0 END AS a,
      |         CASE WHEN n_v > 0 THEN 1 ELSE 0 END AS touched
      |  FROM p)
      |SELECT channel, CAST(sum(touched) AS BIGINT) AS n_purchases_touched,
      |       CAST(sum(a) AS BIGINT) AS attributed_cents
      |FROM alloc GROUP BY channel ORDER BY channel""".stripMargin,
  ) { (spark, dir) =>
    val u = Tables.events(spark, dir)
      .filter($"event_type".isin("purchase", "click", "view"))
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("us"),
        when($"event_type" === "click", 1L).otherwise(0L).as("is_c"),
        when($"event_type" === "view", 1L).otherwise(0L).as("is_v"))
    val frame = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-SevenDaysUs, 0)
    val p = u
      .select($"event_type", $"value",
        sum($"is_c").over(frame).as("n_c"),
        sum($"is_v").over(frame).as("n_v"))
      .filter($"event_type" === "purchase")
      .select(floor($"value" * 100 + 0.5).cast("long").as("cents"),
        $"n_c", $"n_v")
    val click = p.select(lit("click").as("channel"),
      when($"n_c" > 0, expr("cents * n_c DIV (n_c + n_v)")).otherwise(0L).as("a"),
      when($"n_c" > 0, 1L).otherwise(0L).as("touched"))
    val view = p.select(lit("view").as("channel"),
      when($"n_v" > 0, expr("cents * n_v DIV (n_c + n_v)")).otherwise(0L).as("a"),
      when($"n_v" > 0, 1L).otherwise(0L).as("touched"))
    click.unionAll(view)
      .groupBy($"channel")
      .agg(sum($"touched").as("n_purchases_touched"),
        sum($"a").as("attributed_cents"))
      .orderBy($"channel")
  }

  /** Gaps-and-islands: per-user runs of CONSECUTIVE active days (an
    * "island" = a maximal streak with no gap), summarized as active days,
    * number of streaks, and the longest streak with its start date — the
    * classic engagement-streak question a sessionize can't answer because
    * it reasons in timestamps, not calendar days.
    *
    * The island key is the textbook `day_number − row_number()` trick: the
    * difference is constant exactly within a consecutive run, so islands
    * fall out of one per-user window sort plus a (user, island) aggregate —
    * no self-join, no recursion. Both shuffles are user-keyed (the same
    * exchange every other per-user window op here pays), and state per user
    * is one row per DISTINCT active day — bounded by the calendar, not the
    * event volume, so a 100 TB replay shrinks to |users|×|days| rows at the
    * first DISTINCT. The per-user winner is picked by an explicit
    * `(len DESC, start)` row_number on both engines — no arg_max tie
    * ambiguity crosses the oracle boundary. */
  val gapsIslands: QueryDef = QueryDef(
    "seq_gaps_islands",
    """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |d AS (SELECT user_id, day, datediff('day', DATE '1970-01-01', day) AS dn FROM a),
      |g AS (SELECT user_id, day, dn,
      |             dn - row_number() OVER (PARTITION BY user_id ORDER BY dn) AS grp
      |      FROM d),
      |i AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
      |             min(dn) AS start_dn, min(day) AS start_day
      |      FROM g GROUP BY 1, 2),
      |r AS (SELECT user_id, len, start_day,
      |             row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start_dn) AS rk,
      |             CAST(sum(len) OVER (PARTITION BY user_id) AS BIGINT) AS active_days,
      |             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_streaks
      |      FROM i)
      |SELECT user_id, active_days, n_streaks, len AS longest_streak,
      |       CAST(start_day AS VARCHAR) AS longest_start
      |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,
  ) { (spark, dir) =>
    val days = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .withColumn("dn", datediff($"day", lit("1970-01-01").cast("date")))
    val islands = days
      .withColumn("grp",
        $"dn" - row_number().over(Window.partitionBy($"user_id").orderBy($"dn")))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"), min($"dn").as("start_dn"),
        min($"day").as("start_day"))
    val perUser = Window.partitionBy($"user_id")
    islands
      .select($"user_id", $"len", $"start_day",
        row_number().over(perUser.orderBy($"len".desc, $"start_dn")).as("rk"),
        sum($"len").over(perUser).as("active_days"),
        count(lit(1)).over(perUser).as("n_streaks"))
      .filter($"rk" === 1)
      .select($"user_id", $"active_days", $"n_streaks",
        $"len".as("longest_streak"),
        date_format($"start_day", "yyyy-MM-dd").as("longest_start"))
      .orderBy($"user_id")
  }

  /** Association rules over daily per-user "baskets" (the set of event
    * types a user produced on one calendar day): for every ordered pair
    * A→B the support, confidence, and lift, each as exact integer
    * parts-per-million — market-basket mining's co-occurrence heart,
    * order-free where [[transitionProbs]] is order-aware.
    *
    * Scale shape: the first DISTINCT collapses the event stream to
    * ≤ |users|·|days|·|types| basket-item rows; the pair generator is a
    * self-join keyed on the FULL basket id (user, day), so fan-out per
    * basket is |basket|² ≤ 25 — the same bounded-candidate discipline as
    * the LSH band joins, never a cross join. Item counts (≤5 rows) and the
    * basket total (1 row) re-enter by broadcast. All three metrics are
    * integer floor divisions; `pair_n · n_baskets · 10⁶` stays far under
    * Long range here (documented: at extreme basket counts the lift
    * numerator is the first thing to re-scale). */
  val assocRules: QueryDef = QueryDef(
    "seq_assoc_rules",
    """WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets
      |       FROM (SELECT DISTINCT user_id, day FROM b)),
      |i AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
      |p AS (SELECT x.event_type AS ante, y.event_type AS cons, CAST(count(*) AS BIGINT) AS pair_n
      |      FROM b x JOIN b y ON x.user_id = y.user_id AND x.day = y.day
      |                        AND x.event_type <> y.event_type
      |      GROUP BY 1, 2)
      |SELECT p.ante, p.cons, p.pair_n,
      |       CAST(p.pair_n * 1000000 // nb.n_baskets AS BIGINT) AS supp_ppm,
      |       CAST(p.pair_n * 1000000 // ia.c AS BIGINT) AS conf_ppm,
      |       CAST(p.pair_n * nb.n_baskets * 1000000 // (ia.c * ic.c) AS BIGINT) AS lift_ppm
      |FROM p CROSS JOIN nb
      |JOIN i ia ON p.ante = ia.event_type
      |JOIN i ic ON p.cons = ic.event_type
      |ORDER BY ante, cons""".stripMargin,
  ) { (spark, dir) =>
    val b = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day"), $"event_type").distinct()
    val nBaskets = b.select($"user_id", $"day").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val items = b.groupBy($"event_type").agg(count(lit(1)).as("c"))
    val pairs = b.as("x")
      .join(b.as("y"),
        $"x.user_id" === $"y.user_id" && $"x.day" === $"y.day" &&
          $"x.event_type" =!= $"y.event_type")
      .groupBy($"x.event_type".as("ante"), $"y.event_type".as("cons"))
      .agg(count(lit(1)).as("pair_n"))
    pairs
      .crossJoin(broadcast(nBaskets))
      .join(broadcast(items.select($"event_type".as("ante"), $"c".as("c_a"))), "ante")
      .join(broadcast(items.select($"event_type".as("cons"), $"c".as("c_c"))), "cons")
      .select($"ante", $"cons", $"pair_n",
        expr("pair_n * 1000000 DIV n_baskets").as("supp_ppm"),
        expr("pair_n * 1000000 DIV c_a").as("conf_ppm"),
        expr("pair_n * n_baskets * 1000000 DIV (c_a * c_c)").as("lift_ppm"))
      .orderBy($"ante", $"cons")
  }

  /** Time-to-convert distribution: for each purchase, the lag to its
    * user's most recent prior view (backward as-of — operator reuse, like
    * [[lastTouch]]), summarized per purchase day as nearest-rank p25/p50/
    * p75 in whole seconds. Order statistics are REAL ranks over a
    * (lag, event_id) total order — never interpolated — so the quartiles
    * are engine-exact integers. Unmatched purchases (no prior view) drop,
    * mirroring the oracle's inner ASOF JOIN. Scale: the as-of is the
    * one-sort merge every as-of op here pays; ranks run per |days| group. */
  val timeToConvert: QueryDef = QueryDef(
    "seq_time_to_convert",
    """WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
      |v0 AS (SELECT user_id, ts, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |       FROM events WHERE event_type = 'view'),
      |v AS (SELECT user_id, ts FROM v0 WHERE rn = 1),
      |j AS (SELECT p.event_id, CAST(p.ts AS DATE) AS day,
      |             (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS lag_s
      |      FROM p ASOF JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts),
      |r AS (SELECT day, event_id, lag_s,
      |             row_number() OVER (PARTITION BY day ORDER BY lag_s, event_id) AS rk,
      |             count(*) OVER (PARTITION BY day) AS n
      |      FROM j)
      |SELECT CAST(day AS VARCHAR) AS day, CAST(max(n) AS BIGINT) AS n_conversions,
      |       max(CASE WHEN rk = (25 * n + 99) // 100 THEN lag_s END) AS p25_s,
      |       max(CASE WHEN rk = (50 * n + 99) // 100 THEN lag_s END) AS p50_s,
      |       max(CASE WHEN rk = (75 * n + 99) // 100 THEN lag_s END) AS p75_s
      |FROM r GROUP BY day ORDER BY day""".stripMargin,
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val views = ev.filter($"event_type" === "view")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"ts").orderBy(desc("event_id"))))
      .filter($"rn" === 1)
      .select($"user_id", $"ts", unix_micros($"ts").as("t_us"))
    val j = AsofOps.asofJoin(purchases, views, "user_id", "ts", payload = Seq("t_us"))
      .filter($"asof_t_us".isNotNull)
      .select($"event_id", to_date($"ts").as("day"),
        expr("(unix_micros(ts) - asof_t_us) DIV 1000000").as("lag_s"))
    val day = Window.partitionBy($"day")
    j.select($"day", $"lag_s",
        row_number().over(day.orderBy($"lag_s", $"event_id")).as("rk"),
        count(lit(1)).over(day).as("n"))
      .groupBy($"day")
      .agg(max($"n").as("n_conversions"),
        max(when($"rk" === expr("(25 * n + 99) DIV 100"), $"lag_s")).as("p25_s"),
        max(when($"rk" === expr("(50 * n + 99) DIV 100"), $"lag_s")).as("p50_s"),
        max(when($"rk" === expr("(75 * n + 99) DIV 100"), $"lag_s")).as("p75_s"))
      .select(date_format($"day", "yyyy-MM-dd").as("day"),
        $"n_conversions", $"p25_s", $"p50_s", $"p75_s")
      .orderBy($"day")
  }

  private val DayUs = 86400000000L // 24h in µs

  /** Time-decay (multi-touch) attribution: each purchase's value splits
    * across its user's prior-week clicks/views weighted by 2^(−⌊Δ/day⌋) —
    * recency-weighted credit between [[lastTouch]]'s winner-takes-all and
    * [[linearAttribution]]'s equal split.
    *
    * Same no-join architecture as [[linearAttribution]], one step further:
    * the decay kernel DECOMPOSES into whole-day buckets (⌊Δ/day⌋ = d ⇔
    * Δ ∈ [d·day, (d+1)·day)), so each bucket is one RANGE frame
    * [(d+1)·day−1 PRECEDING, d·day PRECEDING] over the SAME per-user sort
    * — 7 buckets × 2 channels = 14 window aggregates, one exchange, and
    * the weight sum Σ 2^(6−d)·count_d is exact integer arithmetic (the
    * powers of two never leave ℤ). Horizon is the half-open Δ < 7 days
    * (vs [[linearAttribution]]'s inclusive ≤ — the bucket decomposition's
    * natural boundary, documented divergence). Allocation is the same
    * exact floor division of cents. */
  val timeDecayAttribution: QueryDef = {
    def frameSql(pfx: String, d: Int): String =
      s"""sum(is_$pfx) OVER (PARTITION BY user_id ORDER BY us
         |  RANGE BETWEEN ${(d + 1) * DayUs - 1} PRECEDING AND ${d * DayUs} PRECEDING) AS ${pfx}$d""".stripMargin
    val frames = (0 to 6).flatMap(d => Seq(frameSql("c", d), frameSql("v", d)))
      .mkString(",\n             ")
    def wSum(pfx: String): String =
      (0 to 6).map(d => s"${1L << (6 - d)} * coalesce($pfx$d, 0)").mkString(" + ")
    QueryDef(
      "attr_time_decay",
      s"""WITH u AS (SELECT user_id, ts, event_id, event_type, value,
         |                  CAST(epoch_us(ts) AS BIGINT) AS us,
         |                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c,
         |                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v
         |           FROM events WHERE event_type IN ('purchase', 'click', 'view')),
         |w AS (SELECT user_id, event_id, event_type, value,
         |             $frames
         |      FROM u),
         |p AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         |             ${wSum("c")} AS wc,
         |             ${wSum("v")} AS wv
         |      FROM w WHERE event_type = 'purchase'),
         |alloc AS (
         |  SELECT 'click' AS channel,
         |         CASE WHEN wc > 0 THEN cents * wc // (wc + wv) ELSE 0 END AS a,
         |         CASE WHEN wc > 0 THEN 1 ELSE 0 END AS touched
         |  FROM p
         |  UNION ALL
         |  SELECT 'view' AS channel,
         |         CASE WHEN wv > 0 THEN cents * wv // (wc + wv) ELSE 0 END AS a,
         |         CASE WHEN wv > 0 THEN 1 ELSE 0 END AS touched
         |  FROM p)
         |SELECT channel, CAST(sum(touched) AS BIGINT) AS n_purchases_touched,
         |       CAST(sum(a) AS BIGINT) AS attributed_cents
         |FROM alloc GROUP BY channel ORDER BY channel""".stripMargin,
    ) { (spark, dir) =>
      val byUser = Window.partitionBy($"user_id").orderBy($"us")
      val u = Tables.events(spark, dir)
        .filter($"event_type".isin("purchase", "click", "view"))
        .select($"user_id", $"event_id", $"event_type", $"value",
          unix_micros($"ts").as("us"),
          when($"event_type" === "click", 1L).otherwise(0L).as("is_c"),
          when($"event_type" === "view", 1L).otherwise(0L).as("is_v"))
      val w = (0 to 6).foldLeft(u) { (df, d) =>
        val frame = byUser.rangeBetween(-((d + 1) * DayUs - 1), -(d.toLong * DayUs))
        df.withColumn(s"c$d", sum($"is_c").over(frame))
          .withColumn(s"v$d", sum($"is_v").over(frame))
      }
      def wSumCol(pfx: String) = (0 to 6)
        .map(d => lit(1L << (6 - d)) * coalesce(col(s"$pfx$d"), lit(0L)))
        .reduce(_ + _)
      val p = w.filter($"event_type" === "purchase")
        .select(floor($"value" * 100 + 0.5).cast("long").as("cents"),
          wSumCol("c").as("wc"), wSumCol("v").as("wv"))
      val alloc = p.select(lit("click").as("channel"),
          when($"wc" > 0, expr("cents * wc DIV (wc + wv)")).otherwise(0L).as("a"),
          when($"wc" > 0, 1L).otherwise(0L).as("touched"))
        .unionAll(p.select(lit("view").as("channel"),
          when($"wv" > 0, expr("cents * wv DIV (wc + wv)")).otherwise(0L).as("a"),
          when($"wv" > 0, 1L).otherwise(0L).as("touched")))
      alloc.groupBy($"channel")
        .agg(sum($"touched").as("n_purchases_touched"),
          sum($"a").as("attributed_cents"))
        .orderBy($"channel")
    }
  }

  /** Top-10 three-step paths to conversion: the exact event-type sequence
    * immediately PRECEDING each purchase (oldest step first) — the
    * conversion-conditioned counterpart of [[trigramTopk]]'s unconditioned
    * pattern head. Three lags over the one per-user sort every sequence op
    * here shares, then a ≤|types|³-key aggregate and a top-k head. */
  val pathTopk: QueryDef = QueryDef(
    "seq_path_topk",
    """WITH s AS (SELECT event_type,
      |                  lag(event_type, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p3,
      |                  lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2,
      |                  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1
      |           FROM events)
      |SELECT concat_ws('>', p3, p2, p1) AS path, CAST(count(*) AS BIGINT) AS n_conversions
      |FROM s WHERE event_type = 'purchase' AND p3 IS NOT NULL
      |GROUP BY 1 ORDER BY n_conversions DESC, path LIMIT 10""".stripMargin,
  ) { (spark, dir) =>
    val seq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"event_type",
        lag($"event_type", 3).over(seq).as("p3"),
        lag($"event_type", 2).over(seq).as("p2"),
        lag($"event_type", 1).over(seq).as("p1"))
      .filter($"event_type" === "purchase" && $"p3".isNotNull)
      .groupBy(concat_ws(">", $"p3", $"p2", $"p1").as("path"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy($"n_conversions".desc, $"path")
      .limit(10)
  }

  val all: Seq[QueryDef] =
    Seq(transitionProbs, trigramTopk, lastTouch, linearAttribution,
      gapsIslands, assocRules, timeToConvert, timeDecayAttribution, pathTopk)
}
