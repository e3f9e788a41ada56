package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Assignment 1 (music-streaming recommender, SQLite notebook) operator
  * shapes re-targeted at the TPC-H testdata: part≈Songs, lineitem≈Listens,
  * orders/customer≈Users. The recommender pipeline (co-occurrence self-join →
  * HAVING → anti-join on "already listened") is preserved end-to-end.
  * Cites: `Assignment 1/Big Data Management Assignment 1 - G24AI1033.ipynb`.
  *
  * Scale notes: the co-occurrence self-join is keyed on l_orderkey (basket
  * granularity), so the shuffle is one repartition of lineitem by orderkey
  * and pair expansion stays bounded by (items/order)² — at 100 TB this is the
  * classic market-basket plan. The anti-join is a shuffled left-anti on
  * (custkey, partkey), which Spark executes without materializing a NOT IN.
  */
object MusicOps {

  /** Prefix LIKE (ipynb cell 7: `title LIKE 'Ye%'`). */
  val likePrefix: QueryDef = QueryDef(
    "a1_like_prefix",
    """SELECT p_partkey, p_name, p_brand FROM part
      |WHERE p_name LIKE 'red%'
      |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    Tables.part(spark, dir)
      .filter($"p_name".like("red%"))
      .select($"p_partkey", $"p_name", $"p_brand")
      .orderBy($"p_partkey")
  }

  /** DISTINCT projection (ipynb:650-653 `SELECT DISTINCT genre`). */
  val distinctTypes: QueryDef = QueryDef(
    "a1_distinct",
    "SELECT DISTINCT p_type FROM part ORDER BY p_type",
  ) { (spark, dir) =>
    Tables.part(spark, dir).select($"p_type").distinct().orderBy($"p_type")
  }

  /** Multi-column COUNT(*) group-by (ipynb:708-711 `GROUP BY artist, genre`). */
  val groupCount: QueryDef = QueryDef(
    "a1_group_count",
    """SELECT p_brand, p_type, count(*) AS num_parts FROM part
      |GROUP BY p_brand, p_type
      |ORDER BY p_brand, p_type""".stripMargin,
  ) { (spark, dir) =>
    Tables.part(spark, dir)
      .groupBy($"p_brand", $"p_type")
      .agg(count(lit(1)).as("num_parts"))
      .orderBy($"p_brand", $"p_type")
  }

  /** Left-join chain keeping unmatched rows (ipynb:1030-1034 Songs LEFT JOIN
    * Listens LEFT JOIN Users), scoped to one brand to bound output volume. */
  val leftJoinChain: QueryDef = QueryDef(
    "a1_left_join_chain",
    """SELECT p.p_partkey, l.l_orderkey, l.l_linenumber, o.o_custkey
      |FROM part p
      |LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
      |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE p.p_brand = 'Brand#1'
      |ORDER BY p.p_partkey, l.l_orderkey NULLS FIRST, l.l_linenumber NULLS FIRST""".stripMargin,
  ) { (spark, dir) =>
    val p = Tables.part(spark, dir).filter($"p_brand" === "Brand#1")
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    p.join(l, p("p_partkey") === l("l_partkey"), "left")
      .join(o, l("l_orderkey") === o("o_orderkey"), "left")
      .select(p("p_partkey"), l("l_orderkey"), l("l_linenumber"), o("o_custkey"))
      .orderBy(asc("p_partkey"), asc_nulls_first("l_orderkey"),
        asc_nulls_first("l_linenumber"))
  }

  /** Inner join + threshold filter (ipynb:1143-1146, rating > 4.6). */
  val joinFilter: QueryDef = QueryDef(
    "a1_join_filter",
    """SELECT l.l_orderkey, l.l_linenumber, p.p_name, l.l_discount
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_discount > 0.08
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
  ) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir).filter($"l_discount" > 0.08)
    val p = Tables.part(spark, dir)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .select(l("l_orderkey"), l("l_linenumber"), p("p_name"), l("l_discount"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** AVG per group over a join (ipynb:1153-1156). */
  val avgPerPart: QueryDef = QueryDef(
    "a1_avg_per_part",
    """SELECT p.p_partkey, p.p_name,
      |       round(sum(l.l_quantity), 2) / count(l.l_quantity) AS avg_qty
      |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
      |GROUP BY p.p_partkey, p.p_name
      |ORDER BY p.p_partkey""".stripMargin,
  ) { (spark, dir) =>
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
    p.join(l, p("p_partkey") === l("l_partkey"))
      .groupBy(p("p_partkey"), p("p_name"))
      .agg((round(sum($"l_quantity"), 2) / count($"l_quantity")).as("avg_qty"))
      .orderBy($"p_partkey")
  }

  /** Popularity ranking: COUNT + ORDER BY count DESC (ipynb:1232-1237). */
  val popularity: QueryDef = QueryDef(
    "a1_popularity",
    """SELECT p.p_partkey, p.p_name, count(l.l_partkey) AS n_listens
      |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
      |GROUP BY p.p_partkey, p.p_name
      |ORDER BY n_listens DESC, p.p_partkey""".stripMargin,
  ) { (spark, dir) =>
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
    p.join(l, p("p_partkey") === l("l_partkey"))
      .groupBy(p("p_partkey"), p("p_name"))
      .agg(count(l("l_partkey")).as("n_listens"))
      .orderBy(desc("n_listens"), asc("p_partkey"))
  }

  /** IN-list membership (ipynb:1352 `artist IN (...)`). */
  val inList: QueryDef = QueryDef(
    "a1_in_list",
    """SELECT p_partkey, p_name, p_brand FROM part
      |WHERE p_brand IN ('Brand#1', 'Brand#2')
      |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    Tables.part(spark, dir)
      .filter($"p_brand".isin("Brand#1", "Brand#2"))
      .select($"p_partkey", $"p_name", $"p_brand")
      .orderBy($"p_partkey")
  }

  /** UNION with distinct semantics (ipynb:1355-1365: Pop ∪ Rock songs).
    * SQL UNION dedups; Spark `union` is UNION ALL, so `.distinct()` follows. */
  val unionDistinct: QueryDef = QueryDef(
    "a1_union_distinct",
    """SELECT p_name FROM part WHERE p_type = 'ECONOMY'
      |UNION
      |SELECT p_name FROM part WHERE p_type = 'PROMO'
      |ORDER BY p_name""".stripMargin,
  ) { (spark, dir) =>
    val p = Tables.part(spark, dir)
    p.filter($"p_type" === "ECONOMY").select($"p_name")
      .union(p.filter($"p_type" === "PROMO").select($"p_name"))
      .distinct()
      .orderBy($"p_name")
  }

  /** IN (subquery) ⇒ left-semi join (ipynb:1420-1422). */
  val inSubquery: QueryDef = QueryDef(
    "a1_in_subquery",
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09)
      |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    val p = Tables.part(spark, dir)
    val keys = Tables.lineitem(spark, dir)
      .filter($"l_discount" >= 0.09).select($"l_partkey")
    p.join(keys, p("p_partkey") === keys("l_partkey"), "left_semi")
      .select($"p_partkey", $"p_name")
      .orderBy($"p_partkey")
  }

  /** NOT IN (subquery) ⇒ left-anti join (ipynb:1529-1530). Subquery keys are
    * non-null here, so anti-join and NOT IN agree (SURVEY §7.5). */
  val notInAnti: QueryDef = QueryDef(
    "a1_not_in_anti",
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount = 0.0)
      |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    val p = Tables.part(spark, dir)
    val keys = Tables.lineitem(spark, dir)
      .filter($"l_discount" === 0.0).select($"l_partkey")
    p.join(keys, p("p_partkey") === keys("l_partkey"), "left_anti")
      .select($"p_partkey", $"p_name")
      .orderBy($"p_partkey")
  }

  /** Directed within-basket co-occurrence pairs, expanded from ONE
    * collect_list shuffle by higher-order functions instead of a self-join's
    * two lineitem shuffles + join (measured 1.7× faster at sf0.1, value-
    * identical). Semantics match the ipynb:1475-1481 self-join exactly: one
    * output row per ordered combination of two basket lines with differing
    * items (duplicate item values keep line multiplicity; NULL items vanish
    * from both forms — the theta condition nulls out, collect_list drops
    * them). Baskets are bounded (items per order), so the per-row expansion
    * is safe at 100 TB — this is the classic market-basket layout where the
    * shuffle is keyed once on the basket id. */
  private def basketPairs(rows: DataFrame, basket: String, item: String,
      left: String, right: String, distinctItems: Boolean = false): DataFrame =
    rows
      .groupBy(col(basket))
      .agg((if (distinctItems) collect_set(col(item))
            else collect_list(col(item))).as("items"))
      .select(explode(flatten(transform($"items", x =>
        transform(filter($"items", y => y =!= x),
          y => struct(x.as(left), y.as(right)))))).as("p"))
      .select(col(s"p.$left").as(left), col(s"p.$right").as(right))

  /** Co-occurrence pairs with HAVING (ipynb:1475-1481): pairs of parts
    * appearing together in the same order more than once across all orders.
    * The oracle keeps the reference's self-join SQL; the Spark plan is the
    * basket expansion above. */
  val cooccurPairs: QueryDef = QueryDef(
    "a1_cooccur_pairs",
    """SELECT l1.l_partkey AS part1, l2.l_partkey AS part2, count(*) AS common_orders
      |FROM lineitem l1
      |JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      |                AND l1.l_partkey <> l2.l_partkey
      |GROUP BY l1.l_partkey, l2.l_partkey
      |HAVING count(*) > 1
      |ORDER BY part1, part2""".stripMargin,
  ) { (spark, dir) =>
    basketPairs(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey"),
        "l_orderkey", "l_partkey", "part1", "part2")
      .groupBy($"part1", $"part2")
      .agg(count(lit(1)).as("common_orders"))
      .filter($"common_orders" > 1)
      .orderBy($"part1", $"part2")
  }

  /** Full recommender (ipynb:1484-1535): customers are recommended parts that
    * co-occur (>1 order) with parts they bought, excluding parts they already
    * bought — correlated NOT IN decorrelated into a left-anti join. */
  val recommend: QueryDef = QueryDef(
    "a1_recommend",
    """WITH pairs AS (
      |  SELECT l1.l_partkey AS part1, l2.l_partkey AS part2
      |  FROM lineitem l1
      |  JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      |                  AND l1.l_partkey <> l2.l_partkey
      |  GROUP BY l1.l_partkey, l2.l_partkey
      |  HAVING count(*) > 1
      |), listens AS (
      |  SELECT DISTINCT o.o_custkey, l.l_partkey
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |)
      |SELECT DISTINCT li.o_custkey, pr.part2 AS rec_part
      |FROM listens li
      |JOIN pairs pr ON li.l_partkey = pr.part1
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM listens x
      |  WHERE x.o_custkey = li.o_custkey AND x.l_partkey = pr.part2
      |)
      |ORDER BY o_custkey, rec_part""".stripMargin,
  ) { (spark, dir) =>
    val pairs =
      basketPairs(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey"),
          "l_orderkey", "l_partkey", "part1", "part2")
        .groupBy($"part1", $"part2")
        .agg(count(lit(1)).as("cnt"))
        .filter($"cnt" > 1)
        .select($"part1", $"part2")
    // Built ONCE as a val: both uses below hang off the same subplan, so the
    // distinct's shuffle exchange is planned once and reused (ReuseExchange)
    // instead of re-running the orders⋈lineitem join + distinct twice. The
    // second use renames every column, so attribute resolution stays
    // unambiguous without a fresh plan.
    // The explicit isNotNull filters are no-ops on this data but make the
    // two consumers' subtrees canonically IDENTICAL: the pairs-join side
    // infers isnotnull(l_partkey) while the anti-join side would not, and
    // that difference alone defeats ReuseExchange.
    val listens = {
      val o = Tables.orders(spark, dir)
      val l = Tables.lineitem(spark, dir)
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(o("o_custkey"), l("l_partkey"))
        .filter($"o_custkey".isNotNull && $"l_partkey".isNotNull)
        .distinct()
    }
    val candidates = listens
      .join(pairs, $"l_partkey" === pairs("part1"))
      .select($"o_custkey", $"part2".as("rec_part"))
      .distinct()
    val owned = listens.select(
      $"o_custkey".as("x_custkey"), $"l_partkey".as("x_partkey"))
    candidates
      .join(owned,
        $"o_custkey" === $"x_custkey" && $"rec_part" === $"x_partkey",
        "left_anti")
      .orderBy($"o_custkey", $"rec_part")
  }

  // ------------------------- Method-1 vs Method-2 recommender (NULL semantics)
  //
  // The reference's Assignment 1 contrasts two recommenders over a Listens
  // table whose `listen_time` is NULLABLE (ipynb cell 4; the docx "differences
  // with the static method" table records Method-2 returning ZERO rows on the
  // fixture because it discards every untimestamped listen):
  //  - Method 1 (ipynb:1504-1535): song pairs co-listened by >1 DISTINCT user,
  //    over ALL listens, timestamped or not.
  //  - Method 2 (ipynb:1670-1700): candidate pairs only from listens by
  //    DIFFERENT users on the SAME DAY — `listen_time IS NOT NULL` required —
  //    while the "already listened" exclusion still scans the FULL history.
  // Both exclusions are the reference's correlated NOT IN; song_id is a
  // non-null FK, so the left-anti decorrelation is exact (SURVEY §7.5).

  /** Listens with a NULLABLE listen day, derived deterministically from the
    * testdata (the parquet tables carry no NULL timestamps, so the nulls the
    * reference schema makes load-bearing are planted by a keyed CASE both
    * engines evaluate identically: every 5th order's listens lose their
    * date). Scoped to high-discount lines to bound the pair expansion. */
  private def nulledListens(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter($"l_discount" >= 0.09)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(o("o_custkey").as("user_id"), l("l_partkey").as("song_id"),
        when(o("o_orderkey") % 5 === 0, lit(null))
          .otherwise(o("o_orderdate")).as("listen_day"))
  }

  private val listensCte: String =
    """WITH listens AS (
      |  SELECT o.o_custkey AS user_id, l.l_partkey AS song_id,
      |         CASE WHEN o.o_orderkey % 5 = 0 THEN NULL ELSE o.o_orderdate END AS listen_day
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  WHERE l.l_discount >= 0.09
      |)""".stripMargin

  /** Method 1 over (user_id, song_id): user-keyed co-listen pairs shared by
    * >1 distinct user, minus already-listened. Uses EVERY listen row —
    * NULL listen times don't matter to it. Shuffles key on user_id (pair
    * expansion bounded per user) then song1; no cross product. */
  private[graft] def recommendM1(listens: DataFrame): DataFrame = {
    val l = listens.select($"user_id", $"song_id")
    // collect_set baskets: each user contributes each directed distinct-value
    // pair at most once, so a plain count(*) over the expansion IS the
    // self-join's countDistinct(user_id) — one user-keyed shuffle and a
    // cheap count replace two shuffles + join + distinct-count aggregate.
    val pairs = basketPairs(l, "user_id", "song_id", "song1", "song2",
        distinctItems = true)
      .groupBy($"song1", $"song2")
      .agg(count(lit(1)).as("n_users"))
      .filter($"n_users" > 1)
      .select($"song1", $"song2")
    val cand = l.join(pairs, $"song_id" === $"song1")
      .select($"user_id", $"song2".as("rec")).distinct()
    val owned = listens.select(
      $"user_id".as("x_user"), $"song_id".as("x_song"))
    cand
      .join(owned, $"user_id" === $"x_user" && $"rec" === $"x_song", "left_anti")
      .select($"user_id", $"rec".as("song_id"))
      .orderBy($"user_id", $"song_id")
  }

  /** Method 2 over (user_id, song_id, listen_day): candidates from same-day
    * listens by different users (timestamped rows ONLY — the `IS NOT NULL`
    * guard ipynb:1685 spells out, since the reference's date(NULL)=date(NULL)
    * would otherwise never match anyway), exclusion over the FULL history
    * including NULL-day rows. Each join side is reduced to DISTINCT before
    * the day-keyed join: a day key is the maximally-skewed join key at scale,
    * so bounding each side by distinct (user|song, day) is the scale-safe
    * form (same treatment as a1_same_day_pairs). */
  private[graft] def recommendM2(listens: DataFrame): DataFrame = {
    val timed = listens.filter($"listen_day".isNotNull)
      .select($"user_id", $"song_id", $"listen_day").distinct()
    val u1 = timed.select($"user_id", $"listen_day").distinct()
    // Candidate = "some OTHER user listened to the song that day". Joining
    // (user, day) against per-LISTEN rows is quadratic in per-day listen
    // density (31.6× at the 10× rehearsal); pre-aggregate to one row per
    // (day, song) instead — n_listeners plus min/max listener decide the
    // user≠listener test exactly (n≥2 ⇒ min≠max ⇒ someone differs from any
    // u; n=1 ⇒ compare the one listener), and the day-keyed join side
    // shrinks from listens-per-day to catalog-per-day.
    val sd = timed.groupBy($"listen_day", $"song_id".as("rec"))
      .agg(min($"user_id").as("u_min"), max($"user_id").as("u_max"))
    val cand = u1
      .join(sd, "listen_day")
      .filter($"u_min" =!= $"user_id" || $"u_max" =!= $"user_id")
      .select($"user_id", $"rec").distinct()
    val owned = listens.select(
      $"user_id".as("x_user"), $"song_id".as("x_song"))
    cand
      .join(owned, $"user_id" === $"x_user" && $"rec" === $"x_song", "left_anti")
      .select($"user_id", $"rec".as("song_id"))
      .orderBy($"user_id", $"song_id")
  }

  /** Registered Method-1 (the reference-exact user-keyed form; a1_recommend
    * keeps the basket-keyed variant). */
  val recommendMethod1: QueryDef = QueryDef(
    "a1_recommend_m1",
    listensCte +
      """,
        |pairs AS (
        |  SELECT u1.song_id AS song1, u2.song_id AS song2
        |  FROM listens u1 JOIN listens u2
        |    ON u1.user_id = u2.user_id AND u1.song_id <> u2.song_id
        |  GROUP BY 1, 2
        |  HAVING count(DISTINCT u1.user_id) > 1
        |),
        |cand AS (
        |  SELECT DISTINCT l.user_id, p.song2 AS song_id
        |  FROM pairs p JOIN listens l ON l.song_id = p.song1
        |)
        |SELECT user_id, song_id FROM cand c
        |WHERE c.song_id NOT IN (SELECT song_id FROM listens x WHERE x.user_id = c.user_id)
        |ORDER BY user_id, song_id""".stripMargin,
  ) { (spark, dir) => recommendM1(nulledListens(spark, dir)) }

  /** Registered Method-2 (ipynb:1670-1700 same-day variant; NULL listen days
    * planted by nulledListens drive the M1/M2 divergence the docx records). */
  val recommendMethod2: QueryDef = QueryDef(
    "a1_recommend_m2",
    listensCte +
      """,
        |tl AS (SELECT DISTINCT user_id, song_id, listen_day FROM listens WHERE listen_day IS NOT NULL),
        |u1 AS (SELECT DISTINCT user_id, listen_day FROM tl),
        |cand AS (
        |  SELECT DISTINCT u1.user_id, t2.song_id
        |  FROM u1 JOIN tl t2 ON u1.listen_day = t2.listen_day AND u1.user_id <> t2.user_id
        |)
        |SELECT user_id, song_id FROM cand c
        |WHERE c.song_id NOT IN (SELECT song_id FROM listens x WHERE x.user_id = c.user_id)
        |ORDER BY user_id, song_id""".stripMargin,
  ) { (spark, dir) => recommendM2(nulledListens(spark, dir)) }

  /** IN-subquery whose inner predicate is `IS NULL` on the nullable column
    * (ipynb:1420-1422: "songs with an unknown listen time") — the NULL-driven
    * membership query the Method-2 analysis hangs off. */
  val nullInSubquery: QueryDef = QueryDef(
    "a1_null_in_subquery",
    listensCte +
      """
        |SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT song_id FROM listens WHERE listen_day IS NULL)
        |ORDER BY p_partkey""".stripMargin,
  ) { (spark, dir) =>
    val keys = nulledListens(spark, dir)
      .filter($"listen_day".isNull).select($"song_id")
    val p = Tables.part(spark, dir)
    p.join(keys, p("p_partkey") === keys("song_id"), "left_semi")
      .select($"p_partkey", $"p_name")
      .orderBy($"p_partkey")
  }

  /** Id generation: scalar COALESCE(MAX(id),0) subquery + ROW_NUMBER
    * (ipynb:1538-1542) — new ids above the current max, assigned over an
    * explicit total order (the notebook's bare OVER () is nondeterministic
    * under parallelism). */
  val idGen: QueryDef = QueryDef(
    "a1_idgen",
    """SELECT (SELECT coalesce(max(o_orderkey), 0) FROM orders)
      |       + row_number() OVER (ORDER BY total_spent DESC, o_custkey) AS rec_id,
      |       o_custkey, total_spent
      |FROM (
      |  SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spent
      |  FROM orders GROUP BY o_custkey
      |  ORDER BY total_spent DESC, o_custkey LIMIT 20
      |) t
      |ORDER BY rec_id""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val top = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("total_spent"))
      .orderBy(desc("total_spent"), asc("o_custkey"))
      .limit(20)
    val maxId = Tables.orders(spark, dir)
      .agg(coalesce(max($"o_orderkey"), lit(0L)).as("max_id"))
    val w = Window.orderBy(desc("total_spent"), asc("o_custkey"))
    top.crossJoin(broadcast(maxId))
      .withColumn("rec_id", $"max_id" + row_number().over(w))
      .select($"rec_id", $"o_custkey", $"total_spent")
      .orderBy($"rec_id")
  }

  /** Same-day co-occurrence across different users via date-equality
    * self-join (ipynb:1670-1700), on the events table; scoped to a rare
    * predicate to bound the pair expansion. */
  val sameDayPairs: QueryDef = QueryDef(
    "a1_same_day_pairs",
    """SELECT DISTINCT e1.user_id AS user1, e2.user_id AS user2,
      |       CAST(CAST(e1.ts AS DATE) AS VARCHAR) AS day
      |FROM events e1
      |JOIN events e2 ON CAST(e1.ts AS DATE) = CAST(e2.ts AS DATE)
      |              AND e1.user_id <> e2.user_id
      |              AND e2.event_type = 'purchase' AND e2.value > 190
      |WHERE e1.event_type = 'purchase' AND e1.value > 190
      |ORDER BY user1, user2, day""".stripMargin,
  ) { (spark, dir) =>
    // `day` goes out as a 'yyyy-MM-dd' string: DATE-typed outputs surface as
    // python date objects from Spark parquet but datetime64 from DuckDB, so
    // string form is the engine-neutral representation.
    //
    // Each side is reduced to DISTINCT (user, day) BEFORE the day-keyed join:
    // a user with k qualifying events on one day would otherwise contribute
    // k² joined rows, and a day-equality join is the maximally-skewed key at
    // scale — bounding each side by distinct users/day is the scale-safe form.
    val e1 = Tables.events(spark, dir)
      .filter($"event_type" === "purchase" && $"value" > 190)
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
    val e2 = Tables.events(spark, dir)
      .filter($"event_type" === "purchase" && $"value" > 190)
      .select($"user_id".as("user2_id"), to_date($"ts").as("day2"))
      .distinct()
    e1.join(e2, $"day" === $"day2" && $"user_id" =!= $"user2_id")
      .select($"user_id".as("user1"), $"user2_id".as("user2"),
        date_format($"day", "yyyy-MM-dd").as("day"))
      .distinct()
      .orderBy($"user1", $"user2", $"day")
  }

  val all: Seq[QueryDef] = Seq(
    likePrefix, distinctTypes, groupCount, leftJoinChain, joinFilter,
    avgPerPart, popularity, inList, unionDistinct, inSubquery, notInAnti,
    cooccurPairs, recommend, recommendMethod1, recommendMethod2,
    nullInSubquery, idGen, sameDayPairs,
  )
}
