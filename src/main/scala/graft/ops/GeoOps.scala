package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.Tables

/** Spatial operators — point k-NN, a grid-bucketed radius self-join, and
  * spatial connected clusters. The reference's only geo surface is the
  * RediSearch latitude range filter (`redis_client.py:336`, covered by
  * `a5_search_tag_range`); these add the JOIN-shaped spatial questions a
  * warehouse asks of coordinates ("which points are near each other"),
  * which no range filter can express.
  *
  * The testdata carries no real coordinates, so each customer gets a
  * deterministic synthetic position from the cross-engine md5 hash of its
  * key (the `portableHash` convention) — micro-degree INTEGERS on a shifted
  * non-negative axis, so every distance is an exact BIGINT and truncating
  * `DIV` (Spark) equals floor `//` (DuckDB); no trig or float geometry
  * crosses an engine boundary anywhere in the lane (a haversine refine
  * would bolt onto the same candidate pipeline; sin/cos are only
  * 1-ulp-reproducible across libm implementations, which this repo's
  * hash-compare gate can't tolerate, so the planar metric is the oracled
  * one).
  *
  * Scale shape: k-NN is a map-only scan + TakeOrdered; the radius join is
  * the spatial analog of the LSH band join — each point lands in ONE home
  * cell sized to the radius, probes its 3×3 neighborhood via a 9-way
  * shift-explode, and exact distance runs on grid-candidates only. A pair
  * at most one cell apart matches in exactly one (shift, home) combination
  * per orientation, so `id1 < id2` alone dedups — no DISTINCT pass. The
  * cluster op feeds those pairs to the shared pointer-jumping CC
  * ([[LlmTextOps.clusterOf]]) — O(log diameter) rounds, the same machinery
  * the dedup lane ships.
  */
object GeoOps {

  /** 2° in micro-degrees: the BASE radius and grid cell edge (cell =
    * radius ⇒ 3×3 neighborhood suffices) — the value the lanes use while
    * the corpus sits at the ladder floor (all driver test SFs). Round 15:
    * the EFFECTIVE radius is corpus-derived ([[radiusOf]]) — the fixed 2°
    * made candidate volume grow with density² (geo_msf was 69% of the
    * round-14 sf10 probe at 762 s), the spatial instance of the LSH
    * fixed-fan-out class. */
  private val RadiusU = 2000000L

  /** Radius ladder: halve the radius (quarter the cell area) each time the
    * point count grows 4×, so expected neighbors-per-point — n·r²-
    * proportional — stays within a constant band (GeoTarget/4, GeoTarget].
    * [[GeoTarget]] = 20000 keeps every driver SF (≤15k customers at sf0.1)
    * at the FLOOR: bench and correctness results are bit-identical to the
    * fixed-radius lanes there, and only synthetic scale-ups shrink the
    * radius — exactly like the ANN plane ladder, and like a production
    * deployment that holds match density constant as the corpus grows.
    * Integer comparison ladder, never a float log (engine and oracle must
    * flip at exactly the same count). */
  private val GeoTarget = 20000L
  private val GeoMaxHalvings = 12

  /** 1-row (`ru`) frame: the corpus-derived radius/cell edge over `pts` —
    * smallest j ∈ [0, [[GeoMaxHalvings]]] with n ≤ GeoTarget·4^j gives
    * ru = RadiusU >> j. Broadcast by every consumer. */
  private[graft] def radiusOf(pts: DataFrame): DataFrame = {
    val ruCol = (0 until GeoMaxHalvings)
      .foldRight(lit(RadiusU >> GeoMaxHalvings): Column) { (j, acc) =>
        when($"__n" <= lit(GeoTarget * (1L << (2 * j))), lit(RadiusU >> j))
          .otherwise(acc)
      }
    pts.agg(count(lit(1)).as("__n")).select(ruCol.as("ru"))
  }

  /** Oracle-side radius derivation — the identical ladder over the
    * identical count base (`pts`), as a 1-row `r` CTE. */
  private def radiusLadderSql: String = {
    val cases = (0 until GeoMaxHalvings)
      .map(j => s"WHEN count(*) <= ${GeoTarget * (1L << (2 * j))} THEN ${RadiusU >> j}")
      .mkString(" ")
    // BIGINT cast: the CASE would otherwise type INT32 and ru*ru overflows
    s"r AS (SELECT CAST(CASE $cases ELSE ${RadiusU >> GeoMaxHalvings} END AS BIGINT) AS ru FROM pts)"
  }

  private def portableHash(c: Column): Column = call_function("md5hash60", c)

  /** Deterministic synthetic positions: shifted-non-negative micro-degrees
    * `ux ∈ [0, 360e6)`, `uy ∈ [0, 180e6)` hashed from the customer key. */
  private[graft] def points(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select($"c_custkey".as("id"),
      (portableHash(concat(lit("lon|"), $"c_custkey".cast("string")))
        % 360000000L).as("ux"),
      (portableHash(concat(lit("lat|"), $"c_custkey".cast("string")))
        % 180000000L).as("uy"))

  private val pointsSql =
    """pts AS (SELECT c_custkey AS id,
      |               ('0x' || substr(md5('lon|' || c_custkey), 1, 15))::BIGINT % 360000000 AS ux,
      |               ('0x' || substr(md5('lat|' || c_custkey), 1, 15))::BIGINT % 180000000 AS uy
      |        FROM customer)""".stripMargin

  /** 10 nearest customers to the origin (lat 0, lon 0 — shifted center):
    * brute-force exact-integer distances + TakeOrderedAndProject. The
    * honest k-NN baseline every indexed variant (the IVF/LSH lanes on the
    * embedding side) is measured against, at 2-D instead of 8-D. */
  val knn: QueryDef = QueryDef(
    "geo_knn",
    s"""WITH $pointsSql
       |SELECT id AS c_custkey, ux - 180000000 AS lon_u, uy - 90000000 AS lat_u,
       |       (ux - 180000000) * (ux - 180000000)
       |       + (uy - 90000000) * (uy - 90000000) AS d2
       |FROM pts ORDER BY d2, c_custkey LIMIT 10""".stripMargin,
  ) { (spark, dir) =>
    points(spark, dir)
      .select($"id".as("c_custkey"),
        ($"ux" - 180000000L).as("lon_u"), ($"uy" - 90000000L).as("lat_u"))
      .withColumn("d2", $"lon_u" * $"lon_u" + $"lat_u" * $"lat_u")
      .orderBy($"d2", $"c_custkey")
      .limit(10)
  }

  /** Grid-bucketed candidate pairs within the derived radius — shared by
    * [[gridPairs]], [[cluster]] and [[msf]]. One side explodes into its
    * 3×3 neighbor cells; the equi-join on (cell, cell) is the only wide
    * operation, and the exact planar predicate prunes candidates. The
    * cell edge IS the derived radius (1-row broadcast), so candidate
    * density per cell stays ~constant under corpus growth. */
  private[graft] def pairsOf(pts: DataFrame): DataFrame =
    pairsOf(pts, radiusOf(pts))

  /** [[pairsOf]] with the derived-radius frame precomputed — [[msf]]
    * re-derives the grid join once per Borůvka round and must not re-run
    * the count ladder each time. */
  private[graft] def pairsOf(pts: DataFrame, ru: DataFrame): DataFrame = {
    val shifts = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val g = pts.crossJoin(broadcast(ru)).select($"id", $"ux", $"uy", $"ru",
      expr("ux DIV ru").as("cx"), expr("uy DIV ru").as("cy"))
    val probe = g
      .select($"id".as("id_a"), $"ux".as("xa"), $"uy".as("ya"),
        explode(array(shifts: _*)).as("s"), $"cx", $"cy")
      .select($"id_a", $"xa", $"ya",
        ($"cx" + $"s.dx").as("cx"), ($"cy" + $"s.dy").as("cy"))
    probe.join(g, Seq("cx", "cy"))
      .filter($"id_a" < $"id")
      .withColumn("d2",
        ($"xa" - $"ux") * ($"xa" - $"ux") + ($"ya" - $"uy") * ($"ya" - $"uy"))
      .filter($"d2" <= $"ru" * $"ru")
      .select($"id_a".as("k1"), $"id".as("k2"), $"d2")
  }

  /** All customer pairs within 2° planar distance, with the exact squared
    * distance and a milli-degree readout (sqrt of an exact integer — the
    * same double in both engines, floor-quantized). The oracle replays the
    * predicate as the naive quadratic self-join: same rows, independent
    * plan — which is exactly the point: the grid join must lose NO pair
    * the quadratic join finds. */
  val gridPairs: QueryDef = QueryDef(
    "geo_grid_pairs",
    s"""WITH $pointsSql,
       |$radiusLadderSql
       |SELECT a.id AS k1, b.id AS k2,
       |       (a.ux - b.ux) * (a.ux - b.ux) + (a.uy - b.uy) * (a.uy - b.uy) AS d2,
       |       CAST(floor(sqrt(CAST((a.ux - b.ux) * (a.ux - b.ux)
       |            + (a.uy - b.uy) * (a.uy - b.uy) AS DOUBLE)) / 1000) AS BIGINT) AS dist_mdeg
       |FROM pts a, pts b, r
       |WHERE a.id < b.id
       |  AND (a.ux - b.ux) * (a.ux - b.ux) + (a.uy - b.uy) * (a.uy - b.uy) <= r.ru * r.ru
       |ORDER BY k1, k2""".stripMargin,
  ) { (spark, dir) =>
    pairsOf(points(spark, dir))
      .withColumn("dist_mdeg",
        floor(sqrt($"d2".cast("double")) / 1000).cast("long"))
      .orderBy($"k1", $"k2")
  }

  /** Spatial connected clusters: customers chained by ≤2° hops share a
    * cluster (single-linkage — the transitive closure a pairwise radius
    * query can't see, same argument as the dedup clusters). Pairs come
    * from the grid join; labels from the shared pointer-jumping CC. The
    * oracle replays the closure as a recursive CTE over the quadratic
    * pair predicate. */
  val cluster: QueryDef = QueryDef(
    "geo_cluster",
    s"""WITH RECURSIVE $pointsSql,
       |$radiusLadderSql,
       |p AS (SELECT a.id AS da, b.id AS db
       |      FROM pts a, pts b, r
       |      WHERE a.id < b.id
       |        AND (a.ux - b.ux) * (a.ux - b.ux)
       |            + (a.uy - b.uy) * (a.uy - b.uy) <= r.ru * r.ru),
       |e AS (SELECT da AS a, db AS b FROM p UNION ALL SELECT db AS a, da AS b FROM p),
       |reach AS (
       |  SELECT id, id AS r FROM pts
       |  UNION
       |  SELECT e.b AS id, reach.r AS r FROM reach JOIN e ON e.a = reach.id
       |)
       |SELECT id AS c_custkey, min(r) AS cluster_id
       |FROM reach GROUP BY id ORDER BY c_custkey""".stripMargin,
  ) { (spark, dir) =>
    // large-star/small-star, NOT the min-label+jump CC: on a spatial
    // proximity graph the min label spreads ~one CELL per round (pointer
    // chains stay spatially local, so the jump can't shortcut), making
    // min-label rounds ~ the spatial diameter — measured 58 rounds on a
    // 20k-point RGG and non-convergence at the 48-round cap on the 150k
    // sf1 rehearsal. Star contraction rewires edges instead and closed the
    // same 60k-point RGG in 8 rounds (simulated; O(log² n) proven). Output
    // contract and oracle are identical — membership is
    // algorithm-independent.
    val pts = graft.Caches.persist(points(spark, dir))
    LlmTextOps.clusterLsOf(
      pairsOf(pts).select($"k1".as("doc_a"), $"k2".as("doc_b")),
      pts.select($"id".as("doc_id")))
      .select($"doc_id".as("c_custkey"), $"cluster_id")
      .orderBy($"c_custkey")
  }

  /** Minimum spanning forest of the ≤2° proximity graph (weights = exact
    * d²) by BORŮVKA'S algorithm — the parallel-native MST: every round
    * each component picks its minimum incident edge under the (w, a, b)
    * total order (ties broken identically everywhere, which makes the
    * forest UNIQUE — the classic lexicographic-perturbation argument, so
    * the spec's driver-side Kruskal must produce the identical edge set),
    * all picked edges join the forest at once, and touching components
    * contract via the shared pointer-jumping CC. Components at least
    * halve per round → ⌈log₂ n⌉ rounds of small keyed joins; nothing in
    * the loop is ever quadratic — candidate edges come from the same grid
    * join as `geo_grid_pairs`.
    *
    * The oracle replays KRUSKAL through the cycle property instead of the
    * rounds: rank every candidate edge by the same (w, a, b) total order;
    * an edge belongs to the UNIQUE forest iff its endpoints are not
    * connected using strictly smaller-ranked edges (exactly Kruskal's
    * acceptance test, so the independent plan must reproduce Borůvka's
    * edge set bit-for-bit). One recursive CTE carries (edge_rank,
    * reachable_node) states — per-component quadratic, fine for an oracle,
    * never for the engine. GeoOpsSpec additionally pins driver-side
    * Kruskal and the forest-size invariant |V| − |components|. */
  val msf: QueryDef = QueryDef(
    "geo_msf",
    s"""WITH RECURSIVE $pointsSql,
       |$radiusLadderSql,
       |p AS (SELECT a.id AS ea, b.id AS eb,
       |             (a.ux - b.ux) * (a.ux - b.ux) + (a.uy - b.uy) * (a.uy - b.uy) AS w
       |      FROM pts a, pts b, r
       |      WHERE a.id < b.id
       |        AND (a.ux - b.ux) * (a.ux - b.ux)
       |            + (a.uy - b.uy) * (a.uy - b.uy) <= r.ru * r.ru),
       |ed AS (SELECT ea, eb, w, row_number() OVER (ORDER BY w, ea, eb) AS k FROM p),
       |e2 AS (SELECT k, ea AS u, eb AS v FROM ed UNION ALL SELECT k, eb, ea FROM ed),
       |reach AS (
       |  SELECT k AS eid, ea AS node FROM ed
       |  UNION
       |  SELECT r.eid, s.v AS node FROM reach r JOIN e2 s ON s.u = r.node AND s.k < r.eid
       |)
       |SELECT t.ea AS a, t.eb AS b, t.w
       |FROM ed t WHERE NOT EXISTS (SELECT 1 FROM reach r WHERE r.eid = t.k AND r.node = t.eb)
       |ORDER BY a, b""".stripMargin,
  ) { (spark, dir) =>
    // Round-17: the candidate edge set IS materialized, once. The "never
    // materialize" rule here dated from the round-14 fixed-radius probe
    // (~290 neighbors/point ≈ 217M edges at 1.5M points, which OOM'd an
    // 8 GB JVM) — but the round-15 radius LADDER made candidate density a
    // constant band, so the grid join's output is corpus-LINEAR (≈ tens
    // of bytes × n·band ≪ the per-round shuffles Borůvka pays anyway),
    // and re-deriving the explode+join+distance pipeline once per
    // ⌈log₂ n⌉ round was pure repeated CPU. Each round now re-labels the
    // checkpointed (k1, k2, w) list with current components — Borůvka
    // still only keeps each component's min(struct(w, a, b)) row, so
    // loop STATE stays component-bounded; on a cluster the one-time
    // candidate list is a reliable checkpoint instead.
    val pts = graft.Caches.persist(points(spark, dir))
    // derived radius computed ONCE (1-row localCheckpoint): the grid join
    // must not re-run the count ladder
    val ru = graft.Caches.localCheckpoint(radiusOf(pts))
    val pairs0 = graft.Caches.localCheckpoint(
      pairsOf(pts, ru).select($"k1", $"k2", $"d2".as("w")))
    var comp = graft.Caches.localCheckpoint(
      pts.select($"id", $"id".as("c")))
    var forest: DataFrame = null
    var done = false
    var round = 0
    // Round-17: every Borůvka round — the re-derived grid join, the
    // min-edge aggregate, and the nested star contraction — runs at the
    // comp leaf's materialized width ([[loopParts]]): at bench SF the
    // point set is 1-2 blocks and the ~10 rounds × (grid join + 4-stage
    // contraction) at session width were pure task-launch overhead; at
    // cluster scale the leaf arrives in many blocks and the cap keeps
    // the full width. Values are width-independent (spec + oracle).
    withLoopWidth(pts.sparkSession, loopParts(pairs0)) {
    while (!done && round < 20) { // ⌈log₂ n⌉ suffices; hard stop for safety
      // checkpointed candidates with component labels, cross-component only
      val e2 = pairs0
        .join(comp.select($"id".as("k1"), $"c".as("ca")), "k1")
        .join(comp.select($"id".as("k2"), $"c".as("cb")), "k2")
        .filter($"ca" =!= $"cb")
        .select($"k1".as("a"), $"k2".as("b"), $"w",
          $"ca", $"cb")
      // per-component minimum incident edge: partial aggregation collapses
      // the candidate stream map-side — one surviving row per component
      val picked = graft.Caches.localCheckpoint(
        e2.select($"ca".as("comp"), struct($"w", $"a", $"b").as("e"))
          .unionAll(e2.select($"cb".as("comp"), struct($"w", $"a", $"b").as("e")))
          .groupBy($"comp").agg(min($"e").as("e"))
          .select($"e.a".as("a"), $"e.b".as("b"), $"e.w".as("w"))
          .distinct())
      if (picked.isEmpty) done = true
      else {
        // lazy union of already-checkpointed round outputs: re-
        // checkpointing the accumulated forest each round re-materialized
        // O(rounds²) rows for a frame only read once at the end (round-17)
        forest =
          if (forest == null) picked
          else forest.unionAll(picked)
        // contract the component graph and relabel every point
        val compEdges = picked
          .join(comp.select($"id".as("a"), $"c".as("ca")), "a")
          .join(comp.select($"id".as("b"), $"c".as("cb")), "b")
          .select($"ca".as("doc_a"), $"cb".as("doc_b"))
        // star contraction for the same reason as geo_cluster: the
        // component graph inherits the spatial chain structure, where
        // min-label rounds grow with the diameter instead of log n
        val labels = LlmTextOps.clusterLsOf(
          compEdges, comp.select($"c".as("doc_id")).distinct())
        comp = graft.Caches.localCheckpoint(
          comp.join(labels.select($"doc_id".as("c"), $"cluster_id"), "c")
            .select($"id", $"cluster_id".as("c")))
      }
      round += 1
    }
    }
    (if (forest == null) pts.limit(0).select($"id".as("a"), $"id".as("b"), $"id".as("w"))
     else forest)
      .select($"a", $"b", $"w").orderBy($"a", $"b")
  }

  /** Zoom levels for [[tileHeatmap]] — each +2 zoom quarters the tile
    * edge, so a tile's parent two levels up is `tile >> 4` (one Morton
    * bit-pair per dim per level), the drill-down identity the spec pins. */
  private val TileZooms = Seq(2, 4, 6)

  /** Map-tile HEATMAP: point counts per Morton quadkey tile at three zoom
    * levels — the aggregation a tile server / dashboard drills through.
    * Tile id = the bit-interleave of the zoom-scaled integer cell coords
    * (`ux·2^z DIV 360e6`, `uy·2^z DIV 180e6`), reusing the
    * [[graft.io.ZOrder]] interleave the layout lanes already oracle-test,
    * so child tiles nest under parents by construction (`tile >> 4` two
    * levels up).
    *
    * Scale shape: map-side tile derivation + one (zoom, tile)-keyed count
    * — output bounded by 4^z non-empty tiles per level regardless of row
    * count; the exact shape a vector-tile pre-aggregation job ships.
    * All-integer (micro-degree coords, truncating DIV on both engines). */
  val tileHeatmap: QueryDef = QueryDef(
    "geo_tile_heatmap",
    s"""WITH $pointsSql,
       |cells AS (${TileZooms.map(z =>
          s"""SELECT $z AS zoom,
             |${graft.io.ZOrder.mortonKeySql(
                s"(ux * ${1L << z} // 360000000)",
                s"(uy * ${1L << z} // 180000000)", z)} AS tile FROM pts""".stripMargin)
          .mkString("\nUNION ALL\n")})
       |SELECT CAST(zoom AS BIGINT) AS zoom, CAST(tile AS BIGINT) AS tile,
       |       CAST(count(*) AS BIGINT) AS n_points
       |FROM cells GROUP BY 1, 2 ORDER BY zoom, tile""".stripMargin,
  ) { (spark, dir) =>
    tileHeatmapOf(points(spark, dir))
  }

  private[graft] def tileHeatmapOf(pts: DataFrame): DataFrame =
    TileZooms.map { z =>
      pts.select(lit(z.toLong).as("zoom"),
        graft.io.ZOrder.mortonKey(
          expr(s"ux * ${1L << z} DIV 360000000"),
          expr(s"uy * ${1L << z} DIV 180000000"), z).as("tile"))
    }.reduce(_ unionAll _)
      .groupBy($"zoom", $"tile").agg(count(lit(1)).as("n_points"))
      .orderBy($"zoom", $"tile")

  val all: Seq[QueryDef] = Seq(knn, gridPairs, cluster, msf, tileHeatmap)
}
