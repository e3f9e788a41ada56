package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class SeqOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("transition probabilities sum to ~1e6 ppm per current type") {
    val rows = SeqOps.transitionProbs.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCur = rows.groupBy(_.getString(0))
    for ((cur, rs) <- byCur) {
      val ppm = rs.map(_.getLong(3)).sum
      // floor division loses at most (n_branches - 1) ppm per row group
      assert(ppm <= 1000000L && ppm > 1000000L - rs.length,
        s"$cur transition mass $ppm")
      // counts are consistent with probabilities: ppm ordering == count ordering
      val byCount = rs.sortBy(_.getLong(2))
      assert(byCount.map(_.getLong(3)).sorted.sameElements(byCount.map(_.getLong(3))))
    }
  }

  test("trigram top-k is count-descending and within the type alphabet") {
    val events = graft.io.Tables.events(spark, sf)
    val types = events.select($"event_type").distinct()
      .collect().map(_.getString(0)).toSet
    val rows = SeqOps.trigramTopk.run(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.flatMap(r => Seq(r.getString(0), r.getString(1), r.getString(2)))
      .forall(types.contains))
    val counts = rows.map(_.getLong(3))
    assert(counts.sorted.reverse.sameElements(counts), "sorted by count desc")
  }

  test("last-touch attribution conserves purchases and revenue") {
    val events = graft.io.Tables.events(spark, sf)
    val purchases = events.filter($"event_type" === "purchase")
    val nPurchases = purchases.count()
    val revenue = purchases
      .agg(sum(floor($"value" * 100 + 0.5).cast("long"))).collect().head.getLong(0)
    val rows = SeqOps.lastTouch.run(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == nPurchases, "every purchase lands in a bucket")
    assert(rows.map(_.getLong(2)).sum == revenue, "revenue is conserved")
    val channels = rows.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("click", "view", "(none)")))
  }

  test("linear attribution never allocates more than total purchase value") {
    val events = graft.io.Tables.events(spark, sf)
    val revenue = events.filter($"event_type" === "purchase")
      .agg(sum(floor($"value" * 100 + 0.5).cast("long"))).collect().head.getLong(0)
    val rows = SeqOps.linearAttribution.run(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == Seq("click", "view"))
    val allocated = rows.map(_.getLong(2)).sum
    assert(allocated <= revenue, s"allocated $allocated > revenue $revenue")
    assert(allocated > 0, "some purchases have preceding touches")
  }

  test("linear attribution splits a hand-built window exactly") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // user 1: click@t1, view@t2, purchase(9.99)@t3 → 999 cents split 1:1
    // → click 499, view 499 (floor drops the odd cent); user 2's purchase
    // has no touches → nothing allocated.
    val base = 1700000000000000L
    def ts(us: Long) = new Timestamp(us / 1000)
    val df = Seq(
      (1L, ts(base), 10L, "click", 0.0),
      (1L, ts(base + 1000000), 11L, "view", 0.0),
      (1L, ts(base + 2000000), 12L, "purchase", 9.99),
      (2L, ts(base), 20L, "purchase", 5.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    df.createOrReplaceTempView("seq_fixture")
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-604800000000L, 0)
    val u = df.select($"event_type", $"value", unix_micros($"ts").as("us"),
      $"user_id",
      when($"event_type" === "click", 1L).otherwise(0L).as("is_c"),
      when($"event_type" === "view", 1L).otherwise(0L).as("is_v"))
    val p = u.select($"event_type", $"value",
        sum($"is_c").over(frame).as("n_c"), sum($"is_v").over(frame).as("n_v"))
      .filter($"event_type" === "purchase")
      .select(floor($"value" * 100 + 0.5).cast("long").as("cents"), $"n_c", $"n_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(p == Set((999L, 1L, 1L), (500L, 0L, 0L)))
  }

  test("gaps-and-islands streaks tile each user's distinct active days") {
    val rows = SeqOps.gapsIslands.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val days = graft.io.Tables.events(spark, sf)
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate)
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.toEpochDay)).toMap
    assert(rows.map(_.getLong(0)).toSet == days.keySet, "one row per user")
    for (r <- rows) {
      val (user, active, nStreaks, longest) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val ds = days(user)
      assert(active == ds.length, s"user $user active days")
      // recompute islands driver-side from the sorted distinct days
      val runs = ds.foldLeft(List.empty[(Long, Long)]) { // (startEpochDay, len)
        case (acc, d) =>
          val e = d.toEpochDay
          acc match {
            case (s, len) :: rest if s + len == e => (s, len + 1) :: rest
            case _                                => (e, 1L) :: acc
          }
      }
      assert(nStreaks == runs.length, s"user $user streak count")
      assert(longest == runs.map(_._2).max, s"user $user longest streak")
      val wantStart = runs.filter(_._2 == longest).map(_._1).min
      assert(r.getString(4) == java.time.LocalDate.ofEpochDay(wantStart).toString,
        s"user $user longest-streak start (earliest on tie)")
    }
  }

  test("association rules: symmetric counts, conf >= supp, lift symmetric") {
    val rows = SeqOps.assocRules.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for (((a, c), (n, supp, conf, lift)) <- byPair) {
      assert(a != c)
      assert(supp <= 1000000L && conf <= 1000000L)
      assert(conf >= supp, "antecedent count <= basket count")
      val (rn, _, _, rlift) = byPair((c, a))
      assert(rn == n, "pair counts are symmetric")
      assert(rlift == lift, "lift is symmetric in exact integer math")
    }
  }

  test("CUSUM finds a seeded level shift at the last pre-shift day") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // 5 days at 2 events/day then 5 days at 6/day for one type: CUSUM
    // peaks on the last low day (2024-01-05). A flat control type must
    // report a calendar day inside its own range with a small peak.
    val dayUs = 86400000000L
    val base = 1704067200000000L // 2024-01-01T00:00Z
    def ts(us: Long) = new Timestamp(us / 1000)
    val shifted = for {
      d <- 0 until 10
      k <- 0 until (if (d < 5) 2 else 6)
    } yield (d * 10L + k, ts(base + d * dayUs + k * 1000000L), 1L, "shifted", 0.0, "{}")
    val flat = for (d <- 0 until 10)
      yield (1000L + d, ts(base + d * dayUs), 2L, "flat", 0.0, "{}")
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    (shifted ++ flat)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = StatsOps.cusumChange.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    // shifted: n=10, total=40; low days contribute 2*10-40=-20 each →
    // running sum bottoms at -100 on day 5, then climbs by +20/day.
    assert(out("shifted") == (("2024-01-05", 100L)))
    assert(out("flat")._2 == 0L, "flat series has zero cumulative deviation")
  }

  test("weighted median splits the quantity mass per flag") {
    val rows = StatsOps.weightedMedian.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.io.Tables.lineitem(spark, sf)
    for (r <- rows) {
      val (flag, med) = (r.getString(0), r.getLong(3))
      val below = li.filter($"l_returnflag" === flag)
        .filter(floor($"l_extendedprice" * 100 + 0.5).cast("long") <= med)
        .agg(sum(floor($"l_quantity" * 100 + 0.5).cast("long")))
        .collect().head.getLong(0)
      val total = r.getLong(2)
      assert(2 * below >= total, s"$flag: mass at/below median is >= half")
    }
  }

  test("winsorized caps are real order statistics and bound the mean") {
    val rows = StatsOps.winsorize.run(spark, sf).collect()
    val li = graft.io.Tables.lineitem(spark, sf)
    for (r <- rows) {
      val (flag, n, lo, hi) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val mean = r.getLong(5)
      assert(lo < hi && mean >= lo && mean <= hi)
      val k = (n + 99) / 100
      val countBelowOrAtLo = li.filter($"l_returnflag" === flag)
        .filter(floor($"l_extendedprice" * 100 + 0.5).cast("long") <= lo).count()
      assert(countBelowOrAtLo >= k, "lo sits at or above the ⌈n/100⌉th value")
    }
  }

  test("time-to-convert quartiles replay from a driver-side as-of walk") {
    val rows = SeqOps.timeToConvert.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.io.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"event_id", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val viewsByUser = ev.filter(_._2 == "view")
      .groupBy(_._1).view.mapValues(_.map(_._4).distinct.sorted).toMap
    val lags = ev.filter(_._2 == "purchase").flatMap { case (u, _, id, us) =>
      viewsByUser.getOrElse(u, Array.empty[Long])
        .takeWhile(_ <= us).lastOption
        .map(v => (us / 86400000000L, (us - v) / 1000000L, id))
    }
    val want = lags.groupBy(_._1).map { case (day, g) =>
      val sorted = g.sortBy(t => (t._2, t._3)).map(_._2)
      val n = sorted.length
      def q(p: Int) = sorted((p * n + 99) / 100 - 1)
      (day, (n.toLong, q(25), q(50), q(75)))
    }
    val got = rows.map { r =>
      val day = java.time.LocalDate.parse(r.getString(0)).toEpochDay
      day -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
    assert(got == want.toMap, s"got $got\nwant $want")
  }

  test("skyline is exactly the non-dominated set under (orders, balance)") {
    val rows = OlapOps.skyline.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // brute-force oracle at sf0.001: all customer points, quadratic check
    val cust = graft.io.Tables.customer(spark, sf)
      .select($"c_custkey", floor($"c_acctbal" * 100 + 0.5).cast("long").as("bal"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ordersPer = graft.io.Tables.orders(spark, sf)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pts = cust.map { case (k, b) => (k, ordersPer.getOrElse(k, 0L), b) }.toSeq
    def dominated(p: (Long, Long, Long)) = pts.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    val want = pts.filterNot(dominated)
      .sortBy(p => (-p._2, -p._3, p._1))
    assert(rows.toSeq == want, s"got ${rows.toSeq}\nwant $want")
  }

  test("percent-of-parent shares sum to ~10000 bps at both hierarchy levels") {
    val rows = OlapOps.pctOfParent.run(spark, sf).collect()
    assert(rows.nonEmpty)
    for ((region, rs) <- rows.groupBy(_.getString(0))) {
      val bps = rs.map(_.getLong(3)).sum
      assert(bps <= 10000L && bps > 10000L - rs.length, s"$region nation shares: $bps")
    }
    val regionShares = rows.groupBy(_.getString(0)).map(_._2.head.getLong(4))
    val total = regionShares.sum
    assert(total <= 10000L && total > 10000L - regionShares.size,
      s"region shares: $total")
    val revenue = graft.io.Tables.orders(spark, sf)
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")))
      .collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == revenue, "revenue conserved across leaves")
  }

  test("RFM quartiles are balanced and the segment echoes the digits") {
    val rows = OlapOps.rfmSegments.run(spark, sf).collect()
    val n = rows.length
    for (col <- Seq(4, 5, 6)) {
      val sizes = rows.groupBy(_.getLong(col)).view.mapValues(_.size)
      assert(sizes.keySet == Set(1L, 2L, 3L, 4L))
      assert(sizes.values.max - sizes.values.min <= 1, s"ntile balance: $sizes")
    }
    assert(rows.forall(r =>
      r.getString(7) == s"${r.getLong(4)}${r.getLong(5)}${r.getLong(6)}"))
    assert(n == graft.io.Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count())
  }

  test("ABC classes cover all revenue and A-share is at most 80% + one customer") {
    val rows = OlapOps.abcPareto.run(spark, sf).collect()
    val classes = rows.map(_.getString(0)).toSeq
    assert(classes == classes.sorted && classes.toSet.subsetOf(Set("A", "B", "C")))
    val shares = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    // every class share in basis points; floor-quantized sum within 3 bps
    assert(shares.values.sum <= 10000 && shares.values.sum > 10000 - 3)
    // the A boundary rule: running share <= 80% ⇒ class-A total <= 8000 bps
    assert(shares.getOrElse("A", 0L) <= 8000)
  }

  test("personalized PageRank concentrates rank on and around the seeds") {
    val rows = GraphOps.personalizedPageRank.run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.sorted.reverse.sameElements(ranks), "rank-descending")
    assert(ranks.forall(_ > 0))
    // deterministic: a second run yields the identical head
    val again = GraphOps.personalizedPageRank.run(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("time-decay attribution replays the bucketed 2^-day kernel driver-side") {
    val ev = graft.io.Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val dayUs = 86400000000L
    val byUser = ev.groupBy(_._1)
    var (wantClick, wantView) = (0L, 0L)
    var (nClick, nView) = (0L, 0L)
    for ((_, es) <- byUser; (_, t, v, pus) <- es if t == "purchase") {
      def wsum(ch: String) = es.iterator
        .filter(e => e._2 == ch && e._4 <= pus && pus - e._4 < 7 * dayUs)
        .map(e => 1L << (6 - ((pus - e._4) / dayUs)).toInt).sum
      val (wc, wv) = (wsum("click"), wsum("view"))
      val cents = math.floor(v * 100 + 0.5).toLong
      if (wc > 0) { wantClick += cents * wc / (wc + wv); nClick += 1 }
      if (wv > 0) { wantView += cents * wv / (wc + wv); nView += 1 }
    }
    val out = SeqOps.timeDecayAttribution.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("click") == ((nClick, wantClick)), "click channel replay")
    assert(out("view") == ((nView, wantView)), "view channel replay")
  }

  test("paths to conversion are the lag-3 sequences ending in purchase") {
    val rows = SeqOps.pathTopk.run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // counts descend, ties alphabetical
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sortBy(p => (-p._1, p._2)).sameElements(pairs))
    // driver replay: total conversions with >=3 predecessors
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val paths = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._3, e._4)).map(_._2)
      s.sliding(4).filter(w => w.length == 4 && w.last == "purchase")
        .map(w => w.init.mkString(">"))
    }.toSeq
    val top = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(p => (-p._2, p._1)).take(10)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == top)
  }

  test("bag set ops: multiplicities follow min/difference, distinct variants agree") {
    val li = graft.io.Tables.lineitem(spark, sf)
    val a = li.filter(col("l_quantity") >= 40).select(col("l_partkey")).collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length).toMap
    val b = li.filter(col("l_discount") >= 0.05).select(col("l_partkey")).collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length).toMap
    val inter = OlapOps.intersectAllShip.run(spark, sf).collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length).toMap
    val diff = OlapOps.exceptAllShip.run(spark, sf).collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length).toMap
    for (k <- (a.keySet ++ b.keySet)) {
      val (ca, cb) = (a.getOrElse(k, 0), b.getOrElse(k, 0))
      assert(inter.getOrElse(k, 0) == math.min(ca, cb), s"intersect-all key $k")
      assert(diff.getOrElse(k, 0) == math.max(ca - cb, 0), s"except-all key $k")
    }
    assert(inter.values.exists(_ > 1), "multiplicity > 1 actually exercised")
  }

  test("cohort LTV: age-0 means first-month revenue, cumulative is monotone") {
    val rows = OlapOps.cohortLtv.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((ym, grp0) <- rows.groupBy(_._1)) {
      val grp = grp0.sortBy(_._2)
      assert(grp.head._2 == 0L, s"cohort $ym starts at age 0")
      // cumulative revenue never decreases and ltv = cum DIV n_cust
      for (Array(a, b) <- grp.sliding(2).map(_.toArray) if b != null)
        assert(b._4 >= a._4, s"cohort $ym cumulative monotone")
      grp.foreach(r => assert(r._5 == r._4 / r._3, s"cohort $ym ltv division"))
    }
    // replay one cohort's age-0 revenue driver-side
    val orders = graft.io.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m12"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val firstM = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val (ym0, age0, n0, rev0, _) = rows.minBy(r => (r._1, r._2))
    val cm0 = orders.map(o => firstM(o._1)).min
    assert(ym0 == (cm0 - 1) / 12 * 100 + ((cm0 - 1) % 12 + 1) && age0 == 0L)
    val cohortCust = firstM.filter(_._2 == cm0).keySet
    assert(n0 == cohortCust.size.toLong)
    assert(rev0 == orders.filter(o => cohortCust(o._1) && o._2 == cm0).map(_._3).sum)
  }
}
