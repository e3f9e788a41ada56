package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class StatsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("moment-based corr agrees with Spark's builtin corr to 1e-6") {
    val ours = StatsOps.corrMoments.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = graft.io.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == builtin.keySet)
    for ((k, v) <- ours)
      assert(math.abs(v - builtin(k)) < 1e-6, s"flag $k: $v vs ${builtin(k)}")
  }

  test("quantile buckets partition every order into near-equal quarters") {
    val orders = graft.io.Tables.orders(spark, sf)
    val total = orders.count()
    val rows = StatsOps.quantileBucket.run(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getLong(1)).sum == total, "buckets partition all rows")
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 2, s"quartiles balanced: ${counts.toSeq}")
    // bucket boundaries are ordered: each bucket's max <= next bucket's min
    val spans = rows.map(r => (r.getDouble(2), r.getDouble(3)))
    spans.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi <= lo) }
  }

  test("histogram bins tile the value range and count every order") {
    val rows = StatsOps.histogram.run(spark, sf).collect()
    val total = graft.io.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 25000))
  }

  test("profile counts nulls, distincts and native-order min/max") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // 999.0 < 10000.0 numerically but '999.00' > '10000.00' as strings —
    // pins the render-after-min ordering.
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 999.0), (2L, 10000.0), (3L, null), (3L, 42.5))
      .toDF("k", "price")
    val prof = df.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count($"price")).as("n_nulls"),
      countDistinct($"price").as("n_distinct"),
      min($"price").cast("decimal(18,2)").cast("string").as("min_s"),
      max($"price").cast("decimal(18,2)").cast("string").as("max_s")).collect().head
    assert(prof.getLong(0) == 4 && prof.getLong(1) == 1 && prof.getLong(2) == 3)
    assert(prof.getString(3) == "42.50" && prof.getString(4) == "10000.00")
    // and the registered op emits one row per orders column, zero nulls
    val out = StatsOps.profileOrders.run(spark, sf).collect()
    assert(out.length == 6)
    assert(out.forall(_.getLong(2) == 0L), "testdata orders has no nulls")
    assert(out.forall(r => r.getString(4) <= r.getString(5) ||
      r.getString(0) == "o_totalprice"), "min_s <= max_s except decimal render")
  }

  test("ks test: identical samples score ~0, planted shift crosses the bar") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // same 200-value grid in both samples -> CDFs coincide, D = 0
    val same = ((1 to 200).map(v => (v.toLong, 1L)) ++
      (1 to 200).map(v => (v.toLong, 0L))).toDF("v", "in_a")
    val sOut = StatsOps.ksTestOf(same).collect().head
    assert(sOut.getAs[Long]("d_num") == 0L)
    assert(sOut.getAs[Double]("d_stat") == 0.0)
    assert(sOut.getAs[Long]("drift") == 0L)
    // disjoint supports -> D = 1, far above any critical value
    val shift = ((1 to 200).map(v => (v.toLong, 1L)) ++
      (1 to 200).map(v => (1000L + v, 0L))).toDF("v", "in_a")
    val dOut = StatsOps.ksTestOf(shift).collect().head
    assert(dOut.getAs[Double]("d_stat") == 1.0, "disjoint supports max the statistic")
    assert(dOut.getAs[Long]("drift") == 1L)
    // D is invariant to which side is called A
    val flipped = shift.select(col("v"), (lit(1L) - col("in_a")).as("in_a"))
    assert(StatsOps.ksTestOf(flipped).collect().head.getAs[Double]("d_stat") == 1.0)
  }

  test("mann-whitney: shift zeroes U, midranks split ties, U_A+U_B = n·m") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // every B value beats every A value -> U_A = 0, AUC = 0
    val shift = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 0L), (5L, 0L), (6L, 0L))
      .toDF("v", "in_a")
    val s = StatsOps.mannWhitneyOf(shift).collect().head
    assert(s.getAs[Long]("u2_a") == 0L)
    assert(s.getAs[Double]("auc_a") == 0.0)
    // A={1,2}, B={2,3}: the 2-2 tie gives half credit -> U_A = 0.5 (u2 = 1)
    val ties = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 0L)).toDF("v", "in_a")
    val t2 = StatsOps.mannWhitneyOf(ties).collect().head
    assert(t2.getAs[Long]("u2_a") == 1L, "midrank tie = half a win")
    // complement identity: U_A + U_B = n_a * n_b whatever the ties
    val t3 = StatsOps.mannWhitneyOf(
      ties.select(col("v"), (lit(1L) - col("in_a")).as("in_a"))).collect().head
    assert(t2.getAs[Long]("u2_a") + t3.getAs[Long]("u2_a") == 2L * 2 * 2)
    // a planted disjoint shift at n=200 is loudly significant
    val big = ((1 to 200).map(v => (v.toLong, 1L)) ++
      (1 to 200).map(v => (1000L + v, 0L))).toDF("v", "in_a")
    val b = StatsOps.mannWhitneyOf(big).collect().head
    assert(b.getAs[Long]("shifted") == 1L)
    assert(b.getAs[Double]("z") < -10.0, "A far below B drives z strongly negative")
  }

  test("target encoding excludes each row's own balance from its segment mean") {
    val cust = graft.io.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val segSum = cust.groupBy(_._2).view.mapValues(cs =>
      (cs.map(_._3).sum, cs.length.toLong)).toMap
    val out = StatsOps.targetEncode.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("enc_q")).toMap
    assert(out.size == cust.length)
    cust.foreach { case (key, seg, cents) =>
      val (sum, n) = segSum(seg)
      val expected = math.floor((sum - cents).toDouble / (n - 1) * 100.0 + 0.5).toLong
      assert(out(key) == expected, s"customer $key")
    }
  }

  test("autocorr matches a driver-side Pearson over the lagged series") {
    val rows = StatsOps.autocorr.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3.toDouble).toArray).toMap
    for (r <- rows) {
      val (t, k, n, got) = (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      val s = daily(t)
      val xs = s.dropRight(k); val ys = s.drop(k)
      assert(n == xs.length)
      val nd = n.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
      val want = (nd * sxy - sx * sy) /
        math.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))
      assert(math.abs(got - want) < 1e-6, s"$t lag $k: $got vs $want")
      assert(got >= -1.0 && got <= 1.0)
    }
  }

  test("Theil-Sen slope is the lower median of all pairwise slopes") {
    val rows = StatsOps.theilSen.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3))).toMap
    for (r <- rows) {
      val (t, nPairs, got) = (r.getString(0), r.getLong(1), r.getLong(2))
      val pts = daily(t)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2) * 1000000L / (pts(j)._1 - pts(i)._1)).sorted
      assert(nPairs == slopes.length)
      assert(got == slopes(((slopes.length + 1) / 2 - 1).toInt),
        s"$t: lower median of ${slopes.length} slopes")
    }
  }

  test("Poisson bootstrap: replicate means replay exactly from the hash draw") {
    val rows = StatsOps.bootstrapCi.run(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (mean, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo < hi && lo <= mean && mean <= hi,
        s"${r.getString(0)}: CI [$lo,$hi] must bracket the point mean $mean")
    }
    // full driver-side replay for one priority with the same hash + CDF
    val pr = rows.head.getString(0)
    val base = graft.io.Tables.orders(spark, sf)
      .filter($"o_orderpriority" === pr)
      .select($"o_orderkey", floor($"o_totalprice" * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def weight(key: Long, b: Int): Long = {
      val hv = graft.functions.Md5Hash60.hash60(s"$key|$b".getBytes("UTF-8"))
      val k = StatsOps.PoissonCdf60.indexWhere(hv < _)
      if (k < 0) 7L else k.toLong
    }
    val means = (0 until 50).flatMap { b =>
      val (swx, sw) = base.foldLeft((0L, 0L)) { case ((x, w), (key, cents)) =>
        val wt = weight(key, b); (x + wt * cents, w + wt)
      }
      if (sw > 0) Some((swx / sw, b)) else None
    }.sorted
    assert(rows.head.getLong(3) == means(1)._1, s"$pr rank-2 lower bound")
    assert(rows.head.getLong(4) == means(48)._1, s"$pr rank-49 upper bound")
  }

  test("weekday ANOVA eta2 stays in [0, 1e6] and replays driver-side") {
    val rows = StatsOps.weekdayAnova.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L))
    val t0 = rows.head.getString(0)
    val daily = graft.io.Tables.events(spark, sf)
      .filter($"event_type" === t0)
      .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("c"))
      .select($"day", dayofweek($"day").as("wd"), $"c")
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val n = daily.length.toLong
    val s = daily.map(_._2).sum
    val ss = daily.map(x => x._2 * x._2).sum
    val between = daily.groupBy(_._1).values
      .map { g => val sg = g.map(_._2).sum; sg * sg * n / g.length }.sum
    val want = (between - s * s) * 1000000L / (n * ss - s * s)
    assert(rows.head.getLong(3) == want, s"$t0 eta2 exact replay")
  }

  test("month-over-month shares sum to ~10000 bps and deltas telescope") {
    val rows = OlapOps.momShare.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byMonth = rows.groupBy(_.getString(0))
    for ((m, rs) <- byMonth) {
      val bps = rs.map(_.getLong(3)).sum
      assert(bps <= 10000L && bps > 10000L - rs.length, s"$m share mass $bps")
    }
    // deltas: share(month) - share(prev month) per segment, null first month
    val bySeg = rows.groupBy(_.getString(1)).view.mapValues(_.sortBy(_.getString(0)))
    for ((seg, rs) <- bySeg) {
      assert(rs.head.isNullAt(4), s"$seg first month delta must be NULL")
      for (Array(a, b) <- rs.sliding(2).map(_.toArray) if !b.isNullAt(4))
        assert(b.getLong(4) == b.getLong(3) - a.getLong(3), s"$seg ${b.getString(0)}")
    }
  }

  /** Day-aligned (x, y) daily-count series for every event-type pair. */
  private def pairSeries: Map[(String, String), Array[(Long, Long, Long)]] = {
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val types = daily.map(_._1).distinct.sorted
    (for {
      ta <- types; tb <- types if ta < tb
      am = daily.filter(_._1 == ta).map(r => r._2 -> r._3).toMap
      bm = daily.filter(_._1 == tb).map(r => r._2 -> r._3).toMap
      days = am.keySet.intersect(bm.keySet).toArray.sorted
    } yield (ta, tb) -> days.map(d => (d, am(d), bm(d)))).toMap
  }

  test("kendall tau-b replays driver-side from concordant/discordant pairs") {
    val rows = StatsOps.kendallTau.run(spark, sf).collect()
    assert(rows.length == pairSeries.size)
    for (r <- rows) {
      val s = pairSeries((r.getString(0), r.getString(1)))
      val pairs = for (i <- s.indices; j <- i + 1 until s.length)
        yield (s(i)._2 - s(j)._2, s(i)._3 - s(j)._3)
      val conc = pairs.count { case (dx, dy) => dx * dy > 0 }
      val disc = pairs.count { case (dx, dy) => dx * dy < 0 }
      val (n1, n2) = (pairs.count(_._1 == 0), pairs.count(_._2 == 0))
      assert(r.getLong(2) == pairs.length && r.getLong(3) == conc && r.getLong(4) == disc)
      val want = (conc - disc).toDouble /
        math.sqrt((pairs.length - n1).toDouble * (pairs.length - n2))
      assert(math.abs(r.getDouble(5) - want) < 1e-6, s"${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("spearman rho matches the permutation-rank formula driver-side") {
    val rows = StatsOps.spearman.run(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val s = pairSeries((r.getString(0), r.getString(1)))
      // rank under the (value, day) total order — same tie rule as the op
      def ranks(vd: Array[(Long, Long)]): Map[Long, Int] =
        vd.sortBy(identity).zipWithIndex.map { case ((_, day), i) => day -> (i + 1) }.toMap
      val rx = ranks(s.map(t => (t._2, t._1)))
      val ry = ranks(s.map(t => (t._3, t._1)))
      val n = s.length.toLong
      val sd2 = s.map(t => { val d = rx(t._1) - ry(t._1); d.toLong * d }).sum
      assert(r.getLong(3) == sd2, "sum of squared rank differences")
      assert(r.getLong(4) == (n * (n * n - 1) - 6 * sd2) * 1000000L / (n * (n * n - 1)))
    }
  }

  test("runs test counts sign runs around the lower median") {
    val rows = StatsOps.runsTest.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1)
    for (r <- rows) {
      val series = daily(r.getString(0)).sortBy(_._2).map(_._3)
      val med = series.map(x => x).sorted.apply((series.length + 1) / 2 - 1)
      val signs = series.filter(_ != med).map(_ > med)
      val runs = 1 + signs.sliding(2).count(w => w.length == 2 && w(0) != w(1))
      assert(r.getLong(1) == signs.count(identity), "n_above")
      assert(r.getLong(2) == signs.count(!_), "n_below")
      assert(r.getLong(3) == runs, s"${r.getString(0)} runs")
    }
  }

  test("gini is 0 on equal spend, ppm-exact on a known tilt, in-range on data") {
    // analytic fixture: spends 1,2,3 -> G = Sigma(2i-n-1)x_i/(n*Sigma x) = 2/9
    val i1 = (2 * 1 - 3 - 1).toLong * 100 + (2 * 2 - 3 - 1).toLong * 200 +
      (2 * 3 - 3 - 1).toLong * 300
    assert(i1 * 1000000L / (3L * 600) == 222222L)
    val rows = StatsOps.giniSegment.run(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(3) >= 0L && r.getLong(3) < 1000000L, s"${r.getString(0)} in range")
    }
    // replay one segment exactly
    val seg = rows.head.getString(0)
    val cents = graft.io.Tables.orders(spark, sf)
      .join(graft.io.Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment" === seg)
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted
    val n = cents.length.toLong
    val tot = cents.map(_._1).sum
    val num = cents.zipWithIndex.map { case ((x, _), i0) =>
      BigInt(2L * (i0 + 1) - n - 1) * x }.sum
    assert(BigInt(rows.head.getLong(3)) == num * 1000000 / (BigInt(n) * tot), s"$seg replay")
  }

  test("EB shrinkage pulls small samples toward the global rate, large ones stay") {
    val rows = StatsOps.ebShrinkage.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val totN = rows.map(_._2).sum
    val m = rows.map(_._3).sum * 1000000L / totN
    rows.foreach { case (ck, n, x, raw, shrunk) =>
      assert(raw == x * 1000000L / n, s"$ck raw rate")
      assert(shrunk == (x * 1000000L + 20L * m) / (n + 20L), s"$ck posterior mean")
      // shrunk lies between the raw rate and the global mean (floor slack 1)
      assert(shrunk >= math.min(raw, m) - 1 && shrunk <= math.max(raw, m) + 1,
        s"$ck between raw and prior")
    }
    // a customer with few orders moves closer to m than one with many
    val small = rows.filter(_._2 <= 2).map(r => math.abs(r._5 - m).toDouble / math.max(1, math.abs(r._4 - m)))
    val big = rows.filter(_._2 >= 15).map(r => math.abs(r._5 - m).toDouble / math.max(1, math.abs(r._4 - m)))
    if (small.nonEmpty && big.nonEmpty)
      assert(small.sum / small.length < big.sum / big.length + 0.5,
        "shrinkage strength decreases with sample size")
  }

  test("seasonal decomposition: additive identity, windowed trend, constant weekday effect") {
    val rows = StatsOps.seasonalDecompose.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // per-row identity: 7000*c = 1000*trend7 + seasonal + residual
    rows.foreach { case (t, day, c, tr, sea, res) =>
      assert(7000L * c == 1000L * tr + sea + res, s"$t $day additive identity")
    }
    // trend is the true centered 7-day total
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate), r.getLong(2))).toMap
    rows.foreach { case (t, day, _, tr, _, _) =>
      val d0 = java.time.LocalDate.parse(day)
      val win = (-3 to 3).flatMap(i => daily.get((t, d0.plusDays(i))))
      assert(win.length == 7, s"$t $day full centered window")
      assert(tr == win.sum, s"$t $day trend")
    }
    // seasonal is constant within (type, weekday)
    rows.groupBy(r => (r._1, java.time.LocalDate.parse(r._2).getDayOfWeek))
      .foreach { case (k, rs) =>
        assert(rs.map(_._5).distinct.length == 1, s"$k one seasonal value")
      }
  }

  test("DES forecast replays Brown's truncated power-of-two kernel") {
    val rows = StatsOps.desForecast.run(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.nonEmpty)
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").cast("string").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    var checked = 0
    for ((t, series) <- daily; idx <- series.indices.drop(14).dropRight(1)) {
      def s1(k: Int): Long =
        (0 to 7).map(i => series(k - i)._3 * (1L << (7 - i))).sum
      val s2 = (0 to 7).map(i => s1(idx - i) * (1L << (7 - i))).sum
      val f = (3 * s1(idx) * 255 - 2 * s2) * 1000 / 65025
      val (day1, actual) = (series(idx + 1)._2, series(idx + 1)._3)
      val got = rows((t, day1))
      assert(got == ((f, actual, math.abs(f - actual * 1000))), s"$t -> $day1")
      checked += 1
    }
    assert(checked == rows.size, "every emitted forecast was replayed")
  }

  test("ljung-box Q is the weighted sum of squared lag correlations") {
    val q = StatsOps.ljungBox.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ac = StatsOps.autocorr.run(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getDouble(3))).toMap
    assert(q.nonEmpty)
    for ((t, (n, got)) <- q) {
      val nd = n.toDouble
      // autocorr's emitted r is rounded to 6dp; Q uses the unrounded r, so
      // compare within the rounding slack propagated through the formula
      val approx = nd * (nd + 2.0) * (1 to 3).map { k =>
        val r = ac((t, k)); r * r / (nd - k) }.sum
      assert(got >= 0.0, s"$t Q nonneg")
      assert(math.abs(got - approx) < nd * nd * 1e-4, s"$t Q ~ $approx vs $got")
    }
  }

  test("hashed cross: bucket accounting closes, collisions flagged exactly") {
    val rows = StatsOps.hashedCross.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.forall { case (b, _, _, _) => b >= 0 && b < 64 })
    val cust = graft.io.Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment")).collect()
      .map(r => s"${r.getInt(0)}:${r.getString(1)}")
    assert(rows.map(_._2).sum == cust.length.toLong,
      "every customer row lands in exactly one bucket")
    assert(rows.map(_._3).sum == cust.distinct.length.toLong,
      "each raw cross hashes to exactly one bucket")
    assert(rows.forall { case (_, _, nc, fl) => fl == (if (nc > 1) 1L else 0L) },
      "collision flag mirrors the distinct-cross count")
  }

  test("WOE replays a driver-side recomputation exactly, IV terms are lift-consistent") {
    val rows = StatsOps.woeEncode.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 5, "one row per order priority")
    val counts = graft.io.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderstatus")).collect()
      .map(r => (r.getString(0), r.getString(1) == "F"))
    val posTot = counts.count(_._2).toLong
    val negTot = counts.length - posTot
    for ((cat, pos, neg, woe, iv) <- rows) {
      val cp = counts.count(c => c._1 == cat && c._2).toLong
      val cn = counts.count(c => c._1 == cat && !c._2).toLong
      assert((pos, neg) == ((cp, cn)), s"$cat counts")
      val arg = ((2 * cp + 1) * (2 * negTot + 1)).toDouble /
        ((2 * cn + 1) * (2 * posTot + 1))
      val expWoe = math.round(
        BigDecimal(math.log(arg)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble * 1000000).toLong
      assert(woe == expWoe, s"$cat woe: $woe vs $expWoe")
      val gap = cp * 1000000L / posTot - cn * 1000000L / negTot
      assert(iv == gap * woe, s"$cat iv term")
    }
  }

  test("permutation test: every shuffle re-deals exact group sizes and replays in plain JVM") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val rows = Seq(
      (1L, 100.00, "1-URGENT"), (2L, 250.50, "3-MEDIUM"),
      (3L, 75.25, "1-URGENT"), (4L, 310.00, "5-LOW"),
      (5L, 42.10, "2-HIGH"), (6L, 199.99, "1-URGENT"),
      (7L, 512.00, "4-NOT SPECIFIED"), (8L, 61.75, "3-MEDIUM"))
    val df = rows.toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val out = StatsOps.permTestOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == (0L until 16L), "one row per permutation")
    // independent JVM replay of the md5hash60 ranking and the statistic
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val cents = rows.map { case (k, p, _) => k -> math.round(p * 100) }.toMap
    val nA = rows.count(_._3 == "1-URGENT")
    val obs = rows.filter(_._3 == "1-URGENT").map(r => cents(r._1)).sum
    for ((perm, stat, ge) <- out) {
      val picked = rows.map(_._1)
        .sortBy(id => (h60(s"$perm:$id"), id)).take(nA)
      val want = picked.map(cents).sum
      assert(stat == want, s"perm $perm statistic")
      assert(ge == (if (stat >= obs) 1L else 0L), s"perm $perm ge_obs")
    }
  }
}
