package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class DqOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("healthy testdata audits clean: zero dup PKs, zero FK orphans") {
    val pk = DqOps.pkUnique.run(spark, sf).collect()
    assert(pk.length == 4)
    assert(pk.forall(_.getLong(3) == 0L), s"dup PKs: ${pk.mkString(",")}")
    val fk = DqOps.fkOrphans.run(spark, sf).collect()
    assert(fk.length == 3)
    assert(fk.forall(_.getLong(1) == 0L), s"orphans: ${fk.mkString(",")}")
  }

  test("the checks DETECT planted violations, not just bless clean data") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import org.apache.spark.sql.functions._
    // planted duplicate key: 2 rows share PK 7 -> n_dup_rows = 1
    val t = Seq(7L, 7L, 8L, 9L).map(Tuple1(_)).toDF("k")
    val dup = t.agg((count(lit(1)) - countDistinct($"k")).as("d"))
      .collect().head.getLong(0)
    assert(dup == 1L)
    // planted orphan: child 99 has no parent -> 1 orphan
    val child = Seq(1L, 2L, 99L).map(Tuple1(_)).toDF("ck")
    val parent = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("pk")
    val orphans = child.join(parent, $"ck" === $"pk", "left_anti").count()
    assert(orphans == 1L)
  }

  test("snapshot diff tags every change kind and excludes unchanged rows") {
    val rows = DqOps.snapshotDiff.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.nonEmpty)
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byStatus.keySet == Set("added", "removed", "changed"))
    assert(byStatus("added").forall(_ % 10 == 7), "added = keys missing old")
    assert(byStatus("removed").forall(_ % 10 == 3), "removed = keys missing new")
    assert(byStatus("changed").forall(k => k % 5 == 0 && k % 10 != 3),
      "changed = bumped keys present in both")
    // unchanged keys never appear
    assert(rows.map(_._1).forall(k =>
      k % 10 == 7 || k % 10 == 3 || k % 5 == 0))
  }

  test("PSI crosses the action bar on a planted shift and stays near 0 without one") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // identical distributions → psi ≈ 0 (smoothing noise only)
    val same = ((1 to 400).map(i => (i % 4, 1)) ++
      (1 to 400).map(i => (i % 4, 0))).map { case (b, a) => (b.toLong, a) }
      .toDF("bucket", "in_a")
    val psiSame = DqOps.psiOf(same).collect().head.getDouble(4)
    assert(math.abs(psiSame) < 0.01, s"no drift planted but psi=$psiSame")
    // hard shift: A mass on buckets {0,1}, B mass on buckets {2,3}
    val shifted = ((1 to 400).map(i => (i % 2, 1)) ++
      (1 to 400).map(i => (2 + i % 2, 0))).map { case (b, a) => (b.toLong, a) }
      .toDF("bucket", "in_a")
    val psiShift = DqOps.psiOf(shifted).collect().head.getDouble(4)
    assert(psiShift > 0.25, s"planted full shift must trip the bar: $psiShift")
  }
  test("k-anonymity: small equivalence classes are flagged, large ones pass") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // class (1, BUILDING): 12 rows (>= k=10, passes); (2, AUTO): 3 rows
    // (violates); (3, MACHINERY): exactly 10 rows (boundary, passes)
    val rows =
      (1 to 12).map(i => (i.toLong, 1L, "BUILDING")) ++
        (1 to 3).map(i => (100L + i, 2L, "AUTO")) ++
        (1 to 10).map(i => (200L + i, 3L, "MACHINERY"))
    val customer = rows.toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val out = DqOps.kAnonymityOf(customer).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((1L, "BUILDING")) == ((12L, 0L, 0.48)))
    assert(out((2L, "AUTO")) == ((3L, 1L, 0.12)), "3 < k flags")
    assert(out((3L, "MACHINERY")) == ((10L, 0L, 0.4)), "exactly k passes")
  }

  test("l-diversity: homogeneous class flags even when k-anonymous") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // class (1, BUILDING): 12 members but ALL in the 'low' band -> l=1,
    // violates despite its size; class (2, AUTO): 6 members spread over
    // negative/low/high -> l=3 passes; boundary values pin the exact band
    // edges (0 -> low, 5000 -> high)
    val rows =
      (1 to 12).map(i => (i.toLong, 1L, "BUILDING", 100.0)) ++
        Seq((101L, 2L, "AUTO", -5.0), (102L, 2L, "AUTO", -1.0),
          (103L, 2L, "AUTO", 0.0), (104L, 2L, "AUTO", 4999.99),
          (105L, 2L, "AUTO", 5000.0), (106L, 2L, "AUTO", 9000.0))
    val customer = rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = DqOps.lDiversityOf(customer).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    assert(out((1L, "BUILDING")) == ((12L, 1L, 1.0, 1L)),
      "single-band class must violate l regardless of class size")
    val auto = out((2L, "AUTO"))
    assert(auto._2 == 3L && auto._4 == 0L, s"three bands pass: $auto")
    assert(auto._3 == math.round(2.0 / 6.0 * 1e6) / 1e6,
      "top band {negative: 2} ties {low: 2}... max n = 2 -> share 2/6")
  }

  test("scd2: consecutive duplicate values collapse, intervals chain, last is current") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: 10 -> 10 (collapse) -> 20 -> 10: three versions
      (1L, t("2024-01-01 00:00:00"), 1L, "purchase", 10.0),
      (2L, t("2024-01-02 00:00:00"), 1L, "purchase", 10.0),
      (3L, t("2024-01-03 00:00:00"), 1L, "purchase", 20.0),
      (4L, t("2024-01-04 00:00:00"), 1L, "purchase", 10.0),
      // non-purchase events never enter the log
      (5L, t("2024-01-05 00:00:00"), 1L, "click", 99.0),
      // user 2: single event = single open version
      (6L, t("2024-02-01 00:00:00"), 2L, "purchase", 7.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = DqOps.scd2BuildOf(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.keySet == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)))
    assert(out((1L, 1L)).getAs[Double]("value") == 10.0)
    assert(out((1L, 2L)).getAs[Double]("value") == 20.0)
    assert(out((1L, 3L)).getAs[Double]("value") == 10.0,
      "a value may recur in a LATER version; only consecutive dups collapse")
    // interval chaining: each version's valid_to equals the next's valid_from
    assert(out((1L, 1L)).getAs[java.sql.Timestamp]("valid_to") ==
      out((1L, 2L)).getAs[java.sql.Timestamp]("valid_from"))
    assert(out((1L, 2L)).getAs[java.sql.Timestamp]("valid_to") ==
      out((1L, 3L)).getAs[java.sql.Timestamp]("valid_from"))
    assert(out((1L, 3L)).getAs[Long]("is_current") == 1L &&
      out((1L, 3L)).get(4) == null, "open interval marks the live version")
    assert(out((1L, 1L)).getAs[Long]("is_current") == 0L)
    assert(out((2L, 1L)).getAs[Long]("is_current") == 1L)
  }

  test("scd2 lookup: each click resolves to the version valid at its instant") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1 version chain: v1 value 10 from Jan 1, v2 value 20 from Jan 3
      (1L, t("2024-01-01 00:00:00"), 1L, "purchase", 10.0),
      (2L, t("2024-01-03 00:00:00"), 1L, "purchase", 20.0),
      // clicks: before any version / inside v1 / exactly at v2 boundary / after
      (10L, t("2023-12-31 00:00:00"), 1L, "click", 0.0),
      (11L, t("2024-01-02 00:00:00"), 1L, "click", 0.0),
      (12L, t("2024-01-03 00:00:00"), 1L, "click", 0.0),
      (13L, t("2024-01-09 00:00:00"), 1L, "click", 0.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = DqOps.scd2LookupOf(events).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(10L) == ((None, None)), "click before first version carries nulls")
    assert(out(11L) == ((Some(1L), Some(10.0))))
    assert(out(12L) == ((Some(2L), Some(20.0))),
      "boundary instant belongs to the NEW version (half-open intervals)")
    assert(out(13L) == ((Some(2L), Some(20.0))), "open interval serves the tail")
  }

  test("t-closeness: class matching the global mix scores 0, skewed classes flag") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // global mix = 6 low / 6 high = (0.5, 0.5); nation 1 mirrors it exactly,
    // nations 2 and 3 are each pure one-band -> TV distance 0.5 > 0.2
    val rows =
      (Seq.fill(2)((1, "A", 100.0)) ++ Seq.fill(2)((1, "A", 6000.0)) ++
        Seq.fill(4)((2, "A", 6000.0)) ++ Seq.fill(4)((3, "A", 100.0)))
        .map { case (n, s, b) => (n, s, b) }
        .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val out = DqOps.tClosenessOf(rows).collect()
      .map(r => r.getInt(0) -> (r.getAs[Double]("t_distance"),
        r.getAs[Long]("violates_t"))).toMap
    assert(out(1) == ((0.0, 0L)), s"mirror class: ${out(1)}")
    assert(out(2) == ((0.5, 1L)), s"all-high class: ${out(2)}")
    assert(out(3) == ((0.5, 1L)), s"all-low class: ${out(3)}")
    // real data: distances are valid TV distances and the flag is the bar
    val real = DqOps.tCloseness.run(spark, sf).collect()
    real.foreach { r =>
      val d = r.getAs[Double]("t_distance")
      assert(d >= 0.0 && d <= 1.0)
      assert((d > 0.2) == (r.getAs[Long]("violates_t") == 1L))
    }
  }

  test("benford: digit accounting closes and expectations are the log law") {
    val rows = DqOps.benford.run(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L), "all nine leading digits")
    val nOrders = graft.io.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nOrders, "every order contributes a digit")
    rows.foreach { r =>
      val d = r.getLong(0)
      val expShare = r.getAs[Double]("exp_share")
      assert(math.abs(expShare - math.log10(1.0 + 1.0 / d)) < 1e-6, s"digit $d law")
      assert(r.getAs[Double]("chi2_term") >= 0.0)
    }
    assert(math.abs(rows.map(_.getAs[Double]("obs_share")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("exp_share")).sum - 1.0) < 1e-4,
      "Benford shares are a distribution")
  }

  test("typo pairs: deletion-neighborhood join finds exactly the ED<=1 pairs") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.io.Tables.customer(spark, sf)
      .select(org.apache.spark.sql.functions.col("c_custkey"),
        org.apache.spark.sql.functions.col("c_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // quadratic ground truth at sf0.001 (150 names)
    val want = (for {
      (i1, w1) <- names; (i2, w2) <- names
      if i1 < i2 && lev(w1, w2) <= 1
    } yield (i1, i2)).toSet
    val got = DqOps.typoPairs.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty, "sequentially-numbered names must yield ED=1 pairs")
  }

  test("rule engine: healthy data passes the hard rules, accounting closes") {
    val rows = DqOps.ruleCheck.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == 6)
    val nLi = graft.io.Tables.lineitem(spark, sf).count()
    // per-row rules check every lineitem; pass flag mirrors the count
    for (rule <- Seq("li_discount_range", "li_quantity_positive", "li_tax_nonnegative")) {
      val (checked, viol, pass) = rows(rule)
      assert(checked == nLi, s"$rule checks every lineitem")
      assert((viol == 0L) == (pass == 1L), s"$rule flag consistent")
    }
    // the temporal rule rides the join: one check per lineitem with an order
    assert(rows("li_ship_after_order")._1 == nLi, "FK is complete in testdata")
    // the synthetic generator draws shipdate independently of orderdate, so
    // the temporal rule FIRES — the engine catching a real inconsistency
    // (and the pass flag correctly reads failure)
    assert(rows("li_ship_after_order")._2 > 0L, "rule detects time travel")
    assert(rows("li_ship_after_order")._3 == 0L, "temporal rule fails loudly")
    assert(rows("cust_segment_known")._2 == 0L, "segments from the known domain")
  }

  test("FD mining: key dependency scores zero g3, accounting closes") {
    val rows = DqOps.fdMine.run(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(rows.size == 6)
    // o_orderkey is a real key: the FD holds exactly
    val (n, g, v, c) = rows(("orders", "o_orderkey", "o_orderpriority"))
    assert(v == 0L && c == 1000000L && n == g,
      "key determinant: zero violations, full confidence, one row per group")
    // replay the weakest candidate driver-side (g3 = n - sum of majorities)
    val cust = graft.io.Tables.customer(spark, sf)
      .select(org.apache.spark.sql.functions.col("c_nationkey"),
        org.apache.spark.sql.functions.col("c_mktsegment")).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val keep = cust.groupBy(_._1).values
      .map(g2 => g2.groupBy(_._2).values.map(_.size).max).sum
    val (n2, g2c, v2, c2) = rows(("customer", "c_nationkey", "c_mktsegment"))
    assert(n2 == cust.length.toLong, "row accounting")
    assert(g2c == cust.map(_._1).distinct.length.toLong, "group count")
    assert(v2 == cust.length - keep, "g3 is rows minus majority mass")
    assert(c2 == keep.toLong * 1000000L / cust.length, "confidence ppm")
  }

  test("SNM pairs: window semantics replayed brute-force, blocking loses nothing") {
    // replay the registered query's candidate rule driver-side on the real
    // table: sort by (cents, custkey), compare rank distance <= 4, verify
    // same nation and <= $1 apart — the banded join must find EXACTLY these
    val cust = graft.io.Tables.customer(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val ranked = cust.sortBy(c => (c._3, c._1)).zipWithIndex
    val want = (for {
      (a, ia) <- ranked; (b, ib) <- ranked
      if ib > ia && ib <= ia + 4 && a._2 == b._2 && math.abs(a._3 - b._3) <= 100
    } yield (a._1, b._1, (ib - ia).toLong, math.abs(a._3 - b._3))).sorted
    val got = DqOps.snmPairs.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want.toSeq, s"banded SNM join != brute-force window replay")
    // determinism: a rerun is bit-identical (ParallelRank total order)
    val again = DqOps.snmPairs.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == again)
  }

  test("golden record: clusters partition the master table, survivorship rules hold") {
    val cust = graft.io.Tables.customer(spark, sf).collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong,
        r.getString(4), r.getInt(2).toLong))
      .map { case (k, c, s, n) => k -> ((c, s, n)) }.toMap
    val rows = DqOps.goldenRecord.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    // golden records partition the full customer table
    assert(rows.map(_._2).sum == cust.size.toLong,
      "cluster sizes must sum to the master table")
    assert(rows.map(_._1).distinct.length == rows.length, "one row per cluster")
    for ((cid, n, rep, bal, seg, nat) <- rows) {
      assert(rep == cid, "representative key IS the min-member cluster id")
      val (repBal, repSeg, repNat) = cust(rep)
      assert(seg == repSeg && nat == repNat,
        s"cluster $cid: descriptive attributes come from the representative")
      assert(bal >= repBal, s"cluster $cid: max-balance survivorship")
      if (n == 1L)
        assert(bal == repBal, s"singleton $cid keeps its own balance")
    }
    // match pairs and multi-member clusters tell the same story: every
    // score>=35 pair must land in one cluster
    val matches = DqOps.linkageScores(graft.io.Tables.customer(spark, sf))
      .filter(org.apache.spark.sql.functions.col("score") >= 35).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // rebuild membership driver-side: min reachable via union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    matches.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val multi = cust.keys.groupBy(find).filter(_._2.size > 1)
    val gotMulti = rows.filter(_._2 > 1).map(r => r._1 -> r._2).toMap
    assert(gotMulti == multi.map { case (r, m) => r -> m.size.toLong },
      s"multi-member clusters must replay the union-find over match pairs")
  }

  test("FS record linkage: weights sum per field, classes split at the thresholds") {
    val rows = DqOps.recordLinkage.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // the four weight sets only ever produce sums in [-35, 73]
    assert(rows.forall { case (s, _, _) => s >= -35 && s <= 73 })
    // class labels are a pure function of the two published thresholds
    assert(rows.forall { case (s, c, _) =>
      c == (if (s >= 35) "match" else if (s >= 10) "possible" else "non_match")
    })
    // every pair that agrees on ALL four fields scores exactly 73; a pair
    // disagreeing on all four exactly -35 — spot-check the arithmetic on a
    // planted two-record frame run through the same scoring expression
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import org.apache.spark.sql.functions._
    val twins = Seq((1L, 7, "AAA", 5000L, "001"), (2L, 7, "AAA", 5050L, "001"))
      .toDF("id", "nat", "seg", "cents", "sfx")
    val a = twins.filter($"id" === 1L).select($"nat".as("na"), $"seg".as("sa"),
      $"cents".as("ca"), $"sfx".as("fa"))
    val s = twins.filter($"id" === 2L).crossJoin(a)
      .select((when(abs($"ca" - $"cents") <= 100, 30).otherwise(-5)
        + when($"fa" === $"sfx", 25).otherwise(-3)
        + when($"sa" === $"seg", 8).otherwise(-12)
        + when($"na" === $"nat", 10).otherwise(-15)).as("score"))
      .collect().head.getInt(0)
    assert(s == 73, "full agreement sums the four agreement weights")
  }
}
