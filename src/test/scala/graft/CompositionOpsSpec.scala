package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class CompositionOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("temperature mixing upsamples low-resource domains, weights normalize") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // 90/10 split between two domains: at alpha = 0.3 the minority domain
    // must be boosted (> 1) and the majority damped (< 1), with weights
    // summing to 1 — the whole point of temperature sampling.
    val docs = (
      (0 until 9).map(i => (i.toLong, "a b c d e f g h i j", "big")) :+
        (9L, "a b c d e f g h i j", "small"))
      .toDF("doc_id", "text", "lang")
    val rows = CompositionOps.domainMixOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val (bigToks, bigShare, bigW, bigBoost) = rows("big")
    val (smallToks, smallShare, smallW, smallBoost) = rows("small")
    assert(bigToks == 90L && smallToks == 10L)
    assert(math.abs(bigShare - 0.9) < 1e-9 && math.abs(smallShare - 0.1) < 1e-9)
    assert(math.abs(bigW + smallW - 1.0) < 1e-5, "weights must normalize")
    assert(smallBoost > 1.0 && bigBoost < 1.0,
      s"temperature must upsample the minority: small $smallBoost, big $bigBoost")
    assert(smallW < bigW, "temperature softens, not inverts, the ordering")
    // corpus run: one row per language, weights normalize there too
    val corpus = CompositionOps.domainMix.run(spark, sf).collect()
    assert(corpus.length == 5)
    assert(math.abs(corpus.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }

  test("domain KL: identical distribution scores zero, skewed scores positive") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // 'same' dominates the corpus, so the corpus distribution is nearly
    // its own (KL ~ ln(82/80) mass correction, < 0.05); 'skew' has a
    // disjoint vocabulary and must diverge strongly.
    val docs = ((0 until 10).map(i => (i.toLong, "x y x y", "same")) :+
      (10L, "q q", "skew"))
      .toDF("doc_id", "text", "lang")
    val rows = CompositionOps.domainKlOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows("same")._3 >= -1e-6 && rows("same")._3 < 0.05,
      s"matching domain must sit near zero, got ${rows("same")._3}")
    assert(rows("skew")._3 > 0.5,
      s"disjoint-vocabulary domain must diverge, got ${rows("skew")._3}")
    assert(rows.values.forall(_._3 >= -1e-6), "KL is non-negative")
    // corpus run: KL defined and non-negative for every language
    val corpus = CompositionOps.domainKl.run(spark, sf).collect()
    assert(corpus.length == 5)
    assert(corpus.forall(_.getDouble(3) >= -1e-6))
  }

  test("quality gate reconstructs exactly from the standalone signal queries") {
    val gate = CompositionOps.qualityGate.run(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val ppl = PerplexityOps.perplexity.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val rep = LlmTextOps.repetition.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(gate.size == 500)
    gate.foreach { case (id, (fp, fr, fpii, n, keep)) =>
      assert(fp == ppl.getOrElse(id, 0L), s"doc $id ppl flag drifted")
      assert(fr == rep.getOrElse(id, 0L), s"doc $id repetition flag drifted")
      assert(fpii == 0L, s"doc $id: clean corpus must not raise pii")
      assert(n == fp + fr + fpii && keep == (if (n == 0L) 1L else 0L),
        s"doc $id: verdict must reconstruct from its flags")
    }
    assert(gate.values.exists(_._5 == 0L) && gate.values.exists(_._5 == 1L),
      "the gate must discriminate, not pass or drop everything")
  }

  test("PII scan: planted identifiers are counted, clean corpus certifies zero") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val docs = Seq(
      (0L, "contact me at jane.doe@example.com or bob@corp.io thanks"),
      (1L, "see https://example.com/path and http://a.b/c"),
      (2L, "call +1 (555) 123-4567 today"),
      (3L, "server at 10.0.0.1 and 192.168.1.254"),
      (4L, "a perfectly clean document with no identifiers"))
      .toDF("doc_id", "text")
    val rows = CompositionOps.piiScanOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows(0L)._1 == 2, s"two emails, got ${rows(0L)}")
    assert(rows(1L)._2 == 2, s"two urls, got ${rows(1L)}")
    assert(rows(2L)._3 >= 1, s"phone number missed: ${rows(2L)}")
    assert(rows(3L)._4 == 2, s"two ipv4 hits, got ${rows(3L)}")
    assert((0L to 3L).forall(rows(_)._5 == 1L), "hits must raise the flag")
    assert(rows(4L) == ((0L, 0L, 0L, 0L, 0L)), "clean doc stays clean")
    // the synthetic corpus is PII-free: the scan is its clean certificate
    val corpus = CompositionOps.piiScan.run(spark, sf).collect()
    assert(corpus.length == 500 && corpus.forall(_.getLong(5) == 0L))
  }

  test("pii redact: typed markers, counts match the scan, rescan comes back clean") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "mail bob@example.com or sue@test.org now"),
      (1L, "fetch https://example.com/a?b=c today"),
      (2L, "server 10.0.0.1 fell over"),
      (3L, "a perfectly clean document")).toDF("doc_id", "text")
    val rows = CompositionOps.piiRedactOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6))).toMap
    assert(rows(0L) == ((2L, 0L, 0L, 1L)), s"emails: ${rows(0L)}")
    assert(rows(1L) == ((0L, 1L, 0L, 1L)), s"urls: ${rows(1L)}")
    assert(rows(2L) == ((0L, 0L, 1L, 1L)), s"one ipv4 hit: ${rows(2L)}")
    assert(rows(3L)._4 == 1L, "clean doc stays clean")
    // the digest proves the text actually changed where PII was removed
    val digests = CompositionOps.piiRedactOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    val rawDigests = docs.select($"doc_id", md5($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L to 2L).forall(i => digests(i) != rawDigests(i)))
    assert(digests(3L) == rawDigests(3L), "no PII -> text untouched")
  }

  test("mix resample: rare domain upsampled whole, dominant domain thinned") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // 'big' holds ~95% of tokens, 'rare' ~5%: α = 0.3 must push big's
    // boost below 1 (thinning) and rare's above 1 (full keep + extras)
    val docs = ((1 to 190).map(i => (i.toLong, "big",
      (1 to 10).map(j => s"b$j").mkString(" "))) ++
      (200 to 209).map(i => (i.toLong, "rare",
        (1 to 10).map(j => s"r$j").mkString(" "))))
      .map { case (id, l, t) => (id, l, t) }.toDF("doc_id", "lang", "text")
    val rows = CompositionOps.mixResampleOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val (big, rare) = rows.partition(_._2 == "big")
    assert(rare.map(_._1).toSet == (200L to 209L).toSet,
      "boost > 1 keeps every rare doc")
    assert(rare.forall(_._3 > 1000000L), "rare boost must exceed 1.0")
    assert(rare.exists(_._4 >= 2L), "fractional upsample emits extra copies")
    assert(big.forall(_._3 < 1000000L), "big boost must fall below 1.0")
    assert(big.length < 190 && big.nonEmpty, "big domain is thinned, not dropped")
    assert(big.forall(_._4 == 1L), "thinned docs keep exactly one copy")
    // determinism: rerun is bit-identical
    assert(CompositionOps.mixResampleOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      rows.map(r => (r._1, r._4)).toSeq)
  }

  test("token budget: sums exactly to B, every domain within one of its quota") {
    val rows = CompositionOps.tokenBudget
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("avail"), r.getAs[Long]("budget_toks")))
    val total = rows.map(_._1).sum
    assert(rows.map(_._2).sum == 100000L,
      "largest-remainder apportionment conserves the budget exactly")
    rows.foreach { case (avail, b) =>
      val fl = 100000L * avail / total
      assert(b == fl || b == fl + 1, s"domain avail=$avail got $b, quota floor $fl")
    }
  }
}
