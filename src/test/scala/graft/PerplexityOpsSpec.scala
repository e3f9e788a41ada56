package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class PerplexityOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("planted gibberish scores high-perplexity and is flagged; fluent text is not") {
    // Fixture corpus: twelve "natural" docs built from a small shared
    // vocabulary with heavily repeated bigrams, plus one gibberish doc of
    // tokens (and therefore bigrams) that occur nowhere else. The bigram
    // LM trains on all thirteen, so the gibberish doc's probabilities
    // collapse to the smoothing floor k/(n1 + k·V) and its perplexity
    // must strictly dominate every natural doc's.
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val naturals = Seq(
      "the cat sat on the mat", "the dog sat on the rug",
      "the cat sat on the rug", "the dog sat on the mat",
      "a cat sat on a mat", "the cat ran on the mat",
      "the dog ran on the rug", "a dog sat on the mat",
      "the cat sat by the mat", "the dog sat by the rug",
      "a cat ran on the mat", "the cat sat on a rug")
    val gibberish = "zxq qpv mmw ovk lxr wqz pvq"
    val docs = (naturals.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (naturals.length.toLong, gibberish)).toDF("doc_id", "text")

    val rows = PerplexityOps.perplexityOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(rows.size == naturals.length + 1, "every doc with >= 2 tokens scores")

    val gibId = naturals.length.toLong
    val (gibN, gibMean, gibPpl, gibFlag) = rows(gibId)
    assert(gibN == 6, "gibberish doc has 7 tokens -> 6 bigrams")
    rows.filter(_._1 != gibId).foreach { case (id, (_, _, ppl, _)) =>
      assert(gibPpl > ppl,
        s"gibberish ppl $gibPpl must dominate doc $id's $ppl")
    }
    assert(gibFlag == 1L, "gibberish must land in the worst decile")
    assert(rows.values.count(_._4 == 1L) < rows.size,
      "the flag must be selective, not mark the whole corpus")
    rows.values.foreach { case (_, mean, ppl, _) =>
      assert(mean < 0.0, "mean log-prob of a real LM is negative")
      assert(math.abs(ppl - BigDecimal(math.exp(-mean))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        "ppl must reconstruct from mean_logp")
    }
  }

  test("cross-fold JM perplexity: gibberish dominates, memorization is impossible") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // Naturals share their bigram inventory ACROSS the parity folds, so
    // each fold's LM predicts the other fold's fluent docs well. The
    // gibberish doc sits at an odd id: the even-fold LM that scores it
    // has never seen its tokens, so it falls to the smoothing floor —
    // the memorization loophole a SELF-trained MLE model has (a doc of
    // singleton bigrams scores ppl ~ 1.4 because its continuations are
    // deterministic) is structurally closed by the fold split.
    val naturals = Seq(
      "the cat sat on the mat", "the dog sat on the rug",
      "the cat sat on the rug", "the dog sat on the mat",
      "a cat sat on a mat", "the cat ran on the mat",
      "the dog ran on the rug", "a dog sat on the mat",
      "the cat sat by the mat", "the dog sat by the rug",
      "a cat ran on the mat", "the cat sat on a rug")
    val gibberish = "zxq qpv mmw ovk lxr wqz pvq"
    val docs = (naturals.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (13L, gibberish)).toDF("doc_id", "text")
    val rows = PerplexityOps.xvalPerplexityOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getLong(4))).toMap
    assert(rows.size == naturals.length + 1)
    rows.filter(_._1 != 13L).foreach { case (id, (ppl, _)) =>
      assert(rows(13L)._1 > ppl,
        s"gibberish must dominate under the held-out LM: doc $id has $ppl")
    }
    assert(rows(13L)._2 == 1L, "gibberish flagged under the held-out LM")
    assert(rows.values.count(_._2 == 1L) < rows.size, "flag stays selective")
  }

  test("n-gram novelty: first sight scores 1, a duplicate scores 0") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val docs = Seq(
      (0L, "a b c d"),            // all 3 bigrams first seen here
      (1L, "a b c d"),            // byte-duplicate: nothing novel
      (2L, "e f g"),              // disjoint: fully novel again
      (3L, "a b e f x y"))        // mixed: 'a b' and 'e f' seen, rest new
      .toDF("doc_id", "text")
    val rows = PerplexityOps.noveltyOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows(0L) == ((3L, 3L, 1.0)), s"doc 0: ${rows(0L)}")
    assert(rows(1L) == ((3L, 0L, 0.0)), s"duplicate doc must be 0-novel: ${rows(1L)}")
    assert(rows(2L) == ((2L, 2L, 1.0)), s"doc 2: ${rows(2L)}")
    // doc 3's 5 bigrams: 'a b' and 'e f' are old, 'b e', 'f x', 'x y' new
    assert(rows(3L)._1 == 5L && rows(3L)._2 == 3L, s"doc 3: ${rows(3L)}")
  }

  test("registered query is well-formed over the test corpus") {
    val rows = PerplexityOps.perplexity.run(spark, sf).collect()
    assert(rows.length == 500, "all sf0.01 docs have >= 2 tokens")
    // roughly a decile flagged (exact percentile; interpolation can admit
    // one extra doc at the boundary)
    val flagged = rows.count(_.getLong(4) == 1L)
    assert(flagged >= 45 && flagged <= 55, s"decile flag marked $flagged of 500")
    // LM head: 50 rows, counts non-increasing, log-probs negative
    val lm = PerplexityOps.bigramLm.run(spark, sf).collect()
    assert(lm.length == 50)
    val counts = lm.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(lm.forall(_.getDouble(4) < 0.0))
  }

  test("curriculum: terciles partition the corpus, phases order by difficulty") {
    val rows = PerplexityOps.curriculum.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length == 500)
    val byPhase = rows.groupBy(_._2)
    assert(byPhase.keySet.subsetOf(Set("easy", "medium", "hard", "unscored")))
    // tercile balance (interpolated thresholds allow boundary slack)
    Seq("easy", "medium", "hard").foreach { p =>
      val n = byPhase.get(p).map(_.length).getOrElse(0)
      assert(n >= 130 && n <= 210, s"phase $p holds $n of 500")
    }
    // difficulty ordering: every easy doc scores lower ppl than every hard doc
    val maxEasy = byPhase("easy").map(_._3).max
    val minHard = byPhase("hard").map(_._3).min
    assert(maxEasy <= minHard, s"easy max $maxEasy vs hard min $minHard")
    // the phase budget column is the sum of its members' tokens
    byPhase.foreach { case (_, rs) =>
      assert(rs.forall(_._5 == rs.map(_._4).sum)) }
  }

  test("moore-lewis: target-like pool doc outscores pool-typical doc") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // Target (src1) speaks bigram patterns over {wiki, cite, ref}; the
    // pool speaks {spam, ad, click}. The pool doc reusing target bigrams
    // must carry the top cross-entropy difference.
    val docs = Seq(
      (0L, "wiki cite ref wiki cite ref wiki cite", "src1"),
      (1L, "cite ref wiki cite ref wiki cite ref", "src1"),
      (2L, "wiki cite ref wiki cite ref wiki", "src9"), // target-like
      (3L, "spam ad click spam ad click spam ad", "src9"),
      (4L, "ad click spam ad click spam ad click", "src9"),
    ).toDF("doc_id", "text", "source")
    val out = PerplexityOps.mooreLewisOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L, 3L, 4L), "only pool docs are scored")
    val s = out.view.mapValues(_.getAs[Double]("ml_score")).toMap
    assert(s(2L) > s(3L) && s(2L) > s(4L),
      s"target-like doc must top the cross-entropy difference: $s")
    assert(s(2L) > 0.0, "target bigrams are likelier under the target LM")
    assert(s(3L) < 0.0 && s(4L) < 0.0,
      "pool-only bigrams are unseen by the target LM -> negative score")
    assert(out.values.forall(_.getAs[Long]("selected") == 1L),
      "SelK exceeds pool size here")
  }

  test("moore-lewis registered query: selection is a weight-threshold cut") {
    val rows = PerplexityOps.mooreLewis.run(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val nSel = rows.count(_.getAs[Long]("selected") == 1L)
    assert(nSel == math.min(100, rows.length), s"got $nSel of ${rows.length}")
    val minSel = rows.filter(_.getAs[Long]("selected") == 1L)
      .map(_.getAs[Double]("ml_score")).min
    val maxUnsel = rows.filter(_.getAs[Long]("selected") == 0L)
      .map(_.getAs[Double]("ml_score")).maxOption.getOrElse(Double.NegativeInfinity)
    assert(minSel >= maxUnsel, "cut must be a score threshold")
  }

  test("kneser-ney: continuation probability rewards context diversity") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // bigrams (q z) and (q m) have IDENTICAL n2=1, n1(q)=2, fanout(q)=2 —
    // only the continuation differs: z follows one context, m follows two.
    // KN must score the diverse-continuation doc as MORE probable; add-k
    // (which only sees n2/n1) is blind to the difference by construction.
    val docs = Seq((1L, "q z"), (2L, "q m"), (3L, "r m")).toDF("doc_id", "text")
    val out = PerplexityOps.knPerplexityOf(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    // lq(q,z) = ln(0.25/2 + 0.75·(2/2)·(1/3)) = ln(0.375)
    // lq(q,m) = ln(0.25/2 + 0.75·(2/2)·(2/3)) = ln(0.625)
    assert(math.abs(out(1L) - 1.0 / 0.375) < 0.01, s"z-doc ppl ${out(1L)}")
    assert(math.abs(out(2L) - 1.0 / 0.625) < 0.01, s"m-doc ppl ${out(2L)}")
    assert(out(1L) > out(2L),
      "single-context continuation must score as LESS fluent")
    // and on real data every ppl is finite and positive
    val real = PerplexityOps.perplexityKn
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(real.nonEmpty)
    assert(real.forall { r =>
      val p = r.getAs[Double]("ppl"); p > 0.0 && !p.isInfinite && !p.isNaN
    })
  }

  /** ccnetBuckets on a planted bilingual corpus: within each language the
    * head bucket's perplexity upper-bounds the tail's lower bound (the
    * thresholds split by fluency), every scored doc lands in exactly one
    * bucket, and bucket_docs tallies agree with the per-(lang, bucket)
    * row counts. */
  test("ccnet buckets split each language by its own perplexity thirds") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def mk(lang: String, base: Int, texts: Seq[String]) =
      texts.zipWithIndex.map { case (t, i) => ((base + i).toLong, t, lang) }
    // language A: nine docs, three clearly-repetitive (fluent under the
    // corpus LM), three mixed, three near-unique token streams
    val aDocs = mk("aa", 0, Seq(
      "the cat sat on the mat", "the cat sat on the mat",
      "the cat sat on the mat", "the dog sat on the mat",
      "a dog ran by the mat", "the cat ran by a rug",
      "qq ww ee rr tt yy", "uu ii oo pp aa ss", "dd ff gg hh jj kk"))
    // language B: same construction, disjoint vocabulary
    val bDocs = mk("bb", 100, Seq(
      "le chat dort sur le tapis", "le chat dort sur le tapis",
      "le chat dort sur le tapis", "le chien dort sur le tapis",
      "un chien court sur le sol", "le chat court sur un sol",
      "zz xx cc vv bb nn", "mm qa ws ed rf tv", "yh uj ik ol pz ax"))
    val docs = (aDocs ++ bDocs).toDF("doc_id", "text", "lang")
    val rows = PerplexityOps.ccnetBucketsOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.length == 18, "every doc has bigrams and is scored once")
    for (lang <- Seq("aa", "bb")) {
      val perLang = rows.filter(_._2 == lang)
      val byBucket = perLang.groupBy(_._3).view.mapValues(_.toSeq).toMap
      assert(byBucket.keySet == Set("head", "middle", "tail"))
      // tallies match the carried bucket_docs column
      byBucket.foreach { case (_, rs) =>
        assert(rs.forall(_._5 == rs.size.toLong))
      }
      // fluency ordering: head is the LOW-perplexity third
      assert(byBucket("head").map(_._4).max
        <= byBucket("middle").map(_._4).min + 1e-9)
      assert(byBucket("middle").map(_._4).max
        <= byBucket("tail").map(_._4).min + 1e-9)
      // the planted repeats are head, the gibberish is tail
      val heads = byBucket("head").map(_._1 % 100).toSet
      assert(Set(0L, 1L, 2L).subsetOf(heads))
      assert(byBucket("tail").map(_._1 % 100).toSet
        .subsetOf(Set(4L, 5L, 6L, 7L, 8L)))
    }
  }
}
