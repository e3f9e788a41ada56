package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("repetition: planted loop doc is flagged, varied doc is not, ties break low") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val docs = Seq(
      // pure two-word loop: top bigram "a b" covers 5/9 slots -> flagged
      (0L, "a b a b a b a b a b"),
      // all-distinct bigrams, no repeated words -> clean
      (1L, "one two three four five six seven eight nine ten"),
      // every bigram occurs exactly once, but words repeat mildly -> the
      // bigram-based flags stay off (dup_word_frac alone never flags)
      (2L, "x y z x z y w v u t s r"),
      // single-word doc: no bigrams, excluded by construction
      (3L, "solo"),
      // two equally-common bigrams ("p q" and "q p" both twice plus the
      // tail) — the tie must resolve to the lexicographically smaller
      (4L, "p q p q p"),
    ).toDF("doc_id", "text")

    val rows = CurationOps.repetitionOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 4L), "1-token doc has no bigrams")

    val loop = rows(0L)
    assert(loop.getAs[Long]("top_n") == 5L, "'a b' appears 5 times in 9 bigrams")
    assert(loop.getAs[String]("top_bigram") == "a b")
    assert(loop.getAs[Long]("flag_repetitive") == 1L)

    val clean = rows(1L)
    assert(clean.getAs[Long]("flag_repetitive") == 0L)
    assert(clean.getAs[Double]("dup_word_frac") == 0.0)
    assert(clean.getAs[Double]("dup_bigram_frac") == 0.0)

    val varied = rows(2L)
    assert(varied.getAs[Double]("dup_bigram_frac") == 0.0,
      "eleven distinct bigrams each once -> no duplicate bigram mass")
    assert(varied.getAs[Long]("flag_repetitive") == 0L,
      "word-level repeats alone must not flag a bigram-varied doc")

    val tied = rows(4L)
    assert(tied.getAs[String]("top_bigram") == "p q",
      "'p q' and 'q p' both occur twice; tie resolves lexicographically")
    // integer-cross-product threshold: 2*5 >= 4*1 -> top flag fires
    assert(tied.getAs[Long]("flag_repetitive") == 1L)
  }

  test("decontaminate: only the doc sharing an 8-gram with the eval slice is dropped") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      // doc_id 0 = eval member (0 % 25 == 0)
      (0L, evalText),
      // contains eval 8-gram "beta gamma ... iota" shifted into new context
      (1L, "intro beta gamma delta epsilon zeta eta theta iota outro"),
      // shares 7 consecutive words only — below the 8-gram bar
      (2L, "intro gamma delta epsilon zeta eta theta iota outro"),
      // disjoint vocabulary
      (3L, "one two three four five six seven eight nine ten"),
      // too short for any 8-gram
      (4L, "alpha beta gamma"),
    ).toDF("doc_id", "text")

    val out = CurationOps.decontaminateOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L),
      "every train doc reports, eval docs never do, ordered by id")
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._4 == 1L && byId(1L)._2 == 1L && byId(1L)._3 == 1L,
      "one shared 8-gram with one eval doc")
    assert(byId(2L)._4 == 0L, "7-word overlap is below the 8-gram bar")
    assert(byId(3L)._4 == 0L)
    assert(byId(4L)._4 == 0L, "short docs contribute no shingles but still report")
  }

  test("registered queries run against sf0.001 with plausible shapes") {
    val rep = SparkEntry.queries("llm_gopher_repetition")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val tf = r.getAs[Double]("top_bigram_frac")
      assert(tf > 0.0 && tf <= 1.0)
      assert(r.getAs[Long]("n_bigrams") == r.getAs[Long]("n_words") - 1,
        "single-line docs: bigram slots = words - 1")
    }
    val dec = SparkEntry.queries("llm_decontaminate")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(dec.nonEmpty)
    assert(dec.forall(_.getLong(0) % 25 != 0), "eval docs are excluded")
  }
}
