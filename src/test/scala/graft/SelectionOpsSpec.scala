package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class SelectionOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("dsirSelect: target-vocabulary doc outranks raw-vocabulary doc") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // Target slice speaks {wiki, cite, ref}; the raw pool mostly speaks
    // {spam, ad, click}. The raw doc that happens to speak target words
    // must get the highest importance weight.
    val docs = Seq(
      (0L, "wiki cite ref wiki cite ref wiki cite", "src1"),
      (1L, "wiki ref cite cite wiki ref ref wiki", "src1"),
      (2L, "wiki cite ref wiki cite ref wiki ref", "src9"), // target-like
      (3L, "spam ad click spam ad click spam ad", "src9"),
      (4L, "spam click ad ad spam click click ad", "src9"),
      (5L, "spam ad wiki click spam ad cite spam", "src9"), // mixed
    ).toDF("doc_id", "text", "source")

    val out = SelectionOps.dsirSelectOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L, 3L, 4L, 5L), "only raw-pool docs are scored")

    val w = out.view.mapValues(_.getAs[Double]("dsir_logratio")).toMap
    assert(w(2L) > w(5L) && w(5L) > w(3L),
      s"target-like > mixed > spam, got $w")
    assert(w(2L) > 0.0, "pure target vocabulary scores positive")
    assert(w(3L) < 0.0, "pure raw vocabulary scores negative")
    // SelK far exceeds 4 docs -> everything selected despite the ordering
    assert(out.values.forall(_.getAs[Long]("selected") == 1L))
  }

  test("rougePairs: identical docs score 1.0, partial overlap clips counts") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d e f"), // identical to 0
      (2L, "a b c x y z"), // half-overlapping with 0
      (3L, "a a a b b c"), // clipping fixture vs 4
      (4L, "a a b c c c"),
    ).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (0L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")

    val out = SelectionOps.rougePairsOf(pairs, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

    val same = out((0L, 1L))
    assert(same.getAs[Long]("r1_overlap") == 6L)
    assert(same.getAs[Double]("r1_f") == 1.0)
    assert(same.getAs[Long]("r2_overlap") == 5L)
    assert(same.getAs[Double]("r2_f") == 1.0)

    val half = out((0L, 2L))
    assert(half.getAs[Long]("r1_overlap") == 3L, "shared {a,b,c}")
    assert(half.getAs[Double]("r1_p") == 0.5 && half.getAs[Double]("r1_r") == 0.5)
    assert(half.getAs[Long]("r2_overlap") == 2L, "shared bigrams 'a b','b c'")

    // clipped counts: min(3,2) for a, min(2,1) for b, min(1,3) for c = 4
    val clip = out((3L, 4L))
    assert(clip.getAs[Long]("r1_overlap") == 4L,
      "overlap must clip per-gram counts, not sum raw occurrences")
  }

  test("registered queries run against sf0.001 with plausible shapes") {
    val sel = SparkEntry.queries("llm_dsir_select")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(sel.nonEmpty)
    val nSel = sel.count(_.getAs[Long]("selected") == 1L)
    assert(nSel == math.min(100, sel.length),
      s"exactly SelK (or all) docs selected, got $nSel of ${sel.length}")
    // selected docs dominate unselected ones by weight
    val minSel = sel.filter(_.getAs[Long]("selected") == 1L)
      .map(_.getAs[Double]("dsir_logratio")).min
    val maxUnsel = sel.filter(_.getAs[Long]("selected") == 0L)
      .map(_.getAs[Double]("dsir_logratio")).maxOption.getOrElse(Double.NegativeInfinity)
    assert(minSel >= maxUnsel, "selection cut must be a weight threshold")

    val rp = SparkEntry.queries("llm_rouge_pairs")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rp.nonEmpty, "the corpus's planted near-dups must yield pairs")
    rp.foreach { r =>
      val f1 = r.getAs[Double]("r1_f")
      assert(f1 > 0.0 && f1 <= 1.0)
      assert(r.getAs[Double]("r2_f") <= f1 + 1e-9,
        "bigram F1 can't exceed unigram F1 on near-dup text")
    }
  }

  test("lcsPairs: diagonal runs recover the exact longest shared token run") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val docs = Seq(
      (1L, "a1 a2 c1 c2 c3 c4 c5 c6 b1 b2"),
      (2L, "x1 c1 c2 c3 c4 c5 c6 y1 c1 c2 c3 c4 z1"),
      (3L, (1 to 8).map(i => s"u$i").mkString(" ")),
      // two equal-length shared runs in swapped order — tie must break to
      // the run starting earliest in doc_a
      (4L, "t1 t2 t3 t4 t5 w1 s1 s2 s3 s4 s5"),
      (5L, "s1 s2 s3 s4 s5 v1 t1 t2 t3 t4 t5"),
      // self-repeat inside doc 6: the d=0 diagonal must win over the
      // shifted second occurrence
      (6L, "r1 r2 r3 r4 r5 r6 w2 r1 r2 r3 r4 r5"),
      (7L, "r1 r2 r3 r4 r5 r6")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L), (6L, 7L)).toDF("doc_a", "doc_b")
    val rows = SelectionOps.lcsPairsOf(pairs, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), r.getString(5), r.getDouble(6))).toMap
    assert(rows((1L, 2L)) == ((6L, "c1 c2 c3 c4 c5 c6", 0.6)), s"${rows((1L, 2L))}")
    assert(rows((1L, 3L)) == ((0L, "", 0.0)), "no shared 5-gram reports zero")
    assert(rows((4L, 5L)) == ((5L, "t1 t2 t3 t4 t5", round6(5.0 / 11))), s"${rows((4L, 5L))}")
    assert(rows((6L, 7L)) == ((6L, "r1 r2 r3 r4 r5 r6", 1.0)), s"${rows((6L, 7L))}")
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6
}
