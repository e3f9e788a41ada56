package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class RankingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("tfidf rank: identical text scores cosine 1.0 and ranks first") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val docs = Seq(
      (0L, "apple banana banana cherry"),
      (5L, "apple banana banana cherry"), // exact copy of the query doc
      (6L, "apple banana melon melon"),   // partial overlap
      (7L, "kiwi kiwi kiwi grape"),       // idf-only overlap: none shared
    ).toDF("doc_id", "text")
    val out = RankingOps.tfidfRankPlan(docs, 1, 10).collect()
    assert(out.forall(_.getLong(0) == 0L), "single query doc (qid 0)")
    // copy first at cosine exactly 1.0; unrelated doc contributes no row
    assert(out.head.getLong(1) == 5L && out.head.getDouble(2) == 1.0)
    assert(!out.map(_.getLong(1)).contains(7L), "no shared terms -> no candidate")
    // cosines are valid similarities in (0, 1] and strictly ordered per rank
    val cos = out.map(_.getDouble(2)).toSeq
    assert(cos.forall(c => c > 0.0 && c <= 1.0))
    assert(cos == cos.sorted.reverse)
  }

  test("tfidf rank on testdata: k bound per query, no self-pairs") {
    val out = RankingOps.tfidfRankPlan(
      graft.io.Tables.documents(spark, sf), 10, 10).collect()
    val perQ = out.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQ.values.forall(_ <= 10))
    assert(out.forall(r => r.getLong(0) != r.getLong(1)), "self-pairs excluded")
  }

  test("bm25: term-frequency saturation and length normalization hold") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // Three docs containing the query term: short doc beats long doc at the
    // same tf (length normalization); higher tf beats lower tf at the same
    // length; and a doc without the term never scores.
    val docs = Seq(
      (1L, "cat dog"),                          // tf=1, dl=2
      (2L, "cat dog bird fish mouse rat wolf"), // tf=1, dl=7
      (3L, "cat cat dog bird fish mouse rat"),  // tf=2, dl=7
      (4L, "dog bird fish"),                    // tf=0 -> absent
    ).toDF("doc_id", "text")
    val out = RankingOps.bm25Plan(docs, Seq("cat"), 10).collect()
    val score = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!score.contains(4L))
    assert(score(1L) > score(2L), "shorter doc ranks higher at equal tf")
    assert(score(3L) > score(2L), "higher tf ranks higher at equal length")
  }

  test("bm25 on testdata: rare term dominates the ranking") {
    // 'dup' is ~16x rarer than 'vector'/'merge' in the synthetic corpus, so
    // its idf dwarfs theirs: every top-20 document must contain 'dup'.
    val docs = graft.io.Tables.documents(spark, sf)
    val out = RankingOps.bm25Plan(docs, Seq("dup", "vector", "merge"), 20)
      .collect()
    assert(out.nonEmpty)
    val dupDocs = docs.where("text LIKE '%dup%'")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val top = out.map(_.getLong(0))
    assert(top.count(dupDocs) == math.min(20, dupDocs.size) ||
      top.forall(dupDocs),
      s"top-20 should be dominated by the ${dupDocs.size} 'dup' docs")
  }
}
