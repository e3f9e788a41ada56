package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowFps
import graft.ops._

class WinnowFpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Straight-line reference: hash every K-gram by the spec'd left fold,
    * take min per complete W-window, distinct+sort — no rolling update, no
    * deque, so a bug in either optimization diverges from this. */
  private def reference(s: String): Seq[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < WinnowFps.K + WinnowFps.W - 1) return Seq.empty
    val hs = cps.sliding(WinnowFps.K).map(
      _.foldLeft(0L)((h, c) => (h * WinnowFps.B + c) % WinnowFps.M)).toArray
    hs.sliding(WinnowFps.W).map(_.min).toSeq.distinct.sorted
  }

  test("native winnow_fps equals the unoptimized reference, including non-ASCII") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaa", // degenerate: all grams identical
      "héllo wörld — ünïcode ça marche très bien aujourd'hui",
      "日本語のテキストでも正しく動作することを確認する",
      "exactly11ch", // K+W-1 chars: exactly one window
      "a b a b a b a b a b a b a b",
    )
    import spark.implicits.newStringEncoder
    val got = spark.createDataset(texts).toDF("text")
      .select(call_function("winnow_fps", $"text").as("fps"))
      .collect().map(_.getSeq[Long](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == reference(t), s"mismatch for: $t")
    }
  }

  test("short, empty, and null inputs") {
    val r = spark.sql(
      """SELECT winnow_fps('tooshort') AS a, winnow_fps('') AS b,
        |       winnow_fps(CAST(NULL AS STRING)) AS c""".stripMargin).head()
    assert(r.getSeq[Long](0).isEmpty && r.getSeq[Long](1).isEmpty && r.isNullAt(2))
  }

  test("interpreted eval agrees with codegen") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      val q = "SELECT winnow_fps('the quick brown fox jumps over the lazy dog') AS f"
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val a = spark.sql(q).head().getSeq[Long](0)
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val b = spark.sql(q).head().getSeq[Long](0)
      assert(a == b && a.nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
