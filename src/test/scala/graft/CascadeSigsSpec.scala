package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CascadeSigsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sigsOf(text: String): (Long, Long, Long, Long, Long, Long) = {
    val r = spark.sql(
      s"SELECT cascade_sigs(split('${text}', ' ')) AS g").select(
      col("g.n"), col("g.stop_hits"), col("g.top_cnt"),
      col("g.tri_total"), col("g.tri_dup"), col("g.eq")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))
  }

  test("signals from the SQL text surface: counts, stopwords, trigram dups") {
    // 8 tokens; stopwords {the, a}; 'cat' ×3 top multiplicity; trigram
    // "the cat sat" appears twice (positions 1 and 6) -> 1 duplicate of 6
    val (n, stop, top, triT, triD, _) =
      sigsOf("the cat sat a cat on the cat sat")
    assert(n == 9L)
    assert(stop == 3L) // the, a, the
    assert(top == 3L) // cat ×3
    assert(triT == 7L)
    // trigrams: [the cat sat][cat sat a][sat a cat][a cat on][cat on the]
    //           [on the cat][the cat sat] -> one repeat
    assert(triD == 1L)
  }

  test("quantized entropy matches the declarative HOF formula bit-for-bit") {
    // uniform 4 distinct tokens ×2: entropy = ln 4; single repeated token:
    // entropy = 0. Compare against the exact quantization pipeline.
    def expectedEq(counts: Seq[Int]): Long = {
      val n = counts.sum
      val s = counts.map(c =>
        java.math.BigDecimal.valueOf(c * math.log(c) * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).sum
      java.math.BigDecimal.valueOf((math.log(n) - s.toDouble / 1e6 / n) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    val (_, _, _, _, _, eqUniform) = sigsOf("w x y z w x y z")
    assert(eqUniform == expectedEq(Seq(2, 2, 2, 2)))
    assert(math.abs(eqUniform - math.round(math.log(4) * 1e6)) <= 2,
      s"uniform-4 entropy must be ~ln(4): $eqUniform")
    val (_, _, _, _, _, eqConst) = sigsOf("w w w w w")
    assert(eqConst == expectedEq(Seq(5)))
    assert(math.abs(eqConst) <= 2, s"constant doc entropy must be ~0: $eqConst")
  }

  test("null and sub-trigram inputs are safe") {
    val r = spark.sql(
      "SELECT cascade_sigs(CAST(NULL AS ARRAY<STRING>)) AS g").collect().head
    assert(r.isNullAt(0), "null input must yield null, not crash")
    val (n, _, top, triT, triD, _) = sigsOf("x y")
    assert(n == 2L && top == 1L && triT == 0L && triD == 0L)
  }
}
