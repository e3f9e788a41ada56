package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert space-filling-curve layout — the same multi-dimensional
  * data-skipping story as [[ZOrder]], with strictly better locality:
  * consecutive curve positions are always UNIT grid steps (the Hilbert
  * hallmark; z-order jumps across the plane at every power-of-two
  * boundary), so equal-count files cut from the curve order have tighter
  * (x, y) bounding boxes and min/max footer pruning skips more of them
  * for the same band predicate. `a4_hilbert_prune` measures exactly this
  * three-way: hilbert vs z-order vs time order on identical predicates.
  *
  * The xy→d transform is the classic per-bit loop (bit test, quadrant
  * offset d += s²·((3·rx) xor ry), then the conditional flip+swap
  * rotation) in codegen'd integer built-ins only — no UDF. One nested
  * expression would blow up exponentially (each round reads the previous
  * round's x/y several times), so BOTH engines step linearly instead:
  * Spark as one simultaneous `withColumns` projection per bit (kept
  * apart by CollapseProject's multi-reference guard), DuckDB as one
  * MATERIALIZED CTE per bit. Inputs mask to the low `bits` bits (the
  * same wrap [[ZOrder.mortonKey]] applies implicitly); HilbertSpec
  * proves the transform is a bijective unit-step walk on a full grid.
  */
object HilbertCurve {

  /** Append `out` = the Hilbert position of (`xc`, `yc`) on the
    * 2^bits × 2^bits grid — ONE call to the native codegen'd
    * [[graft.functions.HilbertKey]] expression. The original per-bit
    * `withColumns` fold (kept below as [[withHilbertKeyFold]] for the
    * parity spec) planned bits² expression nodes and cost ~20 s of FIXED
    * planner + codegen time per run at 11 bits (identical at sf0.1 and
    * sf1 — pure overhead); the native expression carries one plan node
    * and is bit-identical for every input, so the DuckDB per-bit CTE
    * oracle is unchanged. */
  def withHilbertKey(df: DataFrame, xc: Column, yc: Column, bits: Int,
      out: String): DataFrame =
    df.withColumn(out, call_function("hilbertkey",
      xc.cast("long"), yc.cast("long"), lit(bits)))

  /** The declarative per-bit projection chain the native expression
    * replaced — retained so HilbertSpec can assert expression ≡ fold on a
    * full grid (the cross-implementation parity gate). */
  private[graft] def withHilbertKeyFold(df: DataFrame, xc: Column, yc: Column,
      bits: Int, out: String): DataFrame = {
    val m = (1L << bits) - 1
    var d = df.withColumns(Map(
      "__hx" -> xc.cast("long").bitwiseAND(lit(m)),
      "__hy" -> yc.cast("long").bitwiseAND(lit(m)),
      "__hd" -> lit(0L)))
    for (k <- bits - 1 to 0 by -1) {
      val s = 1L << k
      val rx = shiftright(col("__hx"), k).bitwiseAND(lit(1L))
      val ry = shiftright(col("__hy"), k).bitwiseAND(lit(1L))
      d = d.withColumns(Map(
        "__hx" -> when(ry === 0L,
          when(rx === 1L, lit(s - 1) - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")),
        "__hy" -> when(ry === 0L,
          when(rx === 1L, lit(s - 1) - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy")),
        "__hd" -> (col("__hd") + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry))))
    }
    d.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** The identical per-bit steps as chained MATERIALIZED CTEs: emits
    * `bits` CTEs named `<p>1` … `<p>bits`, each carrying the `carry`
    * columns plus (hx, hy, hd); the caller provides `<p>0` with hx/hy
    * masked and hd = 0, and reads the key from `<p>bits.hd`. */
  def hilbertCtesSql(p: String, bits: Int, carry: String): String =
    (bits - 1 to 0 by -1).zipWithIndex.map { case (k, i) =>
      val s = 1L << k
      s"""$p${i + 1} AS MATERIALIZED (SELECT $carry,
         |  CASE WHEN ((hy >> $k) & 1) = 0
         |       THEN CASE WHEN ((hx >> $k) & 1) = 1 THEN ${s - 1} - hy ELSE hy END
         |       ELSE hx END AS hx,
         |  CASE WHEN ((hy >> $k) & 1) = 0
         |       THEN CASE WHEN ((hx >> $k) & 1) = 1 THEN ${s - 1} - hx ELSE hx END
         |       ELSE hy END AS hy,
         |  hd + ${s * s} * xor(3 * ((hx >> $k) & 1), (hy >> $k) & 1) AS hd
         |FROM $p$i)""".stripMargin
    }.mkString(",\n")
}
