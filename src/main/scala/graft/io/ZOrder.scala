package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton space-filling-curve) layout — multi-dimensional data
  * skipping for scans that filter on MORE than the leading sort key.
  *
  * A linear layout sorted on `x` prunes `x`-range reads perfectly but
  * makes every `y`-only filter read the whole table: each file spans the
  * full `y` domain. Interleaving the bits of both dimensions into one
  * Morton key and range-partitioning + sorting on it gives each output
  * file a compact rectangle-ish footprint in `(x, y)` space, so a
  * predicate on EITHER dimension (or a box on both) overlaps only
  * `O(sqrt(files))`-ish file stat ranges — at 100 TB that is the
  * difference between touching ~3% of files and touching all of them,
  * because parquet min/max stats (file footers and row groups) can only
  * skip data the layout actually clusters. ZOrderSpec measures exactly
  * this: the same query-box overlaps every file of a linear layout and a
  * small fraction of the z-ordered one.
  *
  * The key is built from codegen'd bit built-ins only (shift/and/or fold —
  * no UDF), and the write is `repartitionByRange` on the key (one range
  * shuffle, the same cost as any sorted write) + `sortWithinPartitions`,
  * so row groups inside each file are clustered too.
  *
  * Dimensions must be non-negative integers; quantile-bucketize skewed or
  * unbounded dimensions first so both bit domains are comparable (the
  * standard z-order preprocessing — otherwise one dimension's high bits
  * dominate the curve).
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions) into one BIGINT Morton key. */
  def mortonKey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(
          shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(
          shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The identical interleave as ANSI SQL over BIGINT dims — the DuckDB
    * oracle replay (`>>`/`&`/`<<`/`|` are exact on BIGINT in both
    * engines). */
  def mortonKeySql(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")

  /** Write `df` z-ordered on `(x, y)` into `files` parquet files. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      bits: Int, files: Int): Unit =
    df.withColumn("__z", mortonKey(x, y, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
