package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) clustering for multi-dimensional data skipping.
  *
  * A table sorted on one column prunes scans filtered on that column
  * only; interleaving the bits of TWO key columns into one z-value and
  * range-sorting on it clusters the data so every file / parquet row
  * group covers a small rectangle of the (a, b) key space — min/max
  * statistics then prune scans filtered on EITHER dimension (the
  * Delta/Databricks `ZORDER BY` layout idea, built from plain Spark
  * primitives: `repartitionByRange` + `sortWithinPartitions`).
  *
  * The z-value is pure integer bit arithmetic (the standard
  * shift-and-mask bit spread), stays inside whole-stage codegen, and is
  * engine-portable — no floats anywhere. At 100 TB the win is at READ
  * time: a predicate on either key touches O(matching rectangles)
  * files instead of all of them; the one-time layout cost is a single
  * range shuffle, the same price as any global sort.
  */
object ZOrder {

  /** (mask, shift) ladder of the 32→64-bit interleave spread, shared
    * with the DuckDB oracle mirror.
    */
  val SpreadSteps: Seq[(Long, Int)] = Seq(
    (0x0000FFFF0000FFFFL, 16),
    (0x00FF00FF00FF00FFL, 8),
    (0x0F0F0F0F0F0F0F0FL, 4),
    (0x3333333333333333L, 2),
    (0x5555555555555555L, 1))

  /** Spread the low 32 bits of `c` onto the even bit positions of a
    * 64-bit long (monotone: preserves the column's order).
    */
  private def spread(c: Column): Column =
    SpreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (x, (mask, sh)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }

  /** The 64-bit Morton code of two non-negative 32-bit keys: bits of
    * `a` on even positions, `b` on odd. Sorting by it visits the key
    * plane along the Z curve, keeping both coordinates locally dense.
    */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Write `df` parquet at `path` z-clustered on (`c1`, `c2`):
    * range-partition by z-value into `numFiles` contiguous z ranges,
    * sort inside each — so every output file covers a rectangle of the
    * key plane and its footer min/max prune on both columns.
    */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
      numFiles: Int = 16): Unit =
    df.withColumn("__z", zValue(col(c1), col(c2)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
