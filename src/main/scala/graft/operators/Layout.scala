package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: multi-dimensional clustering for 100 TB scan
  * pruning. A table range-partitioned and sorted by a Z-order (Morton)
  * code keeps rows that are close in BOTH dimensions close on disk, so
  * parquet row-group min/max stats prune two-sided box filters — where a
  * lexicographic sort only ever prunes its leading column. The code is
  * pure integer bit-twiddling (shifts/masks), exactly reproducible in any
  * engine, and computed scan-side — the only cost of a z-ordered write is
  * the range shuffle the write needs anyway.
  */
object Layout {

  /** Bit-spread via the standard magic masks: 16-bit `v` → 32-bit value
    * with input bit i at output bit 2i (Morton building block). */
  private def spread16(v: Column): Column = {
    val m = Seq(
      (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
    m.foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (acc, (sh, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, sh))).bitwiseAND(lit(mask))
    }
  }

  /** 32-bit Morton code of two 16-bit coordinates (x in even bits, y in
    * odd): interleaves the low 16 bits of each input (callers quantize
    * wider domains down first — `% 65536` or a range-scaled bucket). */
  def mortonCode(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1)).cast("long")

  /** Write `df` z-ordered on (xCol, yCol): range-partition + sort by the
    * Morton code so every output file owns a disjoint morton range and
    * row-group stats tighten on BOTH columns. The morton column itself is
    * dropped — layout is a storage property, not schema. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  numFiles: Int = 8): Unit =
    df.withColumn("__z", mortonCode(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
