package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable reshape layer (SURVEY §2.10): one-hot pivot, melt, and the
  * multi-valued-attribute explode that is the durable semantic of the
  * reference's pivot→melt round trip. Pivot values must be declared —
  * an undeclared pivot runs an extra distinct-collect job over the data
  * before planning, which is a full scan at 100 TB. */
object Reshape {

  /** PV1: one-hot a categorical column into declared indicator columns,
    * mapped through U22's Yes/No vocabulary. */
  def oneHotYesNo(df: DataFrame, key: String, cat: String, values: Seq[String]): DataFrame = {
    val pivoted = df.groupBy(key).pivot(cat, values).agg(count(lit(1))).na.fill(0, values)
    // presence test, not ===1: a key with duplicate rows of one category
    // yields count > 1 and must still read "Yes"
    values.foldLeft(pivoted)((d, v) =>
      d.withColumn(v, when(col(v) >= 1, "Yes").otherwise("No")))
  }

  /** PV2: melt indicator columns back to long form, keeping only the
    * present ("Yes") combinations — the F5 filter fused in. */
  def meltPresent(df: DataFrame, key: String, valueCols: Seq[String],
                  varName: String): DataFrame =
    df.unpivot(Array(col(key)), valueCols.map(col).toArray, varName, "__present")
      .filter(col("__present") === "Yes")
      .drop("__present")

  /** Multi-valued cell → long form ("3,4,5" zones, ";"-joined lines):
    * the direct form of the PV1→PV2 round trip. */
  def explodeMultiValued(df: DataFrame, cell: String, sep: String,
                         outName: String): DataFrame =
    df.withColumn(outName, explode(split(col(cell), java.util.regex.Pattern.quote(sep))))
}
