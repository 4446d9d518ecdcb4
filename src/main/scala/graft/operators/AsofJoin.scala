package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the time-series operator Spark has no
  * built-in for. For every left row, attach the latest right row with the
  * same key whose timestamp is ≤ (backward, the default) or ≥ (forward)
  * the left timestamp.
  *
  * Implementation is the union-and-carry technique, not a range join: tag
  * both inputs, union them, and run one `last_value(..., ignoreNulls) over
  * (partition by key order by ts, side)` window — right rows populate the
  * carried struct, left rows read it. Cost is ONE shuffle of left+right on
  * the key and a per-partition sort: at 100 TB that beats any
  * O(left × right-per-key) range-join expansion, never broadcasts, and
  * AQE skew-splits hot keys. (A right row and left row at the SAME
  * timestamp match: ties order right before left within the window.)
  */
object AsofJoin {

  /** @param left      probe side; every left row survives (left-outer)
    * @param right     reference side, its `valueCols` get carried over
    * @param keyCols   equi-join key column names (present in both)
    * @param tsCol     timestamp/ordering column name (present in both)
    * @param valueCols right columns to attach (null when no match yet)
    * @param forward   false = match latest right ts ≤ left ts (default);
    *                  true = earliest right ts ≥ left ts
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], forward: Boolean = false): DataFrame = {
    require(valueCols.nonEmpty, "asof: valueCols must be non-empty")
    val leftCols = left.columns.toSeq
    // side tag orders right rows before left at equal timestamps, so a
    // same-instant right row is visible to the left row (inclusive match)
    val l = left.select(
      leftCols.map(col) :+ lit(1).as("__side") :+ lit(null)
        .cast(structType(right, valueCols)).as("__carry"): _*)
    val r = right.select(
      leftCols.map(c => (if (c == tsCol || keyCols.contains(c)) col(c)
        else lit(null).cast(fieldType(right, left, c))).as(c)) :+
        lit(0).as("__side") :+
        struct(valueCols.map(col): _*).as("__carry"): _*)
    // side asc in BOTH modes: right (0) sorts before left (1) at equal
    // timestamps, keeping the same-instant match inclusive
    val ord = if (forward) Seq(col(tsCol).desc, col("__side").asc)
      else Seq(col(tsCol).asc, col("__side").asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__m", last("__carry", ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col("__m").getField(v).as(v)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))

  private def fieldType(primary: DataFrame, fallback: DataFrame, c: String) =
    (if (primary.columns.contains(c)) primary.schema(c) else fallback.schema(c)).dataType
}
