package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join) — not natively in Spark SQL.
  *
  * Reference precedent: the reference resolves "latest state at time T" by
  * point lookups during its single-threaded scan (e.g. address running
  * balances, BlockchainToGraph.java:856–862). At Spark scale the idiomatic
  * formulation is the union–sort–window trick below: ONE shuffle on
  * (key, ts), no cross/theta join, no per-row lookups, skew-bounded by key
  * cardinality. This survives 100 TB where a range-join (O(n·m) per key)
  * would not.
  */
object AsOfJoin {

  /** For every row of `left`, attach the greatest `right.tsCol <= left.tsCol`
    * with the same `keyCol` (inclusive semantics), as column `asOfCol`.
    * Right rows sort before left rows at equal timestamps so an exactly
    * simultaneous right row IS matched.
    *
    * Returns the `left` columns + `asOfCol` (null when no prior right row).
    */
  /** Forward as-of: smallest `right.tsCol >= left.tsCol` per key, as
    * `asOfCol`. Implemented by time reversal over the backward join — one
    * shuffle, same scale properties.
    */
  def firstRightAtOrAfter(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      asOfCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val neg = (df: DataFrame) => df.withColumn(tsCol, -col(tsCol))
    neg(lastRightAtOrBefore(neg(left), neg(right), keyCol, tsCol, asOfCol))
      .withColumn(asOfCol, -col(asOfCol))
  }

  /** Backward as-of with a tolerance window: matches further than
    * `tolerance` time units in the past become NULL.
    */
  def lastRightWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      tolerance: Long,
      asOfCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    lastRightAtOrBefore(left, right, keyCol, tsCol, asOfCol)
      .withColumn(asOfCol,
        when(col(tsCol) - col(asOfCol) <= tolerance, col(asOfCol)))
  }

  def lastRightAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      asOfCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(leftCols.map(col): _*)
      .withColumn("_side", lit(1))
    // Only (key, ts) survive from the right side — column pruning keeps the
    // shuffle payload minimal.
    val r = right.select(col(keyCol), col(tsCol))
      .select(
        (leftCols.map(c =>
          if (c == keyCol || c == tsCol) col(c) else lit(null).as(c)) :+
          lit(0).as("_side")): _*)
    val unioned = l.unionByName(r)
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_rts", when(col("_side") === 0, col(tsCol)))
      .withColumn(asOfCol, max(col("_rts")).over(w))
      .where(col("_side") === 1)
      .select((leftCols.map(col) :+ col(asOfCol)): _*)
  }
}
