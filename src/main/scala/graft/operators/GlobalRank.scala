package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL ordering positions without a single-partition window.
  *
  * `Window.orderBy(...)` with no partition spec moves the ENTIRE dataset
  * through one task — the one plan shape that cannot survive a scale-up, and
  * exactly what global percent_rank/ntile/row_number naively compile to.
  * This operator computes the same positions as a distributed dataflow:
  *
  *   1. range-bucket rows on the leading sort column (cut points from
  *      approxQuantile — boundary quality affects only balance, never
  *      correctness);
  *   2. rank WITHIN each bucket (hash-partitioned window, parallel);
  *   3. prefix-sum the per-bucket counts (a window over <= `buckets` rows —
  *      constant-size, independent of the data) and broadcast-join the
  *      offsets back;
  *   4. global position = bucket offset + within-bucket row number.
  *
  * Rows equal on the leading column always land in the SAME bucket, so
  * concatenating buckets in order reproduces the total order exactly; the
  * caller's trailing `orderCols` break ties within the bucket. A single
  * dominant leading value degrades to one big bucket (the inherent limit of
  * range partitioning under ties) — pick a higher-cardinality leading column
  * or add salting when that is the workload.
  */
object GlobalRank {

  /** Adds `posCol`: the 1-based global position of each row in the total
    * order by `orderCols` (which must be unique as a tuple for the position
    * to be well-defined).
    */
  def globalPositions(
      df: DataFrame, orderCols: Seq[String], posCol: String = "_pos",
      buckets: Int = 64): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val lead = orderCols.head
    val cuts = df.stat
      .approxQuantile(lead, (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
      .distinct
    val bucket = cuts.foldLeft(lit(0)) { case (acc, c) =>
      acc + when(col(lead) > c, 1).otherwise(0)
    }
    val tagged = df.withColumn("_grk_bucket", bucket)
    val wOff = Window.orderBy("_grk_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    // <= `buckets` rows: the only single-partition window here is over the
    // bucket COUNTS, whose size is a constant of the operator, not the data.
    val offsets = tagged.groupBy("_grk_bucket").agg(count(lit(1)).as("_grk_n"))
      .withColumn("_grk_off", coalesce(sum("_grk_n").over(wOff), lit(0L)))
      .select("_grk_bucket", "_grk_off")
    val wIn = Window.partitionBy("_grk_bucket")
      .orderBy(orderCols.map(col): _*)
    tagged.join(broadcast(offsets), "_grk_bucket")
      .withColumn(posCol, col("_grk_off") + row_number().over(wIn))
      .drop("_grk_bucket", "_grk_off")
  }

  /** Global percent_rank over a unique total order: (pos-1)/(n-1), the
    * definition Spark's percent_rank reduces to when the order key is
    * unique (no rank ties). `n` is passed in (a cheap count) so the plan
    * stays a pure dataflow.
    */
  def percentRank(posCol: Column, n: Long): Column =
    (posCol - 1).cast("double") / math.max(n - 1, 1).toDouble

  /** SQL-standard NTILE(k) from a global position: the first n%k buckets
    * take ceil(n/k) rows, the rest floor(n/k) — bit-identical to the
    * window-function form at any n, k.
    */
  def ntileOf(posCol: Column, n: Long, k: Int): Column = {
    val size = n / k
    val rem = n % k
    val bigSpan = rem * (size + 1)
    when(lit(size) === 0, posCol.cast("int")) // n < k: one row per bucket
      .otherwise(
        when(posCol <= bigSpan, ((posCol - 1) / (size + 1)).cast("int") + 1)
          .otherwise(lit(rem.toInt) + ((posCol - bigSpan - 1) / size).cast("int") + 1))
  }
}
