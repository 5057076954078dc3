package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

/** GlobalRank must equal the single-partition window functions it replaces —
  * on ties, on ragged ntile splits, on n < k — while actually distributing:
  * the big window is hash-partitioned by range bucket.
  */
class GlobalRankSpec extends SparkSpec {

  test("positions equal global row_number, incl. leading-column ties") {
    import spark.implicits._
    // many ties on the leading column (only 7 distinct values over 500 rows)
    // force tie runs to cross would-be bucket boundaries
    val df = (1 to 500).map(i => (i.toLong, (i % 7).toDouble)).toDF("id", "v")
    val w = Window.orderBy(col("v"), col("id"))
    val expected = df.select(col("id"), row_number().over(w).as("p"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = GlobalRank.globalPositions(df, Seq("v", "id"), buckets = 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("_pos")).toMap
    assert(got == expected)
  }

  test("percentRank and ntileOf equal the window functions on ragged sizes") {
    import spark.implicits._
    for (n <- Seq(3, 10, 23, 100)) { // n < k, n == k, n % k != 0, n % k == 0
      val df = (1 to n).map(i => (i.toLong, (i * 37 % n).toDouble)).toDF("id", "v")
      val w = Window.orderBy(col("v"), col("id"))
      val expected = df.select(col("id"),
          percent_rank().over(w).as("pr"), ntile(10).over(w).as("nt"))
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
      val got = GlobalRank.globalPositions(df, Seq("v", "id"), buckets = 4)
        .select(col("id"), GlobalRank.percentRank(col("_pos"), n).as("pr"),
          GlobalRank.ntileOf(col("_pos"), n, 10).as("nt"))
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
      assert(got == expected, s"n=$n")
    }
  }

  test("plan: the data-bearing window is partitioned by bucket, never global") {
    val df = graft.tables.Tables.orders(spark, "/root/testdata/sf0.001")
    val p = GlobalRank.globalPositions(df, Seq("o_totalprice", "o_orderkey"))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("hashpartitioning(_grk_bucket"), p.take(3000))
    // the only SinglePartition exchange feeds the constant-size offsets agg
    val single = "Exchange SinglePartition".r.findAllMatchIn(p).size
    assert(single <= 1, s"unexpected global exchanges:\n${p.take(3000)}")
  }
}
