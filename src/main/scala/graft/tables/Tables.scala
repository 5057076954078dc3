package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided TESTDATA parquet tables (TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst keeps full pushdown:
  * filters and column pruning reach the scan (`PushedFilters` / `ReadSchema`),
  * and partition-sized splits (`spark.sql.files.maxPartitionBytes`) drive
  * parallelism at 100 TB the same way they do at sf0.001.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events` with `ts` normalized to NANOSECOND-epoch BIGINT — the engine's
    * canonical event-time representation — whatever encoding the generator
    * used: INT64 TIMESTAMP(NANOS) parquet arrives as a long already
    * (spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP(MICROS) arrives as
    * TIMESTAMP_NTZ and is converted under the UTC session timezone (an
    * instant-preserving cast — every graft session pins UTC). DuckDB oracles
    * read the same file natively, so `ts div 1000` here ≡ `epoch_us(ts)`
    * there for both encodings.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts",
        expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
