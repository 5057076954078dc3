package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.{Blockchain, BlkScale, Pipeline, Relational}
import graft.tables.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full registered inventory: SURVEY.md §2 relational operators + the
    * training-data-pipeline operators (dedup / similarity / text).
    */
  def registry: Seq[Q] =
    Relational.queries ++ Pipeline.queries ++ Blockchain.queries ++ BlkScale.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary — scan + filter + hash aggregate, the
    * spine of the engine.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_quantity") >= 0)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
        count(lit(1)).as("count_order"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
