package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run — Spark startup dominates
  * suite time otherwise.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's union partitioning propagation plans SMJ over a 2N-partition
      // union as exchange-free against an N-partition side -> runtime zip
      // failure (observed on the fused addressStats). Disable everywhere.
      .config("spark.sql.unionOutputPartitioning", "false")
      // Bucket-aligned gold joins cluster on a SUBSET of the join keys
      // (tx_hash buckets, (tx_hash, address) joins); allow that co-partition.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
}
