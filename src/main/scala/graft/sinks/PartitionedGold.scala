package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Height-bucket-partitioned gold storage with DYNAMIC partition overwrite —
  * the physical mechanism behind "reorg = recompute the affected height
  * range" (SURVEY.md §2.9 T4). A reorg at depth d rewrites only the
  * partitions covering the fork range; every other partition's files are
  * untouched, so the operation is O(reorg depth), not O(history).
  * This replaces the reference's per-vertex delete-and-reverse walk
  * (BlockchainToGraph.java:568–777) with an idempotent bulk overwrite.
  */
object PartitionedGold {

  val BucketCol = "height_bucket"

  /** Attach the partition column: height / bucketSize. */
  def withBucket(df: DataFrame, heightCol: String, bucketSize: Int = 10000): DataFrame =
    df.withColumn(BucketCol, (col(heightCol) / bucketSize).cast("int"))

  /** Overwrite ONLY the height buckets present in `df` (dynamic mode);
    * all other partitions keep their files byte-identical.
    */
  def overwriteAffected(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      df.write
        .mode(SaveMode.Overwrite)
        .partitionBy(BucketCol)
        .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
