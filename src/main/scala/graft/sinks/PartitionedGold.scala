package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
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

  /** Diff-and-overwrite: write `gold` (carrying `heightCol`) to `path`,
    * rewriting ONLY the height buckets whose CONTENT differs from what is on
    * disk — the composition of a full logical recompute with an O(changed)
    * physical write. Change detection is a per-bucket signature compare
    * (row count + bit_xor of xxhash64 over all columns — order-independent,
    * so it is insensitive to task scheduling), which costs a scan of both
    * sides but no shuffle of the data itself; the write then touches the
    * tip bucket on extend and fork-depth/bucketSize buckets on reorg, so a
    * steady-state sync's write amplification is O(new work), not O(history).
    * A replayed batch (exactly-once resume) recomputes identical signatures
    * and writes nothing. If a bucket exists on disk but vanished from
    * `gold` (shrinking history — cannot happen under append-only bronze,
    * but a changed bucketSize produces it), dynamic overwrite could never
    * delete it, so the whole table is rewritten once instead.
    *
    * Returns the overwritten bucket ids (null bucket ⇒ null element).
    */
  def syncAffected(
      gold: DataFrame, path: String,
      heightCol: String = "height", bucketSize: Int = 10000): Seq[Any] = {
    val spark = gold.sparkSession
    val bucketed = withBucket(gold, heightCol, bucketSize)
    val dataCols = bucketed.columns.filterNot(_ == BucketCol).toSeq
    def sig(df: DataFrame): DataFrame =
      df.groupBy(col(BucketCol)).agg(
        count(lit(1)).as("n"),
        expr(s"bit_xor(xxhash64(struct(${dataCols.map(c => s"`$c`").mkString(",")})))").as("sig"))
    // Existence probe via the FileSystem API (works for any scheme — local,
    // HDFS, object store) instead of read-and-catch, which logs a spurious
    // error stack on every first write.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val exists = hPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(hPath)
    val onDisk = if (exists) Some(spark.read.parquet(path)) else None
    onDisk match {
      case None =>
        overwriteAffected(bucketed, path)
        bucketed.select(BucketCol).distinct().collect().map(_.get(0)).toSeq
      case Some(cur) =>
        val newSig = sig(bucketed)
        val oldSig = sig(cur.select(BucketCol, dataCols: _*))
        // Bucket counts are bounded by maxHeight/bucketSize (~100 at 1M
        // blocks) — the collected diff is driver-trivial at any scale.
        val joined = newSig.as("nw").join(oldSig.as("od"),
          col(s"nw.$BucketCol") <=> col(s"od.$BucketCol"), "full_outer")
        val rows = joined.select(
          col(s"nw.$BucketCol").as("nb"), col(s"od.$BucketCol").as("ob"),
          col("nw.n").as("nn"), col("od.n").as("on"),
          col("nw.sig").as("nsig"), col("od.sig").as("osig")).collect()
        val removed = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
        if (removed.nonEmpty) {
          // cannot express deletion via dynamic overwrite: rewrite the table
          bucketed.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(path)
          bucketed.select(BucketCol).distinct().collect().map(_.get(0)).toSeq
        } else {
          val changed = rows.filter { r =>
            !r.isNullAt(0) && (r.isNullAt(1) ||
              r.getLong(2) != r.getLong(3) || r.getLong(4) != r.getLong(5))
          }.map(_.get(0)).toSeq
          if (changed.nonEmpty) {
            val keep = spark.createDataFrame(
              spark.sparkContext.parallelize(changed.map(Row(_)), 1),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField(
                  "cb", bucketed.schema(BucketCol).dataType))))
            overwriteAffected(
              bucketed.join(broadcast(keep),
                col(BucketCol) <=> col("cb"), "left_semi"), path)
          }
          changed
        }
    }
  }

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
