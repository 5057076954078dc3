package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming path (SURVEY.md §2.9) — the Spark-native form of the
  * reference's `synchronizeDatabase` loop (BlockchainToGraph.java:116–167):
  *
  *  - T1 unbounded ingest: any readStream source of block rows
  *  - T2 out-of-order arrival: `withWatermark` replaces the fixed 1,126-block
  *    reorder buffer (BlockchainToGraph.java:34–35, 387–425)
  *  - T3 stateful dedupe: `dropDuplicatesWithinWatermark` replaces the
  *    "already in database" probes (BlockchainToGraph.java:449–456)
  *  - T4 reorg: foreachBatch recomputes affected height partitions from
  *    immutable bronze — deterministic overwrite, no hand-written inverse of
  *    every aggregate (vs BlockchainToGraph.java:568–777)
  *  - T5 exactly-once resume: checkpointLocation + idempotent partition
  *    overwrite replaces the genesis-walk recovery (BlockchainToGraph.java:38–49)
  */
object ChainStream {

  /** Parse `bitcoind`-style log lines into UpdateTip events — the reference's
    * stream filter + extract (S4, BlockchainToGraph.java:128–156) as
    * declarative column ops (fully codegen'd, no driver-side string loop).
    * Input: one string column `line`. Output: (hash, height).
    */
  def parseUpdateTips(lines: DataFrame): DataFrame =
    lines
      .filter(col("line").contains("UpdateTip: new best="))
      .select(
        regexp_extract(col("line"), "new best=([0-9a-fA-F]+)", 1).as("hash"),
        regexp_extract(col("line"), "height=(\\d+)", 1).cast("int").as("height"))
      .filter(col("hash") =!= "" && col("height").isNotNull)

  /** Watermarked dedupe of streaming block rows (T2+T3). `eventTimeCol` must
    * be a timestamp column; `delay` bounds how out-of-order a block may
    * arrive and still be accepted — the configurable form of the reference's
    * hard-coded 1,126-block buffer.
    */
  def dedupedBlocks(blocks: DataFrame, eventTimeCol: String, delay: String): DataFrame =
    blocks
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(Seq("hash"))

  /** Incremental gold maintenance (T4/T5): every micro-batch appends to the
    * bronze store and recomputes gold FROM BRONZE, overwriting the gold
    * table wholesale (reorg-safe: a fork block arriving late simply causes
    * the recompute to see the new best chain). Write amplification is
    * O(gold) per batch — fine while gold is an aggregate table; for
    * history-sized gold use [[incrementalGoldPartitioned]], whose sink
    * rewrites only the height buckets that changed.
    *
    * @param newBlocks   streaming DataFrame of block rows
    * @param bronzeDir   append-only bronze parquet path
    * @param recompute   (spark, bronzeDf) => gold DataFrame; called per batch
    * @param goldDir     overwritten gold parquet path
    */
  def incrementalGold(
      newBlocks: DataFrame,
      bronzeDir: String,
      recompute: (SparkSession, DataFrame) => DataFrame,
      goldDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    newBlocks.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        batch.write.mode("append").parquet(bronzeDir)
        // Idempotent: recompute is a pure function of bronze, so replaying a
        // batch after a crash converges to the same gold state.
        val bronze = spark.read.parquet(bronzeDir)
          .dropDuplicates("hash") // replayed appends collapse here
        recompute(spark, bronze).write.mode("overwrite").parquet(goldDir)
        ()
      }

  /** [[incrementalGold]] with an O(changed) sink: gold must carry a `height`
    * column, is stored height-bucket-partitioned, and each micro-batch
    * overwrites only the buckets whose content changed
    * ([[graft.sinks.PartitionedGold.syncAffected]]) — a tip-extending batch
    * rewrites one bucket, a depth-d reorg rewrites ⌈d/bucketSize⌉, and the
    * untouched history's files stay byte-identical. This is the streaming
    * form of "reorg = recompute the affected height range" (T4) with the
    * recompute kept a pure function of bronze (T5 idempotence: a replayed
    * batch produces identical bucket signatures and writes nothing).
    */
  def incrementalGoldPartitioned(
      newBlocks: DataFrame,
      bronzeDir: String,
      recompute: (SparkSession, DataFrame) => DataFrame,
      goldDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      bucketSize: Int = 10000): DataStreamWriter[Row] =
    newBlocks.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        batch.write.mode("append").parquet(bronzeDir)
        val bronze = spark.read.parquet(bronzeDir)
          .dropDuplicates("hash") // replayed appends collapse here
        graft.sinks.PartitionedGold.syncAffected(
          recompute(spark, bronze), goldDir, "height", bucketSize)
        ()
      }

  /** Stateful running balances (SURVEY.md §2.4 A4 streaming form): the
    * reference maintains AddressBalance by `+=`/`-=` on every event
    * (BlockchainToGraph.java:856–862, 913–919); here the state store keeps
    * one Long per address and each micro-batch emits the updated balance.
    * Reorg retraction = feeding negative deltas (cf.
    * [[graft.functions.ExactDistinctWithRetraction]] for distinct counts).
    * State is partitioned by key across executors — 1B addresses is just a
    * bigger state store, not a bigger driver.
    */
  def runningBalances(
      deltas: org.apache.spark.sql.Dataset[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import deltas.sparkSession.implicits._
    deltas
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout) {
        (addr, rows, state) =>
          val bal = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(bal)
          (addr, bal)
      }
      .toDF("address", "balance")
  }

  /** Incremental file-list scan (S2) — the reference enumerates blk%05d.dat
    * from a persisted cursor (BlockchainToGraph.java:79–88, 1096–1107); the
    * Spark form is a file stream source whose checkpoint IS the cursor.
    * `maxFilesPerTrigger` bounds per-batch work exactly like the reference's
    * one-file-at-a-time loop, but each batch is still fully parallel.
    */
  def fileStreamBlocks(
      spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Streaming form of S1: raw blk files arriving in a directory are parsed
    * incrementally — the reference's tail-the-datadir loop
    * (BlockchainToGraph.java:116–167) as an unbounded source. The file-source
    * checkpoint is the cursor; each discovered file is parsed by the same
    * wire-format flatMap as the batch scan, fully parallel within a batch.
    */
  def blkFileStream(
      spark: SparkSession, dir: String,
      networkMagic: Int = graft.sources.BlockFileSource.Magic,
      maxFilesPerTrigger: Int = 2): org.apache.spark.sql.Dataset[graft.sources.BlockFileSource.RawBlock] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "blk*.dat")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select("content").as[Array[Byte]]
      .flatMap(graft.sources.BlockFileSource.parseFile(_, networkMagic))
  }

  /** Tumbling / session event-time aggregation over a stream (T7):
    * watermark + window — the declared streaming-agg surface.
    */
  def windowedCounts(events: DataFrame, tsCol: String, delay: String, width: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
}
