package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}
import graft.sources.DocSource

/** The ROLLING form of the curation pipeline: a corpus directory that
  * absorbs nightly crawl batches through the full incremental gauntlet —
  * quarantine split → within-batch exact + near-dup → exact + near-dup
  * against everything already accumulated → quality gate → append — O(batch)
  * per night, never O(corpus). (The reference's loop has the same rolling
  * shape for blocks: `BlockchainToGraph.java:31-47,79-100` resumes from a
  * persisted best-height cursor and ingests only blk files past it.)
  *
  * Three appendable sidecar artifacts make the history checks O(new):
  *  - `docs/`          the accumulated corpus (parquet, append)
  *  - `_fingerprints/` 32-hex md5(text) per kept doc — the exact-dup check
  *    joins 16-byte digests, never bodies ([[Dedup.exactAgainst]]'s shape
  *    with the reference side precomputed)
  *  - `_bandidx/`      MinHash band index ([[Dedup.writeMinhashBandIndex]])
  *    — the near-dup check equi-joins (band, bucket), never re-shingles
  *
  * Replay-idempotent by construction: a replayed batch's survivors are now
  * EXACT duplicates of rows the first run appended, so every one of them
  * is dropped by the fingerprint check and the replay appends nothing
  * (spec-gated) — the same convergence contract as the streaming gold
  * sink's replayed micro-batch. The three appends are not atomic as a
  * group; a crash between them can only lose sidecar rows for appended
  * docs, and the documented repair is to re-absorb the batch (dups append
  * nothing) after `rebuildSidecars`.
  *
  * Periodic FREEZE stays [[CorpusRelease.write]] over `docs/` — the rolling
  * directory is the accumulator, the release is the attested artifact.
  */
object RollingCuration {

  final case class BatchReport(
      ingested: Long, quarantined: Long, withinBatchDups: Long,
      withinBatchNearDups: Long, historyDups: Long, nearDups: Long,
      qualityRejected: Long, appended: Long)

  /** Absorb one JSONL crawl batch into the rolling corpus at `dir`.
    * Quality gate = p0's: ≥ `minTokens` tokens and ≤ `maxPunct` punctuation
    * ratio. Near-dup candidates against history are DROPPED (candidate =
    * band collision; the conservative choice for a training corpus — false
    * positives cost one fresh doc, false negatives ship a near-dup).
    */
  def absorbBatch(spark: SparkSession, jsonlPath: String, dir: String,
      minTokens: Int = 5, maxPunct: Double = 0.2): BatchReport = {
    val (docs0, quarantine) = DocSource.readJsonl(spark, jsonlPath)
    val docs = docs0.persist()
    try {
      val nIngested = docs.count()
      val nQuarantined = quarantine.count()

      // within-batch exact dedup: keep the min-id copy per content digest
      val keepIds = docs.groupBy(md5(col("text")).as("_fp"))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val unique = docs.join(keepIds, Seq("doc_id"), "left_semi")

      // within-batch NEAR-dup: LSH candidates over the batch, transitive
      // keep-min (the batch-local complement of the history band check).
      // Signatures are computed ONCE here and reused for the history join.
      val sigs = Dedup.minhashSignatures(unique, "doc_id", "text")
      val nearKeep = Dedup.nearDupClusters(
          unique.select("doc_id"),
          Dedup.minhashCandidatePairs(sigs, "doc_id"))
        .where(col("doc_id") === col("cluster_id")).select("doc_id")
      val uniqueNear = unique.join(nearKeep, Seq("doc_id"), "left_semi")

      // history checks ride the sidecars (absent on the first batch)
      val hasHistory = Files.exists(Paths.get(dir, "_fingerprints"))
      val afterExact =
        if (!hasHistory) uniqueNear
        else uniqueNear.join(
          spark.read.parquet(s"$dir/_fingerprints"),
          md5(uniqueNear("text")) === col("fp"), "left_anti")
      val afterNear =
        if (!hasHistory) afterExact
        else {
          val collided = Dedup.minhashPairsAgainst(
            Dedup.bandedBuckets(
              sigs.join(afterExact.select("doc_id"), Seq("doc_id"), "left_semi"),
              "doc_id"),
            spark.read.parquet(s"$dir/_bandidx"), "doc_id").select("doc_id")
          afterExact.join(collided, Seq("doc_id"), "left_anti")
        }

      val survivors = afterNear.join(
          TextOps.qualityMetrics(afterNear, "doc_id", "text")
            .where(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunct)
            .select("doc_id"),
          Seq("doc_id"), "left_semi")
        .persist()
      try {
        val nUnique = unique.count()
        val nUniqueNear = uniqueNear.count()
        val nAfterExact = if (!hasHistory) nUniqueNear else afterExact.count()
        val nAfterNear = if (!hasHistory) nAfterExact else afterNear.count()
        val nAppended = survivors.count()

        if (nAppended > 0) {
          survivors.write.mode("append").parquet(s"$dir/docs")
          survivors.select(md5(col("text")).as("fp"))
            .write.mode("append").parquet(s"$dir/_fingerprints")
          Dedup.writeMinhashBandIndex(
            Dedup.bandedBuckets(
              Dedup.minhashSignatures(survivors, "doc_id", "text"), "doc_id"),
            s"$dir/_bandidx", append = Files.exists(Paths.get(dir, "_bandidx")))
        }
        BatchReport(
          ingested = nIngested, quarantined = nQuarantined,
          withinBatchDups = nIngested - nUnique,
          withinBatchNearDups = nUnique - nUniqueNear,
          historyDups = nUniqueNear - nAfterExact,
          nearDups = nAfterExact - nAfterNear,
          qualityRejected = nAfterNear - nAppended,
          appended = nAppended)
      } finally { survivors.unpersist(); () }
    } finally { docs.unpersist(); () }
  }

  /** Recompute both sidecars from `docs/` — the crash repair (and the
    * migration path for a corpus accumulated before the sidecars existed).
    * One corpus scan; after it, [[absorbBatch]] is O(batch) again.
    */
  def rebuildSidecars(spark: SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/docs")
    docs.select(md5(col("text")).as("fp"))
      .write.mode("overwrite").parquet(s"$dir/_fingerprints")
    Dedup.writeMinhashBandIndex(
      Dedup.bandedBuckets(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id"),
      s"$dir/_bandidx")
  }
}
