package graft.sinks

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
  *  - `_fingerprints/` (fp, doc_id) per kept doc — fp is 32-hex md5(text),
  *    so the exact-dup check joins 16-byte digests, never bodies
  *    ([[Dedup.exactAgainst]]'s shape with the reference side precomputed),
  *    and the id column makes doc_id a real key: an id already absorbed is
  *    dropped even when its text changed (first-wins — a re-crawl that
  *    mutates content does NOT shadow the shipped row, so `docs/` and every
  *    keyed artifact over it stay duplicate-free on doc_id).
  *  - `_bandidx/`      MinHash band index ([[Dedup.writeMinhashBandIndex]])
  *    — the near-dup check equi-joins (band, bucket), never re-shingles
  *
  * Each history check gates on ITS OWN sidecar's existence: a crash between
  * the fingerprint append and the band-index append leaves the next absorb
  * degraded (that one check skipped) rather than failing on a missing path.
  * The documented repair for any sidecar damage stays the same —
  * [[rebuildSidecars]] then re-absorb the batch (dups append nothing). A
  * corpus accumulated under the pre-doc_id fingerprint schema migrates the
  * same way: one [[rebuildSidecars]] call.
  *
  * Replay-idempotent by construction: a replayed batch's survivors are now
  * EXACT duplicates of rows the first run appended, so every one of them
  * is dropped by the id + fingerprint checks and the replay appends nothing
  * (spec-gated) — the same convergence contract as the streaming gold
  * sink's replayed micro-batch.
  *
  * Periodic FREEZE stays [[CorpusRelease.write]] over `docs/` — the rolling
  * directory is the accumulator, the release is the attested artifact.
  */
object RollingCuration {

  /** Per-absorb accounting. The last four fields are the VERIFICATION
    * observability surface (see [[absorbBatch]]'s `verifyTau`): candidates
    * vs what actually dropped, so an operator running the conservative
    * unverified default sees the potential over-drop LIVE —
    * `historyWeakCollisions` counts docs whose best band-agreement estimate
    * sits below [[WeakCollisionTau]] (or below `verifyTau` when set), i.e.
    * collisions that verification would have kept.
    */
  final case class BatchReport(
      ingested: Long, quarantined: Long, withinBatchDups: Long,
      withinBatchNearDups: Long, idCollisions: Long, historyDups: Long,
      nearDups: Long, qualityRejected: Long, appended: Long,
      withinBatchCandidatePairs: Long = 0L,
      withinBatchConfirmedPairs: Long = 0L,
      historyCollisions: Long = 0L,
      historyWeakCollisions: Long = 0L)

  /** Report-only threshold marking a history band collision as WEAK (likely
    * a false positive): a one-band accident estimates Ĵ≈0.59 at the default
    * 32/4 banding and the next quantization level is 0.71, while genuine
    * near-dups estimate near 1 — 0.8 cleanly separates the two (the d12
    * oracle pins the estimator). Measured on the 500k-doc DocScaleRehearsal
    * (r13): the unverified default over-dropped 84/500 fresh docs on salted
    * batches, and verification kept them at 1.24× the absorb cost — this
    * constant makes that trade visible per batch without changing the
    * conservative default drop semantics.
    */
  val WeakCollisionTau = 0.8

  /** Absorb one JSONL crawl batch into the rolling corpus at `dir`.
    * Quality gate = p0's: ≥ `minTokens` tokens and ≤ `maxPunct` punctuation
    * ratio.
    *
    * `verifyTau = None` (default): near-dup CANDIDATES are dropped (candidate
    * = band collision; the conservative choice for a training corpus — false
    * positives cost one fresh doc, false negatives ship a near-dup).
    * RECOMMENDATION for corpora where fresh-doc yield matters: run
    * `Some(0.8)`. The 500k-doc rehearsal measured the unverified default
    * over-dropping 84/500 fresh docs on salted batches, and verification
    * keeping them at 1.24× the absorb cost (r13,
    * bench/rehearsal_r13.json `rolling_corpus` legs). The default stays
    * conservative because it is also the CHEAPER failure mode for
    * decontamination-adjacent corpora; whichever way a deployment decides,
    * the [[BatchReport]] now carries `historyCollisions` vs
    * `historyWeakCollisions` so the over-drop is visible live.
    *
    * `verifyTau = Some(tau)` trades that recall bias for precision: a
    * within-batch candidate pair must confirm at exact n-gram Jaccard ≥ tau
    * (the d3 machinery — both texts are in the batch), and a history
    * collision must confirm at band-agreement estimated Jaccard ≥ tau
    * ([[Dedup.minhashBandAgreement]] — history text is unavailable by
    * design, but the index holds all bands, and a one-band accident
    * estimates Ĵ≈0.59 at the default 32/4 parameters while real near-dups
    * estimate near 1). With verification on, a false-positive collision
    * costs one extra join instead of one fresh document.
    */
  def absorbBatch(spark: SparkSession, jsonlPath: String, dir: String,
      minTokens: Int = 5, maxPunct: Double = 0.2,
      verifyTau: Option[Double] = None): BatchReport = {
    val (docs0, quarantine) = DocSource.readJsonl(spark, jsonlPath)
    val docs = docs0.persist()
    val retained = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      val nIngested = docs.count()
      val nQuarantined = quarantine.count()

      // within-batch exact dedup: keep the min-id copy per content digest
      val keepIds = docs.groupBy(md5(col("text")).as("_fp"))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val unique = docs.join(keepIds, Seq("doc_id"), "left_semi")

      // within-batch NEAR-dup: LSH candidates over the batch, optionally
      // verified at exact Jaccard (texts in hand), then transitive keep-min
      // (the batch-local complement of the history band check). Signatures
      // are computed ONCE here and reused for the history join. Candidates
      // are persisted (batch-bounded) so the report's candidates-vs-
      // confirmed counts don't re-run the LSH self-join.
      val sigs = Dedup.minhashSignatures(unique, "doc_id", "text")
      val candidates = Dedup.minhashCandidatePairs(sigs, "doc_id").persist()
      retained += candidates
      val nCandPairs = candidates.count()
      val pairs = verifyTau match {
        case None => candidates
        case Some(tau) =>
          // exact Jaccard only over candidate MEMBERS — the pair set after
          // LSH is a small fraction of the batch, so the verify join is
          // batch-bounded, not batch².
          val members = candidates.select(col("id1").as("doc_id"))
            .unionByName(candidates.select(col("id2").as("doc_id"))).distinct()
          val verified = Dedup.ngramJaccardPairs(
            unique.join(members, Seq("doc_id"), "left_semi"),
            "doc_id", "text", threshold = tau)
          candidates.join(verified.select("id1", "id2"), Seq("id1", "id2"), "left_semi")
            .persist()
      }
      if (!(pairs eq candidates)) retained += pairs
      val nConfPairs = if (pairs eq candidates) nCandPairs else pairs.count()
      val nearKeep = Dedup.nearDupClusters(unique.select("doc_id"), pairs)
        .where(col("doc_id") === col("cluster_id")).select("doc_id")
      val uniqueNear = unique.join(nearKeep, Seq("doc_id"), "left_semi")

      // history checks ride the sidecars — each gated on its OWN existence
      // (absent on the first batch; individually absent after a mid-append
      // crash, where the absorb degrades instead of failing)
      val fps = if (Hfs.exists(spark, s"$dir/_fingerprints"))
        Some(spark.read.parquet(s"$dir/_fingerprints")) else None
      // id key check first: an already-absorbed doc_id never re-enters,
      // even re-crawled with changed text (first-wins)
      val afterIds = fps.fold(uniqueNear)(f =>
        uniqueNear.join(f.select("doc_id"), Seq("doc_id"), "left_anti"))
      val afterExact = fps.fold(afterIds)(f =>
        afterIds.join(f, md5(afterIds("text")) === f("fp"), "left_anti"))
      var nHistCollisions = 0L
      var nHistWeak = 0L
      val afterNear = if (!Hfs.exists(spark, s"$dir/_bandidx")) afterExact
        else {
          val batchBanded = Dedup.bandedBuckets(
            sigs.join(afterExact.select("doc_id"), Seq("doc_id"), "left_semi"),
            "doc_id")
          val refBanded = spark.read.parquet(s"$dir/_bandidx")
          // the band-agreement estimate is computed for EVERY collision —
          // same (band, bucket) equi-join as the unverified check plus one
          // pair-grain aggregate (the d12 estimator) — so the report can
          // surface collisions-vs-weak even when verification is off and
          // all collisions drop (the conservative default, semantics
          // unchanged). Persisted: collision-doc-bounded, read three times.
          val agreement = Dedup.minhashBandAgreement(batchBanded, refBanded, "doc_id")
            .groupBy("doc_id").agg(max("est_jaccard").as("_max_est"))
            .persist()
          retained += agreement
          nHistCollisions = agreement.count()
          nHistWeak = agreement
            .where(col("_max_est") < verifyTau.getOrElse(WeakCollisionTau)).count()
          val collided = (verifyTau match {
            case None => agreement
            case Some(tau) => agreement.where(col("_max_est") >= tau)
          }).select("doc_id")
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
        val nAfterIds = if (fps.isEmpty) nUniqueNear else afterIds.count()
        val nAfterExact = if (fps.isEmpty) nAfterIds else afterExact.count()
        val nAfterNear =
          if (afterNear eq afterExact) nAfterExact else afterNear.count()
        val nAppended = survivors.count()

        if (nAppended > 0) {
          survivors.write.mode("append").parquet(s"$dir/docs")
          survivors.select(md5(col("text")).as("fp"), col("doc_id"))
            .write.mode("append").parquet(s"$dir/_fingerprints")
          Dedup.writeMinhashBandIndex(
            Dedup.bandedBuckets(
              Dedup.minhashSignatures(survivors, "doc_id", "text"), "doc_id"),
            s"$dir/_bandidx", append = Hfs.exists(spark, s"$dir/_bandidx"))
        }
        BatchReport(
          ingested = nIngested, quarantined = nQuarantined,
          withinBatchDups = nIngested - nUnique,
          withinBatchNearDups = nUnique - nUniqueNear,
          idCollisions = nUniqueNear - nAfterIds,
          historyDups = nAfterIds - nAfterExact,
          nearDups = nAfterExact - nAfterNear,
          qualityRejected = nAfterNear - nAppended,
          appended = nAppended,
          withinBatchCandidatePairs = nCandPairs,
          withinBatchConfirmedPairs = nConfPairs,
          historyCollisions = nHistCollisions,
          historyWeakCollisions = nHistWeak)
      } finally { survivors.unpersist(); () }
    } finally {
      docs.unpersist()
      retained.foreach(_.unpersist())
      ()
    }
  }

  /** Recompute both sidecars from `docs/` — the crash repair (and the
    * migration path for a corpus accumulated before the sidecars, or before
    * the fingerprint sidecar carried doc_id). One corpus scan; after it,
    * [[absorbBatch]] is O(batch) again.
    */
  def rebuildSidecars(spark: SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/docs")
    docs.select(md5(col("text")).as("fp"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/_fingerprints")
    Dedup.writeMinhashBandIndex(
      Dedup.bandedBuckets(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id"),
      s"$dir/_bandidx")
  }
}
