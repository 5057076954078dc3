package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sinks.{CorpusRelease, RollingCuration}

class RollingCurationSpec extends SparkSpec {

  private def writeJsonl(lines: Seq[String]): String = {
    val p = Files.createTempFile("graft-crawl", ".jsonl")
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("rolling curation: batches absorb O(batch); replay appends nothing; freeze verifies") {
    val dir = Files.createTempDirectory("graft-rolling").toString

    // batch 1 into an empty corpus: a within-batch exact dup, a
    // within-batch NEAR-dup (doc 5 vs doc 2, one word changed — min id 2
    // kept), a quality reject, a quarantine line
    val batch1 = writeJsonl(Seq(
      """{"doc_id":1,"text":"alpha beta gamma delta epsilon zeta","lang":"en","source":"a"}""",
      """{"doc_id":2,"text":"the quick brown fox jumps over the lazy sleeping dog tonight","lang":"en","source":"a"}""",
      """{"doc_id":3,"text":"alpha beta gamma delta epsilon zeta","lang":"en","source":"b"}""",
      """{"doc_id":4,"text":"bad!!!! ????","lang":"en","source":"b"}""",
      """{"doc_id":5,"text":"the quick brown fox jumps over the lazy sleeping dog forever","lang":"en","source":"b"}""",
      """this line is not json at all"""))
    val r1 = RollingCuration.absorbBatch(spark, batch1, dir)
    assert(r1 == RollingCuration.BatchReport(
      ingested = 5, quarantined = 1, withinBatchDups = 1,
      withinBatchNearDups = 1, idCollisions = 0, historyDups = 0,
      nearDups = 0, qualityRejected = 1, appended = 2,
      withinBatchCandidatePairs = 1, withinBatchConfirmedPairs = 1))

    // batch 2: an exact re-crawl of doc 1, a near-dup of doc 2 (one word
    // changed), and one fresh doc — only the fresh doc lands
    val batch2 = writeJsonl(Seq(
      """{"doc_id":10,"text":"alpha beta gamma delta epsilon zeta","lang":"en","source":"c"}""",
      """{"doc_id":11,"text":"the quick brown fox jumps over the lazy sleeping dog today","lang":"en","source":"c"}""",
      """{"doc_id":12,"text":"completely novel content about seven shiny green bottles standing","lang":"en","source":"c"}"""))
    val r2 = RollingCuration.absorbBatch(spark, batch2, dir)
    assert(r2.copy(historyWeakCollisions = 0) == RollingCuration.BatchReport(
      ingested = 3, quarantined = 0, withinBatchDups = 0,
      withinBatchNearDups = 0, idCollisions = 0, historyDups = 1,
      nearDups = 1, qualityRejected = 0, appended = 1,
      historyCollisions = 1))

    // replay of batch 2 (the crash-recovery path): its survivor is now an
    // exact duplicate of what the first run appended — nothing lands. The
    // replayed id 12 is caught by the id-key check, the replayed content of
    // 10 by the fingerprint check, 11 by the band index.
    val r2b = RollingCuration.absorbBatch(spark, batch2, dir)
    assert(r2b.appended == 0 && r2b.idCollisions == 1
      && r2b.historyDups == 1 && r2b.nearDups == 1)

    // accumulated corpus = docs 1, 2, 12
    val ids = spark.read.parquet(s"$dir/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 12L))

    // periodic freeze over the rolling corpus attests and verifies
    val freezeDir = Files.createTempDirectory("graft-freeze").toString
    CorpusRelease.write(spark.read.parquet(s"$dir/docs"), freezeDir, "doc_id", 2)
    assert(CorpusRelease.verify(spark, freezeDir))

    // sidecar repair: rebuild from docs/, then the replay still appends
    // nothing (sidecars regained the full history)
    RollingCuration.rebuildSidecars(spark, dir)
    val r2c = RollingCuration.absorbBatch(spark, batch2, dir)
    assert(r2c.appended == 0)
    assert(Files.exists(Paths.get(dir, "_fingerprints"))
      && Files.exists(Paths.get(dir, "_bandidx")))
  }

  test("doc_id is a key: a re-crawl under an absorbed id with CHANGED text is dropped (first-wins)") {
    val dir = Files.createTempDirectory("graft-rolling-idkey").toString
    val original = "the original crawl of this page had exactly these ten words"
    RollingCuration.absorbBatch(spark, writeJsonl(Seq(
      s"""{"doc_id":1,"text":"$original","lang":"en","source":"a"}""")), dir)
    // same id, mutated content — fresh by fingerprint, caught by the id key
    val r = RollingCuration.absorbBatch(spark, writeJsonl(Seq(
      """{"doc_id":1,"text":"a later recrawl rewrote the page into something entirely new here","lang":"en","source":"a"}""")), dir)
    assert(r == RollingCuration.BatchReport(
      ingested = 1, quarantined = 0, withinBatchDups = 0,
      withinBatchNearDups = 0, idCollisions = 1, historyDups = 0,
      nearDups = 0, qualityRejected = 0, appended = 0))
    val rows = spark.read.parquet(s"$dir/docs").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("text") == original)
  }

  test("verifyTau: false-positive band collisions survive; true near-dups still drop") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.{col, lit}
    // ~40-word base doc: long enough that a one-word edit keeps most bands
    // agreeing (est Jaccard near 1), while the verify threshold sits far
    // below it and far above a one-band accident's 0.59 estimate.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    def seeded(): String = {
      val d = Files.createTempDirectory("graft-rolling-verify").toString
      RollingCuration.absorbBatch(spark, writeJsonl(Seq(
        s"""{"doc_id":1,"text":"$base","lang":"en","source":"a"}""")), d)
      d
    }
    val dirPlain = seeded()
    val dirVerify = seeded()

    // the incoming fresh doc, dissimilar to everything absorbed
    val freshText = "completely unrelated prose about nine silver teapots gleaming quietly on the windowsill"
    val freshBatch = writeJsonl(Seq(
      s"""{"doc_id":50,"text":"$freshText","lang":"en","source":"b"}"""))
    // fabricate the false positive: hand the band index a row whose (band,
    // bucket) equals the fresh doc's band 0 — the accidental single-band
    // collision a 64-bit bucket hash can produce but a test cannot wait for
    import spark.implicits._
    val freshDf = Seq((50L, freshText)).toDF("doc_id", "text")
    val fakeRow = Dedup.bandedBuckets(
        Dedup.minhashSignatures(freshDf, "doc_id", "text"), "doc_id")
      .where(col("band") === 0)
      .select(lit(999L).as("doc_id"), col("band"), col("bucket"))
    for (d <- Seq(dirPlain, dirVerify))
      fakeRow.write.mode("append").parquet(s"$d/_bandidx")

    // conservative default: the collision alone discards the fresh doc —
    // and the report now SHOWS the over-drop: 1 collision, 1 weak (its best
    // band-agreement estimate 0.59 sits below WeakCollisionTau)
    val rPlain = RollingCuration.absorbBatch(spark, freshBatch, dirPlain)
    assert(rPlain.nearDups == 1 && rPlain.appended == 0)
    assert(rPlain.historyCollisions == 1 && rPlain.historyWeakCollisions == 1)
    // verified: one agreeing band estimates Ĵ=(1/8)^(1/4)≈0.59 < 0.7 — the
    // fresh doc survives the accident
    val rVerify = RollingCuration.absorbBatch(spark, freshBatch, dirVerify,
      verifyTau = Some(0.7))
    assert(rVerify.nearDups == 0 && rVerify.appended == 1)
    assert(rVerify.historyCollisions == 1 && rVerify.historyWeakCollisions == 1)

    // a TRUE near-dup of history (one word appended to the 40-word base)
    // agrees on nearly all bands — estimated Jaccard ≈1 ≥ tau, still dropped
    val nearBatch = writeJsonl(Seq(
      s"""{"doc_id":60,"text":"$base extra","lang":"en","source":"b"}"""))
    val rNear = RollingCuration.absorbBatch(spark, nearBatch, dirVerify,
      verifyTau = Some(0.7))
    assert(rNear.nearDups == 1 && rNear.appended == 0)
    assert(rNear.historyCollisions == 1 && rNear.historyWeakCollisions == 0)

    // WITHIN-batch verification: two genuinely near-identical docs (on a
    // base unrelated to history) collapse to the min id even under verify
    // (exact Jaccard confirms them), while a dissimilar doc is never a
    // candidate at all
    val base2 = (1 to 40).map(i => s"v$i").mkString(" ")
    val withinBatch = writeJsonl(Seq(
      s"""{"doc_id":70,"text":"$base2 trailing","lang":"en","source":"c"}""",
      s"""{"doc_id":71,"text":"$base2 trailer","lang":"en","source":"c"}""",
      """{"doc_id":72,"text":"an utterly distinct sentence describing four calm mountain lakes at dawn","lang":"en","source":"c"}"""))
    val rWithin = RollingCuration.absorbBatch(spark, withinBatch, dirVerify,
      verifyTau = Some(0.7))
    assert(rWithin.withinBatchNearDups == 1 && rWithin.appended == 2)
    val kept = spark.read.parquet(s"$dirVerify/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(70L) && !kept.contains(71L) && kept.contains(72L))
  }
}
