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
      withinBatchNearDups = 1, historyDups = 0, nearDups = 0,
      qualityRejected = 1, appended = 2))

    // batch 2: an exact re-crawl of doc 1, a near-dup of doc 2 (one word
    // changed), and one fresh doc — only the fresh doc lands
    val batch2 = writeJsonl(Seq(
      """{"doc_id":10,"text":"alpha beta gamma delta epsilon zeta","lang":"en","source":"c"}""",
      """{"doc_id":11,"text":"the quick brown fox jumps over the lazy sleeping dog today","lang":"en","source":"c"}""",
      """{"doc_id":12,"text":"completely novel content about seven shiny green bottles standing","lang":"en","source":"c"}"""))
    val r2 = RollingCuration.absorbBatch(spark, batch2, dir)
    assert(r2 == RollingCuration.BatchReport(
      ingested = 3, quarantined = 0, withinBatchDups = 0,
      withinBatchNearDups = 0, historyDups = 1, nearDups = 1,
      qualityRejected = 0, appended = 1))

    // replay of batch 2 (the crash-recovery path): its survivor is now an
    // exact duplicate of what the first run appended — nothing lands
    val r2b = RollingCuration.absorbBatch(spark, batch2, dir)
    assert(r2b.appended == 0 && r2b.historyDups == 2 && r2b.nearDups == 1)

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
}
