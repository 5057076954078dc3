package graft

import java.nio.file.{Files, Paths}

import graft.sinks.CorpusRelease

/** Release-artifact contract: deterministic shard layout + a manifest whose
  * order-independent digests make a release comparable and verifiable.
  */
class CorpusReleaseSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"doc body $i", s"lang${i % 3}"))
      .toDF("doc_id", "text", "lang")
  }

  test("write → verify round-trip; re-release is byte-identical; layout-independent") {
    val dir = Files.createTempDirectory("release").toString
    CorpusRelease.write(docs(97), dir, "doc_id", numShards = 4)
    assert(Files.exists(Paths.get(dir, "_MANIFEST.json")))
    assert(CorpusRelease.verify(spark, dir))
    val first = Files.readAllBytes(Paths.get(dir, "_MANIFEST.json"))
    // same logical rows, different physical partitioning -> same manifest
    CorpusRelease.write(docs(97).repartition(7), dir, "doc_id", numShards = 4)
    val second = Files.readAllBytes(Paths.get(dir, "_MANIFEST.json"))
    assert(java.util.Arrays.equals(first, second),
      "digest must be independent of input partitioning and task order")
    assert(CorpusRelease.verify(spark, dir))
  }

  test("a changed corpus changes the digest; a damaged copy fails verify") {
    val dir = Files.createTempDirectory("release2").toString
    CorpusRelease.write(docs(50), dir, "doc_id", numShards = 2)
    val m1 = new String(Files.readAllBytes(Paths.get(dir, "_MANIFEST.json")))
    CorpusRelease.write(docs(51), dir, "doc_id", numShards = 2)
    val m2 = new String(Files.readAllBytes(Paths.get(dir, "_MANIFEST.json")))
    assert(m1 != m2, "one extra row must change the manifest")
    // damage the copy: drop one shard's data files -> verify must fail
    CorpusRelease.write(docs(50), dir, "doc_id", numShards = 2)
    val shardDir = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.contains("shard=")).head
    val f = Files.list(Paths.get(shardDir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.delete(Paths.get(f))
    assert(!CorpusRelease.verify(spark, dir), "missing data must fail verify")
  }

  test("a directory without a manifest is an uncommitted release") {
    val dir = Files.createTempDirectory("release3").toString
    assert(!CorpusRelease.verify(spark, dir.toString))
  }
}
