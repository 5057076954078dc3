package graft

import java.nio.file.{Files, Paths}

import graft.sinks.{CorpusRelease, Hfs, RollingCuration}

/** The sinks' kilobyte control files (manifests, sidecar markers, GraphML
  * header/footer) must resolve through the Hadoop `FileSystem` API — the
  * same resolver Spark's own writes use — so a scheme-qualified output
  * directory keeps the whole artifact on one store. These tests drive the
  * helpers and one full sink through an explicit `file:` URI: a path shape
  * `java.nio.file.Paths.get` cannot open, so a regression back to local-only
  * I/O fails here instead of silently splitting artifacts on HDFS/S3.
  */
class HfsSpec extends SparkSpec {

  test("writeText/readText/exists round-trip through a scheme-qualified URI") {
    val dir = Files.createTempDirectory("hfs").toString
    val uri = s"file:$dir/nested/marker.txt" // nested: create must mkdir parents
    assert(!Hfs.exists(spark, uri))
    Hfs.writeText(spark, uri, "v1\n")
    assert(Hfs.exists(spark, uri))
    assert(Hfs.readText(spark, uri).contains("v1\n"))
    Hfs.writeText(spark, uri, "v2\n") // overwrite, not append
    assert(Hfs.readText(spark, uri).contains("v2\n"))
    assert(Hfs.readText(spark, s"file:$dir/absent").isEmpty)
    // the control file landed where the URI says, not CWD-relative
    assert(Files.exists(Paths.get(s"$dir/nested/marker.txt")))
  }

  test("CorpusRelease commits and verifies under a file:-scheme directory") {
    import spark.implicits._
    val dir = s"file:${Files.createTempDirectory("hfs_release")}/rel"
    val docs = (0 until 40).map(i => (i.toLong, s"body $i")).toDF("doc_id", "text")
    CorpusRelease.write(docs, dir, "doc_id", numShards = 2)
    assert(Hfs.exists(spark, s"$dir/_MANIFEST.json"), "manifest must land in the release dir")
    assert(CorpusRelease.verify(spark, dir))
  }

  test("RollingCuration sidecar probes see a file:-scheme corpus across batches") {
    val dir = s"file:${Files.createTempDirectory("hfs_roll")}/corpus"
    def jsonl(ids: Range): String = {
      val p = Files.createTempFile("hfs-crawl", ".jsonl")
      Files.write(p, ids.map(i =>
        s"""{"doc_id":$i,"text":"a perfectly ordinary document body number $i with plenty of words","lang":"en","source":"s"}""")
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      p.toString
    }
    val r1 = RollingCuration.absorbBatch(spark, jsonl(0 until 20), dir)
    assert(r1.appended > 0)
    // the replay must SEE the first batch's sidecars through the URI:
    // replayed ids are id-collisions (not silent re-appends), and the band
    // index must take the append branch (probe returns true)
    val r2 = RollingCuration.absorbBatch(spark, jsonl(0 until 20), dir)
    assert(r2.appended == 0, s"replayed batch must not re-append (got $r2)")
    assert(r2.idCollisions == r1.appended,
      s"history sidecars invisible through the scheme-qualified path (got $r2)")
  }
}
