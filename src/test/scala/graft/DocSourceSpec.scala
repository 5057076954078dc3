package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.sources.DocSource

/** JSONL ingestion contract: one scan, two outputs — typed documents and a
  * raw-line quarantine; acceptance is exactly "doc_id parses".
  */
class DocSourceSpec extends SparkSpec {

  private def writeFixture(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("docsource")
    val f = dir.resolve("in.jsonl")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("good rows typed, junk rows quarantined verbatim, nothing lost") {
    val lines = Seq(
      """{"doc_id":1,"text":"alpha","lang":"en","source":"s1"}""",
      """{"doc_id":2,"text":"beta","lang":"de","source":"s2","extra":"ignored"}""",
      """{"doc_id":3,"lang":"zh"}""", // missing text is fine: text is nullable
      """{"doc_id":""", // truncated JSON
      "", // blank line (mid-file: a trailing one is not a line at all)
      """{"text":"no id"}""", // missing doc_id
      """{"doc_id":"x","text":"bad id type"}""") // non-integral doc_id
    val (docs, quarantine) = DocSource.readJsonl(spark, writeFixture(lines))
    val got = docs.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(got == Set(
      (1L, Some("alpha"), "en"), (2L, Some("beta"), "de"), (3L, None, "zh")))
    val bad = quarantine.collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"doc_id":""", """{"text":"no id"}""",
      """{"doc_id":"x","text":"bad id type"}""", ""))
    // conservation: every input line lands in exactly one output
    assert(docs.count() + quarantine.count() == lines.length)
  }

  test("both outputs are narrow projections of the scan — no exchange") {
    val path = writeFixture(Seq("""{"doc_id":1,"text":"a","lang":"en","source":"s"}"""))
    val (docs, quarantine) = DocSource.readJsonl(spark, path)
    Seq(docs, quarantine).foreach { df =>
      val plan = df.queryExecution.explainString(FormattedMode)
      assert(!plan.contains("Exchange"), plan)
    }
  }
}
