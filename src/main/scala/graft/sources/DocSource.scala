package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document-corpus source — the ingestion front of the curation
  * pipeline (crawl dumps arrive as newline-delimited JSON). Parses against
  * an explicit schema contract and splits ONE scan into two outputs:
  * well-formed rows become typed documents; every rejected line (broken
  * JSON, missing/non-integral `doc_id`) lands in a QUARANTINE with its raw
  * text instead of silently dropping or failing the job — at 100 TB a
  * crawl dump always contains garbage, and the quarantine is the audit
  * trail a curation run has to produce.
  *
  * Scale shape: newline-delimited text splits natively (one task per file
  * split, no record spans a boundary the reader can't heal), `from_json`
  * runs inside whole-stage codegen, and both outputs are narrow
  * projections of the same scan — no shuffle anywhere. The acceptance
  * predicate is deliberately `doc_id IS NOT NULL` after a PERMISSIVE
  * parse: it is total (malformed JSON, absent key, and type-violating key
  * all null the field) and an external SQL oracle reproduces it exactly.
  */
object DocSource {

  /** The document schema contract: id + content + routing metadata. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** One scan, two outputs: (documents, quarantine(raw)). */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parsed = spark.read.textFile(path).toDF("value")
      .select(col("value"), from_json(col("value"), schema).as("j"))
    val good = parsed.where(col("j.doc_id").isNotNull).select("j.*")
    val bad = parsed.where(col("j.doc_id").isNull).select(col("value").as("raw"))
    (good, bad)
  }
}
