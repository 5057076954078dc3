package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document-corpus source — the ingestion front of the curation
  * pipeline (crawl dumps arrive as newline-delimited JSON). Parses against
  * an explicit schema contract and splits the parsed lines into two
  * outputs: well-formed rows become typed documents; every rejected line
  * (broken JSON, missing/non-integral `doc_id`) lands in a QUARANTINE with
  * its raw text instead of silently dropping or failing the job — at
  * 100 TB a crawl dump always contains garbage, and the quarantine is the
  * audit trail a curation run has to produce.
  *
  * Scale shape: newline-delimited text splits natively (one task per file
  * split, no record spans a boundary the reader can't heal), `from_json`
  * runs inside whole-stage codegen, and each output is a narrow projection
  * — no shuffle anywhere. The two outputs are independent PLANS over the
  * same file: a run that materializes both executes the scan+parse twice;
  * to pay it once, either consume just one side or have the caller
  * `persist()` a `(value, j)` projection and derive both from it — the
  * split itself deliberately stays lazy so the common single-output case
  * carries no cache. The acceptance predicate is deliberately
  * `doc_id IS NOT NULL` after a PERMISSIVE parse: it is total (malformed
  * JSON, absent key, and type-violating key all null the field) and an
  * external SQL oracle reproduces it exactly.
  */
object DocSource {

  /** The document schema contract: id + content + routing metadata. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Two outputs over one file: (documents, quarantine(raw)). */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parsed = spark.read.textFile(path).toDF("value")
      .select(col("value"), from_json(col("value"), schema).as("j"))
    val good = parsed.where(col("j.doc_id").isNotNull).select("j.*")
    val bad = parsed.where(col("j.doc_id").isNull).select(col("value").as("raw"))
    (good, bad)
  }
}
