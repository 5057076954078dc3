package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming form of the curation front of [[graft.queries.Pipeline]]'s p0:
  * quality-gate then exact-dedup an UNBOUNDED document stream — the
  * incremental-ingestion shape (a crawl frontier keeps emitting documents;
  * downstream training-data consumers see each distinct content exactly
  * once, already filtered) rather than the batch corpus-freeze shape.
  *
  * Order matters for state: the quality gate runs BEFORE dedup, so junk
  * documents never enter the state store. Dedup keys on the NORMALIZED
  * content fingerprint ([[TextOps.fingerprint]]: lowercase, whitespace
  * collapse — noisy re-crawls of the same page collapse), with watermarked
  * state: one fingerprint per in-watermark doc, hash-partitioned across
  * executors — 1B docs in the window is a bigger state store, not a bigger
  * driver. Re-emission past the watermark is the documented trade for
  * bounded state; compose with a periodic batch [[TextOps.spanDedup]] /
  * d1-style freeze for corpus-lifetime exactness.
  */
object CurationStream {

  def curated(
      docs: DataFrame, tsCol: String, delay: String,
      textCol: String = "text",
      minTokens: Int = 5, maxPunctRatio: Double = 0.2,
      classifierModel: Option[String] = None): DataFrame = {
    val nTok = size(TextOps.tokens(col(textCol)))
    val nChars = length(col(textCol))
    val nPunct = nChars - length(regexp_replace(col(textCol), "[\\p{Punct}]", ""))
    // Optional model-based gate on top of the heuristics: the hashed-linear
    // classifier score is a pure per-row map — stateless, so it streams
    // unchanged; it too runs BEFORE dedup state, keeping junk out of the
    // store. Same integer-weight determinism as the batch t14 operator.
    val classOk = classifierModel.fold(lit(true)) { name =>
      TextOps.classifierScoreExpr(col(textCol), name) > 0L
    }
    docs
      .where(nTok >= minTokens &&
        (nPunct.cast("double") / nChars.cast("double")) <= maxPunctRatio &&
        classOk)
      .withColumn("_fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("_fp"))
      .drop("_fp")
  }
}
