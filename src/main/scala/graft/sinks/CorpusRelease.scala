package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Sampling

/** Reproducible corpus release — the artifact boundary of a training-data
  * freeze (p2/p3 compute WHAT ships; this sink makes shipping VERIFIABLE).
  * Writes the corpus in [[Sampling.shardAssign]]'s deterministic shard
  * layout and a `_MANIFEST.json` carrying, per shard and globally, the row
  * count and an ORDER-INDEPENDENT content digest any engine can recompute:
  * digest = Σ md5₆₀(row-json) summed exactly in DECIMAL(38,0), reduced mod
  * 2⁶⁰. Commutative addition makes the digest independent of partitioning,
  * task order and file layout — the same logical rows always produce the
  * same manifest, so "did the release change?" is a byte compare of two
  * small JSON files and "is this copy intact?" is [[verify]].
  *
  * Commit protocol: shard data is written FIRST, the manifest LAST — the
  * manifest's presence is the release's commit marker (readers treat a dir
  * without `_MANIFEST.json` as in-progress; object stores without atomic
  * rename get the same safety). Re-releasing the same rows is idempotent:
  * same shards, same digest, byte-identical manifest.
  *
  * Scale shape: shard assignment is a narrow pmod projection; the digest
  * is one map-side-partial aggregate over (shard); the write is one
  * partitioned parquet job. Nothing driver-side but the kilobyte manifest.
  */
object CorpusRelease {

  private val Mod = java.math.BigDecimal.valueOf(Sampling.KeySpace) // 2^60

  /** 60-bit md5 digest of a row's canonical JSON form (schema-ordered). */
  private def rowDigest(df: DataFrame) =
    conv(substring(md5(to_json(struct(df.columns.map(col).toIndexedSeq: _*))), 1, 15), 16, 10)
      .cast(DecimalType(38, 0))

  /** Write `df` to `dir` as a `numShards`-way deterministic release. */
  def write(df: DataFrame, dir: String, idCol: String, numShards: Int): Unit = {
    val digest = rowDigest(df)
    val sharded = Sampling.shardAssign(df, idCol, numShards)
    sharded.write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(dir)
    // stats from the WRITTEN files, not the input plan: the manifest attests
    // what is on disk, and a nondeterministic input (that contract violation
    // is exactly what verify must catch) would otherwise self-certify
    val stats = sharded.sparkSession.read.parquet(dir)
      .groupBy(col("shard").cast("long").as("shard")) // partition col reads back int
      .agg(count(lit(1)).as("rows"),
        (sum(digest) % Mod).cast("long").as("digest"))
      .orderBy("shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = stats.map(_._2).sum
    val global = stats.map(s => BigInt(s._3)).sum.mod(BigInt(Sampling.KeySpace)).toLong
    val json = new StringBuilder()
      .append("{\"total_rows\":").append(total)
      .append(",\"digest\":").append(global)
      .append(",\"num_shards\":").append(numShards)
      .append(",\"shards\":[")
      .append(stats.map { case (s, n, d) =>
        s"""{"shard":$s,"rows":$n,"digest":$d}"""
      }.mkString(","))
      .append("]}").toString()
    Hfs.writeText(sharded.sparkSession, s"$dir/_MANIFEST.json", json)
  }

  /** Recompute the per-shard stats from the parquet files and compare with
    * the manifest. True iff every shard's count and digest match — a full
    * integrity check of the release copy (bit rot, partial copy, tamper).
    */
  def verify(spark: SparkSession, dir: String): Boolean = {
    val manifest = Hfs.readText(spark, s"$dir/_MANIFEST.json") match {
      case None => return false // uncommitted release
      case Some(m) => m
    }
    val data = spark.read.parquet(dir)
    val payload = data.drop("shard")
    val digest = conv(substring(md5(to_json(
        struct(payload.columns.map(col).toIndexedSeq: _*))), 1, 15), 16, 10)
      .cast(DecimalType(38, 0))
    val stats = data
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("rows"), (sum(digest) % Mod).cast("long").as("digest"))
      .orderBy("shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    stats.forall { case (s, n, d) =>
      manifest.contains(s"""{"shard":$s,"rows":$n,"digest":$d}""")
    } && {
      val total = stats.map(_._2).sum
      val global = stats.map(x => BigInt(x._3)).sum.mod(BigInt(Sampling.KeySpace)).toLong
      manifest.startsWith(s"""{"total_rows":$total,"digest":$global,""")
    }
  }
}
