package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Codegen tripwire (r18 judge finding): count "Failed to compile the
    // generated Java code" errors — silent interpreted fallback must surface
    // in this driver's log and artifacts, not only in a hand-grep.
    CodegenTripwire.install()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 otherwise
      // rejects; read as nanosecond longs (queries compute in microseconds
      // to line up with DuckDB's ns->us truncation).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's union partitioning propagation plans SMJ over a 2N-partition
      // union as exchange-free against an N-partition side -> runtime zip
      // failure (observed on the fused addressStats). Disable everywhere.
      .config("spark.sql.unionOutputPartitioning", "false")
      // Bucket-aligned gold joins cluster on a SUBSET of the join keys
      // (tx_hash buckets, (tx_hash, address) joins); allow that co-partition.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-loop subset (unset in the driver's run): dump + emit oracles for
    // a comma-separated list of query names only.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        // same cold-cache boundary as Bench: 107 queries in one session
        // would otherwise accumulate every operator's retained register
        Graft.releaseCaches()
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // Measured recall for the approximate ANN queries (the rows-only gate
    // says nothing about their quality): recall_vs_bruteforce per query +
    // its spec-gated floor, written next to the dumps AND to target/ so the
    // number survives even when the driver keeps only its own outDir.
    val recalls = RecallAudit.checks.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if selected(name) =>
        try Some(name -> fn(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[verify] recall $name failed: ${e.getMessage}"); None
        }
      case _ => None
    }
    if (recalls.nonEmpty) {
      val recallJson = recalls.map { case (n, r) =>
        f""""$n": {"recall_vs_bruteforce": $r%.4f, "floor": ${RecallAudit.floors(n)}%.2f, "pass": ${r >= RecallAudit.floors(n)}}"""
      }.mkString("{", ", ", "}")
      Files.writeString(Paths.get(s"$outDir/recall.json"), recallJson)
      Files.createDirectories(Paths.get("target"))
      Files.writeString(Paths.get("target/recall.json"), recallJson)
      println(s"[verify] recall: $recallJson")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Codegen gate, reported AFTER all dumps are written so a trip can never
    // zero the round's correctness artifacts — but loud and machine-readable
    // (target/codegen.rc: 0 clean, 3 tripped; same file-rc contract as
    // bench.rc). Zero is the standing invariant: the r18 collision fired 4×
    // in a full suite run before the fresh-name fixes.
    val codegenErrors = CodegenTripwire.hits
    try {
      Files.createDirectories(Paths.get("target"))
      Files.writeString(Paths.get("target/codegen.rc"),
        (if (codegenErrors == 0) "0" else "3") + "\n")
    } catch { case _: Throwable => () }
    if (codegenErrors > 0)
      println(s"[verify] ERROR: codegen tripwire — $codegenErrors 'Failed to " +
        s"compile the generated Java code' error(s); stage(s) ran interpreted. " +
        s"First: ${CodegenTripwire.firstHit.getOrElse("?")}")
    spark.stop()
  }
}
