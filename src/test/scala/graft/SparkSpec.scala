package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run — Spark startup dominates
  * suite time otherwise.
  *
  * SEQUENTIAL-EXECUTION DEPENDENCY: some suites (PropertySpec, BlkCorpusSpec)
  * route the chain operators through their above-envelope paths by mutating
  * the JVM-global `graft.broadcastMaxRows` system property around a call.
  * That is safe only because `Test / fork` is on and forked suites run
  * sequentially in one JVM — enabling `testForkedParallel` or in-process
  * parallel suites would race the property and silently change which route
  * each test exercises. If parallel tests ever become worth it, replace the
  * property with an explicit envelope parameter threaded into
  * BestChain/ChainOps first.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Graceful-stop tests wait on QueryIdleEvent, which is throttled to
      // every 10s by default — 1s keeps boundary-stop latency out of the
      // suite wall time without changing semantics.
      .config("spark.sql.streaming.noDataProgressEventInterval", "1s")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's union partitioning propagation plans SMJ over a 2N-partition
      // union as exchange-free against an N-partition side -> runtime zip
      // failure (observed on the fused addressStats). Disable everywhere.
      .config("spark.sql.unionOutputPartitioning", "false")
      // Bucket-aligned gold joins cluster on a SUBSET of the join keys
      // (tx_hash buckets, (tx_hash, address) joins); allow that co-partition.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark

  // Suite-wide codegen gate (r18 judge finding): a janino compile error makes
  // Spark silently fall back to interpreted eval — correct results, dead
  // performance, and nothing else in the suite would ever notice. The
  // tripwire counts the ERROR log events; any suite that trips one fails in
  // afterAll with the first offending message. Delta-based so one tripped
  // suite doesn't cascade failures into every suite after it.
  private var codegenHitsBefore = 0

  override protected def beforeAll(): Unit = {
    CodegenTripwire.install()
    codegenHitsBefore = CodegenTripwire.hits
    super.beforeAll()
  }

  override protected def afterAll(): Unit = {
    super.afterAll()
    val delta = CodegenTripwire.hits - codegenHitsBefore
    assert(delta == 0,
      s"codegen tripwire: $delta 'Failed to compile the generated Java code' " +
        s"error(s) during this suite — a stage silently fell back to " +
        s"interpreted eval. First: ${CodegenTripwire.firstHit.getOrElse("?")}")
  }
}
