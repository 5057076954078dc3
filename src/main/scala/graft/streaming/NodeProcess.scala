package graft.streaming

import java.io.{BufferedReader, BufferedWriter, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Node-subprocess lifecycle — the ops glue around the reference's
  * `synchronizeDatabase` loop (BlockchainToGraph.java:119–165: spawn
  * `bitcoind`, read its stdout line-by-line on the driver, `destroy()` on
  * exit, `waitFor` at stream end).
  *
  * The Spark-first shape deliberately differs: the reference PARSES inside
  * the driver-side read loop, single-threaded, so ingest is bounded by one
  * thread's regex throughput. Here the subprocess's stdout is only PUMPED to
  * rolling immutable log files (cheap byte copy, no parsing), and parsing
  * happens in a Structured Streaming file source over those files
  * ([[tipEvents]] → [[ChainStream.parseUpdateTips]], fully codegen'd and
  * parallel across executors). The file-source checkpoint is the resume
  * cursor — kill the session mid-stream and the next one continues from the
  * last committed file, which the reference re-derives by walking from
  * genesis (BlockchainToGraph.java:38–49).
  *
  * Files roll by line count and are made visible ATOMICALLY (written as
  * `.inprogress`, renamed on roll): a file source must never observe a
  * half-written file, because files are read exactly once per name.
  */
object NodeProcess {

  final class NodeHandle private[streaming] (
      proc: Process, pump: Thread, exitCodeRef: AtomicInteger) {

    def isAlive: Boolean = proc.isAlive

    /** Exit code, if the process has exited AND the pump drained stdout. */
    def exitCode: Option[Int] = {
      val c = exitCodeRef.get()
      if (c == Int.MinValue) None else Some(c)
    }

    /** Block until the process exits on its own and its logs are fully
      * published (pump drained), or the deadline passes.
      */
    def awaitExit(timeoutMs: Long): Option[Int] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (exitCode.isEmpty && System.nanoTime() < deadline) Thread.sleep(25)
      exitCode
    }

    /** Graceful shutdown, the reference's `p.destroy()` with an actual
      * contract: SIGTERM, wait up to `graceMs` for the node to flush and
      * exit, only then SIGKILL. Returns the exit code. Idempotent — stopping
      * an exited process just joins the pump.
      */
    def stop(graceMs: Long = 10000): Int = {
      if (proc.isAlive) {
        proc.destroy()
        if (!proc.waitFor(graceMs, java.util.concurrent.TimeUnit.MILLISECONDS))
          proc.destroyForcibly()
      }
      proc.waitFor()
      pump.join(graceMs)
      // publish the exit code ONLY once the pump has drained — exitCode's
      // contract is "process exited AND logs fully published"; a pump still
      // blocked (an orphaned grandchild holding the pipe) must keep
      // exitCode None so callers don't drain a snapshot missing the tail
      if (!pump.isAlive)
        exitCodeRef.compareAndSet(Int.MinValue, proc.exitValue())
      proc.exitValue()
    }
  }

  /** Spawn `command` and pump its stdout (+ merged stderr — bitcoind logs
    * there) into `logDir/node-NNNNN.log`, rolling every `rollLines` lines
    * OR once a non-empty tail is `rollMillis` old — whichever comes first.
    * The time-based roll bounds publish LATENCY: a caught-up node emitting
    * one UpdateTip every ten minutes must not have it withheld in the
    * `.inprogress` tail until 10k lines accumulate; with the default 5s the
    * streaming source sees every line within seconds of the node writing
    * it. The partial tail file stays `.inprogress` until rolled or the
    * process exits, so consumers only ever list complete files.
    */
  def start(command: Seq[String], logDir: String, rollLines: Int = 10000,
      rollMillis: Long = 5000): NodeHandle = {
    require(rollLines > 0, s"rollLines must be positive, got $rollLines")
    require(rollMillis > 0, s"rollMillis must be positive, got $rollMillis")
    val dir = Paths.get(logDir)
    Files.createDirectories(dir)
    // Resume numbering PAST anything already in the dir: a restarted node
    // (same logDir, new process) must never overwrite a published file — the
    // file source tracks names it has seen, so an overwrite is silent data
    // loss on resume, not a re-read.
    val existing = {
      val s = Files.list(dir)
      try s.toArray.map(_.toString)
        .flatMap("node-(\\d{5})\\.log".r.findFirstMatchIn(_))
        .map(_.group(1).toInt)
      finally s.close()
    }
    val startFileNo = if (existing.isEmpty) 0 else existing.max + 1
    val proc = new ProcessBuilder(command: _*).redirectErrorStream(true).start()
    val exitCodeRef = new AtomicInteger(Int.MinValue)
    val pump = new Thread(() => {
      val reader = new BufferedReader(new InputStreamReader(
        proc.getInputStream, StandardCharsets.UTF_8))
      var fileNo = startFileNo
      var lineNo = 0
      var writer: BufferedWriter = null
      var current: Path = null
      var tailBornNanos = 0L // when the current .inprogress got its first line
      def roll(): Unit = if (writer != null) {
        writer.close()
        Files.move(current, finalName(dir, fileNo),
          StandardCopyOption.ATOMIC_MOVE)
        writer = null; fileNo += 1; lineNo = 0
      }
      try {
        // Poll-read instead of blocking on EOF: a grandchild the node
        // orphans (shell children, a forked helper) inherits the stdout
        // pipe, and a blocking readLine would then wait on the ORPHAN's
        // exit, not the node's. The pump stops once the spawned process
        // itself is dead and the pipe is drained.
        var eof = false
        while (!eof) {
          if (reader.ready()) {
            val line = reader.readLine()
            if (line == null) eof = true
            else {
              if (writer == null) {
                current = dir.resolve(f"node-$fileNo%05d.log.inprogress")
                writer = Files.newBufferedWriter(current, StandardCharsets.UTF_8)
                tailBornNanos = System.nanoTime()
              }
              writer.write(line); writer.newLine()
              lineNo += 1
              if (lineNo >= rollLines) roll()
            }
          } else if (!proc.isAlive) {
            Thread.sleep(50) // let in-flight kernel-buffered bytes surface
            if (!reader.ready()) eof = true
          } else Thread.sleep(10)
          // latency-bounded publish: the poll loop ticks even when the node
          // is quiet, so an aged non-empty tail rolls without new input
          if (writer != null &&
              System.nanoTime() - tailBornNanos >= rollMillis * 1000000L) roll()
        }
      } finally {
        roll() // process gone: publish the tail
        reader.close()
        proc.waitFor()
        exitCodeRef.set(proc.exitValue())
      }
    }, s"node-pump-$logDir")
    pump.setDaemon(true)
    pump.start()
    new NodeHandle(proc, pump, exitCodeRef)
  }

  private def finalName(dir: Path, n: Int): Path = dir.resolve(f"node-$n%05d.log")

  /** Unbounded stream of the node's log lines (column `line`) — S3, with the
    * checkpoint as cursor.
    */
  def logStream(spark: SparkSession, logDir: String): DataFrame =
    spark.readStream
      .option("pathGlobFilter", "node-*.log")
      .text(logDir)
      .select(col("value").as("line"))

  /** UpdateTip events (hash, height) from a managed node's logs — the
    * reference's stream filter+extract (S4) over [[start]]'s rolling files.
    */
  def tipEvents(spark: SparkSession, logDir: String): DataFrame =
    ChainStream.parseUpdateTips(logStream(spark, logDir))
}
