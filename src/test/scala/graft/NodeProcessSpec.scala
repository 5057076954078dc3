package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.NodeProcess

/** Lifecycle + log-rolling contract of the managed node subprocess
  * (the reference's spawn/readLine/destroy loop, re-shaped as rolling
  * immutable files feeding a Structured Streaming source).
  */
class NodeProcessSpec extends SparkSpec {

  private def await(cond: => Boolean, ms: Long = 15000): Boolean = {
    val deadline = System.nanoTime() + ms * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(25); ok = cond }
    ok
  }

  test("stdout rolls into immutable files; tip stream parses them") {
    val dir = Files.createTempDirectory("nodeproc").toString
    val script =
      """echo "2024-01-01 UpdateTip: new best=00000000000000aa height=100 version=0x20000000";
        |echo "junk line with no tip";
        |echo "2024-01-01 UpdateTip: new best=00000000000000ab height=101 version=0x20000000";
        |echo "2024-01-01 UpdateTip: new best=00000000000000ac height=102 version=0x20000000";
        |""".stripMargin
    val h = NodeProcess.start(Seq("sh", "-c", script), dir, rollLines = 2)
    assert(await(h.exitCode.isDefined), "process+pump did not finish")
    assert(h.exitCode.contains(0))
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
    assert(files.exists(_.endsWith("node-00000.log")), files.mkString(","))
    assert(files.exists(_.endsWith("node-00001.log")), files.mkString(","))
    assert(!files.exists(_.contains("inprogress")),
      s"partial file leaked: ${files.mkString(",")}")

    // the streaming path end-to-end: file source -> parseUpdateTips
    val q = NodeProcess.tipEvents(spark, dir).writeStream
      .format("memory").queryName("node_tips")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(30000)
    val got = spark.sql("SELECT hash, height FROM node_tips ORDER BY height")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.toSeq == Seq(
      ("00000000000000aa", 100), ("00000000000000ab", 101),
      ("00000000000000ac", 102)))
  }

  test("a quiet node's tail publishes by the time-based roll, not only by line count") {
    val dir = Files.createTempDirectory("nodeproc-latency").toString
    // one line, then a long sleep: the line-count roll (10k) never fires;
    // only the time-based roll can publish the tip while the node lives
    val script =
      """echo "2024-01-01 UpdateTip: new best=00000000000000aa height=100 version=0x20000000";
        |sleep 30""".stripMargin
    val h = NodeProcess.start(Seq("sh", "-c", script), dir, rollMillis = 300)
    try {
      assert(await(Files.list(Paths.get(dir)).toArray.map(_.toString)
          .exists(_.endsWith("node-00000.log")), ms = 10000),
        "tail not published while the process was still alive")
      assert(h.isAlive, "roll must not require process exit")
    } finally h.stop(1000)
  }

  test("graceful stop: SIGTERM first, exit observed, idempotent") {
    val dir = Files.createTempDirectory("nodeproc").toString
    val h = NodeProcess.start(Seq("sleep", "30"), dir)
    assert(h.isAlive)
    assert(h.exitCode.isEmpty, "exitCode must be None while running")
    val code = h.stop(graceMs = 5000)
    assert(code != 0, "SIGTERM'd sleep must not exit 0")
    assert(!h.isAlive)
    assert(h.stop() == code, "second stop must be a no-op with the same code")
  }

  test("fast-exiting process with no output leaves an empty, clean dir") {
    val dir = Files.createTempDirectory("nodeproc").toString
    val h = NodeProcess.start(Seq("true"), dir)
    assert(await(h.exitCode.isDefined))
    assert(h.exitCode.contains(0))
    assert(Files.list(Paths.get(dir)).count() == 0)
  }
}
