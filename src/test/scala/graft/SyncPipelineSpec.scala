package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.SyncPipeline

/** End-to-end: node subprocess → rolling logs → tip stream → bronze append →
  * gold recompute → clean shutdown — the reference's whole main, driven
  * against a scripted fake node.
  */
class SyncPipelineSpec extends SparkSpec {

  private def tipLine(h: String, height: Int): String =
    s"""echo "UpdateTip: new best=$h height=$height version=0x20000000";"""

  private val goldFn: (SparkSession, DataFrame) => DataFrame =
    (_, bronze) => bronze.agg(
      count(lit(1)).as("n_tips"), max("height").as("best_height"))

  test("scripted node catch-up syncs to gold; resume ingests only new logs") {
    val base = Files.createTempDirectory("sync").toString
    val script = tipLine("aa01", 1) + tipLine("aa02", 2) +
      "echo noise;" + tipLine("aa03", 3)
    val code = SyncPipeline.catchUp(spark, Seq("sh", "-c", script),
      s"$base/logs", s"$base/bronze", s"$base/gold", s"$base/ckpt", goldFn)
    assert(code == 0)
    val gold = spark.read.parquet(s"$base/gold").collect().head
    assert(gold.getLong(0) == 3 && gold.getInt(1) == 3)

    // resume: a second catch-up over the SAME dirs must number its log
    // files past run 1's (an overwrite would be silently skipped by the
    // checkpoint) and converge gold over old bronze + new tips
    val code2 = SyncPipeline.catchUp(spark, Seq("sh", "-c", tipLine("aa04", 4)),
      s"$base/logs", s"$base/bronze", s"$base/gold", s"$base/ckpt", goldFn)
    assert(code2 == 0)
    val gold2 = spark.read.parquet(s"$base/gold").collect().head
    assert(gold2.getLong(0) == 4 && gold2.getInt(1) == 4)
  }

  test("live trigger: graceful stop drains the boundary then stops the node") {
    val base = Files.createTempDirectory("sync").toString
    // node emits one tip then lingers — stop() must not hang on it
    val script = tipLine("bb01", 7) + "sleep 300;"
    val run = SyncPipeline.start(spark, Seq("sh", "-c", script),
      s"$base/logs", s"$base/bronze", s"$base/gold", s"$base/ckpt",
      goldFn, trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      // the tip file only becomes visible when the pump rolls it — which for
      // a lingering node happens at rollLines; with the default 10k the tip
      // is still in .inprogress, so gold may legitimately be absent. The
      // contract under test is the SHUTDOWN path: boundary stop + SIGTERM.
      Thread.sleep(1500)
      run.stop(30000)
      assert(!run.query.isActive, "query must be stopped at a boundary")
      assert(!run.node.isAlive, "node must be SIGTERM'd")
    } finally if (run.node.isAlive) run.node.stop(1000)
  }
}
