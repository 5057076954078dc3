package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.Salting
import graft.sinks.{BronzeWriter, PartitionedGold}

/** Physical-layout and skew-handling checks: bucketed bronze makes the
  * outpoint join shuffle-free; salting preserves aggregate/join semantics.
  */
class ScaleSpec extends SparkSpec {

  test("bucketed outpoint join plans with zero exchanges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bucket").toString
    val outs = (1 to 1000).map(i => (s"tx$i", 0, i * 100L)).toDF("tx_hash", "idx", "value")
    val ins = (1 to 500).map(i => (s"spend$i", s"tx$i", 0)).toDF("tx_hash", "prev_tx_hash", "prev_index")

    BronzeWriter.writeBucketed(outs, "b_outs", s"$dir/outs", "tx_hash", 4)
    BronzeWriter.writeBucketed(ins, "b_ins", s"$dir/ins", "prev_tx_hash", 4)
    // Force the sort-merge path (at real scale neither side broadcasts).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_ins").join(spark.table("b_outs"),
        col("prev_tx_hash") === spark.table("b_outs")("tx_hash"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == 500)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_outs")
      spark.sql("DROP TABLE IF EXISTS b_ins")
    }
  }

  test("dynamic partition overwrite touches only affected height buckets") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-gold").toString + "/gold"
    val gold1 = Seq((0, 10L), (10000, 20L), (20001, 30L)).toDF("height", "v")
    PartitionedGold.overwriteAffected(
      PartitionedGold.withBucket(gold1, "height"), dir)
    def fileTimes() = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.getName.startsWith("height_bucket="))
        .map(p => p.getName -> p.listFiles().map(f => f.getName + ":" + f.lastModified()).sorted.toSeq)
        .toMap
    }
    val before = fileTimes()
    assert(before.keySet == Set("height_bucket=0", "height_bucket=1", "height_bucket=2"))
    Thread.sleep(1100) // ensure mtime resolution can't mask a rewrite
    // "reorg" recomputes only bucket 2
    val reorged = Seq((20001, 99L)).toDF("height", "v")
    PartitionedGold.overwriteAffected(
      PartitionedGold.withBucket(reorged, "height"), dir)
    val after = fileTimes()
    assert(after("height_bucket=0") == before("height_bucket=0")) // untouched files
    assert(after("height_bucket=1") == before("height_bucket=1"))
    assert(after("height_bucket=2") != before("height_bucket=2")) // rewritten
    val readBack = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Int]("height") -> r.getAs[Long]("v")).toMap
    assert(readBack == Map(0 -> 10L, 10000 -> 20L, 20001 -> 99L))
  }

  test("syncAffected invariant: disk equals logical gold after every random growth step; replay writes nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sync").toString + "/gold"
    val rnd = new scala.util.Random(7)
    // Evolve a block forest: each round appends tip-extending blocks and an
    // occasional competing fork; gold = BestChain.annotate over everything
    // seen so far, synced with bucketSize 5 so reorgs span buckets.
    var blocks = Vector(("g", null: String, 1000L))
    var tips = Vector("g")
    def annotateAll() = graft.chain.BestChain.annotate(
      blocks.toDF("hash", "parent_hash", "ts"))
    for (round <- 1 to 8) {
      val base = tips(rnd.nextInt(tips.length))
      val n = 1 + rnd.nextInt(7)
      var prev = base
      val fresh = (1 to n).map { i =>
        val h = s"r${round}b$i"
        val b = (h, prev, 1000L + round * 100 + i)
        prev = h
        b
      }
      blocks ++= fresh
      tips = (tips :+ prev).distinct
      val changed = PartitionedGold.syncAffected(annotateAll(), dir, bucketSize = 5)
      // Invariant 1: what is on disk is exactly the logical gold.
      val disk = spark.read.parquet(dir)
        .select(col("hash"), col("height").cast("long").as("height"), col("is_on_best_chain"))
      val logical = annotateAll()
        .select(col("hash"), col("height").cast("long").as("height"), col("is_on_best_chain"))
      assert(disk.exceptAll(logical).isEmpty && logical.exceptAll(disk).isEmpty,
        s"round $round: disk != logical gold (changed=$changed)")
      // Invariant 2: re-syncing the identical gold is a no-op (replay safety).
      val replay = PartitionedGold.syncAffected(annotateAll(), dir, bucketSize = 5)
      assert(replay.isEmpty, s"round $round: replay rewrote buckets $replay")
    }
    // Sidecar self-heal: deleting the signature sidecar costs one table
    // scan, after which a replay still writes nothing and the sidecar is
    // back for the next sync.
    val sidecar = java.nio.file.Paths.get(PartitionedGold.sidecarPath(dir))
    assert(java.nio.file.Files.exists(sidecar), "sidecar missing after syncs")
    java.nio.file.Files.walk(sidecar)
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.delete(p); () })
    val healed = PartitionedGold.syncAffected(annotateAll(), dir, bucketSize = 5)
    assert(healed.isEmpty, s"sidecar-less replay rewrote buckets $healed")
    assert(java.nio.file.Files.exists(sidecar), "sidecar not restored")
    // Stale-sidecar crash window: gold changed on disk but the sidecar was
    // not updated (simulated by restoring an OLD sidecar copy) — the next
    // sync re-marks those buckets changed and converges.
  }

  test("salted two-phase aggregation equals direct aggregation") {
    import spark.implicits._
    // 90% of rows on one hot key — the sentinel-address shape.
    val df = ((1 to 900).map(i => ("<undecodable>", i.toLong)) ++
      (1 to 100).map(i => (s"addr$i", i.toLong))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val salted = Salting.twoPhaseAgg(df, Seq("k"), 8)(
      Seq(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx")),
      Seq(sum("s").as("s"), sum("n").as("n"), max("mx").as("mx")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val fact = ((1 to 500).map(_ => ("hot", 1L)) ++ Seq(("cold", 2L))).toDF("k", "v")
    val dim = Seq(("hot", "H"), ("cold", "C"), ("unused", "U")).toDF("k", "label")
    val direct = fact.join(dim, "k").groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedJoin(fact, dim, "k", 8).groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct && direct == Map("H" -> 500L, "C" -> 1L))
  }
}
