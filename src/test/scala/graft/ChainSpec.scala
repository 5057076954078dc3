package graft

import org.apache.spark.sql.functions._

import graft.chain.{BestChain, ChainFixture, Enrich, GoldStats, WalletCluster}
import graft.operators.ChainOps

class ChainSpec extends SparkSpec {

  private def fixtureParts = {
    val s = spark
    val ann = BestChain.annotate(ChainFixture.blocksDf(s))
    val cTxs = GoldStats.chainTxs(ChainFixture.transactionsDf(s), ann)
    val rin = Enrich.resolvedInputs(ChainFixture.txInputsDf(s), ChainFixture.txOutputsDf(s))
      .join(cTxs.select("tx_hash"), Seq("tx_hash"), "left_semi")
    val outs = ChainFixture.txOutputsDf(s)
      .join(cTxs.select("tx_hash"), Seq("tx_hash"), "left_semi")
    (ann, cTxs, rin, outs)
  }

  test("heights: pointer doubling equals hand-computed chain heights") {
    val got = BestChain.heights(ChainFixture.blocksDf(spark))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("b0" -> 0, "b1" -> 1, "b2" -> 2, "b3a" -> 3, "b3b" -> 3,
      "b4" -> 4, "b5" -> 5))
  }

  test("best chain: fork block excluded, tip chain included") {
    val got = BestChain.annotate(ChainFixture.blocksDf(spark))
      .collect().map(r => r.getAs[String]("hash") -> r.getAs[Boolean]("is_on_best_chain")).toMap
    assert(got("b3b") === false)
    assert(Seq("b0", "b1", "b2", "b3a", "b4", "b5").forall(got(_)))
  }

  test("reorg = recompute: annotate(with fork) equals annotate(never-forked) on chain blocks") {
    val all = BestChain.annotate(ChainFixture.blocksDf(spark))
      .where(col("is_on_best_chain"))
      .select("hash", "height").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val neverForked = BestChain.annotate(
      ChainFixture.blocksDf(spark).where(col("hash") =!= "b3b"))
      .where(col("is_on_best_chain"))
      .select("hash", "height").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(all == neverForked)
  }

  test("tx stats: hand-computed fee, balance, churn, new-address counts") {
    val (_, cTxs, rin, outs) = fixtureParts
    val ts = GoldStats.txStats(cTxs, rin, outs).collect()
      .map(r => r.getAs[String]("tx_hash") -> r).toMap
    val C = ChainFixture.C
    // tx1 spends cb0:0 (50C from A) → 30C to C + 19C back to A, fee 1C, churn
    assert(ts("tx1").getAs[Long]("balance") == 50 * C)
    assert(ts("tx1").getAs[Long]("fee") == 1 * C)
    assert(ts("tx1").getAs[Long]("input_count") == 1)
    assert(ts("tx1").getAs[Long]("output_count") == 2)
    assert(ts("tx1").getAs[Boolean]("is_between_one_address"))
    // C first appears in tx1 (A already seen in cb0) → 1 new address
    assert(ts("tx1").getAs[Long]("new_address_count") == 1)
    // tx3 spends 19C (A) + 50C (B) → 68C to F, fee 1C, no churn
    assert(ts("tx3").getAs[Long]("balance") == 69 * C)
    assert(ts("tx3").getAs[Long]("fee") == 1 * C)
    assert(!ts("tx3").getAs[Boolean]("is_between_one_address"))
    assert(ts("tx3").getAs[Long]("new_address_count") == 1) // F
    // coinbases: zero inputs, zero fee
    assert(ts("cb2").getAs[Long]("input_count") == 0)
    assert(ts("cb2").getAs[Long]("fee") == 0)
    // stale-fork coinbase is not in gold at all
    assert(!ts.contains("cb3b"))
  }

  test("block stats: balance = subsidy + input sums; fee aggregates") {
    val (ann, cTxs, rin, outs) = fixtureParts
    val bs = GoldStats.blockStats(ann, GoldStats.txStats(cTxs, rin, outs))
      .collect().map(r => r.getAs[String]("hash") -> r).toMap
    val C = ChainFixture.C
    assert(bs("b1").getAs[Long]("tx_count") == 2)
    assert(bs("b1").getAs[Long]("coinbase_balance") == 50 * C)
    assert(bs("b1").getAs[Long]("balance") == 100 * C) // 50 subsidy + 50 tx1 inputs
    assert(bs("b1").getAs[Long]("fee") == 1 * C)
    assert(!bs.contains("b3b"))
  }

  test("address stats: hand-computed balances and counterparty counts") {
    val (_, cTxs, rin, outs) = fixtureParts
    val as = GoldStats.addressStats(cTxs, rin, outs).collect()
      .map(r => r.getAs[String]("address") -> r).toMap
    val C = ChainFixture.C
    // A: received 50C (cb0) + 19C (tx1 change), spent 50C (tx1) + 19C (tx3)
    assert(as("A").getAs[Long]("balance") == 0)
    assert(as("A").getAs[Long]("input_tx_balance") == 69 * C)
    assert(as("A").getAs[Long]("output_tx_balance") == 69 * C)
    assert(as("A").getAs[Long]("tx_count") == 3)          // cb0, tx1, tx3
    assert(as("A").getAs[Long]("between_addr_tx_count") == 1) // tx1
    // A funded tx1 (recipients C, A) and tx3 (recipient F) → 3 distinct
    assert(as("A").getAs[Long]("output_addr_count") == 3)
    // txs paying A: cb0 (no funders), tx1 (funder A) → 1 distinct
    assert(as("A").getAs[Long]("input_addr_count") == 1)
    // B: two coinbases received (50C+50C), funded tx3 (50C)
    assert(as("B").getAs[Long]("balance") == 50 * C)
    assert(as("B").getAs[Long]("output_tx_count") == 1)
    // X only exists on the stale fork
    assert(!as.contains("X"))
    // G: untouched single coinbase
    assert(as("G").getAs[Long]("balance") == 50 * C)
    assert(as("G").getAs[Long]("first_seen") == 4000L)
  }

  test("outputs enriched: spent flags match the input set") {
    val e = Enrich.outputsEnriched(
      ChainFixture.txOutputsDf(spark), ChainFixture.txInputsDf(spark))
    val used = e.where(col("is_used")).select("tx_hash", "idx")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(used == Set(("cb0", 0), ("tx1", 0), ("tx1", 1), ("cb1", 0)))
  }

  test("wallet clustering: co-spenders of tx3 merge, others stay singleton") {
    val (_, cTxs, rin, outs) = fixtureParts
    val universe = outs.select("address")
      .union(rin.select(col("src_address").as("address"))).distinct()
    val w = WalletCluster.clusters(universe, rin.select("tx_hash", "src_address"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(w("A") == "A" && w("B") == "A") // co-spend in tx3
    assert(w("C") == "C" && w("D") == "D" && w("F") == "F")
  }

  test("wallet clustering: distributed GraphX route ≡ in-memory union-find route") {
    // the envelope route (driver union-find) is what every local fixture
    // takes; force the GraphX path with a zero envelope and pin equality —
    // a multi-tx overlapping co-spend graph so transitive merges are real
    import spark.implicits._
    val universe = (1 to 12).map(i => f"a$i%02d").toDF("address")
    val funders = Seq(
      ("t1", "a01"), ("t1", "a02"), ("t1", "a03"),
      ("t2", "a03"), ("t2", "a04"), // bridges t1's wallet to a04
      ("t3", "a06"), ("t3", "a07"),
      ("t4", "a09")) // single-funder tx: no edge
      .toDF("tx_hash", "src_address")
    def run(): Map[String, String] =
      graft.chain.WalletCluster.clusters(universe, funders)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val inMem = run()
    assert(inMem("a04") == "a01" && inMem("a07") == "a06" && inMem("a09") == "a09")
    val prev = sys.props.get("graft.broadcastMaxRows")
    try {
      sys.props("graft.broadcastMaxRows") = "0"
      assert(run() == inMem)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.broadcastMaxRows") = v
        case None => sys.props.remove("graft.broadcastMaxRows")
      }
    }
  }

  test("repairAfterReorg: contraction route for small reorgs, recompute-diff route for mass reorgs") {
    import spark.implicits._
    // 12 two-address components: tx "t$i" co-spends (x$i, y$i); stored
    // labeling = 24 rows, each pair labeled by its x (x < y lexically)
    val txs = (0 until 12).flatMap(i => Seq((f"t$i%02d", f"x$i%02d"), (f"t$i%02d", f"y$i%02d")))
    val all = txs.toDF("tx_hash", "src_address")
    val universe = txs.map(_._2).distinct.toDF("address")
    val stored = WalletCluster.clusters(universe, all).persist()
    assert(stored.count() == 24)

    // SMALL reorg: only t00 retracts → members = 2 of 24 → contraction
    // route (forced past the economics floor — a 24-row store would
    // otherwise take the recompute-diff route), which emits replacement
    // rows for every member of the affected component (the x00 row is a
    // no-op re-assertion of its own label)
    val inv1 = all.where(col("tx_hash") === "t00")
    val best1 = all.where(col("tx_hash") =!= "t00")
    val small = WalletCluster.repairAfterReorg(stored, inv1, best1,
        contractionMinStore = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(WalletCluster.lastRepairRoute == "contraction")
    assert(small == Map("x00" -> "x00", "y00" -> "y00"))

    // the SAME small reorg under the default economics floor: the store is
    // tiny (driver-sized by the floor itself), so the router takes the
    // REPLACE route — recompute once, diff in memory — and still emits only
    // genuinely changed rows, same converged state
    val smallMass = WalletCluster.repairAfterReorg(stored, inv1, best1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(WalletCluster.lastRepairRoute == "replace")
    assert(smallMass == Map("y00" -> "y00"))

    // MASS reorg: t00..t06 retract → members = 14 of 24 → recompute-diff
    // route, which emits ONLY rows whose label changes: the y of each
    // split pair (each x already labels itself)
    val hot = (0 until 7).map(i => f"t$i%02d")
    val inv2 = all.where(col("tx_hash").isin(hot: _*))
    val best2 = all.where(!col("tx_hash").isin(hot: _*))
    val mass = WalletCluster.repairAfterReorg(stored, inv2, best2,
        contractionMinStore = 0) // member fraction alone picks the route
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(WalletCluster.lastRepairRoute == "mass")
    assert(mass == (0 until 7).map(i => f"y$i%02d" -> f"y$i%02d").toMap)

    // both routes converge to the same state as a full recompute
    val storedMap = stored.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    stored.unpersist()
    def full(best: org.apache.spark.sql.DataFrame): Map[String, String] =
      WalletCluster.clusters(universe, best)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(storedMap ++ small == full(best1))
    assert(storedMap ++ mass == full(best2))
  }

  test("repairAfterReorg: no-op pre-route — a reorg touching no stored funder returns empty before any discovery pass") {
    import spark.implicits._
    val txs = (0 until 8).flatMap(i => Seq((f"t$i%02d", f"x$i%02d"), (f"t$i%02d", f"y$i%02d")))
    val all = txs.toDF("tx_hash", "src_address")
    val universe = txs.map(_._2).distinct.toDF("address")
    val stored = WalletCluster.clusters(universe, all).persist()
    stored.count()

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // empty blocks reorged out: invalidated carries no funders at all —
      // the replace route's LIMIT-1 probe concludes this without any
      // derivation pass
      val emptyInv = all.where(lit(false))
      val r1 = WalletCluster.repairAfterReorg(stored, emptyInv, all).collect()
      assert(r1.isEmpty)
      // listener events are posted asynchronously; a short settle beats
      // reaching into the private listener bus
      Thread.sleep(500)
      // the pre-route is the point: the funder-less call stays within a few
      // probe jobs (isEmpty + the empty collect), nowhere near the member
      // materialization + count + clustering the full path runs
      assert(jobs.get() <= 8, s"no-op repair ran ${jobs.get()} jobs — discovery not skipped")
      // invalidated funders that never reached the store (replacement-branch
      // addresses the store has no row for): still an EMPTY diff — but on
      // the small-store replace route this is now proven by the
      // recompute-diff itself, not an eager affected-set gate (that gate's
      // full invalidated-funder derivation WAS the measured small-store
      // repair premium, r16 rehearsal), so the call costs the bounded
      // small-store recompute rather than a discovery ladder
      val unknownInv = Seq(("tz", "zz99")).toDF("tx_hash", "src_address")
      val r2 = WalletCluster.repairAfterReorg(stored, unknownInv, all).collect()
      assert(r2.isEmpty)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      stored.unpersist()
      ()
    }
  }

  test("ChainOps.depths handles multi-chain forests") {
    import spark.implicits._
    val nodes = Seq(
      ("a1", null), ("a2", "a1"), ("a3", "a2"),
      ("z1", null), ("z2", "z1")).toDF("id", "parent")
    val got = ChainOps.rootsAndDepths(nodes, "id", "parent")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      "a1" -> (("a1", 0L)), "a2" -> (("a1", 1L)), "a3" -> (("a1", 2L)),
      "z1" -> (("z1", 0L)), "z2" -> (("z1", 1L))))
  }
}
