package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards: the properties that make these queries
  * scale — pushdown, pruning, map-side partial aggregation, broadcast of
  * small dims, top-k group-limit pushdown — asserted on the optimized plan,
  * not hoped for.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(FormattedMode)

  test("point filter reaches the parquet scan as a pushed filter + pruned schema") {
    val p = plan("f1_point_filter")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]"), p)
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"), p)
  }

  test("multihop join broadcasts the small dimension tables") {
    val p = plan("j6_multihop_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("group-by aggregates partially before the shuffle (map-side combine)") {
    val p = plan("a3_sum_group")
    assert(p.contains("partial_sum"), p)
    val aggIdx = p.indexOf("partial_sum")
    val exIdx = p.indexOf("Exchange")
    assert(aggIdx >= 0 && exIdx >= 0, p)
  }

  test("top-k window pushes a group limit below the shuffle") {
    val p = plan("sim1_cosine_topk")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("global top-k compiles to TakeOrderedAndProject, not a full sort") {
    val p = plan("o1_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("scans prune columns: 3-col projection reads exactly 3 of 11 cols") {
    val p = plan("c2_concat_key")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("corpus gold-stats plans: no quadratic joins, map-side partial aggregation") {
    Seq("bk2_tx_stats", "bk4_address_stats").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
      assert(p.contains("partial_"), s"$q lacks partial aggregation")
    }
  }

  test("bucketed address stats shuffle ONLY at the address grain") {
    // The pair-merge shape's whole point: on tx_hash-bucketed silver, no
    // event- or tx-grain data ever crosses the wire — every exchange in the
    // plan clusters on address(+cp/role). A tx_hash key here means the
    // bucket alignment regressed.
    val p = plan("bk4_address_stats")
    val keys = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.nonEmpty, p)
    keys.foreach(k => assert(!k.contains("tx_hash"), s"tx-grain exchange on bucketed silver: $k"))
  }

  test("bucketed tx stats: per-side aggregates are exchange-free above the scans") {
    // txStats' counts/values/churn all aggregate narrow over the bucketed
    // scans; only new-address attribution (address grain) and the final
    // tx-grain alignment may shuffle. More than 4 exchanges means a
    // pair-grain re-exchange crept back in.
    val p = plan("bk2_tx_stats")
    val n = "hashpartitioning\\(".r.findAllMatchIn(p).size
    assert(n <= 4, s"bk2 exchange count regressed: $n\n$p")
  }

  test("UTXO set is an equi anti-join with a partial-aggregated rollup") {
    val p = plan("bk7_utxo_set")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_"), p)
  }

  test("winnowing plans as shingle-stream + window + distinct — no joins at all") {
    val p = plan("t6_winnow_fingerprint")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("MapPartitions"), p) // the JIT'd shingle flatMap
  }

  test("banded self-join shares ONE signature pipeline via runtime exchange reuse") {
    // cappedBucketPairs' three consumers (two join sides + the hot-bucket
    // star path) all sit above the same hashpartitioning(band, bucket)
    // exchange; AQE's stage reuse computes the shingle→hash→min-agg→band
    // pipeline once and the other consumers read the shuffle files. This is
    // why the tagged table is deliberately NOT persisted (a cache-fill
    // barrier regressed d4 by 44% in round 7). Reuse only materializes in
    // the FINAL adaptive plan, so execute first.
    val df = SparkEntry.queries("d4_minhash_pairs")(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(FormattedMode)
    val reused = "ReusedExchange".r.findAllMatchIn(p).size
    assert(p.contains("isFinalPlan=true"), p.take(2000))
    assert(reused >= 2, s"expected >=2 ReusedExchange (one per extra consumer), got $reused\n${p.take(3000)}")
  }

  test("text curation ops are map-only: no exchange, no join in the plan") {
    // chunking / PII scrub / line filter of a 100 TB corpus must be a pure
    // map job — any Exchange here multiplies the corpus over the network.
    Seq("t9_pii_metrics", "t10_pii_redact", "t11_chunk_documents",
        "t12_filter_lines", "t14_classifier_score").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles:\n${p.take(2000)}")
      assert(!p.contains("Join"), s"$q joins:\n${p.take(2000)}")
    }
  }

  test("decontamination broadcasts the eval side; corpus never shuffles") {
    val p = plan("t7_decontamination")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("bloom decontamination probes below the join, inside the scan stage") {
    val p = plan("t13_decontaminate_bloom")
    val probe = p.indexOf("bloom_might_contain")
    val join = p.indexOf("BroadcastHashJoin")
    assert(probe >= 0, p.take(3000))
    assert(join >= 0 && probe > join,
      s"probe must sit BELOW the join in the printed tree (join at $join, probe at $probe)")
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("near-dup default path is the band equi-join, never a quadratic join") {
    import org.apache.spark.sql.functions.col
    val emb = graft.tables.Tables.embeddings(spark, sf).where(col("vec_id") < 100)
    val p = graft.operators.Similarity
      .exactNearDupPairs(emb, "vec_id", "embedding", 0.35)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("band"), p) // candidates come from the (band, bucket) equi-join
    // and the explicit exact baseline IS the quadratic theta join
    val pExact = graft.operators.Similarity
      .exactNearDupPairs(emb, "vec_id", "embedding", 0.35, exact = true)
      .queryExecution.explainString(FormattedMode)
    assert(pExact.contains("NestedLoopJoin") || pExact.contains("CartesianProduct"), pExact)
  }

  test("band-agreement verify is the same (band,bucket) equi-join plus one pair-grain aggregate") {
    import org.apache.spark.sql.functions.col
    val docs = graft.tables.Tables.documents(spark, sf).where(col("doc_id") < 100)
    val banded = graft.operators.Dedup.bandedBuckets(
      graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
    val p = graft.operators.Dedup
      .minhashBandAgreement(banded, banded.select(col("doc_id"), col("band"), col("bucket")), "doc_id")
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the estimate is an aggregate over the SAME collision join the
    // unverified path runs — verification adds no new scan of either side
    assert(p.contains("HashAggregate"), p)
  }

  test("greedy packing plans one shard exchange: no join, no global sort, no window") {
    // Packing a 100 TB corpus must move each doc over the network exactly
    // once (the hash exchange to its shard). A global sort would plan a
    // second, range exchange; a window would serialize per-shard state
    // through a sort-based window operator instead of the O(1) streaming
    // pass.
    val p = plan("t16_sequence_packing")
    // formatted mode prints each node twice (tree + details); the details
    // header "(<id>) Exchange" appears exactly once per physical node
    val exchanges = """\(\d+\) Exchange""".r.findAllMatchIn(p).size
    assert(exchanges == 1, s"expected exactly 1 Exchange, got $exchanges:\n${p.take(3000)}")
    assert(p.contains("hashpartitioning(shard"), p.take(3000))
    assert(!p.contains("rangepartitioning"), s"global sort leaked in:\n${p.take(3000)}")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(3000))
  }

  test("reorg repair's contraction path: equi-joins only, no quadratic fallback") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 12 components so the member fraction stays below the mass-reorg route
    val txs = (0 until 12).flatMap(i => Seq((f"t$i%02d", f"x$i%02d"), (f"t$i%02d", f"y$i%02d")))
    val all = txs.toDF("tx_hash", "src_address")
    val stored = txs.map(t => (t._2, t._2.replace('y', 'x'))).distinct
      .toDF("address", "wallet_id")
    val p = graft.chain.WalletCluster
      .repairAfterReorg(stored, all.where(col("tx_hash") === "t00"),
        all.where(col("tx_hash") =!= "t00"),
        contractionMinStore = 0) // pin the contraction route's plan shape
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("reorg repair's mass path: equi-joins only in the recompute-diff delta") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one chained giant component (a0..a5) plus a 2-address wallet — the
    // affected member fraction crosses the mass-route cut, so the returned
    // plan is the single left-join delta over the store consuming the fresh
    // clustering once
    val txs = Seq(
      ("t0", "a0"), ("t0", "a1"), ("t1", "a1"), ("t1", "a2"),
      ("t2", "a2"), ("t2", "a3"), ("t3", "a3"), ("t3", "a4"),
      ("t4", "a4"), ("t4", "a5"), ("t5", "b0"), ("t5", "b1"))
    val all = txs.toDF("tx_hash", "src_address")
    val stored = (Seq("a0", "a1", "a2", "a3", "a4", "a5").map((_, "a0")) ++
      Seq(("b0", "b0"), ("b1", "b0"))).toDF("address", "wallet_id")
    val p = graft.chain.WalletCluster
      .repairAfterReorg(stored, all.where(col("tx_hash") === "t2"),
        all.where(col("tx_hash") =!= "t2"))
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
