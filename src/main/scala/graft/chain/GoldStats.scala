package graft.chain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Gold layer: the reference's complete derived-property inventory
  * (TransactionGraph.java:116–153) as deterministic batch aggregates over
  * best-chain bronze. Where the reference maintains each property by mutable
  * `+=`/`-=` on every event (BlockchainToGraph.java:837–947) — with reorg
  * reversal as a hand-written inverse (:568–777) — these are pure
  * groupBy().agg() recomputes: idempotent, retraction-free, and
  * partial-aggregated map-side by Catalyst.
  *
  * All joins are equi-joins on tx_hash / address; at 100 TB bronze is
  * bucketed by tx_hash so the tx-grain joins co-locate, and the address-grain
  * aggregates are one hash-shuffle each. No collect_set of unbounded arrays —
  * counterparty distincts are join-then-countDistinct, which AQE can
  * skew-split (the sentinel '<undecodable>' address is the known hot key).
  */
object GoldStats {

  /** Best-chain transactions with height + ts attached.
    * txs(tx_hash, block_hash, is_coinbase) ⋈ annotated blocks. */
  def chainTxs(txs: DataFrame, annotatedBlocks: DataFrame): DataFrame =
    txs.join(
      annotatedBlocks.where(col("is_on_best_chain"))
        .select(col("hash").as("block_hash"), col("height"), col("ts")),
      "block_hash")

  /** Per-transaction stats (≙ the 7 Transaction* properties,
    * TransactionGraph.java:140–147).
    *
    * Shape (same two-level tagged-union pass as [[addressStats]]): spend and
    * receive events union into one direction-tagged stream grouped per
    * (tx, address), then per tx — input/output counts and values are sums of
    * the level-1 partials, and the self-churn flag
    * (BlockchainToGraph.java:873–882) is exactly "some address has both
    * directions", free at level 2. That replaces two per-tx aggregates plus
    * a composite-key semi-join + distinct with two grouped passes (both
    * partial-aggregated map-side). Only new-address attribution
    * (BlockchainToGraph.java:1076–1080) needs more: the level-1 pairs —
    * already deduped, so strictly smaller than raw outputs — join tx height
    * and take each address's global first appearance (chain order = height,
    * then tx_hash as the deterministic batch stand-in for intra-block
    * order). The final assembly joins two tx-grain aggregates instead of
    * four.
    *
    * @param cTxs  chainTxs output
    * @param rin   Enrich.resolvedInputs, pre-filtered to best-chain txs
    * @param outs  tx_outputs, pre-filtered to best-chain txs
    */
  def txStats(cTxs: DataFrame, rin: DataFrame, outs: DataFrame): DataFrame = {
    val events = outs.select(col("tx_hash"), col("address"), col("value"), lit("r").as("dir"))
      .unionByName(rin.select(col("tx_hash"), col("src_address").as("address"),
        col("value"), lit("s").as("dir")))
    // Level 1: per (tx, address) — the grain churn and first-appearance need.
    val perPair = events.groupBy("tx_hash", "address").agg(
      count(when(col("dir") === "s", lit(1))).as("cnt_s"),
      count(when(col("dir") === "r", lit(1))).as("cnt_r"),
      sum(when(col("dir") === "s", col("value"))).as("val_s"),
      sum(when(col("dir") === "r", col("value"))).as("val_r"))
    // Level 2: per tx — counts/values re-sum the partials; churn = any
    // address with both directions.
    val perTx = perPair.groupBy("tx_hash").agg(
      sum("cnt_s").as("input_count"),
      sum("cnt_r").as("output_count"),
      sum("val_s").as("in_value"),
      sum("val_r").as("out_value"),
      max(col("cnt_s") > 0 && col("cnt_r") > 0).as("is_between_one_address"))
    val firstTx = perPair.where(col("cnt_r") > 0).select("tx_hash", "address")
      .join(cTxs.select("tx_hash", "height"), "tx_hash")
      .groupBy("address")
      .agg(min(struct(col("height"), col("tx_hash"))).as("f"))
      .select(col("f.tx_hash").as("tx_hash"))
      .groupBy("tx_hash").agg(count(lit(1)).as("new_address_count"))
    cTxs
      .join(perTx, Seq("tx_hash"), "left")
      .join(firstTx, Seq("tx_hash"), "left")
      .select(
        col("tx_hash"), col("block_hash"), col("is_coinbase"),
        col("ts").as("date"),
        coalesce(col("input_count"), lit(0L)).as("input_count"),
        coalesce(col("output_count"), lit(0L)).as("output_count"),
        coalesce(col("in_value"), lit(0L)).as("balance"),
        when(col("is_coinbase"), lit(0L))
          .otherwise(coalesce(col("in_value"), lit(0L)) - coalesce(col("out_value"), lit(0L)))
          .as("fee"),
        coalesce(col("new_address_count"), lit(0L)).as("new_address_count"),
        coalesce(col("is_between_one_address"), lit(false)).as("is_between_one_address"))
  }

  /** Per-block stats (≙ BlockBalance/CoinBaseBalance/Fee/TransactionCount,
    * TransactionGraph.java:118–123; balance = subsidy + Σ tx input sums,
    * BlockchainToGraph.java:541–542, 1037–1041).
    */
  def blockStats(annotatedBlocks: DataFrame, txStats: DataFrame): DataFrame =
    txStats.groupBy("block_hash").agg(
      count(lit(1)).as("tx_count"),
      sum("balance").as("sum_in"),
      sum("fee").as("total_fee"))
      .join(annotatedBlocks.where(col("is_on_best_chain"))
        .select(col("hash").as("block_hash"), col("height"), col("ts")), "block_hash")
      .select(
        col("block_hash").as("hash"), col("height"), col("ts"),
        col("tx_count"),
        GraftFunctions.block_subsidy(col("height")).as("coinbase_balance"),
        (GraftFunctions.block_subsidy(col("height")) + col("sum_in")).as("balance"),
        col("total_fee").as("fee"))

  /** Per-address stats (≙ the 12 Address* properties,
    * TransactionGraph.java:126–137; running `+=` maintenance at
    * BlockchainToGraph.java:837–947 becomes plain aggregation).
    *
    * Shape: receive and spend events union into ONE direction-tagged stream,
    * aggregated per (address, tx) and then per address — recv/spent/touch/
    * between all fall out of that single two-level grouped pass (each level
    * partial-aggregated map-side, and level 1 makes every per-tx flag exact
    * so level 2 needs NO countDistinct expands). Only the counterparty
    * distincts genuinely need per-tx participant lists: they reuse the
    * level-1 pairs in one tagged join + one grouped pass. 3 shuffles on
    * address + 1 on tx_hash, vs 6 aggregates and a 6-way join chain done
    * naively — at 100 TB that halves the exchanges on the widest table.
    */
  def addressStats(cTxs: DataFrame, rin: DataFrame, outs: DataFrame): DataFrame = {
    val txMeta = cTxs.select("tx_hash", "ts")
    val events = outs.select(col("address"), col("tx_hash"), col("value"), lit("r").as("dir"))
      .unionByName(rin.select(col("src_address").as("address"), col("tx_hash"),
        col("value"), lit("s").as("dir")))
      .join(txMeta, "tx_hash")

    // Level 1: per (address, tx) — collapses duplicates so every downstream
    // count is distinct-by-construction.
    val perTx = events.groupBy("address", "tx_hash").agg(
      sum(when(col("dir") === "r", col("value"))).as("recv_value"),
      sum(when(col("dir") === "s", col("value"))).as("spent_value"),
      (count(when(col("dir") === "r", lit(1))) > 0).as("has_r"),
      (count(when(col("dir") === "s", lit(1))) > 0).as("has_s"),
      min("ts").as("ts"))

    // Level 2: per address — balances, tx counts, first/last seen and the
    // self-churn count (AddressBetweenAddressTransactionCount,
    // BlockchainToGraph.java:870–882) in one grouped pass.
    val perAddr = perTx.groupBy("address").agg(
      sum("recv_value").as("input_tx_balance"),
      sum("spent_value").as("output_tx_balance"),
      count(when(col("has_r"), lit(1))).as("input_tx_count"),
      count(when(col("has_s"), lit(1))).as("output_tx_count"),
      count(lit(1)).as("tx_count"),
      min(when(col("has_r"), col("ts"))).as("first_recv"),
      max(when(col("has_r"), col("ts"))).as("last_recv"),
      min(when(col("has_s"), col("ts"))).as("first_spend"),
      max(when(col("has_s"), col("ts"))).as("last_spend"),
      count(when(col("has_r") && col("has_s"), lit(1))).as("between_addr_tx_count"))

    // Distinct counterparties (BlockchainToGraph.java:950–983): funders of
    // the txs that paid me / recipients of the txs I funded. Per-tx
    // participant lists tagged by role, joined once against the level-1
    // pairs, then both distinct counts in one grouped pass.
    val participants = rin.select(col("tx_hash"), col("src_address").as("cp"), lit("f").as("role"))
      .distinct()
      .unionByName(outs.select(col("tx_hash"), col("address").as("cp"), lit("t").as("role"))
        .distinct())
    val cpAgg = perTx.select("address", "tx_hash", "has_r", "has_s")
      .join(participants, "tx_hash")
      .groupBy("address").agg(
        countDistinct(when(col("has_r") && col("role") === "f", col("cp")))
          .as("input_addr_count"),
        countDistinct(when(col("has_s") && col("role") === "t", col("cp")))
          .as("output_addr_count"))

    perAddr
      .join(cpAgg, Seq("address"), "left")
      .select(
        col("address"),
        (coalesce(col("input_tx_balance"), lit(0L)) - coalesce(col("output_tx_balance"), lit(0L)))
          .as("balance"),
        least(col("first_recv"), col("first_spend")).as("first_seen"),
        greatest(col("last_recv"), col("last_spend")).as("last_seen"),
        coalesce(col("input_tx_balance"), lit(0L)).as("input_tx_balance"),
        coalesce(col("output_tx_balance"), lit(0L)).as("output_tx_balance"),
        coalesce(col("tx_count"), lit(0L)).as("tx_count"),
        coalesce(col("input_tx_count"), lit(0L)).as("input_tx_count"),
        coalesce(col("output_tx_count"), lit(0L)).as("output_tx_count"),
        coalesce(col("input_addr_count"), lit(0L)).as("input_addr_count"),
        coalesce(col("output_addr_count"), lit(0L)).as("output_addr_count"),
        coalesce(col("between_addr_tx_count"), lit(0L)).as("between_addr_tx_count"))
  }
}
