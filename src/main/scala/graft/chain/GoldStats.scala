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
    * Shape: counts and values are plain per-tx aggregates of each side —
    * narrow passes when the input is tx_hash-bucketed (HashPartitioning(tx)
    * satisfies the grouping). Only the self-churn flag
    * (BlockchainToGraph.java:873–882: "some address has both directions")
    * needs pair semantics, and an INNER join of the two distinct (tx, addr)
    * key sets delivers it while PRESERVING the tx partitioning — unlike a
    * full-outer merge, whose coalesced key breaks propagation and forces a
    * pair-grain re-exchange. On bucketed silver the whole tx-grain DAG is
    * exchange-free; only new-address attribution
    * (BlockchainToGraph.java:1076–1080: global first appearance in chain
    * order = height, then tx_hash as the deterministic batch stand-in for
    * intra-block order) shuffles, at the address grain.
    *
    * @param cTxs  chainTxs output
    * @param rin   Enrich.resolvedInputs, pre-filtered to best-chain txs
    * @param outs  tx_outputs, pre-filtered to best-chain txs
    */
  def txStats(cTxs: DataFrame, rin: DataFrame, outs: DataFrame): DataFrame = {
    val outAgg = outs.groupBy("tx_hash").agg(
      count(lit(1)).as("output_count"), sum("value").as("out_value"))
    val inAgg = rin.groupBy("tx_hash").agg(
      count(lit(1)).as("input_count"), sum("value").as("in_value"))
    val recvKeys = outs.select("tx_hash", "address").distinct()
    val spendKeys = rin.select(col("tx_hash"), col("src_address").as("address"))
      .distinct()
    val churn = recvKeys.join(spendKeys, Seq("tx_hash", "address"))
      .groupBy("tx_hash").agg(lit(true).as("is_between_one_address"))
    val firstTx = recvKeys
      .join(cTxs.select("tx_hash", "height"), "tx_hash")
      .groupBy("address")
      .agg(min(struct(col("height"), col("tx_hash"))).as("f"))
      .select(col("f.tx_hash").as("tx_hash"))
      .groupBy("tx_hash").agg(count(lit(1)).as("new_address_count"))
    cTxs
      .join(inAgg, Seq("tx_hash"), "left")
      .join(outAgg, Seq("tx_hash"), "left")
      .join(churn, Seq("tx_hash"), "left")
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
    * Shape: each side joins the tx timestamp FIRST (bucket-aligned — every
    * row of a (tx, address) group shares it) and pre-aggregates to
    * (tx, address) grain, narrow over tx_hash-bucketed silver. One
    * co-partitioned FULL OUTER merge yields distinct pairs with exact
    * has_r/has_s flags, so the address rollup needs NO countDistinct
    * expands for tx counts and the self-churn count
    * (AddressBetweenAddressTransactionCount, BlockchainToGraph.java:870–882)
    * is a plain conditional count. The counterparty distincts
    * (BlockchainToGraph.java:950–983) join each side's pair keys against
    * the opposite role's participant list — bucket-aligned — then one
    * role-tagged dedup feeds both counts from a single grouped pass. On
    * bucketed silver NOTHING shuffles until the address grain: three
    * address-hash exchanges total, vs 6 aggregates and a 6-way join chain
    * done naively — at 100 TB that removes every exchange on the widest
    * (pair/event) tables.
    */
  def addressStats(cTxs: DataFrame, rin: DataFrame, outs: DataFrame): DataFrame = {
    val ctxTs = cTxs.select("tx_hash", "ts")
    val recvA = outs.join(ctxTs, "tx_hash").groupBy("tx_hash", "address")
      .agg(sum("value").as("recv_value"), min("ts").as("ts_r"))
    val spendA = rin
      .select(col("tx_hash"), col("src_address").as("address"), col("value"))
      .join(ctxTs, "tx_hash")
      .groupBy("tx_hash", "address")
      .agg(sum("value").as("spent_value"), min("ts").as("ts_s"))
    // Pair grain: distinct (address, tx) with both direction partials.
    val perTx = recvA.join(spendA, Seq("tx_hash", "address"), "full_outer")
      .withColumn("has_r", col("recv_value").isNotNull)
      .withColumn("has_s", col("spent_value").isNotNull)

    val perAddr = perTx.groupBy("address").agg(
      sum("recv_value").as("input_tx_balance"),
      sum("spent_value").as("output_tx_balance"),
      count(when(col("has_r"), lit(1))).as("input_tx_count"),
      count(when(col("has_s"), lit(1))).as("output_tx_count"),
      count(lit(1)).as("tx_count"),
      min("ts_r").as("first_recv"),
      max("ts_r").as("last_recv"),
      min("ts_s").as("first_spend"),
      max("ts_s").as("last_spend"),
      count(when(col("has_r") && col("has_s"), lit(1))).as("between_addr_tx_count"))

    // Distinct counterparties per role: funders of the txs that paid me /
    // recipients of the txs I funded. Null counterparties are dropped up
    // front (countDistinct ignores nulls) so the role-tagged dedup + one
    // conditional-count pass is exactly two COUNT(DISTINCT cp)s.
    val funders = rin.select(col("tx_hash"), col("src_address").as("cp"))
      .where(col("cp").isNotNull).distinct()
    val recips = outs.select(col("tx_hash"), col("address").as("cp"))
      .where(col("cp").isNotNull).distinct()
    val cpPairs = recvA.select("tx_hash", "address").join(funders, "tx_hash")
      .select(col("address"), col("cp"), lit("in").as("role"))
      .unionByName(spendA.select("tx_hash", "address").join(recips, "tx_hash")
        .select(col("address"), col("cp"), lit("out").as("role")))
      .distinct()
    val cpCounts = cpPairs.groupBy("address").agg(
      count(when(col("role") === "in", lit(1))).as("input_addr_count"),
      count(when(col("role") === "out", lit(1))).as("output_addr_count"))

    perAddr
      .join(cpCounts, Seq("address"), "left")
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
