package graft.chain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver layer: the outpoint join (SURVEY.md §2.3 J13) — every input is
  * resolved to the output it spends, and every output learns its spender.
  * This is THE big join of the workload (both sides ≈ full history at 100 TB)
  * — a sort-merge equi-join on (tx_hash, idx); bucketing bronze on tx_hash
  * makes it co-located and shuffle-free across gold rebuilds.
  */
object Enrich {

  /** Inputs with the value + source address of the output they spend
    * (≙ BlockchainToGraph.java:986–994 outpoint resolution).
    * Returns (tx_hash, prev_tx_hash, prev_index, value, src_address).
    */
  def resolvedInputs(txInputs: DataFrame, txOutputs: DataFrame): DataFrame =
    txInputs.join(
      txOutputs.select(
        col("tx_hash").as("prev_tx_hash"), col("idx").as("prev_index"),
        col("value"), col("address").as("src_address")),
      Seq("prev_tx_hash", "prev_index"))

  /** Outputs annotated with their spending tx (null = UTXO) — the relational
    * form of the `input` edge + `OutputIsUsed` flag
    * (TransactionGraph.java:109, 152).
    */
  def outputsEnriched(txOutputs: DataFrame, txInputs: DataFrame): DataFrame =
    txOutputs.join(
      txInputs.select(
        col("prev_tx_hash").as("tx_hash"), col("prev_index").as("idx"),
        col("tx_hash").as("spent_by_tx")),
      Seq("tx_hash", "idx"), "left")
      .withColumn("is_used", col("spent_by_tx").isNotNull)
}
