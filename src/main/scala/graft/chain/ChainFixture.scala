package graft.chain

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic in-memory blockchain fixture (FIXTURES.md §A) exercising the
  * reference's whole data model: a 6-block best chain with one stale fork
  * block, coinbases, spends, a self-churn tx (pays a funding address,
  * BlockchainToGraph.java:873–882) and a multi-input co-spend tx (the wallet
  * clustering seed, BlockchainToGraph.java:29).
  *
  * The same rows are rendered as SQL VALUES for the DuckDB oracle, so the
  * chain pipeline is hash-verified end-to-end like every other operator.
  * Timestamps are epoch seconds (long) to keep both engines trivially equal.
  */
object ChainFixture {

  val C = 100000000L // 1 coin in base units

  // (hash, parent_hash, ts, nonce_order) — nonce_order shuffled vs height to
  // exercise out-of-order arrival (BlockchainToGraph.java:387–412).
  val blocks: Seq[(String, String, Long, Int)] = Seq(
    ("b0", null, 1000L, 3),
    ("b1", "b0", 1600L, 1),
    ("b2", "b1", 2200L, 0),
    ("b3a", "b2", 2800L, 5),
    ("b3b", "b2", 2810L, 2), // stale fork at height 3
    ("b4", "b3a", 3400L, 4),
    ("b5", "b4", 4000L, 6))

  // (tx_hash, block_hash, is_coinbase)
  val transactions: Seq[(String, String, Boolean)] = Seq(
    ("cb0", "b0", true),
    ("cb1", "b1", true), ("tx1", "b1", false),
    ("cb2", "b2", true), ("tx2", "b2", false),
    ("cb3a", "b3a", true), ("tx3", "b3a", false),
    ("cb3b", "b3b", true),
    ("cb4", "b4", true),
    ("cb5", "b5", true))

  // (tx_hash, prev_tx_hash, prev_index)
  val txInputs: Seq[(String, String, Int)] = Seq(
    ("tx1", "cb0", 0),
    ("tx2", "tx1", 0),
    ("tx3", "tx1", 1), // addr A funds tx3 …
    ("tx3", "cb1", 0)) // … together with addr B → wallet {A, B}

  // (tx_hash, idx, value, address)
  val outputs: Seq[(String, Int, Long, String)] = Seq(
    ("cb0", 0, 50 * C, "A"),
    ("cb1", 0, 50 * C, "B"),
    ("tx1", 0, 30 * C, "C"),
    ("tx1", 1, 19 * C, "A"), // self-churn: A funds tx1 and is paid by it
    ("cb2", 0, 50 * C, "B"),
    ("tx2", 0, 29 * C, "D"),
    ("cb3a", 0, 50 * C, "E"),
    ("tx3", 0, 68 * C, "F"),
    ("cb3b", 0, 50 * C, "X"), // only exists on the stale fork
    ("cb4", 0, 50 * C, "E"),
    ("cb5", 0, 50 * C, "G"))

  def blocksDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    blocks.toDF("hash", "parent_hash", "ts", "nonce_order")
  }
  def transactionsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    transactions.toDF("tx_hash", "block_hash", "is_coinbase")
  }
  def txInputsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    txInputs.toDF("tx_hash", "prev_tx_hash", "prev_index")
  }
  def txOutputsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    outputs.toDF("tx_hash", "idx", "value", "address")
  }

  private def lit(v: Any): String = v match {
    case null => "NULL"
    case s: String => s"'$s'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case n => n.toString
  }

  /** DuckDB CTE header binding the fixture as literal VALUES tables. */
  val sqlCtes: String = {
    def values(rows: Seq[Product]): String =
      rows.map(r => "(" + r.productIterator.map(lit).mkString(", ") + ")").mkString(", ")
    s"""WITH blocks(hash, parent_hash, ts, nonce_order) AS (VALUES ${values(blocks)}),
       |transactions(tx_hash, block_hash, is_coinbase) AS (VALUES ${values(transactions)}),
       |tx_inputs(tx_hash, prev_tx_hash, prev_index) AS (VALUES ${values(txInputs)}),
       |tx_outputs(tx_hash, idx, value, address) AS (VALUES ${values(outputs)})""".stripMargin
  }
}
