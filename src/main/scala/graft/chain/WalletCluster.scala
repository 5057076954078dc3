package graft.chain

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Wallet clustering = connected components over the co-spend graph —
  * completing the reference's abandoned `AddressWalletID` feature
  * (declared at TransactionGraph.java:137, never computed:
  * BlockchainToGraph.java:29, 896 always writes 0).
  *
  * Co-spend heuristic: addresses funding the same transaction belong to one
  * wallet. Edges are a star per tx (each funder → the tx's min funder), so
  * edge count is linear in inputs, not quadratic per tx. GraphX
  * `connectedComponents` is Pregel under the hood — O(diameter) supersteps of
  * partition-local message passing, the scalable form of the reference's
  * per-vertex traversals.
  */
object WalletCluster {

  /** The previous invocation's materialized clustering — swapped per call so
    * repeated runs (bench reruns) hold ONE copy, not one per run (same
    * discipline as BestChain.lastAnn).
    */
  private val lastResult =
    new java.util.concurrent.atomic.AtomicReference[org.apache.spark.rdd.RDD[_]](null)

  /** Drop the retained clustering ([[graft.Graft.releaseCaches]]). */
  private[graft] def release(): Unit =
    Option(lastResult.getAndSet(null)).foreach(_.unpersist(blocking = false))

  /** @param addresses  one-column DF of the full address universe
    * @param txFunders  (tx_hash, src_address) distinct funding pairs
    * @return (address, wallet_id) where wallet_id = min address in the
    *         component (stable, engine-independent label)
    */
  def clusters(addresses: DataFrame, txFunders: DataFrame): DataFrame = {
    val spark = addresses.sparkSession
    import spark.implicits._

    val universe = addresses.select(col(addresses.columns.head).as("address")).distinct()
    // CC runs over FUNDER addresses only — every other address is a
    // singleton component by construction (no incident edge) and labels
    // itself via the final left join. On a real chain most addresses never
    // co-spend, so this shrinks the Pregel graph by the singleton fraction.
    val funderAddrs = txFunders.select(col("src_address").as("address")).distinct()
    // Dense unique vertex ids (no hash-collision risk at 100 TB).
    val vertices = funderAddrs.rdd.map(_.getString(0)).zipWithUniqueId()
    val vdf = vertices.toDF("address", "vid").persist(StorageLevel.MEMORY_AND_DISK)

    val funders = txFunders.select(col("tx_hash"), col("src_address").as("address")).distinct()
      .join(vdf, "address")
    val hub = funders.groupBy("tx_hash").agg(min("vid").as("hub_vid"))
    val edgeRows = funders.join(hub, "tx_hash")
      .where(col("vid") =!= col("hub_vid"))
      .select(col("vid").as("src"), col("hub_vid").as("dst"))
      .distinct()

    val edges = edgeRows.rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = Graph(vertices.map { case (_, vid) => (vid, ()) }, edges)
    val ccGraph = graph.connectedComponents()
    val cc = ccGraph.vertices.toDF("vid", "cc")

    val labeled = vdf.join(cc, "vid")
    val walletLabel = labeled.groupBy("cc").agg(min("address").as("wallet_id"))
    val out = universe
      .join(labeled.join(walletLabel, "cc").select("address", "wallet_id"),
        Seq("address"), "left")
      .select(col("address"), coalesce(col("wallet_id"), col("address")).as("wallet_id"))
    // Materialize, then drop every piece of GraphX state (Pregel leaves its
    // final graph cached) plus the previous invocation's result — a bench
    // rerun or a long session must hold one clustering, not one per call.
    val (outDf, outRdd) = graft.operators.ChainOps.rebase(out)
    ccGraph.unpersist(blocking = false)
    graph.unpersist(blocking = false)
    vdf.unpersist(blocking = false)
    Option(lastResult.getAndSet(outRdd)).foreach(_.unpersist(blocking = false))
    outDf
  }
}
