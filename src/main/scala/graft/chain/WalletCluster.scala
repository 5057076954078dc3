package graft.chain

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.{ChainOps, UnionFind}

/** Wallet clustering = connected components over the co-spend graph —
  * completing the reference's abandoned `AddressWalletID` feature
  * (declared at TransactionGraph.java:137, never computed:
  * BlockchainToGraph.java:29, 896 always writes 0).
  *
  * Co-spend heuristic: addresses funding the same transaction belong to one
  * wallet. Edges are a star per tx (each funder → the tx's min funder), so
  * edge count is linear in inputs, not quadratic per tx. The edge DERIVATION
  * (distincts + hub join) is always distributed; the components step routes
  * on the materialized edge count with the same size cut as a
  * broadcast-vs-shuffle join decision (mirror of
  * [[BestChain.annotateDistributed]]):
  *
  *  - edge list ≤ [[ChainOps.BroadcastMaxRows]]: collect it (the exact
  *    transfer a BroadcastExchange performs) and run driver union-find —
  *    one pass instead of GraphX's ~6 jobs of fixed Pregel stage latency,
  *    which dominate end-to-end time whenever the co-spend graph is small
  *    (it usually is: vertices are DISTINCT co-spending addresses, orders
  *    of magnitude fewer than events).
  *  - above it: GraphX `connectedComponents` — O(diameter) supersteps of
  *    partition-local message passing, the scalable form of the reference's
  *    per-vertex traversals.
  *
  * Both routes label each component with its MIN address; GraphSpec gates
  * route equality on a forced-envelope fixture.
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
    val funders = txFunders.select(col("tx_hash"), col("src_address").as("address")).distinct()
    // Star per tx around the MIN funder address (any fixed hub keeps the
    // same components; min-address makes both routes derivable from the
    // same table). Funder-only vertices: every other address is a singleton
    // by construction and labels itself via the final left join.
    val hub = funders.groupBy("tx_hash").agg(min("address").as("hub"))
    val edgeRows = funders.join(hub, "tx_hash")
      .where(col("address") =!= col("hub"))
      .select(col("address").as("src"), col("hub").as("dst"))
      .distinct()
    // Materialize ONCE: the route decision needs the count (returned by the
    // same pass), and both routes re-read the edges (collect / vid joins +
    // GraphX's internal scans).
    val (edgeDf, edgeRdd, nEdges) = ChainOps.rebaseCounted(edgeRows)
    val envelope = math.min(ChainOps.BroadcastMaxRows, (Int.MaxValue - 1).toLong)

    if (nEdges <= envelope) {
      val labels = UnionFind.components(
        edgeDf.collect().iterator.map(r => (r.getString(0), r.getString(1))))
      edgeRdd.unpersist(blocking = false)
      // the in-memory route holds NO persisted state of its own — but it
      // must still drain the register a previous DISTRIBUTED run filled, or
      // that stale clustering stays cached for the rest of the session
      Option(lastResult.getAndSet(null)).foreach(_.unpersist(blocking = false))
      val labelDf = labels.toSeq.toDF("address", "wallet_id")
      return universe
        .join(broadcast(labelDf), Seq("address"), "left")
        .select(col("address"), coalesce(col("wallet_id"), col("address")).as("wallet_id"))
    }

    // Dense unique vertex ids (no hash-collision risk at 100 TB).
    // zipWithUniqueId over a shuffle output is NOT stable across
    // re-evaluations (fetch order varies), so the assignment is materialized
    // ONCE (persist + count) and every consumer — the edge joins AND the
    // graph's vertex set — reads the cached vdf, never the raw lineage.
    val funderAddrs = funders.select("address").distinct()
    val vdf = funderAddrs.rdd.map(_.getString(0)).zipWithUniqueId()
      .toDF("address", "vid").persist(StorageLevel.MEMORY_AND_DISK)
    vdf.count()
    val edgeVids = edgeDf
      .join(vdf.select(col("address").as("src"), col("vid").as("src_vid")), "src")
      .join(vdf.select(col("address").as("dst"), col("vid").as("dst_vid")), "dst")
      .select("src_vid", "dst_vid")
    val edges = edgeVids.rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = Graph(vdf.select("vid").rdd.map(r => (r.getLong(0), ())), edges)
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
    val (outDf, outRdd) = ChainOps.rebase(out)
    ccGraph.unpersist(blocking = false)
    graph.unpersist(blocking = false)
    vdf.unpersist(blocking = false)
    edgeRdd.unpersist(blocking = false)
    Option(lastResult.getAndSet(outRdd)).foreach(_.unpersist(blocking = false))
    outDf
  }

  /** INCREMENTAL wallet clustering — the chain-side member of the engine's
    * O(new)-against-history family: a day's new transactions update the
    * stored labeling without re-clustering the address universe. The
    * standard contraction trick: each stored component is already
    * represented by its label, so the batch's funders are mapped through
    * `oldLabels` (unseen addresses map to themselves) and [[clusters]] runs
    * on the CONTRACTED graph — vertices are the touched labels plus the
    * batch's new addresses, never the universe. Because stored labels are
    * component MINIMA, composition preserves the invariant: the contracted
    * component's min over {old labels, new addresses} IS the merged
    * component's min member, so incremental-then-upsert equals a full
    * recompute exactly (property-gated against [[clusters]] on the unioned
    * history).
    *
    * @param oldLabels  the stored labeling — (address, wallet_id)
    * @param newFunders (tx_hash, src_address) funding pairs of the NEW
    *                   batch only
    * @return the DELTA: (address, wallet_id) ONLY for addresses whose
    *         stored row must change — new addresses, plus members of
    *         stored clusters merged by the batch. Upsert into the stored
    *         labeling; an empty batch yields an empty delta.
    */
  def incrementalClusters(oldLabels: DataFrame, newFunders: DataFrame): DataFrame = {
    val old = oldLabels.select(col("address"), col("wallet_id"))
    val funders = newFunders
      .select(col("tx_hash"), col("src_address").as("address")).distinct()
    // contract: funder → its stored component label (itself when unseen)
    val contracted = funders.join(old, Seq("address"), "left")
      .select(col("tx_hash"),
        coalesce(col("wallet_id"), col("address")).as("src_address"))
      .distinct()
    val nodes = contracted.select(col("src_address").as("address")).distinct()
    // (contracted node → merged-component label); routing, star edges and
    // cache discipline are clusters' own
    val relabel = clusters(nodes, contracted)
      .select(col("address").as("node"), col("wallet_id").as("new_id"))

    // members of stored clusters whose label moves
    val movedLabels = relabel.where(col("node") =!= col("new_id"))
    val movedMembers = old
      .join(movedLabels, old("wallet_id") === movedLabels("node"))
      .select(col("address"), col("new_id").as("wallet_id"))
    // batch addresses not stored yet (insert, merged label or self)
    val newAddrs = funders.select("address").distinct()
      .join(old.select("address"), Seq("address"), "left_anti")
    val newRows = newAddrs
      .join(relabel, newAddrs("address") === relabel("node"), "left")
      .select(col("address"),
        coalesce(col("new_id"), col("address")).as("wallet_id"))
    movedMembers.unionByName(newRows)
  }
}
