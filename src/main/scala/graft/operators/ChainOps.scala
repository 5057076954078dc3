package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Chain (linked-list / forest) analytics, replacing the reference's Gremlin
  * `repeat(out("chain")).until(...)` traversal (BlockchainToGraph.java:43–44)
  * and its 1,126-block reorder buffer (BlockchainToGraph.java:389–412).
  *
  * A per-hop traversal is O(depth) storage round-trips in the reference; here
  * `rootsAndDepths` uses pointer doubling — each iteration one self equi-join
  * that doubles every node's resolved prefix, so a chain of depth d converges
  * in ceil(log2 d) shuffle rounds (~20 joins for a ~1M-block chain at 100 TB).
  * Intermediate state is persisted and re-planned from a flat scan each round
  * so the logical plan never grows.
  */
object ChainOps {

  /** Truncate a DataFrame's lineage at the RDD level: compile + materialize
    * the rows into a cached RDD and re-wrap with a fresh LogicalRDD.
    *
    * This is the iteration primitive for the doubling loops. Plain
    * `persist()` leaves the logical plan growing (it doubles per self-join
    * round → 2^rounds plan nodes), and Spark 4's `localCheckpoint()` runs
    * `rewriteStatsAndConstraints` over the pre-checkpoint plan whose
    * constraint/stats rewrite goes combinatorial across chained self-join
    * rounds (observed: driver pinned for minutes at 13 rounds). Dropping to
    * the RDD erases Catalyst state entirely: the next round plans against a
    * flat scan, every round, at constant cost. Returns the rebased frame and
    * its backing RDD so callers can unpersist the previous round.
    */
  private[graft] def rebase(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val rdd = df.rdd
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // materialize now so the previous round can be dropped
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** Resolve each node's root and depth in a parent-pointer forest.
    *
    * @param nodes  rows with (idCol, parentCol); parentCol NULL marks a root.
    *               ids must be unique; parents must reference existing ids.
    * @return DataFrame(idCol, root, height) — height 0 at roots, root = the
    *         id of the chain's origin (≙ genesis block).
    */
  def rootsAndDepths(nodes: DataFrame, idCol: String, parentCol: String): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._

    // Root nodes point at themselves with dist 0 — the self-loop makes the
    // doubling join total (every ptr resolves) and gives a clean fixpoint.
    // Each round is rebased to a cached RDD ([[rebase]]): the logical plan
    // stays a flat scan instead of doubling per self-join round.
    var (state, stateRdd) = rebase(nodes
      .select(
        col(idCol).as("id"),
        coalesce(col(parentCol), col(idCol)).as("ptr"),
        when(col(parentCol).isNull, lit(0L)).otherwise(lit(1L)).as("dist"),
        col(parentCol).isNull.as("done")))

    var unresolved = state.where(!$"done").limit(1).count()
    while (unresolved > 0) {
      val hop = state.select(
        $"id".as("h_id"), $"ptr".as("h_ptr"), $"dist".as("h_dist"), $"done".as("h_done"))
      // Left join: a dangling pointer (orphan whose parent was never seen —
      // the case the reference dies on, BlockchainToGraph.java:431) resolves
      // as its own root instead of silently dropping the row.
      val (next, nextRdd) = rebase(state
        .join(hop, state("ptr") === hop("h_id"), "left")
        .select(
          $"id",
          when($"done" || $"h_id".isNull, $"ptr").otherwise($"h_ptr").as("ptr"),
          when($"done" || $"h_id".isNull, $"dist").otherwise($"dist" + $"h_dist").as("dist"),
          ($"done" || $"h_id".isNull || $"h_done").as("done")))
      stateRdd.unpersist(blocking = false)
      val remaining = next.where(!$"done").limit(1).count()
      state = next
      stateRdd = nextRdd
      unresolved = remaining
    }
    val out = state.select($"id".as(idCol), $"ptr".as("root"), $"dist".as("height"))
    out
  }

  /** Depth only — the `BlockHeight` assignment of the reference
    * (BlockchainToGraph.java:364, 458, 516) computed set-wise.
    */
  def depths(nodes: DataFrame, idCol: String, parentCol: String): DataFrame =
    rootsAndDepths(nodes, idCol, parentCol).drop("root")

  /** Pregel alternative to [[rootsAndDepths]] — the general graph-traversal
    * form of the reference's `repeat(out("chain")).until(...)` for when the
    * structure is not a simple forest (SURVEY.md §2.3 J3). Messages flow
    * root→leaf: each vertex adopts parent depth + 1; converges in
    * O(depth) supersteps of partition-local message passing (vs O(log d)
    * shuffles for doubling — Pregel supersteps are cheaper per round,
    * doubling needs fewer rounds; both ship).
    */
  def depthsPregel(nodes: DataFrame, idCol: String, parentCol: String): DataFrame = {
    import org.apache.spark.graphx.{Edge, EdgeDirection, Graph, Pregel}
    val spark = nodes.sparkSession
    import spark.implicits._
    // Dense unique vertex ids assigned distributively; the parent→vid lookup
    // is a JOIN against the same table (pattern of WalletCluster.clusters) —
    // no driver-held hash map, so a 1M-block forest never funnels through
    // the driver.
    val base = nodes.select(col(idCol).as("id"), col(parentCol).as("parent"))
    val vdf = base.select("id").rdd.map(_.getString(0)).zipWithUniqueId()
      .toDF("id", "vid").persist(StorageLevel.MEMORY_AND_DISK)
    val withIds = base.join(vdf, "id")
      .join(vdf.select(col("id").as("parent"), col("vid").as("parent_vid")),
        Seq("parent"), "left") // dangling parent (orphan) → null = root
      .select($"id", $"vid", $"parent_vid")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // edge parent → child carries the depth increment
    val edges = withIds.where($"parent_vid".isNotNull)
      .select($"parent_vid", $"vid")
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val roots = withIds
      .select($"vid", $"id", $"parent_vid".isNull.as("is_root"))
      .rdd.map(r => (r.getLong(0), (r.getString(1), if (r.getBoolean(2)) 0L else Long.MinValue)))
    val graph = Graph(roots, edges)
    val resolved = Pregel(graph, Long.MinValue, activeDirection = EdgeDirection.Out)(
      vprog = (_, attr, msg) => (attr._1, math.max(attr._2, msg)),
      sendMsg = t =>
        if (t.srcAttr._2 >= 0 && t.dstAttr._2 < t.srcAttr._2 + 1)
          Iterator((t.dstId, t.srcAttr._2 + 1))
        else Iterator.empty,
      mergeMsg = math.max)
    resolved.vertices.map { case (_, (id, d)) => (id, d) }.toDF(idCol, "height")
  }

  /** Chain tip = maximal height — the reference's getBestAndHeight
    * (BlockchainToGraph.java:38–49) without any traversal: with height
    * materialized this is a single agg, and with height-bucketed partitioning
    * it prunes to the last partition.
    */
  def bestTip(blocksWithHeight: DataFrame, heightCol: String): DataFrame =
    blocksWithHeight.orderBy(col(heightCol).desc).limit(1)
}
