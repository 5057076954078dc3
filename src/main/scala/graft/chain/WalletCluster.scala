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

  /** Stored-row floor below which [[repairAfterReorg]] always takes the
    * recompute-diff route — see its route-economics note for the
    * calibration against the archived 1×/10×/30× rehearsal scales.
    */
  val ContractionMinStoreRows: Long = 500000L

  /** Route the last [[repairAfterReorg]] call took — observability for
    * specs and rehearsals. One of: "noop", "replace", "mass", "contraction".
    */
  @volatile private[graft] var lastRepairRoute: String = ""

  /** The previous invocation's materialized clustering — swapped per call so
    * repeated runs (bench reruns) hold ONE copy, not one per run (same
    * discipline as BestChain.lastAnn).
    */
  private val lastResult =
    new java.util.concurrent.atomic.AtomicReference[org.apache.spark.rdd.RDD[_]](null)

  /** The mass repair route's materialized best-chain funders — same swap
    * discipline (the route's OUTPUT is lazy, so the input must outlive the
    * call; the next repair or [[release]] drops it).
    */
  private val lastMassBf =
    new java.util.concurrent.atomic.AtomicReference[org.apache.spark.rdd.RDD[_]](null)

  /** Drop the retained clustering ([[graft.Graft.releaseCaches]]). */
  private[graft] def release(): Unit = {
    Option(lastResult.getAndSet(null)).foreach(_.unpersist(blocking = false))
    Option(lastMassBf.getAndSet(null)).foreach(_.unpersist(blocking = false))
  }

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
    // Both frames below are BATCH-grain (the day's funding pairs and their
    // contraction — never the store or the chain) and each is consumed
    // several times by the nested clustering (distincts, the hub self-join,
    // the node universe, the two output joins): materialize each ONCE.
    // Lineage roots in the immutable bronze/batch source, so the eager
    // local checkpoint risks nothing a batch retry wouldn't recover —
    // measured 2× on the catch-up drain's middle batches left lazy.
    val funders = newFunders
      .select(col("tx_hash"), col("src_address").as("address")).distinct()
      .localCheckpoint(true)
    // contract: funder → its stored component label (itself when unseen)
    val contracted = funders.join(old, Seq("address"), "left")
      .select(col("tx_hash"),
        coalesce(col("wallet_id"), col("address")).as("src_address"))
      .distinct()
      .localCheckpoint(true)
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

  /** REORG repair for the stored labeling — the retraction half of
    * [[incrementalClusters]], completing the one derived property the
    * reference never finished (`AddressWalletID`, TransactionGraph.java:137)
    * with the delete-path semantics it wrote for every aggregate it DID
    * finish (BlockchainToGraph.java:568–777). Co-spend merges are monotone,
    * so a reorg that drops the merging transaction can SPLIT a stored
    * component; no edge-level inverse exists, and the repair mirrors the
    * gold sink's contract instead: derive the affected set from the reorged
    * range, recompute exactly that set from best-chain bronze, leave
    * everything else untouched.
    *
    *  1. affected components = stored labels of the invalidated txs'
    *     funders (every component containing a removed edge; no other
    *     component can split, because its internal edges are all intact).
    *  2. their members' co-spend edges are re-derived from `bestFunders`
    *     restricted to member-funded txs — including new-branch txs, so a
    *     replacement block re-mining the same tx re-creates the edge.
    *  3. funders of those txs OUTSIDE the affected set join the re-cluster
    *     CONTRACTED through their stored label (their components cannot
    *     split; min-label composition keeps the merged min exact, as in
    *     [[incrementalClusters]]).
    *
    * Cost: the components step is O(affected members + their txs); the one
    * corpus-sized input, `bestFunders`, is consumed through semi-joins that
    * push down to the bronze scan — the same rare-path bronze read the
    * partitioned gold sink's reorg recompute performs.
    *
    * NOT handled here: txs present ONLY in the replacement blocks and
    * funded entirely by unaffected addresses — those are ordinary NEW
    * transactions; feed them through [[incrementalClusters]] after this
    * repair (the property suite gates exactly that composition against a
    * full recompute of the post-reorg chain).
    *
    * ROUTE ECONOMICS: the contraction route is O(affected) in DATA but pays
    * a fixed ladder of ~10 jobs (affected probe, member materialization,
    * contraction joins, the nested clustering); the recompute-diff route
    * re-clusters the whole post-reorg chain and diffs the store — O(store)
    * data, fewer jobs. Measured route-vs-route on the many-small-components
    * rehearsal corpus (0.5% of wallets affected, bench/rehearsal_r15.json):
    * at a 100k-row store the recompute-diff route wins ~5.1 s vs ~5.8 s; at
    * 1M contraction wins ~14–16 s vs ~23.7 s, and at 3M it wins ~15.0 s vs
    * ~25.9 s — the fixed job ladder amortizes where the store crosses a few
    * hundred thousand rows. Below [[ContractionMinStoreRows]] the router
    * goes one step further: the store is driver-sized by the same bound, so
    * the REPLACE route collects it, recomputes the post-reorg clustering
    * once and diffs in memory — no store joins at all, repair ≈ the full
    * recompute plus two tiny collects (r15's small-store premium was the
    * distributed diff machinery itself). Above the floor the member
    * fraction picks mass vs contraction; `contractionMinStore` overrides
    * the floor (0 forces the distributed routes — the spec fixtures pin the
    * contraction route's output shape that way).
    *
    * @param oldLabels    the stored labeling — (address, wallet_id), built
    *                     on the pre-reorg best chain
    * @param invalidated  (tx_hash, src_address) funding pairs of the
    *                     reorged-OUT blocks (the edges being retracted)
    * @param bestFunders  (tx_hash, src_address) funding pairs of the
    *                     current post-reorg best chain
    * @param contractionMinStore stored-row floor below which the
    *                     recompute-diff route is always taken
    * @return REPLACEMENT rows (address, wallet_id) for every stored member
    *         of an affected component (split members re-label, possibly to
    *         themselves), plus every member of an unaffected component
    *         whose label changes through a merge. Upsert into the store;
    *         unaffected rows are never emitted. A member address absent
    *         from the post-reorg chain keeps a singleton self-labeled row —
    *         semantically a one-address wallet; the next full recompute
    *         drops it with the rest of the vanished universe.
    */
  def repairAfterReorg(
      oldLabels: DataFrame, invalidated: DataFrame,
      bestFunders: DataFrame,
      contractionMinStore: Long = ContractionMinStoreRows): DataFrame = {
    lastRepairRoute = "noop"
    val old = oldLabels.select(col("address"), col("wallet_id"))
    val invAddrs = invalidated.select(col("src_address").as("address")).distinct()
    // REPLACE route — store below the economics floor: the store bounds the
    // universe (up to the replacement branch's new addresses), so the whole
    // labeling is driver-sized BY THE SAME BOUND that routes here, and the
    // diff that costs a store-join ladder at scale is a hash-map pass. Cost
    // = ONE clustering of the post-reorg chain (exactly what the full
    // recompute this route is measured against) + two driver-sized collects;
    // r15's measured premium over the full recompute on small stores — the
    // corpus-grain bestFunders materialization plus the 3-way diff join of
    // the mass route below — is gone. Output contract unchanged: only
    // genuinely changed rows, vanished affected members self-labeled.
    //
    // ONE bounded probe answers the routing question AND (on the replace
    // path) IS the store snapshot the diff needs: collecting up to
    // min(floor, driver-cap + 1) rows tells us whether the store fits under
    // BOTH bounds, and when it does the probe already holds every row — the
    // separate count + collect of r16 (two scheduled jobs, each ~a tenth of
    // the whole small-store repair) collapse into one. A store at or above
    // the probe cap routes distributed and pays its exact count there (the
    // mass/contraction decision needs it; at that scale a parquet-backed
    // count is metadata-cheap).
    val driverCap = math.min(ChainOps.BroadcastMaxRows, (Int.MaxValue - 2).toLong)
    val probeCap = math.min(contractionMinStore, driverCap + 1).toInt
    val storedProbe =
      if (probeCap > 0) old.limit(probeCap).collect() else Array.empty[org.apache.spark.sql.Row]
    // Replace route iff the probe returned the WHOLE store strictly under
    // its cap: nStored = probe length < min(floor, cap+1) implies both
    // belowFloor and the driver bound. The hard driver bound stays separate
    // from the economics floor: callers force routes by moving the floor
    // (0 = contraction, MaxValue = mass), and a forced-mass call on a
    // multi-million-row store must stay distributed — this route only ever
    // collects what a broadcast would ship.
    if (probeCap > 0 && storedProbe.length < probeCap) {
      val spark = oldLabels.sparkSession
      import spark.implicits._
      // No-op pre-route as a LIMIT-1 probe, not a full derivation: this is
      // the only place the route touches `invalidated` at all. The r16 leg
      // decomposition put the small-store premium (repair 1.6–1.9× over the
      // bare recompute) in exactly the invalidated-side work only the repair
      // path paid — the full distinct+collect of invalidated funder
      // addresses and the affected-component gate over them — so the route
      // now skips both: a nonempty probe costs one pushed-down row, and the
      // diff below is correct with or without the gate (a gate-worthy no-op
      // just produces an empty diff the long way — rare, and bounded by the
      // small-store recompute this route already costs).
      if (invalidated.isEmpty)
        return old.select(col("address"), col("wallet_id")).where(lit(false))
      val storedRows = storedProbe.map(r => (r.getString(0), r.getString(1)))
      val bf = bestFunders
        .select(col("tx_hash"), col("src_address").as("address"))
      lastRepairRoute = "replace"
      val storedAddrs = storedRows.toSeq.map(_._1).toDF("address")
      // The diff below reads fresh labels at STORED addresses only (changed
      // members re-label, vanished members self-label; new addresses are
      // never emitted), so the whole-universe labeling clusters() builds is
      // overkill here: its final pass distincts the corpus-grain universe
      // and left-joins the labels — a shuffle and a job whose only consumer
      // would be a ≤nStored-row lookup. Inline the clustering instead: the
      // SAME min-address-hub edge derivation, and UnionFind labels by
      // component minimum — canonical across every route. No presence pass
      // either: a stored address with NO kept co-spend edge emits (a, a)
      // when its label moved whether it is a kept SINGLETON (fresh label =
      // itself) or VANISHED from the post-reorg chain (self-labeled by the
      // output contract) — the two cases produce the same row, so the
      // post-reorg universe is never consulted. Everything collected is
      // structurally bounded: edges by the broadcast envelope (beyond it,
      // the distributed clustering restricted to the broadcast stored set —
      // a post-reorg funder universe that dwarfs the store, the
      // ADVICE-flagged hazard, semi-joins down to ≤ nStored rows).
      val fu = bf.distinct()
      val hubs = fu.groupBy("tx_hash").agg(min("address").as("hub"))
      val edgeRows = fu.join(hubs, "tx_hash")
        .where(col("address") =!= col("hub"))
        .select(col("address").as("src"), col("hub").as("dst"))
        .distinct()
      val (edgeDf, edgeRdd, nEdges) = ChainOps.rebaseCounted(edgeRows)
      val freshAt: String => String =
        if (nEdges <= driverCap) {
          val labels = graft.operators.UnionFind.components(
            edgeDf.collect().iterator.map(r => (r.getString(0), r.getString(1))))
          edgeRdd.unpersist(blocking = false)
          a => labels.getOrElse(a, a)
        } else {
          // co-spend edges outgrew the driver envelope under a tiny store
          // (pathologically dense corpus): distributed clustering, restricted
          // to the stored universe before it leaves the cluster. An address
          // absent from the restricted result (vanished) self-labels — same
          // rule as the in-memory arm.
          edgeRdd.unpersist(blocking = false)
          val freshRows = clusters( // clusters distincts both inputs itself
              bf.select("address"),
              bf.select(col("tx_hash"), col("address").as("src_address")))
            .join(broadcast(storedAddrs), Seq("address"), "left_semi")
            .collect()
          val m = freshRows.iterator.map(r => r.getString(0) -> r.getString(1)).toMap
          a => m.getOrElse(a, a)
        }
      // same emission rule as the mass route's diff join, as a map pass:
      // changed labels (including unaffected components merged by
      // replacement-branch edges), and vanished members singleton. A
      // vanished stored member is PROVABLY affected — its every pre-reorg
      // funding pair must have been in the retracted blocks, or it would
      // still appear post-reorg — so the old affected-set test it used to
      // ride on was redundant (and already-singleton rows skip on nw == w).
      val out = storedRows.iterator.flatMap { case (a, w) =>
        val nw = freshAt(a)
        if (nw != w) Some((a, nw)) else None
      }.toSeq
      return out.toDF("address", "wallet_id")
    }
    // the probe said "not driver-sized": the distributed routes need the
    // exact count (mass-vs-contraction compares member fraction to it)
    val nStored = old.count()
    val belowFloor = nStored < contractionMinStore
    // 1. components with >=1 retracted edge — materialized ONCE: the set is
    // LABEL-grain (small on every route — a handful of labels on the
    // giant-component mass case, one per touched wallet on the shallow
    // case), but its derivation nests a store-scan semi-join, and every
    // consumer below (the no-op pre-route, the member-count route decision,
    // and the chosen route's plan) would otherwise re-pay that scan inside
    // its own. The count rides the materialization pass and IS the no-op
    // pre-route: a reorg whose invalidated blocks carry no funders (empty
    // blocks), or whose funders never reached the store, cannot split or
    // merge anything — and concluding emptiness costs the full semi-join
    // scan whether probed lazily or materialized.
    val (affected, affectedRdd, nAffected) = ChainOps.rebaseCounted(
      old.join(invAddrs, Seq("address"), "left_semi")
        .select(col("wallet_id")).distinct())
    try {
      if (nAffected == 0)
        return old.select(col("address"), col("wallet_id")).where(lit(false))
      // NOT distinct'ed here: a corpus-wide distinct is a full shuffle per
      // consumer, and every consumer below either semi-joins bf down to the
      // affected neighborhood first (then distincts the small result) or—on
      // the mass route—feeds clusters, which distincts its input itself.
      val bf = bestFunders
        .select(col("tx_hash"), col("src_address").as("address"))
      // Count-only route decision: on the mass route the member set is
      // store-sized and read nowhere below, so persisting it (as the
      // contraction route must — it reads the set several times) is pure
      // cache churn at exactly the scale where churn hurts. The contraction
      // route re-derives the set once under a persist; one extra store-scan
      // semi-join on the SMALL-affected path buys never caching a store-sized
      // relation on the giant-component path.
      val memberSet =
        old.join(affected, Seq("wallet_id"), "left_semi").select("address")
      // belowFloor already decides the route — skip the member-count probe
      // (it was a fifth of the whole repair on the small-store path)
      val nMembers = if (belowFloor) 0L else memberSet.count()
      // MASS-reorg route: when the affected components span most of the
      // store (one giant co-spend component is common on dense corpora),
      // the contraction machinery below re-clusters nearly everything
      // anyway and its derivation joins make it SLOWER than the recompute
      // it exists to avoid (measured 4× at corpus scale). Recompute the
      // best-chain labeling once and diff against the store — same output
      // contract, cost capped at one full clustering. belowFloor forces this
      // route when a caller pinned the floor above a store too large for the
      // driver-side replace route (the leg that measures the mass
      // alternative does exactly that).
      if (belowFloor || nMembers * 2 >= nStored) {
        lastRepairRoute = "mass"
        // the recompute consumes bf ~4× (universe distinct, funder distinct,
        // hub self-join, the final label join) — materialize it ONCE, held
        // in the swap register because the route's output is lazy. The
        // contraction route deliberately does NOT do this: its consumers
        // are semi-joins that push down to the source scan, and a corpus-
        // sized persist on the O(affected) path is exactly the cache churn
        // the route exists to avoid.
        val (bfM, bfRdd) = ChainOps.rebase(
          bf, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        Option(lastMassBf.getAndSet(bfRdd)).foreach(_.unpersist(blocking = false))
        val fresh = clusters( // clusters distincts both inputs itself
            bfM.select("address"),
            bfM.select(col("tx_hash"), col("address").as("src_address")))
          .select(col("address"), col("wallet_id").as("new_id"))
        // ONE pass over the store consuming fresh ONCE (the in-memory
        // clusters route returns an unmaterialized corpus-distinct + broadcast
        // join — a second consumer re-pays that whole subtree): label moves
        // (including unaffected components merged by replacement-branch
        // edges) and vanished affected members (absent from the post-reorg
        // chain: singleton themselves) fall out of the same left join. The
        // affected-label marker joins on wallet_id — label-grain, AQE
        // broadcasts it when small (the common giant-component case).
        return old
          .join(affected.withColumn("_aff", lit(true)), Seq("wallet_id"), "left")
          .join(fresh, Seq("address"), "left")
          .where((col("new_id").isNotNull && col("new_id") =!= col("wallet_id")) ||
            (col("new_id").isNull && col("_aff").isNotNull &&
              col("wallet_id") =!= col("address")))
          .select(col("address"), coalesce(col("new_id"), col("address")).as("wallet_id"))
      }
      // Materialized here (and only here): every contraction step below reads
      // the member set at least once.
      lastRepairRoute = "contraction"
      val (members, membersRdd) = ChainOps.rebase(memberSet)
      try {
        // 2. every best-chain tx a member funds, and ALL funders of those txs
        val relevantTxs = bf.join(members, Seq("address"), "left_semi")
          .select("tx_hash").distinct()
        val relevantPairs = bf.join(relevantTxs, Seq("tx_hash"), "left_semi")
        // 3. members stay raw nodes; outside funders contract to their stored
        //    label (or themselves when unseen — a brand-new replacement-branch
        //    address)
        // Materialized ONCE: clusters() consumes its input through several
        // distincts/joins and every one would otherwise re-evaluate the whole
        // derivation above — including the corpus-sized bf semi-joins — ~5×
        // (measured: 9 s of a 19 s repair on a 1M-address store). The
        // contracted graph itself is affected-sized, so the rebase is tiny.
        val (contractedDf, contractedRdd) = ChainOps.rebase(relevantPairs
          .join(members.withColumn("_member", lit(true)), Seq("address"), "left")
          .join(old, Seq("address"), "left")
          .select(col("tx_hash"),
            when(col("_member").isNotNull, col("address"))
              .otherwise(coalesce(col("wallet_id"), col("address")))
              .as("src_address"))
          .distinct())
        try {
          // membership-only members (all their edges were retracted) cluster
          // as singletons via the node universe
          val nodes = contractedDf.select(col("src_address").as("address"))
            .unionByName(members).distinct()
          val relabel = clusters(nodes, contractedDf)
            .select(col("address").as("node"), col("wallet_id").as("new_id"))

          val memberRows = members
            .join(relabel, members("address") === relabel("node"))
            .select(col("address"), col("new_id").as("wallet_id"))
          // unaffected components pulled into a merge: node was a stored LABEL
          // (not a member address) and its id moved — relabel all its members,
          // exactly incrementalClusters' moved-label step
          val movedLabels = relabel
            .where(col("node") =!= col("new_id"))
            .join(members, relabel("node") === members("address"), "left_anti")
          val movedMembers = old
            .join(movedLabels, old("wallet_id") === movedLabels("node"))
            .select(col("address"), col("new_id").as("wallet_id"))
          // Collected by every caller before the register is reused; the
          // member set is small (affected components only) on this route.
          memberRows.unionByName(movedMembers)
        } finally { contractedRdd.unpersist(blocking = false); () }
      } finally { membersRdd.unpersist(blocking = false); () }
    } finally { affectedRdd.unpersist(blocking = false); () }
  }
}
