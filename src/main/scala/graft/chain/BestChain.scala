package graft.chain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ChainOps

/** Best-chain resolution over an append-only block set — the Spark-native
  * replacement for the reference's tip traversal
  * (`repeat(out("chain")).until(...)`, BlockchainToGraph.java:38–49) and its
  * mutable reorg delete-path (BlockchainToGraph.java:523–777). Blocks are
  * never mutated: the best chain is a VIEW over immutable bronze, so a reorg
  * is just this computation returning a different answer (SURVEY.md §2.9 T4).
  *
  * Scale: heights come from pointer doubling (O(log depth) self-joins,
  * ChainOps); chain membership from ancestor doubling — the frontier set S_k
  * holds the 2^k nearest ancestors of the tip and one join per round against
  * the 2^k-jump table doubles it, so a 1M-block chain resolves in ~20 rounds
  * of ≤1M-row hash joins. Each round is localCheckpoint'ed: the logical plan
  * stays flat instead of doubling per iteration.
  */
object BestChain {

  /** (hash, height) for every block in a parent-pointer forest. */
  def heights(blocks: DataFrame): DataFrame =
    ChainOps.rootsAndDepths(blocks.select("hash", "parent_hash"), "hash", "parent_hash")
      .select(col("hash"), col("height").cast("int").as("height"))

  /** blocks + (height, is_on_best_chain). Best tip = max height, ties broken
    * by min hash (deterministic; the reference takes file order —
    * BlockchainToGraph.java:91–102 — which a batch engine cannot see).
    * Alias of [[annotateDistributed]], which already routes adaptively:
    * forests inside the broadcast envelope resolve in one in-memory pass,
    * larger ones take the doubling path.
    */
  def annotate(blocks: DataFrame): DataFrame = annotateDistributed(blocks)

  /** The in-memory walk shared by every envelope route: memoized height
    * walk over a collected parent forest, tip pick, best-chain walk.
    * Returns (heights, on-chain set) — phantom parents (dangling pointers,
    * never seen as blocks) are INCLUDED in the memo at their saturate-at-
    * root positions and must be filtered by the caller against its id set.
    */
  private def resolveInMemory(pairs: Array[org.apache.spark.sql.Row],
      connectedOnly: Boolean = false)
      : (scala.collection.mutable.HashMap[String, Int],
         scala.collection.mutable.HashSet[String]) = {
    // node → parent for every non-null pointer, INCLUDING dangling ones
    // (parents never seen as blocks): the walk terminates at the phantom
    // parent, so a dangling pointer counts its one unresolvable hop —
    // exactly ChainOps' saturate-at-root semantics (a null-parent root sits
    // at height 0, a dangling-parent block at 1), which the bk6 oracle pins.
    // connectedOnly restricts the TIP COMPETITION to genesis-rooted blocks
    // (walks ending at a null-parent block, not a phantom) — heights keep
    // the total semantics, the chain just never seats an orphan fragment.
    val parentOf: Map[String, String] = pairs.flatMap(r =>
      Option(r.getString(1)).map(r.getString(0) -> _)).toMap
    val ids: Set[String] =
      if (connectedOnly) pairs.iterator.map(_.getString(0)).toSet else Set.empty
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    val grounded = scala.collection.mutable.HashSet.empty[String]
    pairs.foreach { r =>
      // walk up to the first memoized ancestor or a root (stack-safe),
      // then assign heights back down the walked path. Step cap = cycle
      // guard: a legitimate walk visits each block at most once, so more
      // steps than blocks proves a parent-pointer loop (corrupt input —
      // real block hashes can't cycle) and the walk must error, not hang.
      var stack = List.empty[String]
      var cur = r.getString(0)
      var steps = 0
      while (!memo.contains(cur) && parentOf.contains(cur)) {
        steps += 1
        if (steps > pairs.length) throw new IllegalStateException(
          "cyclic parent pointers in block input — cannot resolve heights")
        stack ::= cur
        cur = parentOf(cur)
      }
      val curGrounded = connectedOnly &&
        (grounded.contains(cur) || (!memo.contains(cur) && ids.contains(cur)))
      var hh = memo.getOrElseUpdate(cur, 0)
      if (curGrounded) { grounded += cur; grounded ++= stack }
      stack.foreach { n => hh += 1; memo(n) = hh }
    }
    val candidates = if (connectedOnly) memo.view.filterKeys(grounded) else memo.view
    if (candidates.isEmpty)
      return (memo, scala.collection.mutable.HashSet.empty[String])
    val (tip, tipH) = candidates.minBy { case (k, v) => (-v, k) }
    val onChain = scala.collection.mutable.HashSet(tip)
    var cur = tip
    var steps = tipH
    while (steps > 0) {
      parentOf.get(cur).foreach { p => onChain += p; cur = p }
      steps -= 1
    }
    (memo, onChain)
  }

  /** One-pass in-memory resolution of a collected parent forest. Shared by
    * [[annotate]]'s driver route and [[annotateDistributed]]'s
    * broadcast-envelope route — identical semantics by construction.
    */
  private def annotateInMemory(
      blocks: DataFrame, pairs: Array[org.apache.spark.sql.Row]): DataFrame = {
    if (pairs.isEmpty) return blocks
      .withColumn("height", lit(0).cast("int"))
      .withColumn("is_on_best_chain", lit(false))
      .where(lit(false))
    val (memo, onChain) = resolveInMemory(pairs)
    val spark = blocks.sparkSession
    // phantom memo entries drop out of the join (they are not block rows)
    val ann = spark.createDataFrame(
      memo.toSeq.map { case (k, v) => (k, v, onChain.contains(k)) })
      .toDF("hash", "height", "is_on_best_chain")
    blocks.join(ann, "hash")
  }

  /** (hash, height) of the BEST CHAIN only — the streaming maintainer's
    * form of [[annotate]]: it never needs heights of stale branches, so on
    * the envelope route the whole answer is derived in the one driver pass
    * and returned as a LOCAL relation — no join back against the block set,
    * no shuffle, no distributed materialization. On a fragment-attaching
    * catch-up drain this is the difference between a ~1 s resolution and a
    * chain × chain join per micro-batch. Above the envelope it is the
    * filtered distributed annotation, unchanged.
    */
  def bestChain(blocks: DataFrame): DataFrame = {
    import ChainOps.traced
    val spark = blocks.sparkSession
    import spark.implicits._
    val envelope = math.min(ChainOps.BroadcastMaxRows, (Int.MaxValue - 1).toLong).toInt
    val probe = traced("bestChain: envelope probe")(blocks
      .select("hash", "parent_hash")
      .limit(envelope + 1).collect())
    if (probe.length <= envelope) {
      if (probe.isEmpty)
        return Seq.empty[(String, Int)].toDF("hash", "height")
      val (memo, onChain) = traced("bestChain: in-memory walk")(
        resolveInMemory(probe))
      val ids = probe.iterator.map(_.getString(0)).toSet
      // phantom parents saturate the walk but are not blocks — filter them
      val rows = memo.iterator.collect {
        case (k, v) if onChain.contains(k) && ids.contains(k) => (k, v)
      }.toSeq
      rows.toDF("hash", "height")
    } else
      annotateDistributed(blocks)
        .where(col("is_on_best_chain"))
        .select(col("hash"), col("height").cast("int").as("height"))
  }

  /** [[bestChain]] restricted to GENESIS-ROOTED blocks — the incremental
    * maintainer's semantics (the reference's reorder buffer,
    * BlockchainToGraph.java:34–35): an orphan-rooted fragment, however
    * long, is not a tip candidate until it connects, so a catch-up drain's
    * shuffled arrivals never seat a fragment as the chain only to rebase it
    * away next batch. EMPTY when no null-parent root has arrived yet. The
    * batch annotator's total orphan semantics (the bk1/bk6 oracles) are
    * untouched — this variant exists for the maintainer's full routes only.
    * Above the envelope: one rootsAndDepths pass classifies components,
    * then the standard annotator runs on the genesis-rooted subset.
    */
  def bestChainConnected(blocks: DataFrame): DataFrame =
    bestChainConnectedWithFrontier(blocks,
      math.min(ChainOps.BroadcastMaxRows, (Int.MaxValue - 1).toLong).toInt)._1

  /** [[bestChainConnected]] with a CALLER-CHOSEN driver-walk envelope, and —
    * when the walk route ran — the off-chain index the same probe already
    * proves: (dangling parent hashes, pending block → parent). The
    * streaming maintainer's full routes pass a wider envelope than the
    * broadcast cap (the probe is read once per full resolution, reduced
    * immediately to the chain plus a capped frontier, and never broadcast),
    * which turns the once-per-deployment catch-up bootstrap from a
    * distributed doubling resolution into the same driver cascade the
    * fragment-drain attach path uses — and hands the maintainer its
    * post-batch [[graft.streaming.ChainStream.Frontier]] for free, where
    * the distributed route's callers must re-derive it with two bronze
    * anti-joins. `None` in the second slot = the distributed route ran
    * (chain above the envelope).
    */
  private[graft] def bestChainConnectedWithFrontier(
      blocks: DataFrame, envelope: Int)
      : (DataFrame, Option[(Set[String], Map[String, String])]) = {
    import ChainOps.traced
    val spark = blocks.sparkSession
    import spark.implicits._
    val probe = traced("bestChainConnected: envelope probe")(blocks
      .select("hash", "parent_hash")
      .limit(envelope + 1).collect())
    if (probe.length <= envelope) {
      if (probe.isEmpty)
        return (Seq.empty[(String, Int)].toDF("hash", "height"),
          Some((Set.empty, Map.empty)))
      val (memo, onChain) = traced("bestChainConnected: in-memory walk")(
        resolveInMemory(probe, connectedOnly = true))
      val ids = probe.iterator.map(_.getString(0)).toSet
      val rows = memo.iterator.collect {
        case (k, v) if onChain.contains(k) && ids.contains(k) => (k, v)
      }.toArray
      val dangling = probe.iterator
        .flatMap(r => Option(r.getString(1))).filterNot(ids).toSet
      val pending = probe.iterator.collect {
        case r if !onChain.contains(r.getString(0)) =>
          r.getString(0) -> r.getString(1)
      }.toMap
      // parallelize, don't LocalRelation: a chain-sized local relation
      // converts to internal rows single-threaded ON THE DRIVER when the
      // caller materializes it (measured ~17 s of the 30× bootstrap's final
      // batch for 1.5M rows); an RDD splits the same conversion across the
      // executor threads.
      val slices = math.max(1, math.min(
        spark.sparkContext.defaultParallelism, rows.length))
      val chainDf =
        if (rows.isEmpty) Seq.empty[(String, Int)].toDF("hash", "height")
        else spark.sparkContext.parallelize(rows.toIndexedSeq, slices)
          .toDF("hash", "height")
      (chainDf, Some((dangling, pending)))
    } else {
      // No dangling reference in bronze ⇒ every root is a null-parent block
      // ⇒ connected == total, and the classification pass (a SECOND
      // doubling resolution) is pure waste — this is exactly the state a
      // drain converges to, where the one honest full batch runs. One
      // anti-join probe decides.
      val anyDangling = !blocks
        .select(col("parent_hash").as("h")).where(col("h").isNotNull)
        .join(blocks.select(col("hash").as("h")), Seq("h"), "left_anti")
        .isEmpty
      val groundedBlocks =
        if (!anyDangling) blocks
        else {
          val rd = ChainOps.rootsAndDepths(
            blocks.select("hash", "parent_hash"), "hash", "parent_hash")
          blocks.join(
            rd.join(blocks.where(col("parent_hash").isNull)
                .select(col("hash").as("root")), Seq("root"), "left_semi")
              .select("hash"),
            Seq("hash"), "left_semi")
        }
      (annotateDistributed(groundedBlocks)
        .where(col("is_on_best_chain"))
        .select(col("hash"), col("height").cast("int").as("height")), None)
    }
  }

  /** The previous invocation's materialized annotation: each call swaps its
    * result RDD in and unpersists the predecessor, so repeated annotations
    * (bench reruns, bk0→bk1→bk6 in one session) hold at most ONE extra copy
    * of the block set instead of leaking every run's doubling state.
    */
  private val lastAnn =
    new java.util.concurrent.atomic.AtomicReference[org.apache.spark.rdd.RDD[_]](null)

  /** Drop the retained annotation ([[graft.Graft.releaseCaches]]). */
  private[graft] def release(): Unit =
    Option(lastAnn.getAndSet(null)).foreach(_.unpersist(blocking = false))

  /** The scale path, route-picked on the block count with the same size cut
    * as Spark's own broadcast-vs-shuffle join decision:
    *
    *  - **≤ [[graft.operators.ChainOps.BroadcastMaxRows]]**: the parent
    *    forest fits the broadcast envelope (the exact build-side collect a
    *    BroadcastExchange performs), so the whole resolution — heights AND
    *    membership — is ONE in-memory pass over the collected pairs
    *    ([[annotateInMemory]], identical to the driver route) instead of
    *    O(log depth) distributed jobs of fixed stage latency. Chain walks
    *    are inherently sequential (each hop needs the previous hash), so
    *    the in-memory pass is the optimal plan whenever the forest ships.
    *  - **above it**: O(log_Arity depth) self-join doubling rounds for
    *    heights, then membership = the tip's ancestor set via the
    *    ancestor-doubling loop over the jump tables retained from the
    *    height pass: the frontier S starts at {tip, root} and one round per
    *    table — Arity−1 chained jump joins, a distinct, and a
    *    lineage-truncating rebase — grows it Arity× per round. The rebase
    *    is load-bearing: each jump EMBEDS the previous S plan, so an
    *    unmaterialized chain of rounds duplicates the S subtree Arity× per
    *    round and plan canonicalization goes combinatorial (observed as a
    *    driver OOM at 50k blocks).
    *
    * The probe collects at most envelope+1 rows (an early-terminating
    * limit), so the above-envelope path never ships more than the envelope
    * before taking the loop.
    */
  def annotateDistributed(blocks: DataFrame): DataFrame = {
    import ChainOps.traced
    // Read the sys-prop-backed envelope ONCE: a second read could disagree
    // under a concurrent property change and misroute between the in-memory
    // walk and the doubling loop. Clamped before .toInt — an envelope above
    // Int.MaxValue-1 would overflow the limit into a negative value.
    val envelope = math.min(ChainOps.BroadcastMaxRows, (Int.MaxValue - 1).toLong).toInt
    // The probe stays a limit+collect DELIBERATELY: CollectLimit executes
    // partitions incrementally (1, 4, 16, …) and stops at envelope+1 rows,
    // which above the envelope doubles as a GENTLE warm-up of the upstream
    // cache (bk0's parse persist) before the doubling loop's full-
    // parallelism passes. A count-over-limit probe plans as
    // LocalLimit→Exchange→count — every partition computes in ONE job, and
    // at a 1.5M-block corpus that max-concurrency parse storm OOMed a heap
    // the incremental probe survives. The ~130 MB collect at the 2²⁰
    // envelope is the exact build-side cost a BroadcastExchange would pay.
    val probe = traced("annotate: envelope probe")(blocks
      .select("hash", "parent_hash")
      .limit(envelope + 1).collect())
    if (probe.length <= envelope)
      return annotateInMemory(blocks, probe)

    val resolved = traced("annotate: resolve")(ChainOps.resolve(
      blocks.select("hash", "parent_hash"), "hash", "parent_hash",
      keepTables = true))
    val h = resolved.result
      .select(col("id").as("hash"), col("dist").cast("int").as("height"))
    val withH = blocks.join(h, "hash")

    val tipRows = traced("annotate: tip take")(resolved.result
      .orderBy(col("dist").desc, col("id").asc).select("id", "dist", "ptr").take(1))
    if (tipRows.isEmpty) { // empty chain: empty annotation, not a driver crash
      resolved.tables.foreach(_._2.unpersist(blocking = false))
      resolved.resultRdd.unpersist(blocking = false)
      resolved.dictRdd.unpersist(blocking = false)
      return withH.withColumn("is_on_best_chain", lit(false))
    }
    val tipHash = tipRows(0).getString(0)
    val tipHeight = tipRows(0).getLong(1)
    val tipRoot = tipRows(0).getString(2)

    val spark = blocks.sparkSession
    import spark.implicits._
    // the frontier's backing RDD — dropped after the final rebase below
    var sRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    // S: known ancestors of the tip, in the resolve's DICTIONARY space —
    // the jump tables hold encoded longs (ChainOps.resolve), so the
    // frontier stays encoded through the loop and decodes once at the end.
    // Starts at {tip, genesis}; after consuming table r it covers every
    // distance in [0, arity^(r+1)-1] ∪ {height}.
    val seedVids = resolved.dict
      .where(col("oid").isin(tipHash, tipRoot)).select("vid")
      .collect().map(_.getLong(0)).toSeq
    var s = seedVids.distinct.toDF("vid")
    // The jump tables were built at whatever arity the height pass routed
    // to (Arity broadcast-side, 2 above the envelope — tables(r) jumps
    // arity^r), so the span bookkeeping must follow the SAME arity.
    val arity = resolved.arity
    var span = 1L // = arity^r, the jump distance of the table being consumed
    resolved.tables.foreach { case (tbl, _) =>
      if (span <= tipHeight) {
        // jump: follow tbl's arity^r pointer once; saturated rows land on
        // their root, which for members of S is the (already-seeded) tip
        // root.
        def jump(cur: DataFrame, t: Int): DataFrame = {
          val j0 = tbl.select(col("id").as(s"jid$t"), col("ptr").as(s"jptr$t"))
          cur.join(j0, cur("vid") === j0(s"jid$t")).select(col(s"jptr$t").as("vid"))
        }
        val hops = Iterator.iterate(s -> 0) { case (cur, t) => jump(cur, t + 1) -> (t + 1) }
          .drop(1).take(arity - 1).map(_._1).toSeq
        val (ns, nsRdd) = ChainOps.traced(s"annotate: membership span=$span")(
          ChainOps.rebase(hops.foldLeft(s)(_ unionByName _).distinct()))
        if (sRdd != null) sRdd.unpersist(blocking = false)
        s = ns; sRdd = nsRdd
        span *= arity
      }
      ()
    }
    // Decode the frontier back to hashes through the resolve's dictionary
    // (one small join — |S| ≈ chain length ≥ the big side only at the very
    // end, and the dict side is the lookup).
    val sHash = s.join(resolved.dict, s("vid") === resolved.dict("vid"))
      .select(col("oid").as("hash"))
    val ann = withH
      .join(sHash.withColumn("is_on_best_chain", lit(true)), Seq("hash"), "left")
      .na.fill(false, Seq("is_on_best_chain"))
    // Materialize the final annotation, then drop every piece of loop state
    // — jump tables, the membership frontier, the dictionary, and the
    // PREVIOUS invocation's annotation — so repeated annotations hold one
    // copy, not one per run.
    val (annDf, annRdd) = ChainOps.traced("annotate: final rebase")(ChainOps.rebase(ann))
    resolved.tables.foreach(_._2.unpersist(blocking = false))
    // On the walk route no tables were kept, so the height pass's final
    // state RDD is not covered by the loop above — drop it explicitly.
    resolved.resultRdd.unpersist(blocking = false)
    resolved.dictRdd.unpersist(blocking = false)
    if (sRdd != null) sRdd.unpersist(blocking = false)
    Option(lastAnn.getAndSet(annRdd)).foreach(_.unpersist(blocking = false))
    annDf
  }
}
