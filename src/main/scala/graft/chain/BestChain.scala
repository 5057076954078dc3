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

  /** Below this many blocks the whole forest fits trivially in driver
    * memory; resolve it there in one pass instead of paying O(log d)
    * distributed jobs of fixed latency — the same adaptive size cut as a
    * broadcast join. 100k string pairs ≈ 20 MB.
    */
  val DriverSideThreshold: Long = 100000L

  /** (hash, height) for every block in a parent-pointer forest. */
  def heights(blocks: DataFrame): DataFrame =
    ChainOps.rootsAndDepths(blocks.select("hash", "parent_hash"), "hash", "parent_hash")
      .select(col("hash"), col("height").cast("int").as("height"))

  /** blocks + (height, is_on_best_chain). Best tip = max height, ties broken
    * by min hash (deterministic; the reference takes file order —
    * BlockchainToGraph.java:91–102 — which a batch engine cannot see).
    * Forests under [[DriverSideThreshold]] resolve driver-side in one
    * collect; larger ones take the doubling path ([[annotateDistributed]]).
    */
  def annotate(blocks: DataFrame): DataFrame = {
    val pairs = blocks.select("hash", "parent_hash")
      .limit(DriverSideThreshold.toInt + 1).collect()
    if (pairs.length > DriverSideThreshold) return annotateDistributed(blocks)
    if (pairs.isEmpty) return blocks
      .withColumn("height", lit(0).cast("int"))
      .withColumn("is_on_best_chain", lit(false))
      .where(lit(false))

    val ids = pairs.map(_.getString(0)).toSet
    // node → parent, only when the parent actually exists; roots (null or
    // dangling parent — the same orphan semantics as ChainOps) are absent.
    val parentOf: Map[String, String] = pairs.flatMap(r =>
      Option(r.getString(1)).filter(ids.contains).map(r.getString(0) -> _)).toMap
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    pairs.foreach { r =>
      // walk up to the first memoized ancestor or a root (stack-safe),
      // then assign heights back down the walked path
      var stack = List.empty[String]
      var cur = r.getString(0)
      while (!memo.contains(cur) && parentOf.contains(cur)) {
        stack ::= cur
        cur = parentOf(cur)
      }
      var hh = memo.getOrElseUpdate(cur, 0)
      stack.foreach { n => hh += 1; memo(n) = hh }
    }
    val (tip, tipH) = memo.minBy { case (k, v) => (-v, k) }
    val onChain = scala.collection.mutable.HashSet(tip)
    var cur = tip
    var steps = tipH
    while (steps > 0) {
      parentOf.get(cur).foreach { p => onChain += p; cur = p }
      steps -= 1
    }
    val spark = blocks.sparkSession
    val ann = spark.createDataFrame(
      memo.toSeq.map { case (k, v) => (k, v, onChain.contains(k)) })
      .toDF("hash", "height", "is_on_best_chain")
    blocks.join(ann, "hash")
  }

  /** The distributed doubling path — O(log depth) self-join rounds. */
  def annotateDistributed(blocks: DataFrame): DataFrame = {
    val h = heights(blocks)
    val withH = blocks.join(h, "hash")

    val tipRows = withH.orderBy(col("height").desc, col("hash").asc).select("hash", "height").take(1)
    if (tipRows.isEmpty) // empty chain: empty annotation, not a driver crash
      return withH.withColumn("is_on_best_chain", lit(false))
    val tipHash = tipRows(0).getString(0)
    val tipHeight = tipRows(0).getInt(1)

    // anc: current 2^k-jump table (src -> ancestor 2^k above, absent past
    // root). Rounds are rebased to cached RDDs (ChainOps.rebase) — same flat
    // re-planning as the heights loop.
    var (anc, ancRdd) = ChainOps.rebase(
      withH.select(col("hash").as("src"), col("parent_hash").as("dst"))
        .where(col("dst").isNotNull))
    // S: ancestors of the tip found so far (including the tip itself)
    var s = withH.sparkSession.createDataFrame(
      withH.sparkSession.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(tipHash))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("hash", org.apache.spark.sql.types.StringType))))
    var sRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    var span = 1L // S currently covers ancestors within distance span-1
    while (span <= tipHeight) {
      val (s2, s2Rdd) = ChainOps.rebase(
        s.unionByName(
          s.join(anc, s("hash") === anc("src")).select(col("dst").as("hash")))
          .distinct())
      if (sRdd != null) sRdd.unpersist(blocking = false)
      s = s2; sRdd = s2Rdd
      if (span * 2 <= tipHeight) { // the last round's jump table is never read
        val (anc2, anc2Rdd) = ChainOps.rebase(
          anc.as("a")
            .join(anc.as("b"), col("a.dst") === col("b.src"))
            .select(col("a.src").as("src"), col("b.dst").as("dst")))
        ancRdd.unpersist(blocking = false)
        anc = anc2; ancRdd = anc2Rdd
      }
      span *= 2
    }
    withH.join(s.withColumn("is_on_best_chain", lit(true)), Seq("hash"), "left")
      .na.fill(false, Seq("is_on_best_chain"))
  }
}
