package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for hot keys — the manual counterpart to AQE's
  * skew-join splitting, for the cases AQE can't fix: skewed AGGREGATION
  * keys, and skewed join keys where the planner lacks runtime stats (first
  * shuffle of a stage). The domain's known hot key is the `<undecodable>`
  * sentinel address every non-standard script collapses into
  * (BlockchainToGraph.java:1071–1073 → ScriptToAddress.Sentinel).
  */
object Salting {

  /** Two-phase (salted) aggregation: phase 1 shuffles on (key, salt) —
    * spreading a hot key over `salts` reducers — phase 2 combines the
    * per-salt partials on key alone. The caller supplies both phases
    * explicitly (they must compose associatively):
    *
    * {{{
    * Salting.twoPhaseAgg(df, Seq("k"), 16)(
    *   Seq(sum("v").as("s"), count(lit(1)).as("n")),
    *   Seq(sum("s").as("s"), sum("n").as("n")))
    * }}}
    */
  def twoPhaseAgg(df: DataFrame, keyCols: Seq[String], salts: Int)(
      phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(salts)))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }

  /** Skewed equi-join: fact rows get a pseudo-random salt in [0, salts); the
    * (small) dimension is replicated `salts` times. One shuffle on
    * (key, salt) with the hot key spread across `salts` partitions.
    * Semantics identical to fact ⋈ dim on keyCol (inner).
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keyCol: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(replicatedDim, Seq(keyCol, "_salt")).drop("_salt")
  }
}
