package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Exact distinct count with retraction (SURVEY.md §2.10 UDAF) — the
  * streaming-update-mode form of the reference's HashSet counterparty sets
  * (BlockchainToGraph.java:950–983), whose reorg path must SUBTRACT
  * previously-counted elements (BlockchainToGraph.java:651–676).
  *
  * Input is (value, delta) with delta=+1 on add, -1 on retract; the buffer
  * keeps net multiplicity per value, so the aggregate is correct under any
  * interleaving of adds and retractions — countDistinct can't do that, and
  * the reference's decrement-a-counter approach miscounts multi-output txs
  * (the latent bug at BlockchainToGraph.java:670–671 that this design
  * sidesteps). Batch jobs should keep using countDistinct (no retraction →
  * no multiplicity buffer); this Aggregator is for foreachBatch /
  * mapGroupsWithState update paths.
  *
  * Buffer is bounded by distinct-value count per group; at 100 TB cap it
  * with a sentinel-exclusion filter upstream or switch to HLL
  * (approx_count_distinct) when the exactness contract allows.
  */
object ExactDistinctWithRetraction
    extends Aggregator[(String, Int), mutable.Map[String, Long], Long] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], a: (String, Int)): mutable.Map[String, Long] = {
    val nv = b.getOrElse(a._1, 0L) + a._2
    if (nv == 0L) b.remove(a._1) else b.update(a._1, nv)
    b
  }

  override def merge(b1: mutable.Map[String, Long], b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b2.foreach { case (k, v) =>
      val nv = b1.getOrElse(k, 0L) + v
      if (nv == 0L) b1.remove(k) else b1.update(k, nv)
    }
    b1
  }

  override def finish(b: mutable.Map[String, Long]): Long = b.count(_._2 > 0L)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
