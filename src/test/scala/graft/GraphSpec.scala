package graft

import org.apache.spark.sql.functions._

import graft.chain.{BestChain, ChainFixture, Enrich, GoldStats}
import graft.graph.GraphAnalytics

class GraphSpec extends SparkSpec {

  private def flowParts = {
    val s = spark
    val ann = BestChain.annotate(ChainFixture.blocksDf(s))
    val cTxs = GoldStats.chainTxs(ChainFixture.transactionsDf(s), ann)
    val rin = Enrich.resolvedInputs(ChainFixture.txInputsDf(s), ChainFixture.txOutputsDf(s))
      .join(cTxs.select("tx_hash"), Seq("tx_hash"), "left_semi")
    val outs = ChainFixture.txOutputsDf(s)
      .join(cTxs.select("tx_hash"), Seq("tx_hash"), "left_semi")
    GraphAnalytics.flowEdges(rin, outs)
  }

  test("flow edges: funder -> recipient with aggregated values") {
    val C = ChainFixture.C
    val edges = flowParts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // tx1: A funds; pays C 30 and A 19. tx2: C funds; pays D 29.
    // tx3: A and B fund; pays F 68 (full value to each funder).
    assert(edges == Map(
      ("A", "C") -> 30 * C, ("A", "A") -> 19 * C, ("A", "F") -> 68 * C,
      ("B", "F") -> 68 * C, ("C", "D") -> 29 * C))
  }

  test("degrees: hand-computed in/out structure") {
    val got = GraphAnalytics.degrees(flowParts).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("A").getAs[Long]("out_degree") == 3)
    assert(got("A").getAs[Long]("in_degree") == 1) // self-churn edge A->A
    assert(got("F").getAs[Long]("out_degree") == 0)
    assert(got("F").getAs[Long]("in_degree") == 2)
    assert(got.keySet == Set("A", "B", "C", "D", "F"))
  }

  test("pagerank: sinks fed by many sources rank above pure sources") {
    val ranks = GraphAnalytics.pageRank(flowParts).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 5)
    // F receives from both A and B; B only receives the reset mass
    assert(ranks("F") > ranks("B"))
  }
}
