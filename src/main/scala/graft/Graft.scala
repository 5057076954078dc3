package graft

/** Session-level cache control.
  *
  * Every iterative operator in this engine keeps its LAST materialized result
  * persisted (swap-unpersist discipline: a new invocation swaps its result in
  * and unpersists the predecessor's), so repeated invocations hold one copy
  * instead of leaking one per run. That per-operator bound is right for a
  * hot loop over ONE operator, but across a long-lived session touching many
  * operators the registers coexist — on a small heap they evict each other's
  * working set (measured: the corpus pipeline at 70s inside a 32-query bench
  * suite vs 7.5s isolated, purely from retained-cache pressure).
  *
  * [[releaseCaches]] drains every register: BestChain's annotation,
  * Dedup's shingle / cluster caches, WalletCluster's clustering, ChainOps'
  * Pregel depths, GraphAnalytics' PageRank, BlkScale's pipeline scratch,
  * and the IVF index memo. Call it between
  * unrelated workloads (the bench harness calls it between queries) or
  * whenever a long-lived session wants to return to a cold-cache baseline.
  * It never touches caches the CALLER persisted — only the engine's own
  * swap registers — and a released operator simply recomputes on next use.
  */
object Graft {

  def releaseCaches(): Unit = {
    chain.BestChain.release()
    chain.WalletCluster.release()
    graph.GraphAnalytics.release()
    operators.ChainOps.release()
    operators.Dedup.release()
    operators.TextOps.release()
    operators.Similarity.release()
    operators.ProductQuantizer.release()
    queries.BlkScale.release()
  }
}
