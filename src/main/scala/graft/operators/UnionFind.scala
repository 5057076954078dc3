package graft.operators

/** Driver-side connected components for edge lists that fit the broadcast
  * envelope — the in-memory leg of the adaptive route shared by
  * [[graft.chain.WalletCluster]] and [[Dedup.nearDupClusters]] (mirror of
  * [[graft.chain.BestChain]]'s walk-vs-doubling cut): collecting an
  * envelope-sized edge list is the same driver transfer a BroadcastExchange
  * performs, and union-find resolves it in one pass where GraphX Pregel pays
  * ~6 jobs of fixed stage latency. Above the envelope the callers keep the
  * distributed GraphX path — this class never sees a 100 TB graph.
  */
private[graft] object UnionFind {

  /** Components of an undirected edge list: every vertex that appears in an
    * edge maps to the MINIMUM vertex of its component (the stable label the
    * distributed path also produces). Path-halving + union-by-size: ~O(E α).
    */
  def components[T](edges: Iterator[(T, T)])(implicit ord: Ordering[T]): Map[T, T] = {
    val parent = scala.collection.mutable.HashMap.empty[T, T]
    val size = scala.collection.mutable.HashMap.empty[T, Int]
    def find(x0: T): T = {
      var x = x0
      var p = parent.getOrElseUpdate(x, x)
      while (p != x) {
        val gp = parent.getOrElseUpdate(p, p)
        parent(x) = gp // path halving
        x = gp
        p = parent.getOrElseUpdate(x, x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        val (sa, sb) = (size.getOrElse(ra, 1), size.getOrElse(rb, 1))
        val (big, small) = if (sa >= sb) (ra, rb) else (rb, ra)
        parent(small) = big
        size(big) = sa + sb
      }
    }
    // snapshot the members before resolving: find() path-halves (updates
    // values in place), and iterating a map while mutating it is fragile
    // even when no keys are inserted
    val members = parent.keys.toList
    val minOf = scala.collection.mutable.HashMap.empty[T, T]
    members.foreach { v =>
      val r = find(v)
      minOf.get(r) match {
        case Some(m) => if (ord.lt(v, m)) minOf(r) = v
        case None => minOf(r) = v
      }
    }
    members.map(v => v -> minOf(find(v))).toMap
  }
}
