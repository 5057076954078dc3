package graft

import org.apache.spark.sql.execution.FormattedMode

/** Registry-wide scale audit: EVERY registered query's physical plan is
  * checked for the two shapes that cannot survive a 100x scale-up —
  * quadratic joins (CartesianProduct / BroadcastNestedLoopJoin) and
  * full-data windows over a single partition. Query-specific PlanSpec pins
  * assert what good plans DO contain; this suite asserts what no plan may
  * contain, so a regression in ANY registered query fails loudly instead
  * of quietly shipping a plan that only works at gate scale.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose nested-loop/cartesian join is the DOCUMENTED intent over
    * a side that is constant-size or contract-bounded — NOT data x data:
    *  - j10_cross_join: the cross-join operator itself;
    *  - sim1_cosine_topk: BNLJ against the BROADCAST query batch (<= 10
    *    rows by the query's own filter) — linear in the corpus;
    *  - d6_embedding_neardup: the documented exact=true all-pairs BASELINE
    *    on a 200-row slice (the default banded path has no quadratic join —
    *    PlanSpec asserts it);
    *  - ds3/p0/p2: crossJoin of the 1-row global n_min anchor aggregate;
    *  - bk0: crossJoin of two 1-row digest aggregates.
    * Anything NEW appearing here must either justify itself into this list
    * or fix its plan.
    */
  private val quadraticByDesign = Set(
    "j10_cross_join", "sim1_cosine_topk", "d6_embedding_neardup",
    "ds3_temperature_resample", "p0_curation_pipeline", "p2_corpus_freeze",
    "bk0_e2e_pipeline",
    // PQ's ADC scan: corpus x BROADCAST query batch (<= 10 rows), the same
    // contract-bounded shape as sim1
    "sim6_pq_topk",
    // 1-row anchor crossJoins (the ds3 shape): ds7's largest-total N over
    // the count cube (also inside p3); t15's global bigram-count total
    "ds7_domain_mixture", "t15_bigram_surprisal", "p3_mixture_freeze",
    // d9 registers the d6 exact=true 200-row full-recall slice so its
    // closure oracle is exact; the production default is the banded path
    "d9_semantic_dedup")

  test("no registered query plans a quadratic join") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val p = q.build(spark, sf).queryExecution.explainString(FormattedMode)
      if ((p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          && !quadraticByDesign.contains(q.name))
        Some(q.name)
      else None
    }
    assert(offenders.isEmpty, s"quadratic joins in: ${offenders.mkString(", ")}")
  }

  test("no registered query windows full data over a single partition") {
    // A Window/Sort whose exchange is SinglePartition moves the whole input
    // through one task. Single-partition exchanges feeding a final
    // AGGREGATE of partials are fine (constant-size rows); windows over
    // them are not — except when the windowed input is constant-size by
    // construction (GlobalRank's bucket offsets), which plans as a window
    // over an Aggregate's output, matched here by the partial-agg parent.
    val offenders = SparkEntry.registry.flatMap { q =>
      val tree = q.build(spark, sf).queryExecution.executedPlan.toString
      val lines = tree.linesIterator.toVector
      val bad = lines.zipWithIndex.exists { case (l, i) =>
        l.contains("Exchange SinglePartition") && {
          // walk up to the nearest shallower-indented parent operator
          def indent(s: String) = s.takeWhile(c => c == ' ' || c == '+' || c == ':' || c == '-').length
          val myIndent = indent(l)
          val parent = (i - 1 to 0 by -1).iterator.map(lines)
            .find(pl => indent(pl) < myIndent)
          parent.exists(pl => pl.contains("Window") || pl.contains("Sort"))
        }
      }
      if (bad) Some(q.name) else None
    }
    // GlobalRank's offsets window is over <= `buckets` aggregated rows —
    // constant-size by construction, not data-bearing.
    val allowed = Set("w5_percent_rank_ntile")
    val real = offenders.filterNot(allowed)
    assert(real.isEmpty, s"single-partition windows in: ${real.mkString(", ")}")
  }
}
