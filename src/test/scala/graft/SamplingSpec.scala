package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic-sampling properties: reproducibility, growth stability
  * (the reason for hash keys over rand()), exact per-stratum k, and the
  * alpha=1/2 temperature-rebalancing law.
  */
class SamplingSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    // 3 strata with 10 / 40 / 160 members: 16:4:1 size ratios make the
    // sqrt law's expected kept counts distinct and testable.
    ((0 until 10).map(i => (i.toLong, "rare")) ++
      (10 until 50).map(i => (i.toLong, "mid")) ++
      (50 until 210).map(i => (i.toLong, "big"))).toDF("id", "lang")
  }

  test("stratifiedSample: rate 1.0 keeps all, 0.0 keeps none, runs are identical") {
    val out = Sampling.stratifiedSample(docs, "id", "lang",
      Map("rare" -> 1.0, "mid" -> 0.0), defaultRate = 0.5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("rare") == 10L)
    assert(!byLang.contains("mid"))
    assert(byLang("big") > 0 && byLang("big") < 160)
    val again = Sampling.stratifiedSample(docs, "id", "lang",
      Map("rare" -> 1.0, "mid" -> 0.0), defaultRate = 0.5)
    assert(out.collect().map(_.getLong(0)).sorted
      .sameElements(again.collect().map(_.getLong(0)).sorted))
  }

  test("stratifiedSample: lower-rate sample is a subset of the higher-rate one") {
    def ids(rate: Double) =
      Sampling.stratifiedSample(docs, "id", "lang", Map.empty, rate)
        .collect().map(_.getLong(0)).toSet
    val (quarter, half) = (ids(0.25), ids(0.5))
    assert(quarter.subsetOf(half), s"${quarter.diff(half)} kept at 1/4 but not 1/2")
    assert(quarter.size < half.size)
  }

  test("stratifiedSample: growth stability — appending rows never evicts kept ids") {
    import spark.implicits._
    val kept = Sampling.stratifiedSample(docs, "id", "lang", Map.empty, 0.5)
      .collect().map(_.getLong(0)).toSet
    val grown = docs.unionByName(
      (1000 until 1100).map(i => (i.toLong, "big")).toDF("id", "lang"))
    val keptGrown = Sampling.stratifiedSample(grown, "id", "lang", Map.empty, 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(keptGrown))
  }

  test("perStratumSample: exactly min(k, stratum size) rows, deterministic") {
    val out = Sampling.perStratumSample(docs, "id", "lang", k = 25)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("rare" -> 10L, "mid" -> 25L, "big" -> 25L))
    val again = Sampling.perStratumSample(docs, "id", "lang", k = 25)
    assert(out.collect().map(_.getLong(0)).sorted
      .sameElements(again.collect().map(_.getLong(0)).sorted))
  }

  test("temperatureResample: smallest stratum fully kept; kept mass tracks sqrt(n)") {
    val out = Sampling.temperatureResample(docs, "id", "lang")
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("rare") == 10L)
    // Expected kept counts: n * sqrt(n_min/n) = sqrt(10 * n):
    // mid 20, big 40. Bernoulli spread at these sizes stays within ~2 sigma.
    assert(byLang("mid") >= 10 && byLang("mid") <= 32, byLang)
    assert(byLang("big") >= 25 && byLang("big") <= 58, byLang)
    // The rebalance must flatten the distribution: big/rare kept ratio well
    // under the 16x input ratio.
    assert(byLang("big").toDouble / byLang("rare") < 8.0, byLang)
  }

  test("temperatureResample: null strata are dropped and never anchor n_min") {
    import spark.implicits._
    // 2 null-stratum rows are far smaller than every real stratum; if they
    // leaked into the counts they would become the anchor (n_min = 2) and
    // collapse the real strata's keep rates to ~sqrt(2/n) while themselves
    // never surviving the equi-join — the law "smallest stratum keeps
    // everything" would then hold for NO stratum in the output.
    val withNulls = docs.unionByName(
      Seq((9000L, null), (9001L, null)).toDF("id", "lang"))
    val out = Sampling.temperatureResample(withNulls, "id", "lang")
    val byLang = out.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(!byLang.contains(None), byLang) // null rows never emitted
    assert(byLang(Some("rare")) == 10L, byLang) // real anchor keeps everything
    // and the result is IDENTICAL to the null-free corpus: nulls are inert
    val clean = Sampling.temperatureResample(docs, "id", "lang")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(out.select("id").collect().map(_.getLong(0)).sorted.sameElements(clean))
  }

  test("splitAssign/shardAssign: exhaustive, proportional, growth-stable, narrow") {
    import spark.implicits._
    val corpus = (0 until 2000).map(i => (i.toLong, "x")).toDF("id", "lang")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.shardAssign(
      Sampling.splitAssign(corpus, "id", splits), "id", numShards = 4)
    val rows = out.select("id", "split", "shard").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows.size == 2000) // every row labeled exactly once
    val bySplit = rows.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // Bernoulli spread at n=2000: train ~1600 +- ~3 sigma(=54)
    assert(bySplit("train") > 1450 && bySplit("train") < 1750, bySplit)
    assert(bySplit("val") > 120 && bySplit("val") < 280, bySplit)
    // shards roughly even: each ~500 of 2000
    val byShard = rows.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byShard.keySet == (0L to 3L).toSet)
    byShard.values.foreach(n => assert(n > 380 && n < 620, byShard))
    // growth stability: appending docs never moves an existing row's
    // split OR shard (the law that keeps eval sets honest)
    val grown = corpus.unionByName((5000 until 5500).map(i => (i.toLong, "x")).toDF("id", "lang"))
    val rows2 = Sampling.shardAssign(
      Sampling.splitAssign(grown, "id", splits), "id", numShards = 4)
      .select("id", "split", "shard").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    rows.foreach { case (id, v) => assert(rows2(id) == v, s"row $id migrated") }
    // narrow: a pure projection, no exchange at any corpus size
    val p = out.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), p)
  }

  test("splitAssign composes with keep-samplers: val/test survive in downsampled strata") {
    // THE correlation trap: a keep-filter selects key < rate*2^60 and an
    // unsalted range split would label 'train' exactly when key < 0.9*2^60 —
    // every survivor of a stratum with keep-rate <= 0.9 would be 'train' and
    // the eval splits silently empty. The salted split key must keep the two
    // decisions independent: the heavily-downsampled stratum must still land
    // val/test members.
    val resampled = Sampling.temperatureResample(docs, "id", "lang")
    val out = Sampling.splitAssign(resampled, "id",
      Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
    val bigSplits = out.where(col("lang") === "big")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "big" keeps ~40 of 160 (keep-rate 0.25 << any train cut): with an
    // independent split key, ~20/10/10 land per split — P(zero val AND zero
    // test) under independence is ~1e-10, while the correlated bug gives
    // exactly zero in both.
    assert(bigSplits.getOrElse("val", 0L) + bigSplits.getOrElse("test", 0L) > 0,
      s"downsampled stratum lost its eval members: $bigSplits")
  }

  test("packSequences: contiguous per-shard layout, every token accounted once") {
    import spark.implicits._
    val corpus = (0 until 300).map(i => (i.toLong, ("tok " * (1 + i % 40)).trim))
      .toDF("id", "text")
    val out = Sampling.packSequences(corpus, "id", "text", numShards = 2, seqLen = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 300)
    out.foreach { case (_, shard, n, pack, off) =>
      assert(shard >= 0 && shard < 2 && n >= 1 && pack >= 0 && off >= 0 && off < 100)
    }
    // within a shard, laying the docs end-to-end in (pack, offset) order must
    // tile the token stream with no gaps or overlaps
    out.groupBy(_._2).foreach { case (_, docs) =>
      val ordered = docs.sortBy(d => (d._4, d._5)) // by (pack_id, pack_offset)
      var cum = 0L
      ordered.foreach { case (_, _, n, pack, off) =>
        assert(pack == cum / 100 && off == cum % 100, s"gap at cum=$cum: $ordered")
        cum += n
      }
    }
    // deterministic across runs
    val again = Sampling.packSequences(corpus, "id", "text", numShards = 2, seqLen = 100)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(again.sameElements(out.map(t => (t._1, t._4, t._5)).sortBy(_._1)))
  }

  test("tokenBudget: greedy per-shard prefix, straddler kept, budget edges") {
    import spark.implicits._
    val corpus = (0 until 200).map(i => (i.toLong, ("tok " * (1 + i % 40)).trim))
      .toDF("id", "text")
    val budget = 500L
    val kept = Sampling.tokenBudget(corpus, "id", "text", numShards = 2, budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    kept.groupBy(_._2).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._4)
      // tokens_before tiles from 0 with no gaps, every start < budget, and
      // exactly one straddler may end past it
      var cum = 0L
      ordered.foreach { case (_, _, n, before) =>
        assert(before == cum && before < budget, s"bad prefix at $before")
        cum += n
      }
      assert(ordered.init.forall { case (_, _, _, b) => b < budget })
    }
    // the kept set is exactly the packSequences prefix: same order, same
    // arithmetic — every doc whose layout start is inside the budget
    val packed = Sampling.packSequences(corpus, "id", "text", numShards = 2, seqLen = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(3) * 1 + r.getLong(4))).toMap
    assert(kept.map(_._1).toSet == packed.filter(_._2 < budget).keySet)
    // zero budget keeps nothing; an over-budget keeps everything
    assert(Sampling.tokenBudget(corpus, "id", "text", 2, 0L).count() == 0)
    assert(Sampling.tokenBudget(corpus, "id", "text", 2, 1000000L).count() == 200)
  }

  test("mixToTarget: exact floor proportions, equals naive rank at every bucket count") {
    import spark.implicits._
    // skewed domains: 130 web / 40 code / 11 wiki, plus an unlisted domain
    val corpus = ((0 until 130).map(i => (i.toLong, "web")) ++
      (200 until 240).map(i => (i.toLong, "code")) ++
      (300 until 311).map(i => (i.toLong, "wiki")) ++
      (400 until 420).map(i => (i.toLong, "junk"))).toDF("id", "dom")
    val parts = Map("web" -> 6L, "code" -> 3L, "wiki" -> 1L)
    val totalParts = parts.values.sum
    // N = min_d floor(n_d*P/p_d) = min(floor(130*10/6)=216, 133, 110) = 110
    val expectedTotal = 110L
    val expected = parts.map { case (d, p) => d -> (p * expectedTotal / totalParts) }
    // the naive reference: rank the whole domain in one window
    val naive = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("dom")
        .orderBy(Sampling.hashKey(col("id")).asc, col("id").asc)
      corpus.where(col("dom").isin(parts.keys.toSeq: _*))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= when(col("dom") === "web", expected("web"))
          .when(col("dom") === "code", expected("code"))
          .otherwise(expected("wiki")))
        .select("id").as[Long].collect().toSet
    }
    for (b <- Seq(2, 16, 4096)) {
      val out = Sampling.mixToTarget(corpus, "id", "dom", parts, buckets = b)
      val byDom = out.groupBy("dom").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byDom == expected, s"buckets=$b: $byDom != $expected")
      assert(out.select("id").as[Long].collect().toSet == naive,
        s"buckets=$b: selection differs from the naive per-domain rank")
    }
    // a target domain absent from the corpus caps N at 0: empty result
    assert(Sampling.mixToTarget(corpus, "id", "dom",
      parts + ("absent" -> 1L)).count() == 0)
  }

  test("mixToTarget: per-domain selection is a hash prefix (anti-churn law)") {
    import spark.implicits._
    val corpus = ((0 until 64).map(i => (i.toLong, "a")) ++
      (100 until 148).map(i => (i.toLong, "b"))).toDF("id", "dom")
    val small = Sampling.mixToTarget(corpus, "id", "dom",
      Map("a" -> 1L, "b" -> 1L))
    val bigger = Sampling.mixToTarget(corpus, "id", "dom",
      Map("a" -> 1L, "b" -> 3L))
    // raising b's share only shrinks a's kept count; a's kept set must be a
    // PREFIX of its previous one (hash order), never a reshuffle
    val keptA = small.where(col("dom") === "a").select("id").as[Long].collect().toSet
    val keptA2 = bigger.where(col("dom") === "a").select("id").as[Long].collect().toSet
    assert(keptA2.size < keptA.size && keptA2.subsetOf(keptA))
  }

  test("plans: ds7 never shuffles the corpus; boundary window partitions by (domain, bucket)") {
    val sf = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("ds7_domain_mixture")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    // the corpus reaches the output through a BROADCAST verdict join (never
    // a shuffled one), and the only corpus-side window partitions by
    // (domain, bucket) — not by the domain alone, which would funnel each
    // domain through one task
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("(?s).*row_number\\(\\) windowspecdefinition\\(lang#\\d+, _mx_b#\\d+".r
      .findFirstIn(plan).isDefined, plan)
    assert(!"windowspecdefinition\\(lang#\\d+, _mx_key".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("plans: ds1 filter is a single narrow pass; ds2 pushes a window group limit") {
    val sf = "/root/testdata/sf0.001"
    val p1 = SparkEntry.queries("ds1_stratified_sample")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(!p1.contains("Exchange"), p1)
    val p2 = SparkEntry.queries("ds2_per_stratum_sample")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(p2.contains("WindowGroupLimit"), p2)
  }
}
