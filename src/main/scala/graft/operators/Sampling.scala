package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / corpus-rebalancing for training-data curation.
  *
  * All three operators key on a content hash instead of `rand()`: at 100 TB a
  * sample must be (a) reproducible across reruns and engines, (b) STABLE under
  * corpus growth — re-running over an appended corpus keeps every previously
  * kept id, so downstream shards/caches don't churn — and (c) auditable by an
  * external oracle. `rand()` gives none of those; a 60-bit md5-derived key
  * (same portable construction as Dedup's LSH base hashes) gives all three at
  * the cost of one hash per row, computed inside whole-stage codegen.
  *
  * Scale shapes: [[stratifiedSample]] is a pure narrow filter (the rate table
  * rides into the task as a literal CASE — zero shuffles at any corpus size);
  * [[temperatureResample]] adds one tiny stratum-count aggregate broadcast
  * back against the corpus (narrow main pass); [[perStratumSample]] is the
  * only shuffling member and plans as WindowGroupLimit, so each map partition
  * ships at most k rows per stratum, not the corpus.
  */
object Sampling {

  /** 2^60 — the exclusive upper bound of [[hashKey]]. */
  val KeySpace: Long = 1L << 60

  /** Deterministic 60-bit uniform key in [0, 2^60): the first 15 hex digits
    * of md5(id), hashed over the id's canonical string form (numeric ids
    * render identically in every engine). md5 is bit-identical in any
    * engine, so keep/drop decisions can be recomputed exactly by a SQL
    * oracle.
    */
  def hashKey(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** keep <=> hashKey < floor(rate * 2^60). The threshold is computed in
    * double and floored — both steps correctly rounded, hence engine-exact.
    * Binary-fraction rates (1/2, 1/8, ...) make it exact outright.
    */
  private def keep(idCol: String, rate: Column): Column =
    hashKey(col(idCol)) < floor(rate * lit(KeySpace.toDouble)).cast("long")

  /** Stratified Bernoulli sample at explicit per-stratum keep rates (strata
    * not in `rates` use `defaultRate`). One narrow filter pass, no shuffle,
    * no stratum-size scan: the curation recipe ("keep all rare-language docs,
    * 1/8 of English") applies to a 100 TB corpus at scan speed.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(keep(idCol, rate))
  }

  /** Uniform k-per-stratum sample: the k smallest hash keys within each
    * stratum (hash order ≡ uniform order; idCol breaks the astronomically
    * unlikely key tie). Plans as rank-limited window — Spark's
    * WindowGroupLimit pushes a partial top-k below the exchange, so the
    * shuffle carries at most k rows per stratum per map partition.
    */
  def perStratumSample(df: DataFrame, idCol: String, stratumCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(hashKey(col(idCol)).asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }

  /** Deterministic train/val/test split: each row gets the label of the
    * hash-key range it falls in — `splits` are (label, fraction) in order,
    * fractions summing to 1 (the last label absorbs any floating remainder).
    * Same three laws as [[stratifiedSample]]: reproducible, growth-stable
    * (appending rows never moves an existing row between splits — the
    * property that keeps eval sets honest as the corpus grows), and
    * SQL-auditable. A pure narrow projection: zero shuffles at any size.
    *
    * The range key is SALTED (`md5(id || ":split")`), making it independent
    * of the bare-id key every keep/drop sampler uses. Without the salt,
    * composing a sampler with the split is fully correlated: rows surviving
    * `key < rate·2^60` would ALL land below a 0.9 train cut, silently
    * emptying val/test for every stratum with keep-rate ≤ 0.9
    * (spec-gated: the composition test in SamplingSpec).
    */
  def splitAssign(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    val key = hashKey(concat(col(idCol).cast("string"), lit(":split")))
    val label = splits.init.zip(splitCutKeys(splits))
      .foldRight(lit(splits.last._1): Column) {
        case (((l, _), cutKey), acc) => when(key < cutKey, lit(l)).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** The exact long thresholds of [[splitAssign]]'s ranges (one per split
    * label except the last, which absorbs the remainder), computed ONCE
    * driver-side so an external auditor/oracle compares against literally
    * the same numbers — re-deriving `0.9 + 0.05` in another engine can land
    * on a different double than Scala's accumulation.
    */
  def splitCutKeys(splits: Seq[(String, Double)]): Seq[Long] = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    splits.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(c => math.floor(c * KeySpace.toDouble).toLong)
  }

  /** Deterministic output shard for training-data writes: pmod of the hash
    * key — even shard sizes by uniformity, no global sort or row_number (a
    * global ordering is a single-partition window; this stays narrow and
    * embarrassingly parallel at any corpus size), and a doc keeps its shard
    * forever, so downstream shard-level caches don't churn on corpus growth.
    */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int): DataFrame =
    df.withColumn("shard", pmod(hashKey(col(idCol)), lit(numShards.toLong)))

  /** GPT-style sequence packing layout: concatenate documents into
    * fixed-`seqLen`-token training sequences and report where each doc
    * lands. Docs are laid out in deterministic hash order WITHIN their
    * [[shardAssign]] shard and the token stream is cut every seqLen tokens
    * (docs may straddle a cut — the standard concat-and-chunk packing).
    * Emits (id, shard, n_tokens, pack_id, pack_offset): the pack of the
    * doc's first token and its offset inside that pack — everything a
    * writer needs to materialize the packed sequences.
    *
    * Scale shape: the prefix sum runs PER SHARD (one window per shard
    * partition) — the distributed form of the global running total; a
    * single global ordering would be a one-partition window. Determinism,
    * growth-stability of shard membership, and integer-only arithmetic make
    * the whole layout reproducible and SQL-auditable.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      numShards: Int, seqLen: Int): DataFrame = {
    val nTok = size(split(lower(trim(col(textCol))), "\\s+"))
    val w = Window.partitionBy("shard")
      .orderBy(hashKey(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shardAssign(df, idCol, numShards)
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("_cum_end", sum(col("n_tokens")).over(w))
      .select(
        col(idCol), col("shard"), col("n_tokens"),
        floor((col("_cum_end") - col("n_tokens")) / seqLen).cast("long").as("pack_id"),
        ((col("_cum_end") - col("n_tokens")) % seqLen).cast("long").as("pack_offset"))
  }

  /** Token-budget freeze: keep, per output shard, the greedy prefix of docs
    * (in the same deterministic hash order [[packSequences]] lays them out
    * in) whose token stream starts inside `budgetPerShard` — "train on N
    * tokens" as an exact, auditable selection. The doc straddling the
    * boundary is KEPT (its first token is within budget), mirroring how a
    * packed-sequence writer cuts: every kept doc's tokens_before is exactly
    * where its tokens land in the shard's stream.
    *
    * Scale shape: one window per shard partition (the distributed prefix
    * sum), integer-only arithmetic. NOTE exact budgets are deliberately NOT
    * growth-stable — an appended doc can hash-sort ahead of the old cutoff
    * and displace the tail. That is inherent to "exactly N tokens"; when
    * stability under growth matters more than exactness, use
    * [[stratifiedSample]] rates instead.
    *
    * @return kept rows as (idCol, shard, n_tokens, tokens_before)
    */
  def tokenBudget(df: DataFrame, idCol: String, textCol: String,
      numShards: Int, budgetPerShard: Long): DataFrame = {
    require(budgetPerShard >= 0, s"budget must be >= 0, got $budgetPerShard")
    val nTok = size(split(lower(trim(col(textCol))), "\\s+"))
    val w = Window.partitionBy("shard")
      .orderBy(hashKey(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shardAssign(df, idCol, numShards)
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("_cum_end", sum(col("n_tokens")).over(w))
      .where(col("_cum_end") - col("n_tokens") < budgetPerShard)
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("_cum_end") - col("n_tokens")).as("tokens_before"))
  }

  /** Temperature resampling at alpha = 1/2: downsample each stratum so kept
    * counts are proportional to n_s^alpha — the multilingual rebalancing rule
    * of mC4/T5 and XLM-R (arXiv:1910.10683 §3.4.3, arXiv:1911.02116 §3) —
    * anchored so the smallest stratum keeps everything:
    * rate_s = sqrt(n_min / n_s). sqrt is IEEE-correctly-rounded in every
    * engine — unlike pow — so rates, thresholds, and hence the sample are
    * bit-deterministic. Rows with a null stratum are dropped — BEFORE the
    * counts, so the anchor n_min is the smallest stratum that actually
    * survives: a few null-stratum rows must not become the anchor and
    * collapse every real stratum's keep rate while never appearing in the
    * output themselves.
    *
    * One tiny per-stratum count (shuffled at stratum cardinality, not corpus
    * size) broadcast back against the corpus: the main pass stays narrow.
    */
  def temperatureResample(df: DataFrame, idCol: String,
      stratumCol: String): DataFrame = {
    val counts = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("_n"))
    val rates = counts
      .crossJoin(counts.agg(min("_n").as("_nmin")))
      .select(col(stratumCol),
        sqrt(col("_nmin").cast("double") / col("_n")).as("_rate"))
    df.join(broadcast(rates), stratumCol)
      .where(keep(idCol, col("_rate")))
      .drop("_rate")
  }

  /** Deterministic domain-mixture rebalance — the "data mixing" step of a
    * training-corpus recipe (The Pile / DoReMi-style domain weights): given
    * target proportions as INTEGER parts (e.g. web:4, code:2, wiki:1),
    * select the LARGEST subset whose domain composition matches the target
    * exactly (up to integer floor). Integer parts keep every threshold in
    * exact arithmetic, so an external SQL oracle recomputes the identical
    * selection — a double weight like 0.57 would make `floor(n·w)` depend
    * on the engine's literal parsing.
    *
    * The math: N = min_d floor(n_d·P/p_d) is the largest total honoring
    * every proportion (P = Σ parts); each domain keeps its t_d =
    * floor(p_d·N/P) smallest-hash rows — uniform-in-domain, reproducible,
    * and prefix-stable (shrinking the target only truncates each domain's
    * hash-ordered prefix, so shard caches don't churn).
    *
    * Scale shape — exact per-domain top-t WITHOUT windowing the corpus by
    * domain (a handful of domains would make that a few giant skewed
    * partitions): the 60-bit hash key is range-cut into `buckets` uniform
    * slices, a tiny per-(domain, bucket) count cube (≤ domains·buckets
    * rows) decides each bucket wholesale — fully below the domain's cutoff
    * ⇒ keep all, fully above ⇒ drop all — and only the ONE boundary bucket
    * per domain (≈ n_d/buckets rows) is ranked, in a window partitioned by
    * (domain, bucket). The corpus itself never shuffles: both branches are
    * narrow scans behind a broadcast verdict join. Raise `buckets` as n_d
    * grows to keep the boundary rank partition in memory (n_d/buckets rows).
    */
  def mixToTarget(df: DataFrame, idCol: String, domainCol: String,
      parts: Map[String, Long], buckets: Int = 4096): DataFrame = {
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      s"mixture parts must be positive: $parts")
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two: $buckets")
    val totalParts = parts.values.sum
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val partOf = parts.foldLeft(lit(null).cast("long")) { case (acc, (k, v)) =>
      when(col(domainCol) === k, lit(v)).otherwise(acc)
    }
    val keyed = df
      .withColumn("_mx_p", partOf)
      .where(col("_mx_p").isNotNull)
      .withColumn("_mx_key", hashKey(col(idCol)))
      .withColumn("_mx_b", shiftright(col("_mx_key"), shift))
    // The only full-corpus aggregate: a (domain, bucket) count cube, map-side
    // partial, result size domains·buckets — constant in the corpus.
    val cube = keyed
      .groupBy(col(domainCol).as("_mx_d"), col("_mx_p"), col("_mx_b"))
      .agg(count(lit(1)).as("_mx_n"))
    val byDomain = Window.partitionBy("_mx_d")
    val cumBefore = byDomain.orderBy("_mx_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withTotals = cube
      .withColumn("_mx_nd", sum("_mx_n").over(byDomain))
      .withColumn("_mx_cum", coalesce(sum("_mx_n").over(cumBefore), lit(0L)))
    // N ranges over the PARTS list, not the observed domains: a target
    // domain with zero corpus rows caps N at 0 (the empty set is the only
    // subset honoring its proportion) instead of being silently ignored.
    val spark = df.sparkSession
    import spark.implicits._
    val partsDf = parts.toSeq.toDF("_mx_pd", "_mx_pp")
    val nTotal = partsDf
      .join(withTotals.select("_mx_d", "_mx_nd").distinct(),
        col("_mx_pd") === col("_mx_d"), "left")
      .agg(min(floor(coalesce(col("_mx_nd"), lit(0L)) * lit(totalParts) / col("_mx_pp")))
        .cast("long").as("_mx_ntot"))
    // Per-bucket verdict: -1 = keep whole bucket, q>0 = keep the q
    // smallest-key rows (the domain's boundary bucket), absent = drop.
    val verdict = withTotals.crossJoin(nTotal)
      .withColumn("_mx_t",
        floor(col("_mx_p") * col("_mx_ntot") / lit(totalParts)).cast("long"))
      .withColumn("_mx_quota",
        when(col("_mx_cum") + col("_mx_n") <= col("_mx_t"), lit(-1L))
          .when(col("_mx_cum") < col("_mx_t"), col("_mx_t") - col("_mx_cum"))
          .otherwise(lit(0L)))
      .where(col("_mx_quota") =!= 0L)
      .select(col("_mx_d"), col("_mx_b").as("_mx_vb"), col("_mx_quota"))
    val tagged = keyed.join(broadcast(verdict),
      keyed(domainCol) === col("_mx_d") && col("_mx_b") === col("_mx_vb"))
    val keepWhole = tagged.where(col("_mx_quota") === -1L)
    val inBucket = Window.partitionBy(col(domainCol), col("_mx_b"))
      .orderBy(col("_mx_key").asc, col(idCol).asc)
    val boundary = tagged.where(col("_mx_quota") > 0L)
      .withColumn("_mx_rn", row_number().over(inBucket))
      .where(col("_mx_rn") <= col("_mx_quota"))
      .drop("_mx_rn")
    keepWhole.unionByName(boundary)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
