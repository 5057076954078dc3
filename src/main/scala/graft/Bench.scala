package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}. Results are forced
  * with a noop-format write so Catalyst cannot prune work under a count().
  */
object Bench {

  /** Headline subset: scan-heavy, join-heavy, window, dedup and text ops —
    * the queries whose plans dominate a 100 TB run. The full registry runs in
    * Verify; keeping the bench focused keeps the signal per-operator.
    */
  val headline: Seq[String] = Seq(
    "a1_count_group", "a3_sum_group", "a7_count_distinct",
    "j1_fk_join", "j5_big_join_agg", "j6_multihop_agg", "j8_range_join",
    "w1_rank", "w3_running_sum", "w4_sessionize",
    "o1_topk", "e1_tumbling_counts", "e3_session_window", "e4_funnel",
    "d1_exact_dedup", "d2_fingerprint_dedup", "d3b_ngram_jaccard_capped",
    "d4_minhash_pairs", "d7_neardup_clusters", "d8_span_dedup",
    "t13_decontaminate_bloom",
    "t1_token_stats", "t5_tfidf", "t6_winnow_fingerprint", "t7_decontamination",
    "t9_pii_metrics", "t11_chunk_documents",
    "t14_classifier_score", "t15_bigram_surprisal",
    "ds3_temperature_resample", "ds7_domain_mixture",
    "p0_curation_pipeline", "p2_corpus_freeze",
    "sim1_cosine_topk", "sim2_lsh_topk", "sim5_ivf_topk", "sim7_ivfpq_topk",
    "bc5_block_stats",
    // bk5 (corpus-scale clustering), not bc7: the 7-row fixture's time is
    // pure GraphX stage latency and measures nothing about the engine.
    "bk0_e2e_pipeline", "bk2_tx_stats", "bk4_address_stats", "bk5_wallet_clusters",
    "bk7_utxo_set")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's union partitioning propagation plans SMJ over a 2N-partition
      // union as exchange-free against an N-partition side -> runtime zip
      // failure (observed on the fused addressStats). Disable everywhere.
      .config("spark.sql.unionOutputPartitioning", "false")
      // Bucket-aligned gold joins cluster on a SUBSET of the join keys
      // (tx_hash buckets, (tx_hash, address) joins); allow that co-partition.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries
    val names = headline.filter(all.contains)
    // Steady-state protocol: warm each query immediately before timing it
    // (cold-vs-warm codegen/JIT is 6x on the heaviest query, and a single
    // up-front warm pass gets evicted from the codegen cache by the other
    // queries' plans before the timed run), then time `runs` executions and
    // report the per-query MEDIAN plus spread (max−min): one sample cannot
    // distinguish a real regression from JIT/GC variance.
    // A failed query must be LOUD: a swallowed exception reads as a
    // suspiciously fast time and poisons the round's numbers.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    var failures = List.empty[String]
    val results = names.filter(n => only.forall(_.contains(n))).map { name =>
      // Cold-cache boundary: drain every operator's retained swap register
      // before each query. WITHIN a query the warm+timed runs share the
      // registers (that is the steady-state being measured); ACROSS queries
      // the registers coexist in the deliberately small bench heap and the
      // eviction thrash poisons the medians (bk0 measured 70s in-suite vs
      // 7.5s isolated before this boundary existed).
      Graft.releaseCaches()
      def once(): Double = {
        val t0 = System.nanoTime()
        try all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          if (!failures.contains(name)) {
            failures ::= name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage.linesIterator.next()}")
          }
        }
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      def unstable(ss: Seq[Double]): Boolean = {
        val sorted = ss.sorted
        val m = sorted(sorted.length / 2)
        sorted.last - sorted.head > math.max(m * 0.5, 0.5)
      }
      var ordered = Seq.fill(runs)(once())
      // Adaptive resampling: transient host contention (another tenant, a
      // page-cache cold start) can poison a 3-sample median by 10–20x. When
      // the spread flags instability, take up to `runs` extra samples — the
      // median over more samples sheds the outliers if the cause was
      // transient, and keeps flagging if it is real drift.
      var extra = 0
      while (unstable(ordered) && extra < runs) { ordered :+= once(); extra += 1 }
      // Execution-order samples are the drift diagnostic: monotone growth
      // means within-session accumulation (heap aging, lineage, shuffle
      // files), not noise — the sorted median alone cannot distinguish them.
      System.err.println(f"[bench] $name samples: " +
        ordered.map(s => f"$s%.2f").mkString(", "))
      val samples = ordered.sorted
      name -> (samples(samples.length / 2), samples.last - samples.head)
    }
    failures.foreach(n => System.err.println(s"[bench] WARNING: $n time is a failure, not a run"))
    // Self-diagnose protocol problems: a spread comparable to the median
    // means the samples measure session state (cache eviction, GC pressure),
    // not the query — exactly how round 7's retained-cache contamination
    // showed up (bk0 spread 42.9s on a 70.3s median) before anyone read the
    // numbers. Loud, not fatal: the medians still ship.
    results.foreach { case (name, (m, s)) =>
      if (s > math.max(m * 0.5, 0.5))
        System.err.println(f"[bench] WARNING: $name spread $s%.2fs vs median $m%.2fs — samples unstable")
    }
    val qs = results.map { case (k, (m, _)) => "\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, (_, s)) => "\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"runs":$runs,"sf":"$sfDir"}"""
    println(json)
    // The driver stores only a truncated tail of the run log, which has cut
    // up to 10 of the per-query timings from every BENCH artifact so far —
    // the file is the lossless channel.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, json + "\n")
    spark.stop()
  }
}
