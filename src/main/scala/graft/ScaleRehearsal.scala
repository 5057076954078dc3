package graft

import org.apache.spark.sql.SparkSession

/** Scale-rehearsal main (not part of the API): materializes the BlkCorpus at
  * the current SPARK_GRAFT_CORPUS_SCALE and times one steady-state run each
  * of bk0/bk1/bk4/bk7 — the evidence behind the "would this survive 10× the
  * corpus" claims (doubling-loop round count, envelope routing, bucketed
  * gold joins). Emits one JSON line per phase; the cross-scale table lives
  * in COVERAGE.md.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scale = graft.chain.BlkCorpus.Scale
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, matSec) = timed(graft.chain.BlkCorpus.ensureMaterialized(spark))
    val nBlocks = spark.read.parquet(graft.chain.BlkCorpus.bronzeDir("blocks")).count()
    println(f"""{"rehearsal":"materialize","scale":$scale,"blocks":$nBlocks,"sec":$matSec%.1f}""")
    val names = Seq("bk0_e2e_pipeline", "bk1_best_chain",
      "bk4_address_stats", "bk7_utxo_set")
    names.foreach { name =>
      Graft.releaseCaches()
      def once(): Double = timed(
        SparkEntry.queries(name)(spark, "unused")
          .write.format("noop").mode("overwrite").save())._2
      val warm = once()
      val s1 = once()
      val s2 = once()
      println(f"""{"rehearsal":"$name","scale":$scale,"warm":$warm%.2f,"s1":$s1%.2f,"s2":$s2%.2f}""")
    }
    spark.stop()
  }
}
