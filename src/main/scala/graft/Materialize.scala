package graft
import org.apache.spark.sql.SparkSession
object Materialize {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.unionOutputPartitioning", "false")
      // Bucket-aligned gold joins cluster on a SUBSET of the join keys
      // (tx_hash buckets, (tx_hash, address) joins); allow that co-partition.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.chain.BlkCorpus.ensureMaterialized(spark)
    println(f"materialized in ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
