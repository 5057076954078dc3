package org.apache.spark.util

import org.apache.hadoop.conf.Configuration

/** Minimal public bridge to Spark's private[spark] SerializableConfiguration
  * — the canonical way to ship the driver's Hadoop configuration (HDFS/S3
  * credentials, filesystem implementations) to tasks that open files
  * directly via `FileSystem.open`, which graft's streaming blk scan does so
  * task heap stays O(block) instead of O(file). Nothing else from the
  * internal API is touched (same policy as sql.GraftShims).
  */
class GraftSerializableHadoopConf(@transient private val conf: Configuration)
    extends Serializable {
  private val inner = new SerializableConfiguration(conf)
  def value: Configuration = inner.value
}
