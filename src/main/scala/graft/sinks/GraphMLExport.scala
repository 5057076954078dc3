package graft.sinks

import java.io.{BufferedWriter, FileWriter}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraphML export sink (SURVEY.md §2.1 S7) — the reference ships this
  * commented out (`graph.io(IoCore.graphml())`, BlockchainToGraph.java:
  * 1248–1249); here it works. GraphML is a single-document format, so the
  * node/edge XML fragments are rendered DISTRIBUTED (one codegen'd
  * format_string projection per partition) and only streamed to the local
  * file through `toLocalIterator` — one partition in memory at a time, never
  * a full collect. For cluster-scale exports prefer the sharded variant
  * (`df.write.text`) and concatenate downstream.
  */
object GraphMLExport {

  private def esc(c: org.apache.spark.sql.Column) = {
    // XML-escape the three structural characters.
    regexp_replace(regexp_replace(regexp_replace(c.cast("string"),
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
  }

  private def fragments(vertices: DataFrame, edges: DataFrame)
      : (Seq[String], DataFrame, DataFrame) = {
    val vExtra = vertices.columns.filterNot(_ == "id")
    val eExtra = edges.columns.filterNot(c => c == "src" || c == "dst")

    def dataTags(cols: Seq[String]): org.apache.spark.sql.Column =
      concat(cols.map(c =>
        concat(lit(s"""<data key="$c">"""), esc(col(c)), lit("</data>"))): _*)

    val vXml = vertices.select(concat(
      lit("""<node id=""""), esc(col("id")), lit("\">"),
      if (vExtra.nonEmpty) dataTags(vExtra) else lit(""),
      lit("</node>")).as("x"))
    val eXml = edges.select(concat(
      lit("""<edge source=""""), esc(col("src")),
      lit("""" target=""""), esc(col("dst")), lit("\">"),
      if (eExtra.nonEmpty) dataTags(eExtra) else lit(""),
      lit("</edge>")).as("x"))
    ((vExtra ++ eExtra).distinct.toSeq, vXml, eXml)
  }

  private def header(keys: Seq[String]): String =
    """<?xml version="1.0" encoding="UTF-8"?>""" + "\n" +
      """<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""" + "\n" +
      keys.map(k => s"""<key id="$k" attr.name="$k" attr.type="string"/>""" + "\n").mkString +
      """<graph id="G" edgedefault="directed">""" + "\n"

  private val footer = "</graph>\n</graphml>\n"

  /** @param vertices (id) + any extra columns exported as <data> entries
    * @param edges    (src, dst) + extra columns likewise
    */
  def write(vertices: DataFrame, edges: DataFrame, path: String): Unit = {
    val (keys, vXml, eXml) = fragments(vertices, edges)

    val w = new BufferedWriter(new FileWriter(path))
    try {
      w.write(header(keys))
      vXml.toLocalIterator().forEachRemaining { r => w.write(r.getString(0)); w.write("\n") }
      eXml.toLocalIterator().forEachRemaining { r => w.write(r.getString(0)); w.write("\n") }
      w.write(footer)
    } finally w.close()
  }

  /** Cluster-scale export: node/edge XML fragments are written as PARALLEL
    * text shards (every executor writes its partitions concurrently — the
    * driver never sees a row), plus kilobyte `_header.xml` / `_footer.xml`
    * files. Concatenating header + nodes/part-* + edges/part-* + footer (a
    * filesystem-level merge — `cat`, `hadoop fs -cat`, S3 multipart compose)
    * yields the identical single document [[write]] produces; at 100 TB the
    * export is then bounded by sink bandwidth, not a driver stream.
    *
    * @return shard paths in concatenation order
    */
  def writeSharded(vertices: DataFrame, edges: DataFrame, dir: String): Seq[String] = {
    val (keys, vXml, eXml) = fragments(vertices, edges)
    val spark = vertices.sparkSession
    Hfs.writeText(spark, s"$dir/_header.xml", header(keys))
    vXml.write.mode("overwrite").text(s"$dir/nodes")
    eXml.write.mode("overwrite").text(s"$dir/edges")
    Hfs.writeText(spark, s"$dir/_footer.xml", footer)
    Seq(s"$dir/_header.xml", s"$dir/nodes", s"$dir/edges", s"$dir/_footer.xml")
  }
}
