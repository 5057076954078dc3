package graft

import java.nio.file.{Files, Paths}

import graft.sinks.GraphMLExport

class GraphMLSpec extends SparkSpec {

  test("graphml export: well-formed document with escaped attributes") {
    import spark.implicits._
    val v = Seq(("a", "first & <best>"), ("b", "plain")).toDF("id", "label")
    val e = Seq(("a", "b", 42L)).toDF("src", "dst", "value")
    val out = Files.createTempDirectory("graft-gml").resolve("g.xml").toString
    GraphMLExport.write(v, e, out)
    val xml = new String(Files.readAllBytes(Paths.get(out)))
    assert(xml.contains("""<node id="a"><data key="label">first &amp; &lt;best&gt;</data></node>"""))
    assert(xml.contains("""<edge source="a" target="b"><data key="value">42</data></edge>"""))
    assert(xml.startsWith("""<?xml version="1.0""""))
    assert(xml.trim.endsWith("</graphml>"))
    // parses as XML
    scala.xml.XML.loadString(xml)
  }

  test("sharded export: concatenated shards = the single-file document") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val v = (1 to 100).map(i => (s"v$i", s"label & $i")).toDF("id", "label").repartition(8)
    val e = (1 to 99).map(i => (s"v$i", s"v${i + 1}", i.toLong)).toDF("src", "dst", "value")
      .repartition(8)
    val dir = Files.createTempDirectory("graft-gml-sharded")
    val order = GraphMLExport.writeSharded(v, e, dir.toString)

    // multi-partition: the parallel write actually sharded
    def parts(p: String) = Files.list(Paths.get(p)).iterator.asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq.sortBy(_.toString)
    assert(parts(s"$dir/nodes").size > 1)

    // filesystem-level concatenation in the returned order → valid GraphML
    // with the same node/edge set as the single-file writer
    val concat = order.flatMap { p =>
      if (Files.isDirectory(Paths.get(p))) parts(p).map(f => new String(Files.readAllBytes(f)))
      else Seq(new String(Files.readAllBytes(Paths.get(p))))
    }.mkString
    val doc = scala.xml.XML.loadString(concat)
    assert((doc \\ "node").size === 100)
    assert((doc \\ "edge").size === 99)
    assert((doc \\ "node").exists(n => (n \ "data").text == "label & 7"))

    val single = Files.createTempDirectory("graft-gml").resolve("g.xml").toString
    GraphMLExport.write(v, e, single)
    val sdoc = scala.xml.XML.loadString(new String(Files.readAllBytes(Paths.get(single))))
    assert((doc \\ "node").map(_.toString).sorted === (sdoc \\ "node").map(_.toString).sorted)
    assert((doc \\ "edge").map(_.toString).sorted === (sdoc \\ "edge").map(_.toString).sorted)
  }
}
