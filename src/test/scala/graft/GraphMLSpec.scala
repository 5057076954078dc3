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
}
