package graft

import graft.functions.ExactDistinctWithRetraction

import scala.collection.mutable

class ExactDistinctSpec extends SparkSpec {

  test("retraction: add/remove interleavings net out exactly") {
    val agg = ExactDistinctWithRetraction
    var b = agg.zero
    b = agg.reduce(b, ("a", 1)); b = agg.reduce(b, ("b", 1)); b = agg.reduce(b, ("a", 1))
    assert(agg.finish(b) == 2)
    b = agg.reduce(b, ("a", -1)) // one of two 'a' events retracted
    assert(agg.finish(b) == 2)
    b = agg.reduce(b, ("a", -1)) // fully retracted
    assert(agg.finish(b) == 1)
    b = agg.reduce(b, ("a", 1)) // re-added after full retraction
    assert(agg.finish(b) == 2)
  }

  test("merge combines partial buffers with cancellation") {
    val agg = ExactDistinctWithRetraction
    val b1 = mutable.Map("x" -> 2L, "y" -> 1L)
    val b2 = mutable.Map("x" -> -2L, "z" -> 1L)
    val m = agg.merge(b1, b2)
    assert(agg.finish(m) == 2) // y, z; x cancelled to 0 and evicted
    assert(!m.contains("x"))
  }

  test("distributed: equals countDistinct when no retractions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val f = udaf(ExactDistinctWithRetraction,
      org.apache.spark.sql.Encoders.product[(String, Int)])
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "c"))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(f(col("v"), lit(1)).as("n"), countDistinct("v").as("cd"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("g1") == ((2L, 2L)))
    assert(got("g2") == ((1L, 1L)))
  }
}
