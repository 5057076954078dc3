package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSpec {

  test("block_subsidy: halving schedule incl. 64-halving cutoff") {
    import spark.implicits._
    val df = Seq(0, 1, 209999, 210000, 420000, 210000 * 64, Int.MaxValue)
      .toDF("h")
      .select(col("h"), GraftFunctions.block_subsidy(col("h")).as("s"))
    val got = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got(0) == 5000000000L)
    assert(got(1) == 5000000000L)
    assert(got(209999) == 5000000000L)
    assert(got(210000) == 2500000000L)
    assert(got(420000) == 1250000000L)
    assert(got(210000 * 64) == 0L)
    assert(got(Int.MaxValue) == 0L)
  }

  test("block_subsidy survives codegen and interpreted paths identically") {
    import spark.implicits._
    val df = (0 until 100).map(i => i * 50000).toDF("h")
    val viaExpr = df.select(GraftFunctions.block_subsidy(col("h")).as("s"))
      .agg(sum("s")).head().getLong(0)
    val viaScala = (0 until 100).map { i =>
      val halvings = i * 50000 / 210000
      if (halvings >= 64) 0L else 5000000000L >> halvings
    }.sum
    assert(viaExpr == viaScala)
  }

  test("extensions: native functions callable from plain SQL") {
    val r = spark.sql(
      "SELECT block_subsidy(210000) AS s, " +
        "script_to_address(unhex('6a00')) AS a, " +
        "vec_dot_f(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "          array(CAST(2 AS FLOAT), CAST(3 AS FLOAT))) AS d").head()
    assert(r.getLong(0) == 2500000000L)
    assert(r.getString(1) == "<undecodable>")
    assert(r.getDouble(2) == 9.0)
    val bg = spark.sql("SELECT bigram_counts('abab') AS m").head()
      .getMap[String, Long](0)
    assert(bg == Map("ab" -> 2L, "ba" -> 1L))
  }

  test("script_to_address: real Base58Check/bech32 through codegen path") {
    import spark.implicits._
    val df = Seq(
      (1L, "76a914010966776006953d5567439e5e39f86a0d273bee88ac"),
      (2L, "0014751e76e8199196d454941c45d1b3a323f1433bd6"),
      (3L, "6a4c00"),
      (4L, ""),
      (5L, null)).toDF("id", "hex")
      .select(col("id"), GraftFunctions.script_to_address(unhex(col("hex"))).as("a"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM")
    assert(got(2L) == "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4")
    assert(got(3L) == "<undecodable>")
    assert(got(4L) == "<undecodable>")
    assert(got(5L) == "<undecodable>")
  }
}
