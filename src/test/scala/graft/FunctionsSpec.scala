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

  test("codegen: two vec_dot_f + two block_subsidy share one stage (r18 collision regression)") {
    import spark.implicits._
    import graft.functions.VecOps.vec_dot_f
    // The r18 failure mode: doGenCode emitted FIXED local names (`acc`,
    // `graftHalvings`), so two instances in one codegen stage redefined the
    // local, janino rejected the class, and Spark silently ran the stage
    // interpreted. fallback=false turns that silent degradation into a
    // thrown SparkException — this test then fails instead of passing slow.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // Built from spark.range, NOT a local Seq: ConvertToLocalRelation
      // would otherwise fold the whole projection at plan time and the test
      // would assert nothing about generated code.
      val df = spark.range(2)
        .select(
          array((col("id") + 1).cast("float"), (col("id") + 2).cast("float"),
            (col("id") + 3).cast("float")).as("a"),
          array((col("id") + 4).cast("float"), (col("id") + 5).cast("float"),
            (col("id") + 6).cast("float")).as("b"),
          (col("id") * 209999).cast("int").as("h"))
        .select(
          // cosine shape = THREE VecDotF instances in one projection
          (vec_dot_f(col("a"), col("b")) /
            sqrt(vec_dot_f(col("a"), col("a")) * vec_dot_f(col("b"), col("b"))))
            .as("cos"),
          // subsidy delta = TWO BlockSubsidy instances in one projection
          (GraftFunctions.block_subsidy(col("h")) -
            GraftFunctions.block_subsidy((col("h") + lit(1)).cast("int")))
            .as("subsidy_delta"))
      val plan = df.queryExecution.executedPlan
      assert(plan.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
        s"projection left whole-stage codegen entirely:\n$plan")
      val rows = df.collect().sortBy(_.getDouble(0))
      // row h=209999: subsidy(209999)=50e8, subsidy(210000)=25e8 → delta 25e8
      assert(rows.map(_.getLong(1)).toSet == Set(0L, 2500000000L))
      val cos0 = 32.0 / math.sqrt(14.0 * 77.0) // (1,2,3)·(4,5,6) shape
      assert(math.abs(rows.map(_.getDouble(0)).min - cos0) < 1e-12)
      assert(CodegenTripwire.hits == 0,
        s"codegen compile error logged during the two-instance stage: " +
          s"${CodegenTripwire.firstHit.getOrElse("?")}")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
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
