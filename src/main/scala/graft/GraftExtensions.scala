package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BigramCountsExpr, BlockSubsidy, ScriptToAddressExpr, VecDotF}

/** SQL-surface registration of the engine's native expressions
  * (SURVEY.md §2.10): configure
  * `spark.sql.extensions=graft.GraftExtensions` and the functions become
  * callable from `spark.sql(...)` exactly like built-ins — full codegen, no
  * UDF boundary:
  *
  * {{{
  *   SELECT block_subsidy(height), script_to_address(script) FROM outputs
  *   SELECT vec_dot_f(a.embedding, b.embedding) FROM ...
  *   SELECT doc_id, explode(bigram_counts(trim(text))) FROM documents
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args =>
      if (args.length == n) build(args)
      else throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("block_subsidy"),
      info("block_subsidy", "block_subsidy(height INT) -> BIGINT coinbase subsidy"),
      arity("block_subsidy", 1)(args => BlockSubsidy(args.head))))
    ext.injectFunction((
      FunctionIdentifier("script_to_address"),
      info("script_to_address", "script_to_address(script BINARY) -> STRING address or sentinel"),
      arity("script_to_address", 1)(args => ScriptToAddressExpr(args.head))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot_f"),
      info("vec_dot_f", "vec_dot_f(a ARRAY<FLOAT>, b ARRAY<FLOAT>) -> DOUBLE dot product"),
      arity("vec_dot_f", 2)(args => VecDotF(args(0), args(1)))))
    ext.injectFunction((
      FunctionIdentifier("bigram_counts"),
      info("bigram_counts", "bigram_counts(s STRING) -> MAP<STRING,BIGINT> character-bigram histogram"),
      arity("bigram_counts", 1)(args => BigramCountsExpr(args.head))))
  }
}
