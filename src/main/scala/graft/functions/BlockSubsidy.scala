package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bitcoin block subsidy (coinbase inflation) as a native Catalyst expression
  * with whole-stage codegen — ≙ bitcoinj's `block.getBlockInflation(height)`
  * used at BlockchainToGraph.java:541, 1011.
  *
  * subsidy(height) = 50 BTC >> (height / 210000), zero after 64 halvings.
  * A UnaryExpression with doGenCode keeps this inside the codegen'd stage —
  * no UDF boundary, no boxing, vectorization-friendly.
  */
case class BlockSubsidy(child: Expression) extends UnaryExpression {

  // Input contract: child must already be IntegerType (call sites cast).
  override def dataType: DataType = LongType
  override def prettyName: String = "block_subsidy"

  override protected def nullSafeEval(height: Any): Any = {
    val halvings = height.asInstanceOf[Int] / 210000
    if (halvings >= 64) 0L else 5000000000L >> halvings
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      // Fresh-named so two subsidy calls can share one codegen stage
      // (e.g. subsidy delta between consecutive heights) without janino
      // rejecting the stage on local redefinition.
      val halvings = ctx.freshName("halvings")
      s"""
         |int $halvings = $h / 210000;
         |${ev.value} = $halvings >= 64 ? 0L : (5000000000L >> $halvings);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BlockSubsidy =
    copy(child = newChild)
}

object GraftFunctions {
  import org.apache.spark.sql.GraftShims

  /** Column-API entry point: `block_subsidy($"height")`. */
  def block_subsidy(height: Column): Column =
    GraftShims.toColumn(BlockSubsidy(GraftShims.toExpression(height)))

  /** Column-API entry point: `script_to_address($"script")` (C7). */
  def script_to_address(script: Column): Column =
    GraftShims.toColumn(ScriptToAddressExpr(GraftShims.toExpression(script)))
}
