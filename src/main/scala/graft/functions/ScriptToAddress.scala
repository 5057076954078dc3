package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** scriptPubKey → address decode (SURVEY.md §2.8 C7) — the one genuinely
  * domain-specific scalar of the reference
  * (`getScriptPubKey().getToAddress(np, true)` with an exception fallback,
  * BlockchainToGraph.java:1067–1074). Undecodable scripts collapse into ONE
  * sentinel address, exactly like the reference's literal fallback string
  * (BlockchainToGraph.java:1071–1073) — but null-safe.
  *
  * Recognizes the two dominant script templates by structure (public
  * knowledge, Bitcoin script encoding):
  *   - P2PKH:  76 a9 14 <20B hash> 88 ac  → "1" + hex(hash)
  *   - P2WPKH: 00 14 <20B hash>           → "bc1" + hex(hash)
  * (Base58Check/bech32 encodings are presentation-layer; hex keeps the
  * decode dependency-free and deterministic.)
  */
object ScriptToAddress {
  val Sentinel = "<undecodable>"

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder((until - from) * 2)
    var i = from
    while (i < until) {
      val b = bytes(i) & 0xFF
      sb.append(HexChars(b >>> 4)).append(HexChars(b & 0xF))
      i += 1
    }
    sb.toString
  }

  /** Static decode — referenced directly from generated code. */
  def decode(script: Array[Byte]): UTF8String = {
    val s =
      if (script == null) Sentinel
      else if (script.length == 25 && (script(0) & 0xFF) == 0x76 &&
        (script(1) & 0xFF) == 0xa9 && (script(2) & 0xFF) == 0x14 &&
        (script(23) & 0xFF) == 0x88 && (script(24) & 0xFF) == 0xac)
        "1" + hex(script, 3, 23)
      else if (script.length == 22 && script(0) == 0x00 && (script(1) & 0xFF) == 0x14)
        "bc1" + hex(script, 2, 22)
      else Sentinel
    UTF8String.fromString(s)
  }
}

/** Codegen'd Catalyst expression wrapping [[ScriptToAddress.decode]].
  * Never null on output (null input → sentinel), so downstream aggregates
  * skip null branches entirely.
  */
case class ScriptToAddressExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "script_to_address"

  override def eval(input: InternalRow): Any =
    ScriptToAddress.decode(child.eval(input).asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = graft.functions.ScriptToAddress.decode(
          ${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptToAddressExpr =
    copy(child = newChild)
}
