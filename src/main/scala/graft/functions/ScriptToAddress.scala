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
  * Recognizes the standard script templates by structure (public knowledge,
  * Bitcoin script encoding) and emits the REAL wire addresses via
  * [[AddressCodec]] (Base58Check / BIP-173 bech32 / BIP-350 bech32m):
  *   - P2PKH:  76 a9 14 <20B hash> 88 ac      → Base58Check(version 0)
  *   - P2SH:   a9 14 <20B hash> 87            → Base58Check(version 5)
  *   - P2PK:   <33B|65B pubkey push> ac       → Base58Check(0, hash160(pk))
  *                                              (= bitcoinj's scriptSig-mode
  *                                              `getToAddress(np, TRUE)`)
  *   - P2WPKH: 00 14 <20B hash>               → bech32 v0
  *   - P2WSH:  00 20 <32B hash>               → bech32 v0
  *   - P2TR:   51 20 <32B key>                → bech32m v1
  */
object ScriptToAddress {
  val Sentinel = "<undecodable>"

  import AddressCodec.{Base58, Bech32, Network, Mainnet, hash160}

  private def slice(script: Array[Byte], from: Int, len: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(script, from, from + len)

  /** Network-parameterized decode (mainnet/testnet/regtest share templates,
    * differ only in version bytes + HRP).
    */
  def decodeString(script: Array[Byte], net: Network): String = {
    if (script == null) return Sentinel
    val n = script.length
    // P2PKH: OP_DUP OP_HASH160 <20> OP_EQUALVERIFY OP_CHECKSIG
    if (n == 25 && (script(0) & 0xFF) == 0x76 && (script(1) & 0xFF) == 0xa9 &&
      (script(2) & 0xFF) == 0x14 && (script(23) & 0xFF) == 0x88 &&
      (script(24) & 0xFF) == 0xac)
      Base58.encodeCheck(net.p2pkhVersion, slice(script, 3, 20))
    // P2SH: OP_HASH160 <20> OP_EQUAL
    else if (n == 23 && (script(0) & 0xFF) == 0xa9 && (script(1) & 0xFF) == 0x14 &&
      (script(22) & 0xFF) == 0x87)
      Base58.encodeCheck(net.p2shVersion, slice(script, 2, 20))
    // P2WPKH / P2WSH: OP_0 <20|32>
    else if (n == 22 && script(0) == 0x00 && (script(1) & 0xFF) == 0x14)
      Bech32.segwitAddress(net.hrp, 0, slice(script, 2, 20))
    else if (n == 34 && script(0) == 0x00 && (script(1) & 0xFF) == 0x20)
      Bech32.segwitAddress(net.hrp, 0, slice(script, 2, 32))
    // P2TR: OP_1 <32>
    else if (n == 34 && (script(0) & 0xFF) == 0x51 && (script(1) & 0xFF) == 0x20)
      Bech32.segwitAddress(net.hrp, 1, slice(script, 2, 32))
    // P2PK: <push 33 compressed | 65 uncompressed> OP_CHECKSIG
    else if (n == 35 && (script(0) & 0xFF) == 0x21 && (script(34) & 0xFF) == 0xac)
      Base58.encodeCheck(net.p2pkhVersion, hash160(slice(script, 1, 33)))
    else if (n == 67 && (script(0) & 0xFF) == 0x41 && (script(66) & 0xFF) == 0xac)
      Base58.encodeCheck(net.p2pkhVersion, hash160(slice(script, 1, 65)))
    else Sentinel
  }

  /** Static mainnet decode — referenced directly from generated code. */
  def decode(script: Array[Byte]): UTF8String =
    UTF8String.fromString(decodeString(script, Mainnet))
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
