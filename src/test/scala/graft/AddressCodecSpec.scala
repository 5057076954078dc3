package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AddressCodec
import graft.functions.AddressCodec.{Base58, Bech32, Mainnet, Testnet}
import graft.functions.ScriptToAddress

/** External published test vectors: the classic P2PKH worked example
  * (hash160 + Base58Check), BIP-173 bech32 and BIP-350 bech32m segwit
  * vectors. These anchor the codec independently of our own code — the
  * bc8 oracle literals derive their authority from these passing.
  */
class AddressCodecSpec extends AnyFunSuite {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val UncompressedPk =
    "0450863AD64A87AE8A2FE83C1AF1A8403CB53F53E486D8511DAD8A04887E5B2352" +
      "2CD470243453A299FA9E77237716103ABC11A1DF38855ED6F2EE187E9C582BA6"

  test("hash160 of the worked-example pubkey (RIPEMD160 ∘ SHA256)") {
    val h = AddressCodec.hash160(unhex(UncompressedPk))
    assert(h.map(b => f"${b & 0xFF}%02x").mkString ==
      "010966776006953d5567439e5e39f86a0d273bee")
  }

  test("Base58Check P2PKH vector (version 0x00)") {
    assert(Base58.encodeCheck(0x00, unhex("010966776006953d5567439e5e39f86a0d273bee")) ==
      "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM")
  }

  test("Base58 leading-zero handling: all-zero payload starts with 1s") {
    val addr = Base58.encodeCheck(0x00, new Array[Byte](20))
    assert(addr.startsWith("1111"))
  }

  test("BIP-173 P2WPKH vectors (mainnet + testnet)") {
    val prog = unhex("751e76e8199196d454941c45d1b3a323f1433bd6")
    assert(Bech32.segwitAddress("bc", 0, prog) ==
      "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4")
    assert(Bech32.segwitAddress("tb", 0, prog) ==
      "tb1qw508d6qejxtdg4y5r3zarvary0c5xw7kxpjzsx")
  }

  test("BIP-173 P2WSH vector") {
    val prog = unhex("1863143c14c5166804bd19203356da136c985678cd4d27a1b8c6329604903262")
    assert(Bech32.segwitAddress("bc", 0, prog) ==
      "bc1qrp33g0q5c5txsp9arysrx4k6zdkfs4nce4xj0gdcccefvpysxf3qccfmv3")
  }

  test("BIP-350 P2TR (bech32m, witness v1) vector") {
    val prog = unhex("79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798")
    assert(Bech32.segwitAddress("bc", 1, prog) ==
      "bc1p0xlxvlhemja6c4dqv22uapctqupfhlxm9h8z3k2e72q4k9hcz7vqzk5jj0")
  }

  test("script templates decode to real addresses (mainnet)") {
    def d(hex: String): String =
      ScriptToAddress.decodeString(unhex(hex), Mainnet)
    // P2PKH
    assert(d("76a914010966776006953d5567439e5e39f86a0d273bee88ac") ==
      "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM")
    // P2WPKH
    assert(d("0014751e76e8199196d454941c45d1b3a323f1433bd6") ==
      "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4")
    // P2WSH
    assert(d("00201863143c14c5166804bd19203356da136c985678cd4d27a1b8c6329604903262") ==
      "bc1qrp33g0q5c5txsp9arysrx4k6zdkfs4nce4xj0gdcccefvpysxf3qccfmv3")
    // P2TR
    assert(d("512079be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798") ==
      "bc1p0xlxvlhemja6c4dqv22uapctqupfhlxm9h8z3k2e72q4k9hcz7vqzk5jj0")
    // P2PK uncompressed (scriptSig-mode address = hash160 of the pushed key)
    assert(d("41" + UncompressedPk.toLowerCase + "ac") ==
      "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM")
    // P2PK compressed generator point → its well-known P2PKH address
    assert(d("210279be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798ac") ==
      "1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH")
    // non-standard / empty / null → sentinel
    assert(d("6a4c00") == ScriptToAddress.Sentinel)
    assert(d("") == ScriptToAddress.Sentinel)
    assert(ScriptToAddress.decodeString(null, Mainnet) == ScriptToAddress.Sentinel)
  }

  test("testnet versions/hrp differ from mainnet") {
    val p2pkh = unhex("76a914010966776006953d5567439e5e39f86a0d273bee88ac")
    val t = ScriptToAddress.decodeString(p2pkh, Testnet)
    assert(t != ScriptToAddress.decodeString(p2pkh, Mainnet))
    assert(t.startsWith("m") || t.startsWith("n")) // 0x6f version prefix
  }
}
