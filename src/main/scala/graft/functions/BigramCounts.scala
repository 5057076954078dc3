package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-bigram histogram as ONE native expression:
  * `bigram_counts(text)` → `map<string,bigint>` of each overlapping 2-char
  * sequence to its occurrence count, in a single pass over the UTF-8 bytes.
  *
  * This is the scale lever for LM-style corpus scoring (t15 bigram
  * surprisal): the naive plan explodes one row PER CHARACTER of the corpus
  * and shuffles that stream to (doc, bigram) grain before counting, so both
  * the generator output and the first exchange are O(total characters). The
  * histogram collapses that inside the scan — the generator emits one row
  * per DISTINCT bigram per document (bounded by min(len, |charset|²), for
  * natural text ~5–20× fewer rows) already at count grain, and no
  * (doc, bigram) exchange exists at all. Both downstream aggregates
  * (global model, per-doc score) are unchanged sums over `cd`, so results
  * are bit-identical to the exploded form — the DuckDB oracle keeps its
  * UNNEST formulation as the independent witness.
  *
  * Characters are Unicode code points exactly as Spark's `substring` walks
  * them (UTF-8 leading-byte widths), so `bigram_counts(s)` ≡
  * `count-by(substr(s, i, 2) for i in 1..len-1)` including surrogate and
  * multi-byte content. Inputs with fewer than 2 characters yield an empty
  * map (→ a generator emits nothing — same absence-of-row semantics as the
  * exploded form). Codegen-friendly: `doGenCode` is one static call, so the
  * whole scoring projection stays inside WholeStageCodegen.
  */
object BigramCounts {

  /** Byte width of a UTF-8 character from its first byte — delegated to
    * `UTF8String.numBytesForFirstByte` so the walk is byte-for-byte the one
    * Spark's own `substring` uses (including its lenient handling of
    * invalid leading bytes).
    */
  private def charWidth(b: Byte): Int = UTF8String.numBytesForFirstByte(b)

  /** Single-pass histogram shared by eval and generated code. */
  def compute(s: UTF8String): MapData = {
    val bytes = s.getBytes // contiguous copy only when offset/length demand it
    val n = bytes.length
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var prevStart = 0
    var curStart = -1
    if (n > 0) {
      var w = charWidth(bytes(0))
      curStart = math.min(w, n)
    }
    // (prevStart, curStart) delimit the previous char; emit [prevStart, end
    // of current char) as a bigram each step.
    while (curStart > 0 && curStart < n) {
      val w = charWidth(bytes(curStart))
      val end = math.min(curStart + w, n)
      val bg = UTF8String.fromBytes(bytes, prevStart, end - prevStart)
      val slot = counts.get(bg)
      if (slot == null) counts.put(bg, Array(1L)) else slot(0) += 1L
      prevStart = curStart
      curStart = end
    }
    val m = counts.size()
    val keys = new Array[Any](m)
    val values = new Array[Any](m)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      values(i) = e.getValue()(0)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}

case class BigramCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "bigram_counts"

  override protected def nullSafeEval(input: Any): Any =
    BigramCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BigramCounts.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): BigramCountsExpr =
    copy(child = newChild)
}

object BigramCountsOps {
  import org.apache.spark.sql.GraftShims

  /** Column-API entry point: `bigram_counts($"text")`. */
  def bigram_counts(text: Column): Column =
    GraftShims.toColumn(BigramCountsExpr(GraftShims.toExpression(text)))
}
