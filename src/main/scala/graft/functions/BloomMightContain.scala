package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContain(longHash)` as a native codegen'd Catalyst expression —
  * the probe side of a Bloom-prefiltered semi-join (the same shape Spark's
  * runtime row-level filtering uses internally, which is not exposed for
  * user filters built with `DataFrameStatFunctions.bloomFilter`).
  *
  * The serialized filter ships to executors via the expression itself
  * (task-broadcast with the serialized plan, deserialized once per instance,
  * referenced from generated code with `addReferenceObj` — no UDF boundary,
  * no per-row deserialization). Probes stay inside whole-stage codegen, so
  * prefiltering a 100 TB shingle stream is scan-speed work.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  // Input contract: child must already be LongType (call sites hash first).
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  // filterBytes is payload, not a comparable child: semantic equality on the
  // bytes' content, not array identity.
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, b) =>
      c == child && java.util.Arrays.equals(b, filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)
}

object BloomMightContain {
  import org.apache.spark.sql.GraftShims

  /** Serialize a built filter for embedding in the expression. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** Column-API probe: `might_contain(bloomBytes, $"hash64")`. */
  def might_contain(filterBytes: Array[Byte], hash: Column): Column =
    GraftShims.toColumn(BloomMightContain(GraftShims.toExpression(hash), filterBytes))
}
