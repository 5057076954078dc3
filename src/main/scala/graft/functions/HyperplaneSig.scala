package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH signature of an array<float> vector as one native
  * expression — replaces 16+ interpreted higher-order folds per row with a
  * single primitive loop over a cached ±1 plane matrix (derived
  * deterministically from (seed, plane, dim) — no RNG state to ship,
  * identical on every executor; the matrix for a given (seed, bits, dim) is
  * computed once per JVM and reused).
  */
object HyperplaneSig {

  private val cache = new ConcurrentHashMap[(Int, Int, Int), Array[Array[Float]]]()

  /** Deterministic ±1 planes (splitmix64-style mixing — public domain). */
  private def planes(seed: Int, bits: Int, dim: Int): Array[Array[Float]] =
    cache.computeIfAbsent((seed, bits, dim), _ =>
      Array.tabulate(bits, dim) { (p, d) =>
        var z = seed.toLong * 0x9E3779B97F4A7C15L + p.toLong * 0xBF58476D1CE4E5B9L + d.toLong
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if ((z & 1L) == 0L) 1.0f else -1.0f
      })

  /** Oracle support: the plane matrix is deterministic in (seed, bits, dim),
    * so a SQL twin can embed it as literals and recompute signatures exactly
    * (the ±1 products are exact in IEEE — no float-rounding divergence).
    */
  private[graft] def planeMatrix(seed: Int, bits: Int, dim: Int): Array[Array[Float]] =
    planes(seed, bits, dim)

  /** Static entry point shared by eval and generated code. */
  def signature(vec: ArrayData, bits: Int, seed: Int): Long = {
    val dim = vec.numElements()
    val m = planes(seed, bits, dim)
    var sig = 0L
    var p = 0
    while (p < bits) {
      val plane = m(p)
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += vec.getFloat(d) * plane(d); d += 1 }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

case class HyperplaneSigExpr(child: Expression, bits: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneSig.signature(v.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HyperplaneSig.signature($v, $bits, $seed);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

object HyperplaneSigOps {
  import org.apache.spark.sql.GraftShims

  def hyperplane_sig(vec: Column, bits: Int, seed: Int): Column =
    GraftShims.toColumn(HyperplaneSigExpr(GraftShims.toExpression(vec), bits, seed))
}
