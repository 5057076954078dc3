package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two array<float> columns, accumulated left-to-right in
  * double — a native Catalyst expression replacing the
  * `aggregate(zip_with(...))` higher-order formulation in the similarity
  * operators. Same accumulation order ⇒ bit-identical results, but the
  * generated code is a tight primitive loop over ArrayData instead of one
  * interpreted lambda frame per element (~10× on 64-dim embeddings).
  * Null if either side is null; lengths must match (min length used).
  */
case class VecDotF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // acc must be fresh-named too: two VecDotF instances in one codegen
      // stage (any cosine = dot/norm shape) would otherwise redefine the
      // same local and janino rejects the whole stage → silent interpreted
      // fallback on exactly the hot scoring scans.
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotF =
    copy(left = l, right = r)
}

object VecOps {
  import org.apache.spark.sql.GraftShims

  /** `vec_dot_f($"a", $"b")` — double dot product of float vectors. */
  def vec_dot_f(a: Column, b: Column): Column =
    GraftShims.toColumn(VecDotF(GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
