package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two float-array columns — the hot kernel of
  * every vector-similarity operator, as a native expression instead of the
  * higher-order `zip_with`/`aggregate` fold (which is CodegenFallback:
  * interpreted per element, with per-element expression-tree overhead).
  * One tight JVM loop per row, inlined into WholeStageCodegen.
  *
  * Accumulation is float→double widening then left-to-right double adds —
  * the SAME IEEE operation order as [[graft.ops.Vector.dot]]'s fold and the
  * DuckDB oracle's `list_reduce`, so all three produce bit-identical
  * doubles (pinned in ExtSpec). Inputs must be non-null `array<float>` of
  * equal length (the embedding contract); the builder casts.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.VecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}
