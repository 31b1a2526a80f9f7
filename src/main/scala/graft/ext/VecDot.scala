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
  * doubles (pinned in ExtSpec). Malformed inputs match the fold too: a
  * length mismatch or a null element yields NULL (exactly what
  * `zip_with`+`aggregate` produce), never a silently-truncated score.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.ext.VecDot.dot($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Boxed on purpose: `null` is the defined result for a length mismatch
    * or a null element, mirroring the higher-order-function fold.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}
