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

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (!VecDot.valid(x, y)) null else VecDot.dot(x, y)
  }

  // validity split from the kernel so the VALID path stays primitive and
  // allocation-free in codegen (the hot path of every vector operator);
  // only the two cold error cases branch to isNull
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (!graft.ext.VecDot.valid($a, $b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.ext.VecDot.dot($a, $b);
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** The defined-result precondition: equal lengths, no null elements.
    * When false the expression yields NULL, mirroring the higher-order
    * fold. Null-bit probes on primitive float arrays are bitset lookups —
    * this pre-pass is far cheaper than boxing every valid result.
    */
  def valid(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Primitive dot kernel — callers must check [[valid]] first. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Double-array kernel twin — same left-to-right fold, no widening
    * (operands already double). Used by the dequantized-search path
    * (q60), where the reconstruction math produces doubles and a float
    * round-trip would break oracle parity.
    */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** [[VecDot]] over `array<double>` columns — identical fold order, double
  * element reads. Bit-identical to the HOF `zip_with`/`aggregate` fold on
  * the same doubles (pinned in ExtSpec).
  */
case class VecDotD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (!VecDot.valid(x, y)) null else VecDot.dotD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (!graft.ext.VecDot.valid($a, $b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.ext.VecDot.dotD($a, $b);
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotD =
    copy(left = newLeft, right = newRight)
}
