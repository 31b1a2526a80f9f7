package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd symmetric-int8 quantization of a float embedding — the WRITE
  * path of the q59/q60 storage trade, as one pass per vector instead of
  * the portable `array_max`/`transform`/`round`/`concat_ws` chain (which
  * is CodegenFallback: a lambda frame and a BigDecimal round per element,
  * per row — on the full-corpus encode pass that interpreted chain IS the
  * job at scale).
  *
  * Returns `struct(scale: double, q8: string)`:
  *  - `scale = max|x| / 127` (null when the array is empty or all-null —
  *    the `array_max` result is null there);
  *  - `q8` = the comma-joined int codes `round(x / scale)`, with the HOF
  *    chain's exact edge behavior: when scale is not positive every
  *    element emits "0" (the `when` predicate is false/null, all elements
  *    fall to the otherwise arm), and when scale is positive a null
  *    element is SKIPPED (null code — `concat_ws` drops nulls);
  *  - rounding is `java.math.BigDecimal.valueOf(d).setScale(0, HALF_UP)`,
  *    the exact operation Spark's `round(double)` performs.
  * Bit/string-identical to the HOF chain, pinned in ExtSpec.
  */
case class Quant8Sym(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("q8", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "quant8_sym"

  override protected def nullSafeEval(a: Any): Any =
    Quant8Sym.quantize(a.asInstanceOf[ArrayData])

  // NOTE: the helper must NOT be named `eval` — the class inherits
  // `eval(InternalRow)` from Expression, and scalac suppresses a companion's
  // static forwarder when the class already has a member of that name, so the
  // generated Java would fail Janino and silently fall back to interpretation
  // (found by the round-9 review; ExtSpec's codegen-only guard pins this).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.Quant8Sym.quantize($a)")

  override protected def withNewChildInternal(newChild: Expression): Quant8Sym =
    copy(child = newChild)
}

object Quant8Sym {
  def quantize(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var mx = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = math.abs(a.getFloat(i).toDouble)
        if (!seen || java.lang.Double.compare(v, mx) > 0) { mx = v; seen = true }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(n * 4)
    if (!seen || !(mx > 0)) {
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(',')
        sb.append('0')
        j += 1
      }
      InternalRow(if (seen) java.lang.Double.valueOf(mx / 127.0) else null,
        UTF8String.fromString(sb.toString))
    } else {
      val scale = mx / 127.0
      var first = true
      var j = 0
      while (j < n) {
        if (!a.isNullAt(j)) {
          if (!first) sb.append(',')
          first = false
          sb.append(java.math.BigDecimal.valueOf(a.getFloat(j).toDouble / scale)
            .setScale(0, java.math.RoundingMode.HALF_UP).intValue())
        }
        j += 1
      }
      InternalRow(java.lang.Double.valueOf(scale), UTF8String.fromString(sb.toString))
    }
  }
}
