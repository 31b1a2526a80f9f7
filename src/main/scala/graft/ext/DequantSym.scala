package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd symmetric-int8 dequantization of a float embedding — the
  * reconstruction kernel behind the quantized-search query (q60): per
  * vector, `scale = max|x| / 127` and each element becomes
  * `round(x / scale) * scale` (0.0 when the vector is all-zero).
  *
  * Semantically IDENTICAL to the portable higher-order chain
  * `transform(e, x -> when(array_max(transform(e, abs)) > 0,
  * round(x / scale) * scale).otherwise(0.0))` — but that chain is
  * CodegenFallback (interpreted per element) and, worse, projection
  * collapse inlines one copy of it per *use*, so a norm + a dot under a
  * probe cross join re-runs the whole interpreted chain per PAIR. This
  * expression is one tight loop per row inside WholeStageCodegen.
  *
  * Parity details, each pinned bit-identical to the HOF chain in ExtSpec:
  *  - the max scan skips null elements and uses `java.lang.Double.compare`
  *    ordering (array_max's interpreted ordering: NaN greatest,
  *    -0.0 < 0.0);
  *  - rounding is `java.math.BigDecimal.valueOf(d).setScale(0, HALF_UP)`
  *    — the exact operation Spark's `round(double)` performs;
  *  - a null element dequantizes to null when the vector has a positive
  *    max, but to 0.0 when it does not (the `when(mx > 0, …)` predicate
  *    is null/false there, so every element falls to the otherwise arm).
  */
case class DequantSym(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "dequant_sym"

  override protected def nullSafeEval(a: Any): Any =
    DequantSym.dequantize(a.asInstanceOf[ArrayData])

  // NOTE: the helper must NOT be named `eval` — the class inherits
  // `eval(InternalRow)` from Expression, and scalac suppresses a companion's
  // static forwarder when the class already has a member of that name, so the
  // generated Java would fail Janino and silently fall back to interpretation
  // (found by the round-9 review; ExtSpec's codegen-only guard pins this).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ext.DequantSym.dequantize($a)")

  override protected def withNewChildInternal(newChild: Expression): DequantSym =
    copy(child = newChild)
}

object DequantSym {
  /** One-pass max, one-pass reconstruct. Output is a fresh
    * `GenericArrayData` of boxed doubles (nullable elements).
    *
    * NaN pinning: a NaN element makes `mx` NaN, and Java's `!(mx > 0)`
    * then zeroes the whole vector. DuckDB's comparison sorts NaN greater
    * than everything, so the q59/q60 oracles restate the guard as
    * `NOT isnan(mx) AND mx > 0` — identical branch choice in both
    * engines for every input, NaN-bearing or not.
    */
  def dequantize(a: ArrayData): ArrayData = {
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
    val out = new Array[Any](n)
    if (!seen || !(mx > 0)) {
      var j = 0
      while (j < n) { out(j) = 0.0; j += 1 }
    } else {
      val scale = mx / 127.0
      var j = 0
      while (j < n) {
        out(j) =
          if (a.isNullAt(j)) null
          else java.math.BigDecimal.valueOf(a.getFloat(j).toDouble / scale)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() * scale
        j += 1
      }
    }
    new GenericArrayData(out)
  }
}
