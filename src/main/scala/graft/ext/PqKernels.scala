package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for the IVF-PQ and z-order hot paths. The
  * higher-order-function forms ([[graft.ops.VectorPq]]'s first cut —
  * kept as executable references, value-equality pinned in ExtSpec) are
  * CodegenFallback: every lambda application is an interpreted
  * expression-tree walk, and PQ encoding walks m × k × sublen of them
  * per row (measured: the x27 gate spent ~30 s of its 35 s bench time
  * in interpreted encode lambdas at sf0.1). These expressions run the
  * same arithmetic as one tight JVM loop per row, inlined into
  * whole-stage codegen; fold orders are IDENTICAL to the HOF forms
  * (left-to-right within subvectors, subspaces in order, strict-<
  * argmin keeping the first minimum), so results are bit-for-bit the
  * same — the x27b/x27c oracle gates re-verify that end to end.
  *
  * The codebook/boundary parameters arrive as FOLDABLE literal
  * arguments and are extracted once at function-build time
  * ([[GraftExtensions]]' builders), so the per-row expressions stay
  * unary/binary and the arrays live as codegen reference objects, not
  * per-row literals.
  */

/** `pq_encode(vecD, flatCodebook, m, k, sublen)` →
  * `struct(codes: array<int>, c_norm: double)`: per subspace the
  * argmin-L2 codeword index over the flat codebook, plus the L2 norm of
  * the reconstruction (codeword concatenation), both in one pass.
  */
case class PqEncode(child: Expression, flat: Array[Double], m: Int,
    k: Int, sublen: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false)),
    StructField("c_norm", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any =
    PqEncode.encode(v.asInstanceOf[ArrayData], flat, m, k, sublen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.ext.PqEncode.encode($v, $flatRef, $m, $k, $sublen);
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

object PqEncode {
  /** The kernel: same arithmetic and fold order as the HOF reference
    * (dist = Σ (a−b)² left-to-right; first minimum wins via strict <;
    * norm = √Σ recon² in dimension order).
    */
  def encode(vec: ArrayData, flat: Array[Double], m: Int, k: Int,
      sublen: Int): InternalRow = {
    val codes = new Array[Int](m)
    var n2 = 0.0
    var i = 0
    while (i < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        while (j < sublen) {
          val diff = vec.getDouble(i * sublen + j) -
            flat((i * k + c) * sublen + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(i) = best
      var j = 0
      while (j < sublen) {
        val r = flat((i * k + best) * sublen + j)
        n2 += r * r
        j += 1
      }
      i += 1
    }
    InternalRow(new GenericArrayData(codes), math.sqrt(n2))
  }
}

/** `pq_encode_res(residual, base, flatCodebook, m, k, sublen)` →
  * `struct(codes: array<int>, c_norm: double)`: the RESIDUAL-encoding
  * variant (FAISS `by_residual = true`, VERDICT r16 #6) — codes are the
  * argmin-L2 codeword per subspace of the residual (vector − its cell
  * centroid, computed by the caller), while `c_norm` is the norm of
  * the FULL reconstruction `base + recon` (search cosines live in
  * reconstructed space, and the reconstruction of a residual code is
  * centroid + codeword). Same fold orders as [[PqEncode]].
  */
case class PqEncodeRes(left: Expression, right: Expression,
    flat: Array[Double], m: Int, k: Int, sublen: Int)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false)),
    StructField("c_norm", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_res"

  override protected def nullSafeEval(res: Any, base: Any): Any =
    PqEncodeRes.encode(res.asInstanceOf[ArrayData],
      base.asInstanceOf[ArrayData], flat, m, k, sublen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (res, base) => s"""
      ${ev.value} = graft.ext.PqEncodeRes.encode($res, $base, $flatRef, $m, $k, $sublen);
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeRes =
    copy(left = newLeft, right = newRight)
}

object PqEncodeRes {
  def encode(res: ArrayData, base: ArrayData, flat: Array[Double],
      m: Int, k: Int, sublen: Int): InternalRow = {
    val codes = new Array[Int](m)
    var n2 = 0.0
    var i = 0
    while (i < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        while (j < sublen) {
          val diff = res.getDouble(i * sublen + j) -
            flat((i * k + c) * sublen + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(i) = best
      var j = 0
      while (j < sublen) {
        val r = base.getDouble(i * sublen + j) +
          flat((i * k + best) * sublen + j)
        n2 += r * r
        j += 1
      }
      i += 1
    }
    InternalRow(new GenericArrayData(codes), math.sqrt(n2))
  }
}

/** `pq_adc(codes, lut, k)` → double: asymmetric distance computation —
  * the candidate's dot product against a probe as m lookup-table reads
  * summed in subspace order (identical fold to the HOF
  * `aggregate(transform(codes, element_at(lut, …)))` form).
  */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(c: Any, l: Any): Any =
    PqAdc.adc(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => s"""
      ${ev.value} = graft.ext.PqAdc.adc($c, $l, $k);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def adc(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      s += lut.getDouble(i * k + codes.getInt(i))
      i += 1
    }
    s
  }
}

/** `bucket_rank(x, bounds)` → int: the number of (sorted, possibly
  * repeating) boundary values strictly below `x` — each stats column's
  * quantile rank for the z-order interleave, as one binary search
  * instead of the HOF form's 255 interpreted comparisons per row. NULL
  * ranks 0 (nulls sort first, as in the range layout).
  */
case class BucketRank(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bucket_rank"

  override protected def nullSafeEval(v: Any): Any =
    BucketRank.rank(v.asInstanceOf[Double], bounds)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("zBounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.ext.BucketRank.rank($v, $b);
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BucketRank = copy(child = newChild)
}

object BucketRank {
  /** First index whose boundary is ≥ x (= count of boundaries < x),
    * binary search over the sorted, possibly-repeating boundary array —
    * identical to the linear strictly-greater count.
    */
  def rank(x: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }
}
