package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** SimHash-style bucket id of an embedding against `bits` deterministic
  * pseudo-random hyperplanes, as ONE native pass — replacing the per-plane
  * interpreted `aggregate(zip_with(...))` fold in Vector.simhashBucket
  * (`bits` separate O(dim) expression-tree walks per row; VERDICT r3 #5).
  *
  * Value parity is EXACT with the HOF formulation it replaces
  * ([[graft.ops.Vector.hofSimhashBucket]], pinned in VectorSpec), because
  * the plane coordinates come from the same Catalyst hash chain
  * (`xxhash64(lit(p), i)` = `hash(i, Int, hash(p, Int, 42))` → pmod into
  * [-1e6, 1e6] / 1e6) and each projection accumulates left-to-right in
  * the same IEEE order. The HOF edge semantics are reproduced:
  *
  *   - vec shorter than `dim` (incl. empty): zip_with pads the value side
  *     with nulls → every projection is null → every `when(proj >= 0)`
  *     falls to otherwise → bucket 0; same for a null element;
  *   - vec longer than `dim`: the index side pads with nulls, and
  *     `xxhash64(p, null)` skips the null child, so tail terms multiply a
  *     per-plane constant coordinate `hash(p, 42)`-derived.
  *
  * The (dim, bits) coordinate table is plan-time constant and memoized
  * JVM-wide (same pattern as MinHashBands.seedsFor).
  */
case class SimHashBucket(child: Expression, dim: Int, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bucket"

  override protected def nullSafeEval(vec: Any): Any =
    SimHashBucket.bucket(vec.asInstanceOf[ArrayData], dim, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ext.SimHashBucket.bucket($c, $dim, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBucket =
    copy(child = newChild)
}

object SimHashBucket {
  /** coefs(p*dim + i) = plane p coordinate i; tail(p) = the constant
    * coordinate for indices beyond dim (null index, hash chain = seed hash
    * of p alone).
    */
  private final case class Planes(coefs: Array[Double], tail: Array[Double])

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Planes]()

  private def coord(h: Long): Double = {
    val m = ((h % 2000001L) + 2000001L) % 2000001L
    (m - 1000000L).toDouble / 1000000.0
  }

  private def planesFor(dim: Int, bits: Int): Planes =
    planeCache.computeIfAbsent((dim, bits), { case (d, b) =>
      val coefs = new Array[Double](b * d)
      val tail = new Array[Double](b)
      var p = 0
      while (p < b) {
        val hp = XxHash64Function.hash(p, IntegerType, 42L)
        tail(p) = coord(hp)
        var i = 0
        while (i < d) {
          coefs(p * d + i) = coord(XxHash64Function.hash(i, IntegerType, hp))
          i += 1
        }
        p += 1
      }
      Planes(coefs, tail)
    })

  /** One pass over the vector, `bits` running projections. */
  def bucket(vec: ArrayData, dim: Int, bits: Int): Long = {
    val n = vec.numElements()
    if (n < dim) return 0L // null-padded value side nulls every projection
    val planes = planesFor(dim, bits)
    val proj = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return 0L // null term nulls every projection
      val x = vec.getDouble(i)
      var p = 0
      if (i < dim) {
        while (p < bits) { proj(p) += x * planes.coefs(p * dim + i); p += 1 }
      } else {
        while (p < bits) { proj(p) += x * planes.tail(p); p += 1 }
      }
      i += 1
    }
    var out = 0L
    var p = 0
    while (p < bits) {
      if (proj(p) >= 0) out |= (1L << p)
      p += 1
    }
    out
  }
}
