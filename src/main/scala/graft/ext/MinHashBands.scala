package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Banded MinHash signatures from a shingle array — the signature stage of
  * the minhash near-dup detector as ONE native pass instead of `numHashes`
  * interpreted `array_min(transform(...))` columns plus per-band xxhash64
  * folds (CodegenFallback: an expression-tree walk per shingle PER hash).
  *
  * Hash parity is EXACT with the higher-order formulation it replaces
  * (pinned per band in ExtSpec), because it calls the same
  * `XxHash64Function` Catalyst uses for the `xxhash64` expression with the
  * same chaining:
  *   minhash i of doc  = min over shingles s of
  *                       hash(s, String, hash(i, Int, 42))
  *   band b signature  = fold hash(m_{b·rows+r}, Long, ·) over
  *                       r = 0..rows-1 starting from hash(b, Int, 42)
  * Null shingle elements hash as the seed alone (xxhash64 skips null
  * children) and an empty array leaves each band at its seed hash — both
  * identical to the HOF form, so candidates cannot shift.
  *
  * Returns `array<long>` of `bands` signatures; `posexplode` gives the
  * (band, sig) bucket keys.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must divide into bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(sh: Any): Any =
    MinHashBands.bandsOf(sh.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ext.MinHashBands.bandsOf($c, $numHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  // numHashes is a plan-time literal, so the per-hash seed array is pure
  // constant work — memoize it per distinct numHashes instead of recomputing
  // numHashes XxHash64 calls on every row (ADVICE r3). ConcurrentHashMap:
  // executor threads share the JVM-wide cache; the map stays tiny (one entry
  // per distinct numHashes literal ever planned).
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def seedsFor(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, { nh =>
      val a = new Array[Long](nh)
      var j = 0
      while (j < nh) {
        a(j) = XxHash64Function.hash(j, IntegerType, 42L)
        j += 1
      }
      a
    })

  def bandsOf(sh: ArrayData, numHashes: Int, nBands: Int): ArrayData = {
    val rows = numHashes / nBands
    val seeds = seedsFor(numHashes)
    var j = 0
    val n = sh.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // a null element contributes the seed itself — exactly what
      // xxhash64(lit(j), null) evaluates to (null children are skipped)
      val s = if (sh.isNullAt(i)) null else sh.getUTF8String(i)
      j = 0
      while (j < numHashes) {
        val h = if (s == null) seeds(j)
                else XxHash64Function.hash(s, StringType, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = XxHash64Function.hash(b, IntegerType, 42L)
      if (n > 0) { // empty input: every min is "null", the fold is a no-op
        var r = 0
        while (r < rows) {
          h = XxHash64Function.hash(mins(b * rows + r), LongType, h)
          r += 1
        }
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}
