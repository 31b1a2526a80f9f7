package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `cuts_bucket(value, cuts)` — the equi-depth bucket key: the number of
  * cut points ≤ `value`, for an ASCENDING-sorted `array<double>` of cut
  * points, as one codegen'd binary search (⌈log₂ cuts⌉ compares/row).
  *
  * Replaces the higher-order `aggregate(cuts, 0, acc + (value >= c))`
  * fold in [[graft.ops.Analytics.suffixCumMax]]'s equiDepth mode:
  * ArrayAggregate evaluates its lambda through the interpreted expression
  * walker (HOFs never enter whole-stage codegen), which put an
  * interpreted 63-element scan in the per-row hot path of every bucketed
  * pass — the same situation `dequant_sym` fixed for q60. Value parity
  * with the fold is pinned in ExtSpec (ties: `>=` against a fixed cut is
  * monotone and tie-stable, so equal inputs land in equal buckets either
  * way).
  *
  * Contract: `cuts` must be sorted ascending and null-free (callers pass
  * a `typedLit` of a driver-sorted `Array[Double]`). NaN values land in
  * the TOP bucket, matching Spark SQL's ordering (NaN > everything, so
  * the fold's `NaN >= c` is true for every cut) rather than Java's
  * all-comparisons-false — pinned in ExtSpec alongside the finite-domain
  * parity.
  */
case class CutsBucket(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "cuts_bucket"

  override protected def nullSafeEval(v: Any, cuts: Any): Any =
    CutsBucket.bucket(v.asInstanceOf[Double], cuts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) => s"graft.ext.CutsBucket.bucket($v, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutsBucket =
    copy(left = newLeft, right = newRight)
}

object CutsBucket {
  /** Upper-bound binary search: first index with cuts(i) > v, which IS
    * the count of cuts ≤ v. No boxing — reads doubles straight off the
    * (Unsafe)ArrayData.
    */
  def bucket(v: Double, cuts: ArrayData): Int = {
    // Spark SQL ordering: NaN is greater than every value, so it takes
    // the top bucket (Java comparisons would answer false throughout and
    // silently send NaN to bucket 0 instead)
    if (java.lang.Double.isNaN(v)) return cuts.numElements()
    var lo = 0
    var hi = cuts.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts.getDouble(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}
