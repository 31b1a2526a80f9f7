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
  * Contract: `cuts` must be sorted ascending (ties allowed) and
  * null/NaN-free. Internal callers pass a `typedLit` of a driver-sorted
  * `Array[Double]`, but `cuts_bucket` is also registered as a
  * session-wide SQL function (GraftExtensions), so the contract is
  * ENFORCED, not assumed (ADVICE r11): the kernel validates the cut
  * array and throws a named error on an unsorted, null-bearing or
  * NaN-bearing one — a binary search over such an array would silently
  * return wrong buckets. Validation is O(cuts) but runs ONCE per
  * distinct array instance (cached on reference + length + endpoint
  * fingerprint; see the companion's cache note for the best-effort
  * contract on reused mutable containers): for the literal-cuts hot
  * path that is one scan per task, not per row. NaN *values* land in
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
  // Cache of the last cut array that passed validation, keyed on
  // (reference, length, first, last). The common caller binds cuts as a
  // literal, so the SAME ArrayData instance arrives for every row of a
  // task — one reference compare plus two element reads skips the
  // O(cuts) scan. The length/first/last fingerprint additionally catches
  // the reused-container hazard (ADVICE r12): a mutable ArrayData buffer
  // re-filled with DIFFERENT contents between rows no longer slips past
  // the reference check undetected unless the new contents agree on all
  // three probes — the guard is therefore BEST-EFFORT for non-literal
  // cuts: an interior mutation that preserves length and both endpoints
  // evades it, and if that mutation also breaks SORTEDNESS the binary
  // search returns silently wrong buckets (the search reads actual
  // content, so content the validator never saw is only correct when
  // still sorted — an evading mutation forfeits BOTH the loud failure
  // and, if unsorted, correctness). Literal cuts — every in-repo caller —
  // are immutable and fully covered. Benign race under concurrent
  // tasks: the fields update
  // non-atomically, but a mixed write can only cause a redundant
  // revalidation or mark as-validated an instance some thread DID
  // validate — never skip a never-validated instance (lastOk is only
  // ever set to an instance the storing thread just validated).
  @volatile private var lastOk: ArrayData = _
  @volatile private var lastOkLen: Int = -1
  @volatile private var lastOkFirst: Double = 0.0
  @volatile private var lastOkLast: Double = 0.0

  private def validate(cuts: ArrayData): Unit = {
    var prev = Double.NegativeInfinity
    var i = 0
    val n = cuts.numElements()
    while (i < n) {
      if (cuts.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"cuts_bucket: cut array has a NULL at index $i — cuts must be " +
            "null-free (a binary search over undefined slots would return " +
            "silently wrong buckets)")
      }
      val x = cuts.getDouble(i)
      if (java.lang.Double.isNaN(x) || x < prev) {
        throw new IllegalArgumentException(
          s"cuts_bucket: cut array is not ascending-sorted and NaN-free " +
            s"at index $i — sort (and de-NaN) the cuts; an unsorted array " +
            "would return silently wrong buckets")
      }
      prev = x
      i += 1
    }
  }

  /** Upper-bound binary search: first index with cuts(i) > v, which IS
    * the count of cuts ≤ v. No boxing — reads doubles straight off the
    * (Unsafe)ArrayData. Throws on an invalid cut array (see class doc);
    * validation is cached (reference + length + endpoints) so the
    * literal-cuts hot path pays one reference compare and two element
    * reads per row.
    */
  def bucket(v: Double, cuts: ArrayData): Int = {
    val len = cuts.numElements()
    val fresh = (cuts ne lastOk) || len != lastOkLen ||
      (len > 0 && (cuts.isNullAt(0) || cuts.isNullAt(len - 1) ||
        cuts.getDouble(0) != lastOkFirst ||
        cuts.getDouble(len - 1) != lastOkLast))
    if (fresh) {
      validate(cuts)
      if (len > 0) {
        lastOkFirst = cuts.getDouble(0)
        lastOkLast = cuts.getDouble(len - 1)
      }
      lastOkLen = len
      lastOk = cuts
    }
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
