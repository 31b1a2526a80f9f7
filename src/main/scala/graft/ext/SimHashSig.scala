package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash signature from a shingle-hash array — the hot kernel of
  * the simhash near-dup detector, as a native codegen'd expression instead
  * of 64 interpreted `filter(hs, bit-test)` passes (CodegenFallback: one
  * expression-tree walk per element PER BIT — measured as the dominant
  * cost of x07 at sf0.1). One pass over the array with 64 branchless
  * counters, inlined into WholeStageCodegen.
  *
  * Bit rule is IDENTICAL to the higher-order formulation it replaces
  * (pinned in ExtSpec): bit i is set iff 2·|{h : bit i set}| ≥ |hashes|,
  * i.e. ties vote 1. Empty input yields the all-ones signature — callers
  * MUST pre-filter shingle-less docs (simhashText does), same contract as
  * before.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(hs: Any): Any = {
    val a = hs.asInstanceOf[ArrayData]
    if (!SimHashSig.valid(a)) null else SimHashSig.sig(a)
  }

  // same valid/kernel split as VecDot: a null element (possible through
  // the public SQL registration — any array casts to array<long>) yields
  // NULL identically under interpreted and codegen eval, never an NPE or
  // a storage-format-dependent wrong signature
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if (!graft.ext.SimHashSig.valid($c)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.ext.SimHashSig.sig($c);
      }
    """)

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  /** False iff the array contains a null element — the one undefined-input
    * case. Null-bit probes are bitset lookups, far cheaper than the vote.
    */
  def valid(hs: ArrayData): Boolean = {
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Single-pass 64-counter vote — callers must check [[valid]] first. */
  def sig(hs: ArrayData): Long = {
    val n = hs.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        cnt(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2 * cnt(b) >= n) out |= (1L << b)
      b += 1
    }
    out
  }
}
