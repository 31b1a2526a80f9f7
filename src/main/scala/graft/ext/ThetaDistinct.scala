package graft.ext

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** `theta_distinct(longCol, lgK)` — per-group distinct count via a
  * Datasketches THETA sketch (Dasgupta et al., "A Framework for Estimating
  * Stream Expression Cardinalities"), as a native
  * [[TypedImperativeAggregate]]: the aggregation buffer is the JVM `Union`
  * object itself — updated in place per row, serialized to the compact
  * wire format ONLY at the partial/final shuffle boundary — which is the
  * shape a sketch aggregate needs at scale (a UDAF with an encoder-backed
  * buffer would round-trip the whole sketch through serde on EVERY row).
  *
  * Next to x05's HLL++ this is the family's second distinct sketch, with
  * one property HLL lacks and the gate twin x05b exploits: an EXACT
  * regime. A theta sketch retains raw 64-bit hashes and only begins
  * sampling (lowering θ below 1) once retained entries exceed the nominal
  * k = 2^lgK; while every partial AND their union stay under k, the
  * estimate IS the retained-hash count — the exact number of distinct
  * inputs, modulo 64-bit MurmurHash collisions (probability ~n²/2⁶⁵;
  * deterministic hash + fixed fixture ⇒ the gate is stable, and the
  * caveat is stated rather than hidden). Above k it degrades gracefully
  * to the declared ~1/√k relative-error sketch, which SketchesSpec pins
  * in the estimation regime.
  *
  * Merge is the set-theoretic union (θ := min, hash sets merged, trimmed
  * to k), associative and commutative — the partial-aggregate contract —
  * so the shuffle carries ONE ≤ 8·k-byte compact sketch per group per
  * mapper: O(groups) network like x05/x09/x14, vs O(distinct values) for
  * exact countDistinct's Expand.
  *
  * Null inputs are skipped (countDistinct semantics); lgK must be a
  * foldable int in [4, 26] (Datasketches' own bounds).
  */
@ExpressionDescription(
  usage = "theta_distinct(col, lgK) - distinct-count theta sketch estimate, exact below 2^lgK retained")
case class ThetaDistinctAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta_distinct lgK out of [4,26]: $lgK")

  // the child arrives as LongType — the builder casts (the EurConvert
  // convention: ExpectsInputTypes' type tokens are private[sql])
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_distinct"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    Math.round(buffer.getResult.getEstimate)

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaDistinctAgg =
    copy(child = newChild)
}
