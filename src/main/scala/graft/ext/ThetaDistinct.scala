package graft.ext

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The THETA distinct-sketch family (Dasgupta et al., "A Framework for
  * Estimating Stream Expression Cardinalities") as native
  * [[TypedImperativeAggregate]]s: the aggregation buffer is the JVM
  * `Union` object itself — updated in place per row, serialized to the
  * compact wire format ONLY at the partial/final shuffle boundary — which
  * is the shape a sketch aggregate needs at scale (a UDAF with an
  * encoder-backed buffer would round-trip the whole sketch through serde
  * on EVERY row).
  *
  * Three registered functions (GraftExtensions):
  *  - `theta_distinct(col, lgK)` → BIGINT estimate — the inline form
  *    (x05's shape);
  *  - `theta_sketch_agg(col, lgK)` → BINARY compact sketch — the
  *    MATERIALIZED form (x18's shape: persist per-partition sketches as
  *    columns, answer range queries later without rescanning facts);
  *  - `theta_union_agg(sketchCol, lgK)` → BINARY — re-aggregates stored
  *    sketches; with the scalar `theta_estimate(bytes)` → BIGINT on top.
  *
  * Next to the HLL++ forms (x05/x18/x19) theta has one property HLL
  * lacks, which the x05b/x18b/x19b gate twins exploit: an EXACT regime.
  * A theta sketch retains raw 64-bit hashes and only begins sampling
  * (lowering θ below 1) once retained entries exceed the nominal
  * k = 2^lgK; while every partial AND their union stay under k, the
  * estimate IS the retained-hash count — the exact number of distinct
  * inputs, modulo 64-bit MurmurHash collisions (probability ~n²/2⁶⁵;
  * deterministic hash + fixed fixture ⇒ the gates are stable, and the
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
  * foldable int in [4, 26] (Datasketches' own bounds). Long and Int
  * children hash as longs; String children hash their UTF-8 bytes —
  * both deterministic. Inputs arrive with those types from the builders
  * (the EurConvert convention: ExpectsInputTypes' tokens are
  * private[sql]); anything else fails with a named error at first eval.
  */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  // lgK's [4, 26] range is validated in the BUILDERS (GraftFunctions.
  // thetaLgK), deliberately not here: executors re-instantiate this tree
  // through Java serialization, whose reflective constructor runs with
  // fields still defaulted — a constructor require would see lgK = 0 and
  // kill every task at deserialization time
  def lgK: Int

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  /** Per-row feed, dispatched ONCE on the child's resolved type. */
  protected lazy val feed: (Union, Any) => Unit = child.dataType match {
    case LongType    => (u, v) => u.update(v.asInstanceOf[Long])
    case IntegerType => (u, v) => u.update(v.asInstanceOf[Int].toLong)
    case StringType  => (u, v) => u.update(v.asInstanceOf[UTF8String].getBytes)
    case dt => throw new IllegalArgumentException(
      s"$prettyName: unsupported input type $dt (long, int or string)")
  }

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) feed(buffer, v)
    buffer
  }
}

/** `theta_distinct(col, lgK)` — inline BIGINT distinct estimate. */
@ExpressionDescription(
  usage = "theta_distinct(col, lgK) - distinct-count theta sketch estimate, exact below 2^lgK retained")
case class ThetaDistinctAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def dataType: DataType = LongType
  override def prettyName: String = "theta_distinct"

  override def eval(buffer: Union): Any =
    Math.round(buffer.getResult.getEstimate)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaDistinctAgg =
    copy(child = newChild)
}

/** `theta_sketch_agg(col, lgK)` — the sketch ITSELF as a BINARY column,
  * for materialization (x18's store-then-merge pattern).
  */
@ExpressionDescription(
  usage = "theta_sketch_agg(col, lgK) - compact theta sketch bytes for the group")
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg(sketchCol, lgK)` — set union over STORED compact
  * sketches (BINARY in, BINARY out): the re-aggregation half of the
  * materialized pattern — a range query touches only the sketch rows,
  * never the fact table.
  */
@ExpressionDescription(
  usage = "theta_union_agg(sketchBytes, lgK) - union of stored theta sketches")
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buffer.union(CompactSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** `theta_estimate(sketchBytes)` — BIGINT estimate off a stored compact
  * sketch. Scalar, codegen'd through the shared static kernel; runs on
  * aggregate OUTPUT rows (O(groups)), never in a per-fact-row hot path.
  */
@ExpressionDescription(
  usage = "theta_estimate(sketchBytes) - rounded estimate of a stored theta sketch")
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"

  override protected def nullSafeEval(bytes: Any): Any =
    ThetaEstimate.estimate(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.ext.ThetaEstimate.estimate($b)")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

object ThetaEstimate {
  /** Row kernel, shared by interpreted eval and generated code. */
  def estimate(bytes: Array[Byte]): Long =
    Math.round(CompactSketch.heapify(Memory.wrap(bytes)).getEstimate)
}

/** `theta_intersect(a, b)` — set INTERSECTION of two stored compact
  * sketches, the capability that separates theta from HLL (an HLL union
  * is lossless but HLL has no principled intersection): audience overlap,
  * retention, segment conjunction — answered from materialized sketches
  * without touching the fact table. Intersection keeps exactly the
  * matching retained hashes under θ = min(θa, θb), so two EXACT sketches
  * intersect EXACTLY (x22's gate argument); in the sampling regime the
  * estimate carries the standard set-operation error bounds.
  */
@ExpressionDescription(
  usage = "theta_intersect(a, b) - compact theta sketch of the set intersection")
case class ThetaIntersect2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaSetOps.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.ThetaSetOps.intersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect2 =
    copy(left = newLeft, right = newRight)
}

/** `theta_union2(a, b)` — pairwise union of two stored compact sketches
  * (the scalar complement of the grouped [[ThetaUnionAgg]]), at the max
  * nominal lgK 26 so the pair union never downsamples two exact inputs
  * below their combined cardinality (the table grows lazily — lgK 26 is
  * a ceiling, not an allocation).
  */
@ExpressionDescription(
  usage = "theta_union2(a, b) - compact theta sketch of the set union")
case class ThetaUnion2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaSetOps.union2(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.ThetaSetOps.union2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnion2 =
    copy(left = newLeft, right = newRight)
}

/** `theta_anotb(a, b)` — set DIFFERENCE a ∖ b of two stored compact
  * sketches, completing the algebra (union [[ThetaUnion2]], intersection
  * [[ThetaIntersect2]], difference): churn and new-arrival counts are
  * differences of adjacent-period sketches. A∖B keeps exactly A's
  * retained hashes absent from B under θ = min(θa, θb), so two exact
  * sketches difference exactly (x22b's gate argument).
  */
@ExpressionDescription(
  usage = "theta_anotb(a, b) - compact theta sketch of the set difference a \\ b")
case class ThetaAnotB(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_anotb"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaSetOps.anotb(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.ThetaSetOps.anotb($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaAnotB =
    copy(left = newLeft, right = newRight)
}

object ThetaSetOps {
  private def heap(bytes: Array[Byte]) =
    CompactSketch.heapify(Memory.wrap(bytes))

  /** Row kernels, shared by interpreted eval and generated code. */
  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildIntersection()
      .intersect(heap(a), heap(b)).toByteArray

  def union2(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().setLogNominalEntries(26).buildUnion()
      .union(heap(a), heap(b)).toByteArray

  def anotb(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(heap(a), heap(b)).toByteArray
}
