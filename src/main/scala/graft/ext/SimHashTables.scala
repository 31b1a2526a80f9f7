package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The 64 two-level pigeonhole bucket keys of a 64-bit SimHash signature,
  * as ONE native pass — the candidate-generation kernel of
  * [[graft.ops.Text.simhashPairsWide]] (x07). The pure-Column formulation
  * it replaces builds a 64-element `array(...)` whose every entry splices
  * the signature with 5–6 shift/mask ops: correct, but the generated Java
  * for that single Generate input ran to hundreds of KB — the dominant
  * COLD cost of x07 after the shuffle-hash fix (Janino compile, plus a
  * plan tree 64 expressions wide that every transformAllExpressions walk
  * re-traverses). Here the explode input is one call; the loop lives in
  * JVM code Janino never sees.
  *
  * Key layout per table (j,k), j,k in 0..7 (packed little-endian into one
  * long, 6+8+7 bits):  [ j*8+k | byte j of sig | 7-bit sub-chunk k of the
  * 56 bits with byte j spliced out ]. Pigeonhole twice: Hamming ≤ 7
  * touches ≤ 7 bytes so some byte j is equal, and the ≤ 7 differing bits
  * then all lie in the spliced remainder, touching ≤ 7 of its 8 sub-chunks
  * so some sub-chunk k is equal — every qualifying pair shares ≥ 1 of the
  * 64 keys. Value parity with the Column formulation is pinned in ExtSpec
  * ([[graft.ops.Text.hofWideKeys]]).
  */
case class SimHashTables(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_tables"

  override protected def nullSafeEval(sig: Any): Any =
    SimHashTables.tables(sig.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.SimHashTables.tables($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashTables =
    copy(child = newChild)
}

object SimHashTables {
  /** All 64 (j,k) keys of one signature. */
  def tables(sig: Long): ArrayData = {
    val out = new Array[Long](64)
    var j = 0
    while (j < 8) {
      val c = (sig >>> (j * 8)) & 0xFFL
      // 56-bit remainder with byte j spliced out; shifts by 0/64 would wrap
      // in Java, so the edge bytes take the degenerate halves explicitly
      val low = if (j == 0) 0L else sig & ((1L << (8 * j)) - 1)
      val high = if (j == 7) 0L else (sig >>> (8 * (j + 1))) << (8 * j)
      val rem = low | high
      val base = (j * 8).toLong << 15 | (c << 7)
      var k = 0
      while (k < 8) {
        out(j * 8 + k) = (base + (k.toLong << 15)) | ((rem >>> (k * 7)) & 0x7FL)
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
