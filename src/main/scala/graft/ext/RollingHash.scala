package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string (base 31, mod 1e9+7) as one native
  * codegen'd pass — the fingerprint kernel of q28/q32, replacing the
  * interpreted per-character fold (`regexp_extract_all(text, '.')` →
  * transform → aggregate with pmod per char: an expression-tree walk AND a
  * regex match per character; measured as the dominant cost of both
  * queries, same situation `minhash_bands`/`simhash_sig` fixed for
  * x02/x07 — VERDICT r3 #4).
  *
  * Value parity is EXACT with the higher-order formulation it replaces
  * ([[graft.ops.TextAnalysis.hofRollingHash]], pinned in ExtSpec),
  * including its two Java-regex/`ascii` quirks, so memoized fingerprints
  * and the q32 split assignment can never shift:
  *
  *   - `.` does not match line terminators (\n, \r, U+0085, U+2028,
  *     U+2029), so those code points are SKIPPED by the fold;
  *   - `ascii` contributes the full CODE POINT of the matched character
  *     (probed on Spark 4.1: ascii of U+1F600 is 128512, and `.` matches
  *     the surrogate pair as one character).
  *
  * The rolling hash itself is engine-portable exact Long arithmetic
  * (unlike xxhash64/DuckDB `hash`, whose implementations differ), which is
  * what makes q28/q32 oracle-checkable; DuckDB restates it with
  * `list_reduce` over `unicode(c)` (identical for BMP text, which is what
  * the regex-based form can round-trip anyway).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(s: Any): Any =
    RollingHash.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  private final val Mod = 1000000007L

  /** One pass over the string's code points; empty input hashes to 0L. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var h = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      // Java-regex '.' default: line terminators are not matched
      if (cp != '\n' && cp != '\r' && cp != 0x85 && cp != 0x2028 && cp != 0x2029) {
        h = (h * 31L + cp) % Mod
      }
      i += Character.charCount(cp)
    }
    h
  }
}
