package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of lowercased text as ONE native pass — the
  * tokenization kernel behind every shingle consumer (x02 minhash, x07
  * simhash, x10 jaccard join, q35 repetition filter), replacing the
  * interpreted `split` → `sequence` → `transform` → n×`element_at` →
  * `concat_ws` higher-order chain (CodegenFallback: a lambda dispatch and
  * an expression-tree walk per produced shingle; measured ~0.6-0.9 s per
  * corpus pass at sf0.1, the single largest cost of x10).
  *
  * Semantics are EXACTLY the higher-order formulation it replaces
  * ([[graft.ops.Text.shingles]]/[[graft.ops.Text.ngrams]], pinned in PropertiesSpec on random
  * unicode):
  *   - words = `split(lower(text), " ")` with Spark's split semantics
  *     (single-space regex, trailing empty strings KEPT);
  *   - n-grams joined with a single space, multiplicity preserved;
  *   - `distinct = true` reproduces `array_distinct` (first-occurrence
  *     order, binary equality);
  *   - fewer than n words ⇒ empty array.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "word_ngrams requires n >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(s: Any): Any =
    WordNgrams.ngrams(s.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.WordNgrams.ngrams($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private final val Space = UTF8String.fromString(" ")

  /** One pass: lowercase, split, slide an n-word window, optional
    * first-occurrence dedup. */
  def ngrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    // same split call StringSplit makes: regex " " with limit -1
    val words = s.toLowerCase.split(Space, -1)
    val cnt = words.length - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](cnt)
    val seen = if (distinct) new java.util.HashSet[UTF8String](cnt * 2) else null
    var i = 0
    while (i < cnt) {
      val gram =
        if (n == 1) words(i)
        else {
          val parts = new Array[UTF8String](2 * n - 1)
          var j = 0
          while (j < n) {
            parts(2 * j) = words(i + j)
            if (j < n - 1) parts(2 * j + 1) = Space
            j += 1
          }
          UTF8String.concat(parts: _*)
        }
      if (seen == null || seen.add(gram)) out.add(gram)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
