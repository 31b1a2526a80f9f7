package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** x14_heavy_hitters — bounded-memory frequent-items sketch as a typed
  * `Aggregator` (SURVEY.md §2.3): Misra–Gries with the MERGEABLE-summaries
  * combine (Agarwal et al., "Mergeable Summaries", PODS 2012), the third
  * member of the sketch family next to x05's HLL++ distinct and x09's
  * KLL-style percentile.
  *
  * Why a sketch at all: q22's exact per-type counts hold state O(|types|)
  * per mapper — fine while the TYPE space fits a hash aggregate, the
  * wrong shape when it is corpus-scale (open-vocabulary n-grams at
  * 100 TB). Misra–Gries holds exactly `k` counters per partial buffer
  * REGARDLESS of input size, merges associatively (pointwise sum, then
  * subtract the (k+1)-th largest count and drop non-positives), and so
  * runs as a normal map-side-combined Spark aggregate whose shuffle
  * carries k rows per mapper — the same O(groups·k) shape as x05.
  *
  * Guarantee (the testable contract, pinned in HeavyHittersSpec): after
  * any partitioning and merge order, every item with true frequency
  * > N/(k+1) is present, and each reported count c satisfies
  * true − N/(k+1) ≤ c ≤ true. The candidate SET beyond that guarantee is
  * deliberately not deterministic across partitionings — which is why
  * x14 is declared rows-only, like every sketch (SURVEY §2.3 risk
  * notes), while [[graft.ops.Text.ngramTopK]] remains the exact-verify
  * path when a deterministic top-k is the requirement.
  */
object HeavyHitters {

  case class Buf(counters: Map[String, Long])

  /** Misra–Gries summary of at most `k` counters. */
  def mgAgg(k: Int): Aggregator[String, Buf, Map[String, Long]] = {
    require(k >= 1, "heavy-hitters sketch needs k >= 1")
    new Aggregator[String, Buf, Map[String, Long]] {
      def zero: Buf = Buf(Map.empty)
      def reduce(b: Buf, key: String): Buf = {
        if (key == null) return b
        val m = b.counters
        if (m.contains(key)) Buf(m.updated(key, m(key) + 1L))
        else if (m.size < k) Buf(m.updated(key, 1L))
        else // classic MG step: a miss on a full summary decrements all
          Buf(m.iterator.map { case (g, c) => (g, c - 1L) }
            .filter(_._2 > 0L).toMap)
      }
      def merge(b1: Buf, b2: Buf): Buf = {
        val sum = (b1.counters.keySet ++ b2.counters.keySet).iterator
          .map(g => g -> (b1.counters.getOrElse(g, 0L) +
            b2.counters.getOrElse(g, 0L)))
          .toMap
        if (sum.size <= k) Buf(sum)
        else {
          // subtract the (k+1)-th largest count, drop non-positives —
          // the mergeable-summaries combine; ≤ k survivors by construction
          val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
          Buf(sum.iterator.map { case (g, c) => (g, c - cut) }
            .filter(_._2 > 0L).toMap)
        }
      }
      def finish(b: Buf): Map[String, Long] = b.counters
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }

  /** Column form: topk_freq(col, k) → map<string, long> of MG candidates
    * with lower-bound counts.
    */
  def topk_freq(c: Column, k: Int): Column =
    udaf(mgAgg(k), Encoders.STRING).apply(c)

  /** Declared query (rows-only, sketch family): the k = 32 Misra–Gries
    * summary over the corpus's word-trigram stream, exploded to
    * (gram, count_lb) rows. The guarantee — not the exact set — is the
    * contract; HeavyHittersSpec pins it against exact counts under
    * adversarial repartitioning.
    */
  def x14(spark: SparkSession, dir: String): DataFrame = {
    graft.ext.GraftFunctions.ensureWordNgrams(spark)
    Tables.documents(spark, dir)
      .select(explode(graft.ops.Text.nativeNgrams(col("text"), 3)).as("g"))
      .agg(topk_freq(col("g"), 32).as("hh"))
      .select(explode(col("hh")).as(Seq("gram", "count_lb")))
      .orderBy(desc("count_lb"), asc("gram"))
  }

  /** x14b_heavy_hitters_gate: the Misra–Gries SKETCH code path under the
    * driver's DuckDB hash gate (VERDICT r11 #2a). MG with k ≥ |type
    * space| is EXACT: `reduce` never hits the full-summary decrement
    * (the map holds every key it has seen) and `merge`'s pointwise sum
    * never exceeds k entries, so the (k+1)-th-largest subtraction never
    * fires — the summary IS the exact count map, under ANY partitioning.
    * The fixture vocabulary is a closed 31-word set, so its word-BIGRAM
    * space is ≤ 961 at every SF; k = 1024 clears it with headroom, and
    * the oracle is the plain exact bigram count — the same degenerate-
    * regime pinning q71 used for IVF (probe all cells ⇒ exact). x14
    * stays the declared sketch form whose k < space guarantee
    * HeavyHittersSpec pins adversarially.
    */
  def x14b(spark: SparkSession, dir: String): DataFrame = {
    graft.ext.GraftFunctions.ensureWordNgrams(spark)
    Tables.documents(spark, dir)
      .select(explode(graft.ops.Text.nativeNgrams(lower(col("text")), 2)).as("g"))
      .agg(topk_freq(col("g"), 1024).as("hh"))
      .select(explode(col("hh")).as(Seq("gram", "cnt")))
      .orderBy(desc("cnt"), asc("gram"))
  }

  /** Exact bigram counts — x14b's oracle: with k ≥ |bigram space| the MG
    * summary degenerates to exactly this query.
    */
  val x14bSql: String =
    """SELECT gram, CAST(count(*) AS BIGINT) AS cnt
      |FROM (
      |  SELECT w[i] || ' ' || w[i+1] AS gram
      |  FROM (SELECT string_split(lower(text), ' ') AS w FROM documents),
      |       unnest(range(1, len(w))) AS u(i))
      |GROUP BY gram
      |ORDER BY cnt DESC, gram ASC""".stripMargin
}
