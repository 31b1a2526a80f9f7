package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over the `embeddings` table (SURVEY.md §2.3 x01;
  * north-star similarity search).
  *
  * All kernels are higher-order column functions (`zip_with`, `aggregate`,
  * `transform`) — no UDF, no driver-side math. Per-row folds evaluate
  * left-to-right, so a given row's cosine is bit-deterministic; doubles stay
  * out of declared oracle queries per SURVEY §2.2 D2 (x01 is rows-only).
  *
  * Scale notes (100 TB):
  *  - brute-force top-k against a BROADCAST probe set is the right baseline:
  *    one linear scan, no shuffle until the per-probe top-k (which
  *    TakeOrdered-style reduces map-side via the row_number window on a
  *    probe-partitioned shuffle of only (probe, id, score) triples).
  *  - never materialize the corpus×corpus cross join; probes must be the
  *    small side. For probe sets too big to broadcast, use the SimHash
  *    bucket join (`simhashBucket`) to prune candidates first.
  */
object Vector {

  /** Σ aᵢ·bᵢ as double — elementwise product then left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ as double. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a, b) given precomputed norms (avoid recomputing the corpus norm
    * once per probe). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** SimHash-style bucket id: sign bits of the vector against `bits`
    * deterministic pseudo-random hyperplanes (coordinates derived from
    * xxhash64 — reproducible across runs, no rand()). Near-identical
    * vectors land in the same bucket with high probability; use as a
    * pre-join prune when probes don't fit in a broadcast.
    */
  def simhashBucket(vec: Column, dim: Int, bits: Int = 8): Column = {
    val planes = (0 until bits).map { p =>
      // hyperplane p coordinate i in [-1, 1): hash → uniform via modulus
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") *
            ((pmod(xxhash64(lit(p), i), lit(2000001L)) - 1000000L)
              .cast("double") / 1000000.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce((a, b) => a + b)
  }

  /** Brute-force cosine top-k: for each probe row, the k nearest corpus
    * rows by cosine. Probes are broadcast; the corpus is scanned once.
    */
  def cosineTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10): DataFrame = {
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", l2Norm(col("c_vec")))
    val p = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"))
      .withColumn("p_norm", l2Norm(col("p_vec")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(desc("cosine"), asc("neighbor_id"))
    c.crossJoin(broadcast(p))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cosine",
        cosine(col("c_vec"), col("p_vec"), col("c_norm"), col("p_norm")))
      .select(col("probe_id"), col("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** x01_vector_cosine: top-10 cosine neighbors for a fixed probe set
    * (vec_id < 8). Non-declared (double-valued scores have no stable SQL
    * oracle); rows-only check + unit tests.
    */
  def x01(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    cosineTopK(emb, emb.filter(col("vec_id") < 8))
      .orderBy("probe_id", "rank")
  }
}
