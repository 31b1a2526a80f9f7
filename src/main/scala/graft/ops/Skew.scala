package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY.md §4; the 100 TB power-law reality).
  *
  * AQE rebalances skewed SHUFFLE JOINS at runtime, but a skewed GROUP BY
  * still funnels every row of a hot key through one task's hash-map slot
  * before partial aggregation saves it — and when the aggregate's partial
  * state is large (collect-style aggs, many distinct buffer cols), one
  * reducer still owns the hot key. Salting splits each key into `buckets`
  * sub-keys for a first exact partial pass, then combines the partials in
  * a second, tiny pass. Works for any algebraic aggregate (sum/count/min/
  * max here); exact because decimal/long addition is associative.
  */
object Skew {

  /** Two-phase salted sum/count: exact results, hot keys spread over
    * `buckets` reducers in phase 1; phase 2 aggregates `buckets` rows per
    * key instead of the raw row count.
    *
    * The salt comes from the row's position (`monotonically_increasing_id`
    * mod buckets — sequential within each input partition, so perfectly
    * uniform), NOT from any column's hash: a hot key whose rows all carry
    * one constant value would collapse a value-derived salt into a single
    * bucket, defeating the mitigation exactly when it is needed. Salt
    * values are partitioning-dependent, but the final result is exact
    * regardless — grouping keys are untouched and the aggregates are
    * associative.
    */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      valueCol: Column,
      buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_v", valueCol)
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col("_v")).as("_partial_sum"), count(lit(1)).as("_partial_cnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial_sum")).as("total"),
        sum(col("_partial_cnt")).as("n_rows"))
  }

  /** Salted shuffle JOIN for hot probe keys: the big side gets a
    * row-position salt, the small side replicates `buckets`× (one row per
    * salt value), and the join runs on (key, salt) — a hot key's rows
    * spread over `buckets` reducers instead of funneling through one.
    * Result is EXACTLY the inner equi-join (each big row matches the one
    * replica carrying its salt), at the price of a `buckets`× blow-up of
    * the replicated side — so `small` must be the dimension-ish side, too
    * big to broadcast (else just broadcast) but far smaller than the fact.
    *
    * AQE's skew-join split covers the common case at runtime; this is the
    * DETERMINISTIC form for when the skew is known up front, the plan must
    * not depend on runtime stats (AQE only splits when size thresholds
    * trip, and cannot split a shuffle reused by a same-keyed aggregate
    * above), or the engine runs AQE-off. Measured head-to-head (Stress
    * salted stage, SCALE.md r11): on a 90%-hot-key join at 50M rows,
    * plain 21.0 s, salted 8.6 s, AQE-split 3.2 s — AQE wins when it CAN
    * fire (it splits only the hot partitions, paying no buckets×
    * replication), so at 100 TB the order of preference is AQE first,
    * salting for the cases above and for skewed AGGREGATION (where AQE's
    * join splitter does not apply — that is [[saltedSum]]'s domain).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      buckets: Int = 16): DataFrame = {
    // helper columns must be fresh: withColumn would silently REPLACE a
    // caller column of the same name and drop() would then remove caller
    // data — the exactness contract breaks without an error
    require(!big.columns.contains("_salt_b") && !small.columns.contains("_salt_s"),
      "saltedJoin reserves column names _salt_b/_salt_s")
    val b = big.withColumn("_salt_b",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val s = small.withColumn("_salt_s",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    b.join(s, b(bigKey) === s(smallKey) && b("_salt_b") === s("_salt_s"))
      .drop("_salt_b", "_salt_s")
  }
}
