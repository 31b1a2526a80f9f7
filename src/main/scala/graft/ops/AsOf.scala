package graft.ops

import graft.{Dims, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — the canonical time-series operator Spark
  * has no built-in for (SURVEY.md §2.3 q33; the "custom operator" ladder's
  * compose-existing-ops tier). Two implementations by version-table size:
  *
  *  - [[asOfJoinBroadcast]] (small version dims — rate histories, config
  *    versions): broadcast theta join + latest-per-probe-row `max_by`.
  *    No skew regardless of key cardinality: the one shuffle groups by a
  *    per-row id, which is uniform by construction.
  *  - [[asOfJoin]] (large version tables): union+window — version and
  *    probe rows union into one stream per key, sorted (time,
  *    version-first), `last(value, ignoreNulls)` over the running frame.
  *    Linear, no per-probe rescans, BUT partitioned by the raw key: with
  *    few distinct keys each reducer sorts that key's whole history, so
  *    at that scale extend the partition key with a time bucket and
  *    carry each bucket's last version into the next (the standard
  *    carry-in refinement) — or, if versions fit in memory, just use the
  *    broadcast form.
  */
object AsOf {

  private def checkCols(probes: DataFrame, valueCols: Seq[String]): Unit = {
    val clash = probes.columns.toSet
      .intersect(valueCols.toSet ++
        Set("_is_probe", "_pid", "_b", "_r0", "_last", "_carry"))
    require(clash.isEmpty,
      s"probe columns collide with value/internal columns: $clash")
  }

  /** As-of against a BROADCAST version table: for each probe row, the
    * latest `valueCols` with `versions.tsCol <= probes.tsCol` (inclusive).
    * Probes with no prior version get nulls (left semantics).
    */
  def asOfJoinBroadcast(
      probes: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    checkCols(probes, valueCols)
    val pCols = probes.columns.toSeq
    val p = probes.withColumn("_pid", monotonically_increasing_id())
    val v = versions.select(
      col(keyCol).as("_vk") +: col(tsCol).as("_vts") +: valueCols.map(col): _*)
    val aggs = pCols.map(c => first(col(c)).as(c)) ++
      valueCols.map(c => max_by(col(c), col("_vts")).as(c))
    p.join(broadcast(v),
        p(keyCol) === col("_vk") && col("_vts") <= p(tsCol), "left")
      .groupBy(col("_pid"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("_pid")
  }

  /** Generic as-of for non-broadcastable version tables: for each row of
    * `probes`, the latest `valueCols` from `versions` with
    * `versions.tsCol <= probes.tsCol` (inclusive), matched on `keyCol`.
    * Probes with no prior version get nulls (left semantics). See the
    * object doc for the key-cardinality caveat.
    */
  def asOfJoin(
      probes: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    checkCols(probes, valueCols)
    val pCols = probes.columns.toSeq
    // carry struct(v) rather than the bare value: a version row whose value
    // is legitimately NULL must still WIN the as-of race (matching
    // asOfJoinBroadcast's max_by, which returns that NULL) — last(value,
    // ignoreNulls) would skip it and resurrect an older version's value.
    // The struct is non-null exactly on version rows, so ignoreNulls skips
    // only probe rows.
    def boxed(c: String) = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", versions.schema(c).dataType)))
    val vNull = valueCols.map(c => lit(null).cast(boxed(c)).as(c))
    val p = probes
      .select(col(keyCol) +: col(tsCol) +: lit(1).as("_is_probe") +:
        (pCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++ vNull): _*)
    val v = versions
      .select(col(keyCol) +: col(tsCol) +: lit(0).as("_is_probe") +:
        (pCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
          valueCols.map(c => struct(col(c).as("v")).as(c))): _*)
    // versions sort before probes at the same instant => ties are inclusive
    val w = Window.partitionBy(col(keyCol))
      .orderBy(asc(tsCol), asc("_is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(p.unionByName(v)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_is_probe") === 1).drop("_is_probe")
      .select(pCols.map(col) ++ valueCols.map(c => col(c).getField("v").as(c)): _*)
  }

  /** The carry-in refinement the [[asOfJoin]] doc prescribes, implemented
    * (round 6 — the same documentation→code promotion as q41b and the x08
    * handoff): partition by (key, TIME BUCKET) instead of the raw key, so
    * a 10-key corpus no longer serializes each key's entire history
    * through one reducer. The cross-bucket dependency — a probe whose
    * prevailing version lives in an EARLIER bucket — is restored by
    * CARRY-IN rows: per (key, bucket) the last version is summarized
    * (one aggregate row each), a per-key window over those SUMMARIES
    * (O(occupied buckets) rows per key, not O(history)) computes what was
    * in force entering each occupied bucket — probe-only buckets
    * included — and that carry-in enters the bucket's sort ranked before
    * every real row. Within (key, bucket) the machinery is [[asOfJoin]]'s
    * union+window with the same boxed-struct null-winning semantics.
    *
    * `bucket` maps the ts column to a bucket id (e.g. months since epoch);
    * width trades the two costs exactly as in RangeJoin.rangeJoinDates:
    * finer buckets = more parallelism, more carry-in rows.
    */
  def asOfJoinBucketed(
      probes: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    checkCols(probes, valueCols)
    val pCols = probes.columns.toSeq
    val otherCols = pCols.filterNot(c => c == keyCol || c == tsCol)
    def boxed(c: String) = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", versions.schema(c).dataType)))
    val tsType = probes.schema(tsCol).dataType

    val pB = probes.withColumn("_b", bucket(col(tsCol)))
    val vB = versions.withColumn("_b", bucket(col(tsCol)))

    // one summary row per (key, occupied version bucket): the bucket's
    // last version, all values taken from the SAME winning row
    val lastPerBucket = vB.groupBy(col(keyCol), col("_b"))
      .agg(max_by(
        struct(valueCols.map(c => struct(col(c).as("v")).as(c)): _*),
        col(tsCol)).as("_last"))

    // what is in force ENTERING each occupied bucket (probe-only buckets
    // included): a per-key window over bucket summaries — rows per key =
    // occupied buckets, never history length
    val occupied = pB.select(col(keyCol), col("_b"))
      .union(vB.select(col(keyCol), col("_b"))).distinct()
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(asc("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = occupied
      .join(lastPerBucket, Seq(keyCol, "_b"), "left")
      .withColumn("_carry", last(col("_last"), ignoreNulls = true).over(wCarry))
      .filter(col("_carry").isNotNull)
      .select(col(keyCol) +: lit(null).cast(tsType).as(tsCol) +:
        col("_b") +: lit(0).as("_r0") +: lit(0).as("_is_probe") +:
        (otherCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
          valueCols.map(c => col("_carry").getField(c).as(c))): _*)

    val p = pB.select(col(keyCol) +: col(tsCol) +: col("_b") +:
      lit(1).as("_r0") +: lit(1).as("_is_probe") +:
      (otherCols.map(col) ++
        valueCols.map(c => lit(null).cast(boxed(c)).as(c))): _*)
    val v = vB.select(col(keyCol) +: col(tsCol) +: col("_b") +:
      lit(1).as("_r0") +: lit(0).as("_is_probe") +:
      (otherCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        valueCols.map(c => struct(col(c).as("v")).as(c))): _*)

    // carry-in first (_r0=0), then (ts, version-before-probe) as in asOfJoin
    val w = Window.partitionBy(col(keyCol), col("_b"))
      .orderBy(asc("_r0"), asc(tsCol), asc("_is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(p.unionByName(v).unionByName(carryIn)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_is_probe") === 1).drop("_is_probe", "_r0", "_b")
      .select(pCols.map(col) ++ valueCols.map(c => col(c).getField("v").as(c)): _*)
  }

  /** q33_asof_join: each order picks the exchange rate prevailing at its
    * order date from the dated rate history (Dims.ratesHistory); unknown
    * currencies fall back to 1.0 (the reference's missing-rate default).
    * Oracle: DuckDB's native ASOF LEFT JOIN over the identical literals.
    */
  def q33(spark: SparkSession, dir: String): DataFrame =
    // the rate history is a 40-row dim: the broadcast form's uniform
    // per-row grouping beats union+window's 10-currency partitioning
    q33Finish(asOfJoinBroadcast(q33Probes(spark, dir), Dims.ratesHistoryDf(spark),
      keyCol = "currency", tsCol = "valid_from", valueCols = Seq("rate")))

  /** q33b_asof_window: the SAME query through the generic union+window
    * form ([[asOfJoin]], the non-broadcastable-versions path) — both
    * variants are oracle-checked against the identical DuckDB ASOF JOIN,
    * so their documented equivalence is driver-verified at every SF, not
    * only on the AsOfSpec fixtures.
    */
  def q33b(spark: SparkSession, dir: String): DataFrame =
    q33Finish(asOfJoin(q33Probes(spark, dir), Dims.ratesHistoryDf(spark),
      keyCol = "currency", tsCol = "valid_from", valueCols = Seq("rate")))

  /** q33c_asof_bucketed: the SAME query through the carry-in time-bucketed
    * form ([[asOfJoinBucketed]], month buckets) — the plan for a
    * non-broadcastable version table over FEW keys, where q33b's raw-key
    * window would serialize each currency's whole history through one
    * reducer. Shares q33's DuckDB ASOF oracle, so the three-way
    * equivalence is driver-verified at every SF.
    */
  def q33c(spark: SparkSession, dir: String): DataFrame =
    q33Finish(asOfJoinBucketed(q33Probes(spark, dir),
      Dims.ratesHistoryDf(spark),
      keyCol = "currency", tsCol = "valid_from", valueCols = Seq("rate"),
      bucket = c => year(c) * 12 + month(c)))

  private def q33Probes(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val nation   = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(nation, customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(Dims.nationCurrencyDf(spark)),
        nation("n_name") === col("n_name_key"))
      .select(col("o_orderkey"), col("currency"),
        col("o_orderdate").as("valid_from"))
  }

  private def q33Finish(joined: DataFrame): DataFrame =
    joined.select(
        col("o_orderkey"),
        col("currency"),
        col("valid_from").as("order_date"),
        coalesce(col("rate"), lit("1.000000").cast("decimal(10,6)"))
          .cast("double").as("used_rate"))
      .orderBy("o_orderkey")

  val q33Sql: String =
    s"""SELECT o.o_orderkey, nc.currency, o.o_orderdate AS order_date,
       |       CAST(COALESCE(h.rate, CAST(1.000000 AS DECIMAL(10,6))) AS DOUBLE) AS used_rate
       |FROM orders o
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN ${Dims.nationCurrencySql()} ON n.n_name = nc.n_name_key
       |ASOF LEFT JOIN ${Dims.ratesHistorySql()}
       |  ON nc.currency = h.currency AND o.o_orderdate >= h.valid_from
       |ORDER BY o_orderkey""".stripMargin
}
