package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates (SURVEY.md §2.3 x05).
  *
  * The scale escape hatch for q09/q19's exact `countDistinct`: HLL++ merges
  * per-partition sketches, so the shuffle carries one fixed-size sketch per
  * group per mapper instead of every distinct key — the difference between
  * O(distinct) and O(groups) network at 100 TB.
  */
object Sketches {

  /** x05_approx_distinct: HLL++ distinct counts next to the exact answer
    * (sketch layout differs from DuckDB's, so no SQL oracle; rows-only
    * check + unit test asserting relative error).
    *
    * Default rsd (5%) deliberately: the HLL buffer is `numWords` separate
    * long slots in the aggregation buffer, so rsd=0.01 (p=14, ~1.6k words)
    * next to a distinct-Expand blows the hash-agg row to ~26 KB and ran
    * 50× slower measured at sf0.1 — precision is not free at scale.
    */
  def x05(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .orderBy("l_returnflag")

  /** x05b_approx_distinct_gate: the distinct-sketch shape in an EXACT
    * regime, under the driver's hash gate — via [[graft.ext.ThetaDistinctAgg]]
    * (theta, not HLL: HLL has no exact regime, theta does). With lgK = 23
    * every partial and their union retain < 2²³ hashes at the gate's
    * driver SFs and well past the sf1 derivation (~1.5M distinct
    * orderkeys — lgK 21 would have sat within 1.5× of its nominal
    * there, so the headroom is bought explicitly; theta allocates its
    * table lazily, so the ceiling costs nothing at gate scale),
    * so θ stays 1 and the estimate is exactly the number of distinct
    * inputs (modulo deterministic 64-bit hash collisions — stated in the
    * aggregate's doc, probability ~n²/2⁶⁵). This puts the full
    * TypedImperativeAggregate path — buffer create, per-row update,
    * compact-sketch serialize, shuffle, union merge — under the DuckDB
    * count(DISTINCT) oracle; x05 stays the declared HLL++ sketch whose
    * error SketchesSpec pins. The honest price, stated: exact-regime
    * memory is O(distinct) per group — which is exactly why the declared
    * forms keep bounded-k sketches for the 100 TB shape.
    */
  def x05b(spark: SparkSession, dir: String): DataFrame = {
    graft.ext.GraftFunctions.ensureThetaDistinct(spark)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        call_function("theta_distinct", col("l_orderkey"), lit(23))
          .as("distinct_orders"),
        call_function("theta_distinct", col("l_partkey"), lit(23))
          .as("distinct_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Exact distinct counts — x05b's oracle. */
  val x05bSql: String =
    """SELECT l_returnflag,
      |       count(DISTINCT l_orderkey) AS distinct_orders,
      |       count(DISTINCT l_partkey) AS distinct_parts,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** x09_approx_percentile: quantile SKETCH next to q34/q34b's exact ranks
    * — the third point on the median-at-scale spectrum. q34 sorts whole
    * groups on 3 reducers (correct, serializes at 100×); q34b counts
    * instead of sorting (exact AND parallel, ~4 stages); this one merges
    * fixed-size Greenwald-Khanna sketches, so the shuffle carries one
    * sketch per group per mapper — O(groups), like x05 vs exact distinct —
    * at the price of a bounded rank error (accuracy parameter 10⁴ ⇒ rank
    * error ≤ n/10⁴). Sketch layout differs from DuckDB's t-digest, so no
    * SQL oracle (x05 precedent): rows-only check here, error bound pinned
    * against the exact q34 answers in SketchesSpec.
    */
  def x09(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("approx_median"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000))
          .as("approx_p90"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  /** x09b_approx_percentile_gate: the GK quantile-sketch code path in its
    * EXACT regime, under the driver's hash gate (the x06b/x14b/q71
    * degenerate-regime pattern). With accuracy = Int.MaxValue the
    * summary's compression threshold 2·ε·n stays below 1 for any n <
    * ~10⁹, so no sample is ever dropped through inserts OR merges and
    * the query returns EXACTLY the element at rank ⌈p·n⌉ under any
    * partitioning (pinned empirically across tie/edge cases; Spark's
    * rank rule differs from DuckDB's quantile_disc — ⌈p·n⌉ vs
    * ⌊p·(n−1)⌋+1 — so the oracle selects the rank explicitly instead of
    * calling quantile_disc). The output values are input doubles, hence
    * bit-exact cross-engine. x09 stays the declared sketch form — this
    * twin pins the same aggregate expression tree (buffer, partial
    * merge, query) where the sketch math cannot hide; memory in this
    * regime is O(group) per group, which is exactly why x09's declared
    * form keeps accuracy 10⁴ for the 100 TB shape.
    */
  def x09b(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(Int.MaxValue))
          .as("approx_median"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(Int.MaxValue))
          .as("approx_p90"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  /** Exact rank-⌈p·n⌉ selection — x09b's oracle. */
  val x09bSql: String =
    """WITH ranked AS (
      |  SELECT o_orderstatus, o_totalprice,
      |         row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rnk,
      |         count(*) OVER (PARTITION BY o_orderstatus) AS n
      |  FROM orders)
      |SELECT o_orderstatus,
      |       max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT) THEN o_totalprice END) AS approx_median,
      |       max(CASE WHEN rnk = CAST(ceil(0.9 * n) AS BIGINT) THEN o_totalprice END) AS approx_p90,
      |       CAST(max(n) AS BIGINT) AS n_orders
      |FROM ranked
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** x18_sketch_columns: MATERIALIZED, MERGEABLE sketch columns — the
    * 100 TB pattern x05's inline aggregate only hints at: per-day
    * Datasketches HLL sketches stored AS COLUMNS (one binary per day),
    * then re-aggregated with `hll_union_agg` to answer "distinct users
    * over any day range" WITHOUT rescanning events — the pre-aggregation
    * a lakehouse materializes once and every dashboard reads. Output is
    * one row per day (estimate beside the exact count) plus a grand
    * row (day = NULL) whose estimate comes only from UNIONING the daily
    * sketches — never from re-touching raw events — next to the exact
    * overall distinct for the spec's error pin.
    *
    * Determinism: HLL register updates are max-folds — commutative and
    * associative — so estimates are partitioning-independent; but the
    * sketch LAYOUT differs from DuckDB's, so rows-only check (x05
    * precedent) with the error + merge-consistency bounds pinned in
    * SketchesSpec.
    */
  /** x19_profile_sketch: q86's column profile with the distinct counts as
    * HLL SKETCHES instead of exact countDistinct — the 100 TB stats pass
    * (VERDICT r9 design note): q86's exact per-column distinct shuffles
    * every distinct (column, value) pair, correct by contract but
    * O(values) network; this variant's shuffle carries one fixed-size
    * sketch per column per mapper — O(columns) — and keeps the exact
    * n_rows/n_nulls beside the estimate. Columns sketch through a string
    * cast (bijective on values, so distinct counts are preserved; nulls
    * stay null and are skipped by the sketch exactly as countDistinct
    * skips them).
    *
    * Rows-only (Datasketches layout ≠ DuckDB's — x05 precedent); the
    * lgK=12 3σ relative-error bound is pinned per column against the
    * oracle-gated exact q86 in SketchesSpec.
    */
  def x19(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.profileOver(spark, dir,
      c => hll_sketch_estimate(hll_sketch_agg(c.cast("string"), lit(12))),
      "est_distinct")

  def x18(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sketch"),
        countDistinct(col("user_id")).as("exact_users"))
    // a real deployment persists `daily` (day, sketch) as a table; the
    // range query below reads ONLY sketches
    val overall = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_users"))
    val exactOverall = Tables.events(spark, dir)
      .agg(countDistinct(col("user_id")).as("exact_users"))
    daily.select(col("day"),
        hll_sketch_estimate(col("sketch")).as("est_users"),
        col("exact_users"))
      .unionByName(
        overall.crossJoin(exactOverall)
          .select(lit(null).cast("timestamp").as("day"),
            col("est_users"), col("exact_users")))
      .orderBy(asc_nulls_first("day"))
  }

  /** x18b_sketch_columns_gate: x18's MATERIALIZED-sketch-column pattern in
    * the theta EXACT regime, under the driver's hash gate — per-day
    * `theta_sketch_agg` BINARY sketches, the grand row computed ONLY by
    * `theta_union_agg` over those stored sketches (the fact table is never
    * re-touched for the range answer), estimates read with
    * `theta_estimate`. At lgK = 21 every daily sketch and their union stay
    * below nominal k, so every estimate is the exact distinct count and
    * the whole store-then-merge lifecycle — sketch build, binary
    * materialization, re-aggregation union, scalar estimate — lands under
    * DuckDB's count(DISTINCT). x18 stays the declared HLL form whose
    * error/merge-consistency SketchesSpec pins; the declared lgK-bounded
    * theta form is what a 100 TB deployment would persist (8·2²¹ B max
    * per sketch is the stated exact-regime price).
    */
  def x18b(spark: SparkSession, dir: String): DataFrame = {
    graft.ext.GraftFunctions.ensureThetaDistinct(spark)
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(call_function("theta_sketch_agg", col("user_id"), lit(21))
        .as("sketch"))
    val overall = daily.agg(
      call_function("theta_estimate",
        call_function("theta_union_agg", col("sketch"), lit(21)))
        .as("est_users"))
    daily.select(col("day"),
        call_function("theta_estimate", col("sketch")).as("est_users"))
      .unionByName(
        overall.select(lit(null).cast("timestamp").as("day"),
          col("est_users")))
      .orderBy(asc_nulls_first("day"))
  }

  /** Exact per-day + overall distinct users — x18b's oracle. */
  val x18bSql: String =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
      |FROM events GROUP BY 1
      |UNION ALL
      |SELECT NULL AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
      |FROM events
      |ORDER BY day NULLS FIRST""".stripMargin

  /** x22_sketch_overlap: day-over-day RETENTION from materialized
    * sketches — the set-algebra capability that separates theta from HLL
    * (an HLL union is lossless but HLL has no principled intersection):
    * per consecutive-day pair, |users(a)|, |users(b)|, the INTERSECTION
    * |users(a) ∩ users(b)|, the union, and their Jaccard — computed
    * entirely from the per-day `theta_sketch_agg` columns, never
    * re-touching the fact table (x18's store-then-merge pattern extended
    * to conjunctions: audience overlap, segment intersection, retention
    * curves are all this shape). The pair join is an equi-join on
    * day + 1 against a ~30-row broadcast dim of sketches.
    *
    * Oracle-gated at lgK = 21: intersection keeps exactly the matching
    * retained hashes under θ = min(θa, θb), so two exact sketches
    * intersect exactly, the pair union at lgK 26 never downsamples, and
    * every count matches DuckDB's distinct-join restatement (union via
    * inclusion–exclusion of exact counts); jaccard is one IEEE divide of
    * exact longs. lgK is the declared scale knob — below it the same
    * query degrades to the standard theta set-operation error bounds.
    */
  /** The consecutive-day sketch pairs behind [[x22]]/[[x22b]] — ONE copy
    * of the per-day sketch build and the day+1 broadcast equi-join, so
    * the overlap and churn reports cannot silently compute over
    * different pair sets.
    */
  private def dailySketchPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.ext.GraftFunctions.ensureThetaDistinct(spark)
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(call_function("theta_sketch_agg", col("user_id"), lit(21))
        .as("sk"))
    val a = daily.select(col("day").as("day_a"),
      (col("day") + expr("INTERVAL 1 DAY")).as("day_next"),
      col("sk").as("sk_a"))
    val b = daily.select(col("day").as("day_b"), col("sk").as("sk_b"))
    a.join(broadcast(b), col("day_next") === col("day_b"))
  }

  def x22(spark: SparkSession, dir: String): DataFrame =
    dailySketchPairs(spark, dir)
      .select(col("day_a"),
        call_function("theta_estimate", col("sk_a")).as("n_a"),
        call_function("theta_estimate", col("sk_b")).as("n_b"),
        call_function("theta_estimate",
          call_function("theta_intersect", col("sk_a"), col("sk_b")))
          .as("n_both"),
        call_function("theta_estimate",
          call_function("theta_union2", col("sk_a"), col("sk_b")))
          .as("n_either"))
      .withColumn("jaccard",
        col("n_both").cast("double") / col("n_either").cast("double"))
      .orderBy("day_a")

  /** x22b_sketch_churn: the set-DIFFERENCE half of the sketch algebra —
    * per consecutive-day pair, retained = a ∩ b, churned = a ∖ b,
    * new = b ∖ a, all from the same stored per-day sketches (x22's
    * retention query completed into the full churn report: union,
    * intersection and both differences, facts never re-read). A∖B keeps
    * exactly A's retained hashes absent from B under θ = min, so exact
    * sketches difference exactly — same gate argument, same lgK = 21
    * regime, oracle restates the differences by subtraction of exact
    * counts.
    */
  def x22b(spark: SparkSession, dir: String): DataFrame = {
    dailySketchPairs(spark, dir)
      .select(col("day_a"),
        call_function("theta_estimate",
          call_function("theta_intersect", col("sk_a"), col("sk_b")))
          .as("n_retained"),
        call_function("theta_estimate",
          call_function("theta_anotb", col("sk_a"), col("sk_b")))
          .as("n_churned"),
        call_function("theta_estimate",
          call_function("theta_anotb", col("sk_b"), col("sk_a")))
          .as("n_new"))
      .orderBy("day_a")
  }

  /** Exact-count restatement of the churn report — x22b's oracle. */
  val x22bSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
      |  FROM events),
      |d AS (SELECT day, count(*) AS n FROM du GROUP BY day),
      |pairs AS (
      |  SELECT a.day AS day_a, a.n AS n_a, b.n AS n_b
      |  FROM d a JOIN d b ON b.day = a.day + INTERVAL 1 DAY),
      |onboth AS (
      |  SELECT x.day AS day_a, count(*) AS n_both
      |  FROM du x JOIN du y
      |    ON y.day = x.day + INTERVAL 1 DAY AND y.user_id = x.user_id
      |  GROUP BY x.day)
      |SELECT p.day_a,
      |       CAST(coalesce(o.n_both, 0) AS BIGINT) AS n_retained,
      |       CAST(p.n_a - coalesce(o.n_both, 0) AS BIGINT) AS n_churned,
      |       CAST(p.n_b - coalesce(o.n_both, 0) AS BIGINT) AS n_new
      |FROM pairs p LEFT JOIN onboth o ON o.day_a = p.day_a
      |ORDER BY p.day_a""".stripMargin

  /** Distinct-join restatement of the overlap — x22's oracle. */
  val x22Sql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
      |  FROM events),
      |d AS (SELECT day, count(*) AS n FROM du GROUP BY day),
      |pairs AS (
      |  SELECT a.day AS day_a, a.n AS n_a, b.n AS n_b
      |  FROM d a JOIN d b ON b.day = a.day + INTERVAL 1 DAY),
      |onboth AS (
      |  SELECT x.day AS day_a, count(*) AS n_both
      |  FROM du x JOIN du y
      |    ON y.day = x.day + INTERVAL 1 DAY AND y.user_id = x.user_id
      |  GROUP BY x.day)
      |SELECT p.day_a,
      |       CAST(p.n_a AS BIGINT) AS n_a,
      |       CAST(p.n_b AS BIGINT) AS n_b,
      |       CAST(coalesce(o.n_both, 0) AS BIGINT) AS n_both,
      |       CAST(p.n_a + p.n_b - coalesce(o.n_both, 0) AS BIGINT) AS n_either,
      |       CAST(coalesce(o.n_both, 0) AS DOUBLE)
      |         / CAST(p.n_a + p.n_b - coalesce(o.n_both, 0) AS DOUBLE) AS jaccard
      |FROM pairs p LEFT JOIN onboth o ON o.day_a = p.day_a
      |ORDER BY p.day_a""".stripMargin

  /** x19b_profile_sketch_gate: x19's sketched column profile in the theta
    * EXACT regime — the same single-scan wide-aggregate + stack shape,
    * distinct counts via `theta_distinct` over the bijective string cast
    * at lgK = 23 (every per-column cardinality is far below 2²³ at driver
    * SFs), so the profile equals q86's exact one and SHARES q86's oracle
    * verbatim. x19 stays the declared lgK = 12 HLL form whose 3σ error
    * SketchesSpec pins — O(columns) shuffle either way; the exact regime
    * trades O(distinct)-per-column buffer memory, stated.
    */
  def x19b(spark: SparkSession, dir: String): DataFrame = {
    graft.ext.GraftFunctions.ensureThetaDistinct(spark)
    graft.ops.Analytics.profileOver(spark, dir,
      c => call_function("theta_distinct", c.cast("string"), lit(23)),
      "n_distinct")
  }
}
