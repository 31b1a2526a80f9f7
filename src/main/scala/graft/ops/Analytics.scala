package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytics operator set (SURVEY.md §2.3 q29–q31): pivot,
  * moment-based statistics, and ordered array aggregation — the everyday
  * reshaping/statistics surface beyond plain aggregates.
  *
  * Determinism notes: the pivot value list is explicit (a data-driven
  * pivot would make the output schema depend on scan order); statistics
  * come from exact decimal Σx / Σx² with ONE final double expression per
  * statistic, because Spark's and DuckDB's native stddev/variance merge
  * float moments in partition order — not reproducible cross-engine (D2);
  * array_agg is sorted, since collect order is undefined in both engines.
  */
object Analytics {

  /** q29_pivot: order counts and revenue per priority, pivoted across the
    * (explicit) status values — compiles to one hash aggregate with
    * conditional aggregation, same as the oracle's CASE sums.
    */
  def q29(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  val q29Sql: String =
    """SELECT o_orderpriority,
      |       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS "F",
      |       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS "O",
      |       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS "P"
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q43_unpivot: wide→long reshaping through the NATIVE Dataset.unpivot
    * (melt) operator — the inverse of q29's pivot, closing the reshaping
    * pair. Unpivots q29's per-status count columns back to
    * (priority, status, n) rows; zero cells survive the round trip (q29
    * fills absent combinations), which a plain re-aggregation would drop —
    * exactly the semantics unpivot exists for. The oracle restates the melt
    * as CASE-sums + UNION ALL, dialect-free.
    */
  def q43(spark: SparkSession, dir: String): DataFrame =
    q29(spark, dir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")),
        "o_orderstatus", "n_orders")
      .orderBy("o_orderpriority", "o_orderstatus")

  val q43Sql: String =
    """WITH w AS (
      |  SELECT o_orderpriority,
      |         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS f,
      |         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS o,
      |         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS p
      |  FROM orders
      |  GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 'F' AS o_orderstatus, f AS n_orders FROM w
      |UNION ALL
      |SELECT o_orderpriority, 'O' AS o_orderstatus, o AS n_orders FROM w
      |UNION ALL
      |SELECT o_orderpriority, 'P' AS o_orderstatus, p AS n_orders FROM w
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  /** q30_stats: mean / variance / stddev per group from exact decimal
    * Σx and Σx² — the order-independent way to compute moments (native
    * float stddev aggregates are partition-order-dependent and differ
    * across engines). One IEEE expression per statistic at the end.
    */
  def q30(spark: SparkSession, dir: String): DataFrame = {
    val x  = col("o_totalprice").cast("decimal(18,2)")
    val sx  = sum(x).cast("double")
    val sx2 = sum((x * x).cast("decimal(38,4)")).cast("double")
    val n   = count(lit(1)).cast("double")
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sx / n).as("mean_price"),
        ((sx2 - sx * sx / n) / (n - lit(1.0))).as("var_price"),
        sqrt((sx2 - sx * sx / n) / (n - lit(1.0))).as("stddev_price"))
      .orderBy("o_orderstatus")
  }

  /** The oracle converts the exact decimal sums to DOUBLE through VARCHAR:
    * DuckDB's direct wide-decimal→double conversion goes through the
    * int128 storage and double-rounds (observed 1 ulp off at sf0.1), while
    * decimal→string is exact and string→double is a correctly-rounded
    * parse — matching Spark's correctly-rounded BigDecimal→double.
    */
  val q30Sql: String =
    """SELECT o_orderstatus,
      |       CAST(n AS BIGINT) AS n_orders,
      |       sx / nd AS mean_price,
      |       (sx2 - sx * sx / nd) / (nd - 1.0) AS var_price,
      |       sqrt((sx2 - sx * sx / nd) / (nd - 1.0)) AS stddev_price
      |FROM (
      |  SELECT o_orderstatus, count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
      |         CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sx2
      |  FROM orders
      |  GROUP BY o_orderstatus)
      |ORDER BY o_orderstatus""".stripMargin

  /** q30b_corr: Pearson correlation + least-squares regression line
    * (quantity → extended price per return flag) from EXACT decimal
    * co-moment sums — q30's order-independence discipline extended to
    * two variables. Spark's `corr`/`regr_slope` run a streaming update
    * formula whose float accumulation is partition-order-dependent (and
    * engine-specific); here Σx, Σy, Σxy, Σx², Σy² aggregate as exact
    * decimals (associative ⇒ any partitioning gives the same sums) and
    * the closed-form doubles are computed ONCE from those sums, in an
    * operation order the oracle restates verbatim ⇒ bit-identical.
    * Map-side partial aggregation applies as in any hash agg: the shuffle
    * carries 5 decimal sums + a count per (mapper, group).
    */
  def q30b(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_extendedprice").cast("decimal(18,2)")
    val sx  = sum(x).cast("double")
    val sy  = sum(y).cast("double")
    val sxy = sum((x * y).cast("decimal(38,4)")).cast("double")
    val sx2 = sum((x * x).cast("decimal(38,4)")).cast("double")
    val sy2 = sum((y * y).cast("decimal(38,4)")).cast("double")
    val n   = count(lit(1)).cast("double")
    val cov   = n * sxy - sx * sy
    val varx  = n * sx2 - sx * sx
    val vary  = n * sy2 - sy * sy
    val slope = cov / varx
    // degenerate groups (a constant variable ⇒ zero variance) must yield
    // NULL identically in both engines — unguarded IEEE division would
    // give NaN/Inf here while DuckDB's division-by-zero yields NULL, and
    // the shared comparison is on the same doubles so the guard decision
    // is cross-engine identical
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        when(varx > 0 && vary > 0, cov / (sqrt(varx) * sqrt(vary)))
          .as("corr_qty_price"),
        when(varx > 0, slope).as("slope"),
        when(varx > 0, (sy - slope * sx) / n).as("intercept"))
      .orderBy("l_returnflag")
  }

  /** Sums go double via VARCHAR (q30's D7 discipline); the closed-form
    * arithmetic mirrors the Spark expression tree token-for-token.
    */
  val q30bSql: String =
    """SELECT l_returnflag,
      |       CAST(n AS BIGINT) AS n_rows,
      |       CASE WHEN nd * sx2 - sx * sx > 0 AND nd * sy2 - sy * sy > 0
      |            THEN (nd * sxy - sx * sy) / (sqrt(nd * sx2 - sx * sx) * sqrt(nd * sy2 - sy * sy)) END AS corr_qty_price,
      |       CASE WHEN nd * sx2 - sx * sx > 0
      |            THEN (nd * sxy - sx * sy) / (nd * sx2 - sx * sx) END AS slope,
      |       CASE WHEN nd * sx2 - sx * sx > 0
      |            THEN (sy - ((nd * sxy - sx * sy) / (nd * sx2 - sx * sx)) * sx) / nd END AS intercept
      |FROM (
      |  SELECT l_returnflag, count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
      |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
      |         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
      |         CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sxy,
      |         CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sx2,
      |         CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sy2
      |  FROM lineitem
      |  GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  /** q31_array_agg: ordered array aggregation — sorted distinct priority
    * list per status (collect order is undefined in both engines, so the
    * sort is the determinism contract).
    */
  def q31(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        // sorted collect_set stays the exercised op; serialized to a string
        // because the driver's oracle harness cannot hash array columns.
        // ',' is unambiguous HERE because o_orderpriority is a closed enum
        // ('1-URGENT'..'5-LOW', comma-free by construction — gen/OrderGen);
        // for user-ish data use a non-occurring separator (q18 uses \\u0001)
        concat_ws(",", sort_array(collect_set(col("o_orderpriority"))))
          .as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy("o_orderstatus")

  val q31Sql: String =
    """SELECT o_orderstatus,
      |       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
      |       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** q34_median: exact median and discrete p90 per group via deterministic
    * rank arithmetic — NOT percentile()/quantile_cont(), whose interpolation
    * formulas differ across engines. Median = mean of the one or two middle
    * rows of the (value, unique-key)-sorted group; p90 = the value at rank
    * ceil(0.9·n). Integer index logic + exact decimal values ⇒ identical
    * in both engines; one window shuffle then a tiny aggregate.
    */
  def q34(spark: SparkSession, dir: String): DataFrame = {
    val byStatus = Window.partitionBy(col("o_orderstatus"))
    val w = byStatus.orderBy(asc("o_totalprice_d"), asc("o_orderkey"))
    val ranked = Tables.orders(spark, dir)
      .withColumn("o_totalprice_d", col("o_totalprice").cast("decimal(18,2)"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(byStatus))
    val lo  = (col("cnt") + 1) / lit(2)
    val hi  = (col("cnt") + 2) / lit(2)
    val p90 = (col("cnt") * 9 + 9) / lit(10)
    ranked.groupBy(col("o_orderstatus"))
      .agg(
        (sum(when(col("rn") === floor(lo).cast("long") ||
            col("rn") === floor(hi).cast("long"), col("o_totalprice_d")))
          .cast("double") /
          sum(when(col("rn") === floor(lo).cast("long") ||
            col("rn") === floor(hi).cast("long"), 1).otherwise(0))
            .cast("double")).as("median_price"),
        max(when(col("rn") === floor(p90).cast("long"), col("o_totalprice_d")))
          .cast("double").as("p90_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  /** q34b_median_hist: q34's exact median/p90 through the scale-safe
    * histogram plan (VERDICT r3 #1). q34's direct window partitions on
    * o_orderstatus — 3 distinct values — so three reducers sort the whole
    * table at any cluster size. The value at a global rank is a function of
    * the per-(status, price) count histogram alone, so the full sort is
    * replaced by counting:
    *
    *   1. histogram: one shuffle on the high-cardinality (status, price)
    *      composite with map-side partial agg — full parallelism;
    *   2. coarse price buckets (fixed width: bucket = floor(price/512),
    *      ~10³ buckets over the TPC-H price domain — the count stays ~10³
    *      at ANY data scale, so the per-(status, bucket) subtotal table is
    *      always tiny) → running bucket offsets + group totals, the only
    *      status-partitioned window, over ≤ statuses×10³ pre-aggregated
    *      rows;
    *   3. within-bucket running counts: window partitioned by the COMPOSITE
    *      (status, bucket) key — thousands of independent partitions, no
    *      serialization point; global cumulative rank = bucket offset +
    *      within-bucket running count (the q20b salt-then-merge idea
    *      applied to rank);
    *   4. a price row covers global ranks (cum−c, cum]; the median/p90
    *      boundary ranks select their covering rows in one final partial
    *      agg on status.
    *
    * Rank-interval selection is arithmetically identical to q34's
    * rank-equality selection (a tied price covering both middle ranks
    * contributes p once with weight 1 here vs 2p/2 there — same IEEE double,
    * division by 2 is exact). Shares q34's oracle (q20b/q33b precedent);
    * ScaleSpec pins that no exchange hash-partitions raw rows on the bare
    * status key.
    */
  def q34Hist(spark: SparkSession, dir: String): DataFrame = {
    val cum = histCum(spark, dir)
    val lo  = floor((col("cnt") + 1) / lit(2)).cast("long")
    val hi  = floor((col("cnt") + 2) / lit(2)).cast("long")
    val p90 = floor((col("cnt") * 9 + 9) / lit(10)).cast("long")
    def covers(k: Column) = col("cum") - col("c") < k && k <= col("cum")
    cum.groupBy(col("o_orderstatus"))
      .agg(
        (sum(when(covers(lo) || covers(hi), col("p"))).cast("double") /
          sum(when(covers(lo) || covers(hi), 1).otherwise(0)).cast("double"))
          .as("median_price"),
        max(when(covers(p90), col("p"))).cast("double").as("p90_price"),
        max(col("cnt")).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  /** The shared histogram-rank pipeline behind [[q34Hist]] and [[q34c]]:
    * per-(status, price) counts with global cumulative rank, built without
    * ever sorting raw rows on the 3-value status key (steps 1–3 of
    * q34Hist's doc). A thin rename shim over [[histCumOn]] — ONE copy of
    * the two-level census discipline — so the two cannot drift. Returns
    * one row per distinct (status, price) with columns
    * (o_orderstatus, bkt, p, c, off, cnt, cum): the price covers global
    * ranks (cum − c, cum].
    */
  private def histCum(spark: SparkSession, dir: String): DataFrame =
    histCumOn(Tables.orders(spark, dir)
        .select(col("o_orderstatus").as("g"),
          col("o_totalprice").cast("decimal(18,2)").as("p")))
      .withColumnRenamed("g", "o_orderstatus")

  /** The two-level histogram-rank census over any (g, p) input: coarse
    * fixed-width buckets → broadcast offsets → within-(g, bkt) running
    * counts. [[histCum]] is its orders-scan instantiation. The offsets
    * branch re-evaluates `base` STRAIGHT off a second pruned scan rather
    * than deriving from `hist`: the branches diverge after filter
    * pushdown, so ReuseExchange cannot merge them, and deriving from
    * `hist` would re-run the whole (g, p) shuffle — this way the heavy
    * shuffle happens exactly once and the offsets branch is a map-side
    * partial agg collapsing to ~|groups|·10³ rows before its tiny
    * exchange. Callers whose base is more than a pruned scan should keep
    * it cheap
    * (map-side joins only) or persist it. Columns in: (g, p decimal);
    * out: (g, bkt, p, c, off, cnt, cum) — p covers global ranks
    * (cum − c, cum] within its group.
    */
  private def histCumOn(base: DataFrame): DataFrame = {
    val bktOfP = floor(col("p") / 512).cast("long")
    val hist = base
      .groupBy(col("g"), col("p"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bkt", bktOfP)
    val wB = Window.partitionBy(col("g")).orderBy(asc("bkt"))
    val bucketOffsets = base
      .groupBy(col("g"), bktOfP.as("bkt"))
      .agg(count(lit(1)).as("bc"))
      .select(
        col("g"), col("bkt"),
        coalesce(sum(col("bc")).over(
          wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"),
        sum(col("bc")).over(Window.partitionBy(col("g"))).as("cnt"))
    val wIn = Window.partitionBy(col("g"), col("bkt"))
      .orderBy(asc("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.join(broadcast(bucketOffsets), Seq("g", "bkt"))
      .withColumn("cum", col("off") + sum(col("c")).over(wIn))
  }

  /** q88_integrity: REFERENTIAL-INTEGRITY audit — one row per declared
    * FK relationship with (n_rows, n_orphans): the data-quality sibling
    * of q86's column profile, checking the star schema's joinability
    * before any query trusts it (an orphan fact row silently vanishes
    * from every inner join downstream — this is the reference target's
    * FK constraints, `init/postgres-2/init.sql`, as a batch audit). All
    * four counts are zero on intact TPC-H data; the values are verified
    * against DuckDB regardless, and the planted-orphan behavior is
    * spec-pinned through the shared [[orphanCounts]] helper.
    *
    * Scale shape: each relationship is ONE left join of the fact's key
    * projection against the DISTINCT parent keys with a hit marker,
    * folded map-side to (count, null-hits) — no anti-join + count pair
    * scanning twice, no 1-row cross-joins; dims small enough broadcast,
    * the lineitem→orders leg shuffles on the high-cardinality orderkey.
    */
  def q88(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    Seq(
      orphanCounts("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey"),
      orphanCounts("lineitem.l_partkey -> part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      orphanCounts("lineitem.l_suppkey -> supplier", li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"),
      orphanCounts("orders.o_custkey -> customer", o, "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
      .reduce(_.unionByName(_))
      .orderBy("relationship")
  }

  /** One FK audit leg: the child's key projection LEFT-joined against the
    * distinct parent keys with a constant hit marker, folded to
    * (n_rows, n_orphans) in one aggregate. Shared by q88 and its
    * planted-orphan spec.
    */
  private[graft] def orphanCounts(
      name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct()
        .withColumn("__hit", lit(1)), Seq(childKey), "left")
      .groupBy()
      .agg(count(lit(1)).as("n_rows"),
        // coalesce: sum over ZERO rows is NULL — an empty child relation
        // must audit as (0, 0), not (0, NULL) (ADVICE r9)
        coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_orphans"))
      .select(lit(name).as("relationship"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_orphans").cast("long").as("n_orphans"))

  val q88Sql: String = {
    def leg(name: String, child: String, ck: String, parent: String, pk: String) =
      s"""SELECT '$name' AS relationship,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(coalesce(sum(CASE WHEN p.__k IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_orphans
         |FROM $child c LEFT JOIN (SELECT DISTINCT $pk AS __k FROM $parent) p
         |  ON c.$ck = p.__k""".stripMargin
    Seq(
      leg("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      leg("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
      leg("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      leg("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
  }

  /** q87_user_growth: CUMULATIVE DISTINCT users per day — (day,
    * new_users, cum_users) where cum_users on day d is the exact count
    * of distinct users seen on or before d. The growth-dashboard
    * primitive, and the query naive composition gets catastrophically
    * wrong at scale: countDistinct per expanding window re-scans
    * every prior day per day (O(days·events)); the exact-and-linear
    * form is one first-seen reduction — a user contributes to
    * cum_users exactly from their FIRST day — then a running sum over
    * ≤ days aggregate rows.
    *
    * Scale shape: one map-side-combinable min(day) per user (user-key
    * shuffle, high cardinality), one tiny per-day count, and the only
    * unpartitioned window runs over ≤ |days| rows (the q78-offsets
    * precedent: bounded by construction). Exact longs throughout; the
    * final day's cum_users IS the corpus's distinct user count
    * (spec-pinned, and the exact anchor x18's sketch estimates are
    * judged against).
    */
  def q87(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
    firstSeen.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      .select(col("day"), col("new_users"),
        sum(col("new_users")).over(Window.orderBy(asc("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long").as("cum_users"))
      .orderBy("day")
  }

  val q87Sql: String =
    """WITH f AS (
      |  SELECT user_id, min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day
      |  FROM events GROUP BY user_id),
      |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
      |SELECT day, CAST(new_users AS BIGINT) AS new_users,
      |       CAST(sum(new_users) OVER (ORDER BY day ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM d
      |ORDER BY day""".stripMargin

  /** q86_profile: COLUMN PROFILING over orders — one row per column with
    * (n_rows, n_nulls, n_distinct): the data-quality pass a pipeline runs
    * before trusting a new drop (null-rate spikes and cardinality
    * collapses are the two cheapest corruption detectors), and the
    * integer-only subset of a stats catalog a CBO would consume.
    *
    * Scale shape: ONE scan computes every column's null count and
    * distinct count in a single aggregate — Spark plans the N distinct
    * aggregates as one Expand (N tagged copies per row) UNDER a partial
    * aggregate, the q81/q84 fan-out discipline, so the shuffle carries
    * per-column partial states, never N copies of the data; the wide
    * 1-row result unpivots to long form with a literal `stack`
    * (driver-side column list — schema metadata, not data). All counts
    * exact longs.
    *
    * EXACT by contract — countDistinct still shuffles every distinct
    * (column, value) pair. At 100 TB a stats pass uses the sketch form
    * ([[Sketches.x19]]): same profile, distinct counts as mergeable HLL
    * sketches, shuffle O(columns) instead of O(values), 3σ error pinned
    * against this query in SketchesSpec.
    */
  /** The orders fixture schema both q86 sides profile — ONE source of
    * truth for the Scala aggregate and the SQL oracle (ADVICE r9: the two
    * lists were maintained separately and would diverge silently on a
    * fixture schema change). q86 asserts the runtime schema against it,
    * so a regenerated fixture fails with a precise message instead of a
    * generic oracle mismatch.
    */
  private[graft] val q86Cols = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** The shared single-scan profile scaffold behind q86 / x19 / x19b —
    * wide aggregate (one null-count + one distinct-flavored agg per
    * column, under one partial-aggregated Expand) unpivoted through a
    * literal stack. ONE copy on purpose: the three profiles differ ONLY
    * in the distinct aggregate (`countDistinct` / HLL estimate / theta),
    * and a stack-shape or schema change must not be able to diverge
    * them silently.
    */
  private[graft] def profileOver(
      spark: SparkSession, dir: String,
      distinctAgg: Column => Column, distinctName: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val cols = o.columns.toSeq
    require(cols == q86Cols,
      s"q86: orders fixture schema drifted — update q86Cols (and check " +
        s"FIXTURES.md). fixture=${cols.mkString(",")} expected=${q86Cols.mkString(",")}")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
      distinctAgg(col(c)).as(s"__d_$c")))
    val allAggs = count(lit(1)).as("__rows") +: aggs
    val wide = o.agg(allAggs.head, allAggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', `__n_$c`, `__d_$c`").mkString(", ")
    wide.select(col("__rows"),
        expr(s"stack(${cols.length}, $stackArgs) AS (column_name, n_nulls, $distinctName)"))
      .select(col("column_name"), col("__rows").as("n_rows"),
        col("n_nulls").cast("long").as("n_nulls"),
        col(distinctName).cast("long").as(distinctName))
      .orderBy("column_name")
  }

  def q86(spark: SparkSession, dir: String): DataFrame =
    profileOver(spark, dir, countDistinct(_), "n_distinct")

  /** q86's restatement: one UNION ALL branch per column (the oracle may
    * scan six times; the engine side must not).
    */
  val q86Sql: String = {
    q86Cols.map { c =>
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** q85_weighted_median: per-returnflag WEIGHTED median — the smallest
    * price p whose cumulative quantity weight reaches half the group
    * total (min p with 2·cumW(p) ≥ W). The weighted member of the
    * median family: q34's rank counts rows, q85's rank counts UNITS —
    * "the price at which half the shipped quantity is cheaper", the
    * inventory/pricing form of a median, and the capability a plain
    * percentile cannot express.
    *
    * Scale shape: the histCumOn two-level census generalized from row
    * counts to DECIMAL weight sums — identical shuffle story (raw rows
    * hash only on the high-cardinality (flag, price) composite, coarse
    * bucket offsets broadcast, within-bucket running sums), and every
    * comparison (2·cum ≥ W) is exact decimal, so both engines select
    * the identical price; the only doubles are the output casts (D7).
    */
  def q85(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("g"),
      col("l_extendedprice").cast("decimal(18,2)").as("p"),
      col("l_quantity").cast("decimal(18,2)").as("w"))
    val bktOfP = floor(col("p") / 4096).cast("long")
    val hist = base.groupBy(col("g"), col("p"))
      .agg(sum(col("w")).as("c"))
      .withColumn("bkt", bktOfP)
    // offsets straight off a second pruned scan (histCumOn's argument)
    val wB = Window.partitionBy(col("g")).orderBy(asc("bkt"))
    val offs = base.groupBy(col("g"), bktOfP.as("bkt"))
      .agg(sum(col("w")).as("bc"))
      .select(col("g"), col("bkt"),
        coalesce(sum(col("bc")).over(
            wB.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast("decimal(28,2)")).as("off"),
        sum(col("bc")).over(Window.partitionBy(col("g"))).as("tot"))
    val wIn = Window.partitionBy(col("g"), col("bkt")).orderBy(asc("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.join(broadcast(offs), Seq("g", "bkt"))
      .withColumn("cum", col("off") + sum(col("c")).over(wIn))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("g"))
      .agg(min(col("p")).cast("double").as("w_median"),
        max(col("tot")).cast("double").as("total_weight"))
      .select(col("g").as("l_returnflag"), col("w_median"),
        col("total_weight"))
      .orderBy("l_returnflag")
  }

  /** q85's restatement: plain per-group running weight windows over the
    * (flag, price) histogram (the oracle may sort whole groups; the
    * engine side may not), the same exact-decimal half-weight rule.
    */
  val q85Sql: String =
    """WITH base AS (
      |  SELECT l_returnflag AS g, CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
      |         CAST(l_quantity AS DECIMAL(18,2)) AS w
      |  FROM lineitem),
      |h AS (SELECT g, p, sum(w) AS c FROM base GROUP BY g, p),
      |cum AS (
      |  SELECT g, p,
      |         sum(c) OVER (PARTITION BY g ORDER BY p ASC
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |         sum(c) OVER (PARTITION BY g) AS tot
      |  FROM h)
      |SELECT g AS l_returnflag,
      |       CAST(min(p) AS DOUBLE) AS w_median,
      |       CAST(max(tot) AS DOUBLE) AS total_weight
      |FROM cum
      |WHERE cw * 2 >= tot
      |GROUP BY g
      |ORDER BY l_returnflag""".stripMargin

  /** q77_mad_outliers: per-group ROBUST outlier detection — the median
    * absolute deviation. Each status gets its discrete median (the
    * rank-⌈n/2⌉ order statistic), the discrete median of |p − med| (the
    * MAD), and the count of orders beyond the 3·MAD fence. The robust
    * complement of q66's moment z-score (one wild order shifts a mean
    * and explodes a stddev; it moves a median by at most one rank) and
    * the detection twin of q70's winsorize (q70 clips the tails, q77
    * counts them).
    *
    * Cross-engine exactness: every quantity before the two output casts
    * is EXACT — medians are rank-selected decimals (never interpolated),
    * |p − med| is exact decimal subtraction, the 3·MAD fence is an exact
    * decimal multiply and the fence comparison an exact decimal compare;
    * the only doubles are the final correctly-rounded scale-2
    * decimal→double casts (direct, D7: scaled values ≪ 2⁵³).
    *
    * Scale shape: both median passes run the [[histCumOn]] histogram-rank
    * census — raw rows hash-shuffle only on the high-cardinality
    * (status, value) composite, never sort on the 3-value status key —
    * and the med/MAD results broadcast back as 3-row dims onto a pruned
    * fact scan whose fence test and count aggregate map-side.
    */
  def q77(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("g"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
    def covers(k: Column) = col("cum") - col("c") < k && k <= col("cum")
    val medRank = floor((col("cnt") + 1) / lit(2)).cast("long")
    val med = histCumOn(base).groupBy(col("g"))
      .agg(max(when(covers(medRank), col("p"))).as("med"),
        max(col("cnt")).as("n_orders"))
    val dev = base.join(broadcast(med), "g")
      .select(col("g"), abs(col("p") - col("med")).as("p"))
    val mad = histCumOn(dev).groupBy(col("g"))
      .agg(max(when(covers(medRank), col("p"))).as("mad"))
    base.join(broadcast(med), "g").join(broadcast(mad), "g")
      .groupBy(col("g"), col("med"), col("mad"), col("n_orders"))
      .agg(sum(when(abs(col("p") - col("med")) > lit(3) * col("mad"), 1)
        .otherwise(0)).cast("long").as("n_outliers"))
      .select(col("g").as("o_orderstatus"),
        col("med").cast("double").as("med_price"),
        col("mad").cast("double").as("mad"),
        col("n_orders"), col("n_outliers"))
      .orderBy("o_orderstatus")
  }

  /** q77's restatement: ranked-window rank selection for both medians
    * (the q70/q34 equivalence), the same exact-decimal fence.
    */
  val q77Sql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus AS g,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |         row_number() OVER (PARTITION BY o_orderstatus
      |                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) ASC, o_orderkey ASC) AS rn,
      |         count(*) OVER (PARTITION BY o_orderstatus) AS cnt
      |  FROM orders),
      |med AS (
      |  SELECT g, max(CASE WHEN rn = (cnt + 1) // 2 THEN p END) AS med,
      |         max(cnt) AS n_orders
      |  FROM base GROUP BY g),
      |dev AS (
      |  SELECT b.g, abs(b.p - m.med) AS d,
      |         row_number() OVER (PARTITION BY b.g
      |                            ORDER BY abs(b.p - m.med) ASC, b.o_orderkey ASC) AS rn,
      |         count(*) OVER (PARTITION BY b.g) AS cnt
      |  FROM base b JOIN med m USING (g)),
      |mad AS (
      |  SELECT g, max(CASE WHEN rn = (cnt + 1) // 2 THEN d END) AS mad
      |  FROM dev GROUP BY g)
      |SELECT m.g AS o_orderstatus,
      |       CAST(m.med AS DOUBLE) AS med_price,
      |       CAST(x.mad AS DOUBLE) AS mad,
      |       CAST(m.n_orders AS BIGINT) AS n_orders,
      |       CAST(sum(CASE WHEN abs(b.p - m.med) > 3 * x.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM base b JOIN med m ON b.g = m.g JOIN mad x ON b.g = x.g
      |GROUP BY m.g, m.med, x.mad, m.n_orders
      |ORDER BY o_orderstatus""".stripMargin

  /** q78_ks_test: two-sample KOLMOGOROV–SMIRNOV distance between the
    * open ('O') and finished ('F') order price distributions — the
    * distribution-drift statistic D = max over the pooled support of
    * |ecdfO(p) − ecdfF(p)|, plus the (smallest) price where the maximum
    * is attained. The nonparametric complement of q30's moment
    * comparison: two groups can share mean and variance and still be
    * distributionally far apart; D is what a train/serve or
    * before/after-rebalance drift check actually reads.
    *
    * Cross-engine exactness: ECDF numerators/denominators are exact
    * longs; each ecdf is ONE IEEE divide, D one subtraction + abs — both
    * engines produce bit-identical doubles, so max(D) and the
    * equality-selected argmin price match exactly.
    *
    * Scale shape: the only fact-sized stage is the map-side-combined
    * census on the high-cardinality price key. The running counts that
    * make the ECDFs use the [[histCumOn]] two-level discipline — coarse
    * fixed-width buckets whose ~10³-row totals take the only
    * unpartitioned window, then within-bucket windows on the composite
    * (bkt) key — a distributed prefix scan, never a single-reducer global
    * sort of the support (q52's argument). The final max/argmin fold is
    * over already-tiny values and the 1-row D attaches by broadcast.
    */
  def q78(spark: SparkSession, dir: String): DataFrame = {
    val bktOfP = floor(col("p") / 512).cast("long")
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_totalprice").cast("decimal(18,2)").as("p"),
        col("o_orderstatus").as("s"))
    val h = base.groupBy(col("p"))
      .agg(sum(when(col("s") === "O", 1).otherwise(0)).as("co"),
        sum(when(col("s") === "F", 1).otherwise(0)).as("cf"))
      .withColumn("bkt", bktOfP)
    // bucket totals straight off a second pruned scan (histCum discipline)
    val wB = Window.orderBy(asc("bkt"))
    val off = base.groupBy(bktOfP.as("bkt"))
      .agg(sum(when(col("s") === "O", 1).otherwise(0)).as("bo"),
        sum(when(col("s") === "F", 1).otherwise(0)).as("bf"))
      .select(col("bkt"),
        coalesce(sum(col("bo")).over(
          wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("oo"),
        coalesce(sum(col("bf")).over(
          wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("of"),
        sum(col("bo")).over(Window.partitionBy()).as("no"),
        sum(col("bf")).over(Window.partitionBy()).as("nf"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(asc("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // degenerate-sample guard (q30 convention): if either status had zero
    // rows the ECDF denominators are 0 and D is undefined — emit NULL
    // identically in both engines rather than rely on either's
    // divide-by-zero behavior. TPC-H orders always has both 'O' and 'F',
    // so on the fixtures this branch never fires.
    val d = h.join(broadcast(off), "bkt")
      .select(col("p"), col("no"), col("nf"),
        when(col("no") > 0 && col("nf") > 0,
          abs((col("oo") + sum(col("co")).over(wIn)).cast("double") /
              col("no").cast("double") -
            (col("of") + sum(col("cf")).over(wIn)).cast("double") /
              col("nf").cast("double"))).as("d"))
    val dm = d.groupBy().agg(max(col("d")).as("d_stat"))
    // 1-row scalar attach (the global max) — a broadcast nested loop
    // bounded by construction, PlanSpec-exempted as such (q73 precedent)
    d.crossJoin(broadcast(dm))
      .filter(col("d") === col("d_stat"))
      .groupBy(col("d_stat"))
      .agg(min(col("p")).cast("double").as("at_price"),
        max(col("no")).as("n_o"), max(col("nf")).as("n_f"))
      .select(col("d_stat"), col("at_price"), col("n_o"), col("n_f"))
  }

  /** q78's restatement: plain running windows over the pooled support
    * (the oracle may sort globally; the engine side may not), the same
    * single-divide ECDFs and equality-selected argmin.
    */
  val q78Sql: String =
    """WITH base AS (
      |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p, o_orderstatus AS s
      |  FROM orders WHERE o_orderstatus IN ('O', 'F')),
      |h AS (
      |  SELECT p, sum(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS co,
      |         sum(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS cf
      |  FROM base GROUP BY p),
      |c AS (
      |  SELECT p,
      |         sum(co) OVER (ORDER BY p ASC
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumo,
      |         sum(cf) OVER (ORDER BY p ASC
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumf,
      |         sum(co) OVER () AS no, sum(cf) OVER () AS nf
      |  FROM h),
      |d AS (
      |  SELECT p, no, nf,
      |         CASE WHEN no > 0 AND nf > 0 THEN
      |           abs(CAST(cumo AS DOUBLE) / CAST(no AS DOUBLE)
      |             - CAST(cumf AS DOUBLE) / CAST(nf AS DOUBLE)) END AS d
      |  FROM c),
      |m AS (SELECT max(d) AS d_stat FROM d)
      |SELECT m.d_stat AS d_stat,
      |       CAST(min(d.p) AS DOUBLE) AS at_price,
      |       CAST(max(d.no) AS BIGINT) AS n_o,
      |       CAST(max(d.nf) AS BIGINT) AS n_f
      |FROM d, m
      |WHERE d.d = m.d_stat
      |GROUP BY m.d_stat""".stripMargin

  /** q34c_percentile_cont: INTERPOLATED quantiles (the SQL-standard
    * percentile_cont semantics users actually type) — p50/p90 where a
    * fractional rank position lerps between the two surrounding order
    * statistics: pos = q·(n−1) zero-indexed, lo = value at floor(pos)+1,
    * hi = the next value, result = lo + frac·(hi − lo). Completes the
    * quantile family: exact-discrete (q34), histogram-rank (q34b), sketch
    * (x09), and now interpolated — on q34b's scale-safe histogram plan
    * (rank selection over (status, price) counts; raw rows never sort on
    * the 3-value status key).
    *
    * Cross-engine exactness, q63's discipline: rank positions are SCALED
    * INTEGERS (pos×10 = (n−1)·{5,9}), so floor/frac are integer div/mod —
    * no float rank arithmetic anywhere; the fraction becomes a double in
    * one exact ÷10.0, values are correctly-rounded decimal→double casts,
    * and the single lerp `lo + f·(hi − lo)` is restated operand-for-
    * operand in the oracle ⇒ hash-exact. (DuckDB's native quantile_cont
    * on DECIMAL input truncates the interpolated result back to scale 2,
    * so the oracle restates the standard formula on doubles instead —
    * verified equal to the native function up to that truncation.)
    */
  def q34c(spark: SparkSession, dir: String): DataFrame = {
    val cum = histCum(spark, dir)
    // rank of the LOWER order statistic for quantile m/10, 1-indexed:
    // pos10 = (n−1)·m is pos×10, so rank = pos10 div 10 + 1 and the
    // fractional part is (pos10 mod 10)/10 — all integer until the ÷10.0
    def r10(m: Int) =
      ((((col("cnt") - 1) * m) - ((col("cnt") - 1) * m) % 10) / 10)
        .cast("long") + 1
    def covers(k: Column) = col("cum") - col("c") < k && k <= col("cum")
    def pAt(k: Column) = max(when(covers(k), col("p")))
    val agged = cum.groupBy(col("o_orderstatus"))
      .agg(
        pAt(r10(5)).as("lo50"), pAt(r10(5) + 1).as("hi50"),
        pAt(r10(9)).as("lo90"), pAt(r10(9) + 1).as("hi90"),
        max(col("cnt")).as("cnt"))
    // hi is null only when the lower rank is the maximum (frac provably 0):
    // coalesce to lo so the lerp stays total
    def lerp(lo: String, hi: String, m: Int) = {
      val f = (((col("cnt") - 1) * m) % 10).cast("double") / lit(10.0)
      col(lo).cast("double") +
        f * (coalesce(col(hi), col(lo)).cast("double") - col(lo).cast("double"))
    }
    agged.select(col("o_orderstatus"),
        lerp("lo50", "hi50", 5).as("p50_price"),
        lerp("lo90", "hi90", 9).as("p90_price"),
        col("cnt").as("n_orders"))
      .orderBy("o_orderstatus")
  }

  /** q70_winsorize: per-group OUTLIER CLIPPING — every order's price
    * clamped to its status's [p5, p95] discrete quantile band, the
    * winsorization step of robust feature preparation (q55 normalizes
    * moments, q70 tames the tails that would dominate them). Thresholds
    * are the values at ranks ⌈cnt·5/100⌉ and ⌈cnt·95/100⌉ of the
    * (price, orderkey) total order — exact rank arithmetic, no
    * interpolation, all decimal internally; the two price outputs exit as
    * DOUBLE (exact: scaled decimal(18,2) values are far below 2⁵³), with
    * the oracle routed through VARCHAR per D7/D8 so neither engine's
    * decimal *rendering* reaches the driver comparator.
    *
    * Scale shape: thresholds come from [[histCum]] (q34b's histogram-rank
    * selection — the fact table never sorts on the 3-value status key)
    * and broadcast back as a 3-row dim onto the fact scan; the clamp is
    * map-side. The only fact-sized shuffles are histCum's composite-key
    * census and the output ORDER BY.
    */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    val cum = histCum(spark, dir)
    def rank(m: Int) = // ⌈cnt·m/100⌉ in pure integer arithmetic
      (((col("cnt") * m + 99) - ((col("cnt") * m + 99) % 100)) / 100)
        .cast("long")
    def covers(k: Column) = col("cum") - col("c") < k && k <= col("cum")
    val th = cum.groupBy(col("o_orderstatus"))
      .agg(max(when(covers(rank(5)), col("p"))).as("lo"),
        max(when(covers(rank(95)), col("p"))).as("hi"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .join(broadcast(th), "o_orderstatus")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("p").cast("double").as("p"),
        least(greatest(col("p"), col("lo")), col("hi"))
          .cast("double").as("p_winsor"))
      .orderBy("o_orderkey")
  }

  val q70Sql: String =
    """WITH ranked AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |         row_number() OVER (PARTITION BY o_orderstatus
      |                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) ASC, o_orderkey ASC) AS rn,
      |         count(*) OVER (PARTITION BY o_orderstatus) AS cnt
      |  FROM orders),
      |th AS (
      |  SELECT o_orderstatus,
      |         max(CASE WHEN rn = (cnt * 5 + 99) // 100 THEN p END) AS lo,
      |         max(CASE WHEN rn = (cnt * 95 + 99) // 100 THEN p END) AS hi
      |  FROM ranked GROUP BY o_orderstatus)
      |SELECT r.o_orderkey, r.o_orderstatus,
      |       CAST(CAST(r.p AS VARCHAR) AS DOUBLE) AS p,
      |       CAST(CAST(least(greatest(r.p, t.lo), t.hi) AS VARCHAR) AS DOUBLE) AS p_winsor
      |FROM ranked r JOIN th t USING (o_orderstatus)
      |ORDER BY o_orderkey""".stripMargin

  /** q34c's restatement: the ranked-window definition of the same scaled-
    * integer rank arithmetic and the SAME operand-order lerp on doubles.
    */
  val q34cSql: String =
    """WITH ranked AS (
      |  SELECT o_orderstatus,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |         row_number() OVER (PARTITION BY o_orderstatus
      |                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) ASC, o_orderkey ASC) AS rn,
      |         count(*) OVER (PARTITION BY o_orderstatus) AS cnt
      |  FROM orders)
      |SELECT o_orderstatus,
      |       lo50 + f50 * (hi50 - lo50) AS p50_price,
      |       lo90 + f90 * (hi90 - lo90) AS p90_price,
      |       CAST(cnt AS BIGINT) AS n_orders
      |FROM (
      |  SELECT o_orderstatus,
      |         CAST(max(CASE WHEN rn = ((cnt-1)*5)//10 + 1 THEN p END) AS DOUBLE) AS lo50,
      |         CAST(coalesce(max(CASE WHEN rn = ((cnt-1)*5)//10 + 2 THEN p END),
      |                       max(CASE WHEN rn = ((cnt-1)*5)//10 + 1 THEN p END)) AS DOUBLE) AS hi50,
      |         CAST(((max(cnt)-1)*5) % 10 AS DOUBLE) / 10.0 AS f50,
      |         CAST(max(CASE WHEN rn = ((cnt-1)*9)//10 + 1 THEN p END) AS DOUBLE) AS lo90,
      |         CAST(coalesce(max(CASE WHEN rn = ((cnt-1)*9)//10 + 2 THEN p END),
      |                       max(CASE WHEN rn = ((cnt-1)*9)//10 + 1 THEN p END)) AS DOUBLE) AS hi90,
      |         CAST(((max(cnt)-1)*9) % 10 AS DOUBLE) / 10.0 AS f90,
      |         max(cnt) AS cnt
      |  FROM ranked
      |  GROUP BY o_orderstatus)
      |ORDER BY o_orderstatus""".stripMargin

  val q34Sql: String =
    """SELECT o_orderstatus,
      |       CAST(sum(CASE WHEN rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2 THEN p END) AS DOUBLE)
      |         / CAST(sum(CASE WHEN rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2 THEN 1 ELSE 0 END) AS DOUBLE) AS median_price,
      |       CAST(max(CASE WHEN rn = (cnt * 9 + 9) // 10 THEN p END) AS DOUBLE) AS p90_price,
      |       CAST(count(*) AS BIGINT) AS n_orders
      |FROM (
      |  SELECT o_orderstatus,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |         row_number() OVER (PARTITION BY o_orderstatus
      |                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) ASC, o_orderkey ASC) AS rn,
      |         count(*) OVER (PARTITION BY o_orderstatus) AS cnt
      |  FROM orders)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** q55_normalize: per-group feature normalization — z-score and min-max
    * of order totals within each status, the feature-prep step before any
    * model ever sees the column. Group moments come from q30's exact
    * decimal sums (partitioning-independent), land in O(groups) rows, and
    * re-attach by BROADCAST join — the fact side never shuffles on the
    * 3-value status key (q37b's pattern; a window over the bare key would
    * serialize on 3 reducers at scale). Every normalized value is a fixed
    * chain of IEEE ops on cross-engine-identical doubles, restated
    * verbatim in the oracle. Degenerate groups (zero variance / zero
    * range) yield NULL identically in both engines.
    */
  def q55(spark: SparkSession, dir: String): DataFrame = {
    val x = col("o_totalprice").cast("decimal(18,2)")
    val sx  = sum(x).cast("double")
    val sx2 = sum((x * x).cast("decimal(38,4)")).cast("double")
    val n   = count(lit(1)).cast("double")
    val stats = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        (sx / n).as("mu"),
        sqrt((sx2 - sx * sx / n) / (n - lit(1.0))).as("sigma"),
        min(x).cast("double").as("lo"),
        max(x).cast("double").as("hi"))
    val v = col("o_totalprice").cast("decimal(18,2)").cast("double")
    Tables.orders(spark, dir)
      .join(broadcast(stats), "o_orderstatus")
      .select(
        col("o_orderkey"), col("o_orderstatus"),
        v.as("price"),
        when(col("sigma") > 0, (v - col("mu")) / col("sigma")).as("zscore"),
        when(col("hi") > col("lo"),
          (v - col("lo")) / (col("hi") - col("lo"))).as("minmax"))
      .orderBy("o_orderkey")
  }

  /** Sums → double via VARCHAR (D7); the per-row arithmetic mirrors the
    * Spark chain token-for-token on the same broadcast-joined doubles.
    */
  val q55Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |       CASE WHEN sigma > 0
      |            THEN (CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) - mu) / sigma END AS zscore,
      |       CASE WHEN hi > lo
      |            THEN (CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) - lo) / (hi - lo) END AS minmax
      |FROM orders
      |JOIN (
      |  SELECT o_orderstatus,
      |         sx / nd AS mu,
      |         sqrt((sx2 - sx * sx / nd) / (nd - 1.0)) AS sigma,
      |         lo, hi
      |  FROM (
      |    SELECT o_orderstatus, CAST(count(*) AS DOUBLE) AS nd,
      |           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
      |           CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sx2,
      |           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
      |           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
      |    FROM orders GROUP BY o_orderstatus)
      |) USING (o_orderstatus)
      |ORDER BY o_orderkey""".stripMargin

  /** q53_funnel: strict-order event funnel over `events` — per user, the
    * earliest view, the earliest click AFTER that view, and the earliest
    * purchase AFTER that click (the product-analytics staple). Three
    * chained min-aggregates, each a key-partitioned shuffle on the
    * high-cardinality user_id; stages 2/3 join back on the same key, so
    * the exchanges reuse one partitioning. Users stall at the stage they
    * never reach (NULL via left joins from the stage-1 population).
    */
  def q53(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = ev.join(v, "user_id")
      .filter(col("event_type") === "click" && col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val p = ev.join(c, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy("user_id")
  }

  val q53Sql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |  GROUP BY e.user_id)
      |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
      |FROM v
      |LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin

  /** q82_attribution: LAST-TOUCH ATTRIBUTION — every purchase event
    * credited to the same user's most recent click within the preceding
    * hour (ties on ts broken toward the larger event_id — the
    * lexicographic struct-max order, identical in both engines). The
    * sequence-analytics member the funnel family lacks: q53 checks stage
    * ORDER, q72 measures adjacency, q82 pins each conversion to the touch
    * that gets credit — the query behind CTR and campaign-attribution
    * reporting.
    *
    * Scale shape: ONE running window over the high-cardinality user key
    * (narrow partitions at any size — q72's argument) carries a 2-field
    * struct of the latest click seen so far; no self-join, no per-pair
    * fan-out, and the 1-hour cutoff is a codegen'd filter on exact µs.
    * gap_sec is exact integer µs division.
    */
  def q82(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("lc",
        max(when(col("event_type") === "click",
          struct(col("ts").as("cts"), col("event_id").as("cid")))).over(w))
      .filter(col("event_type") === "purchase" && col("lc").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("lc.cts")) <= 3600000000L)
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("ts").as("purchase_ts"),
        col("lc.cid").as("click_id"),
        col("lc.cts").as("click_ts"),
        expr("(unix_micros(ts) - unix_micros(lc.cts)) div 1000000")
          .cast("long").as("gap_sec"))
      .orderBy("purchase_id")
  }

  /** q82's restatement: the same running struct-max window (DuckDB
    * struct comparison is field-order lexicographic like Spark's) on the
    * same (ts, event_id) order, the same exact-µs cutoff.
    */
  val q82Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, ts, event_type FROM events
      |  WHERE event_type IN ('click', 'purchase')),
      |w AS (
      |  SELECT *,
      |         max(CASE WHEN event_type = 'click'
      |             THEN {'cts': ts, 'cid': event_id} END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc
      |  FROM e)
      |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
      |       lc.cid AS click_id, lc.cts AS click_ts,
      |       CAST((epoch_us(ts) - epoch_us(lc.cts)) // 1000000 AS BIGINT) AS gap_sec
      |FROM w
      |WHERE event_type = 'purchase' AND lc IS NOT NULL
      |  AND epoch_us(ts) - epoch_us(lc.cts) <= 3600000000
      |ORDER BY purchase_id""".stripMargin

  /** q54_retention: weekly cohort retention — users grouped by the ISO
    * week of their first event; `n_users` counts the distinct users of
    * cohort w active again k weeks later. Two shuffles on user_id (first
    * event + join back) and one on the tiny (cohort, offset) key; both
    * engines truncate weeks to ISO Monday, and the offset is exact
    * integer day arithmetic ÷ 7.
    */
  def q54(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    ev.join(first, "user_id")
      .select(col("user_id"), col("cohort"),
        date_trunc("week", col("ts")).as("wk"))
      .select(col("user_id"), col("cohort"),
        expr("datediff(wk, cohort) div 7").as("offset_weeks"))
      .groupBy("cohort", "offset_weeks")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "offset_weeks")
  }

  val q54Sql: String =
    """SELECT cohort, offset_weeks, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM (
      |  SELECT e.user_id, f.cohort,
      |         date_diff('day', CAST(f.cohort AS DATE), CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS offset_weeks
      |  FROM events e
      |  -- DuckDB's date_trunc('week') yields DATE; Spark's yields
      |  -- TIMESTAMP — pin the wider type explicitly
      |  JOIN (SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
      |        FROM events GROUP BY user_id) f
      |    ON e.user_id = f.user_id)
      |GROUP BY cohort, offset_weeks
      |ORDER BY cohort, offset_weeks""".stripMargin

  /** q62_gap_fill: time-series DENSIFICATION + carry-forward
    * interpolation — the timeseries-prep staple: the daily revenue
    * series per order status densified over each status's [min, max]
    * day span (`sequence` + explode builds the calendar), missing days
    * filled with the LAST OBSERVED revenue (`last(..., ignoreNulls)`
    * up to the current row) and flagged. The span's first day always
    * has data by construction (it IS a min over observed days), so the
    * carry never needs a leading default; the coalesce(0) is for the
    * degenerate single-row frame both engines treat identically.
    *
    * Scale shape: the only corpus-sized work is the (status, day) hash
    * aggregate — map-side combined, then everything downstream (span
    * agg, calendar explode, left join, carry-forward window) runs on
    * DAYS × STATUSES rows, pre-aggregated and bounded by the calendar,
    * never by fact volume (q34b's defense for the low-cardinality
    * window key). Revenue sums in exact decimal (D2) and exits as
    * double (D7).
    */
  def q62(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("status")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyCalendar(spark, dir)
      .select(col("status"), col("day"),
        coalesce(last(col("rev"), ignoreNulls = true).over(w),
          lit(0).cast("decimal(18,2)")).cast("double").as("rev_filled"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("rev").isNull.as("is_gap"))
      .orderBy("status", "day")
  }

  val q62Sql: String =
    """WITH daily AS (
      |  SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS day,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
      |         count(*) AS n_orders
      |  FROM orders GROUP BY 1, 2),
      |cal AS (
      |  SELECT status, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |           CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT status, min(day) AS d0, max(day) AS d1
      |        FROM daily GROUP BY status))
      |SELECT c.status, c.day,
      |       CAST(coalesce(last_value(d.rev IGNORE NULLS) OVER (
      |         PARTITION BY c.status ORDER BY c.day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS rev_filled,
      |       CAST(coalesce(d.n_orders, 0) AS BIGINT) AS n_orders,
      |       d.rev IS NULL AS is_gap
      |FROM cal c LEFT JOIN daily d ON c.status = d.status AND c.day = d.day
      |ORDER BY c.status, c.day""".stripMargin

  /** Shared base of q62/q63: the per-status daily revenue aggregate LEFT
    * JOINED onto its dense [min, max] day calendar — observed days carry
    * (rev, n_orders), gap days carry nulls. The (status, day) aggregate
    * is the only fact-sized stage.
    */
  private def dailyCalendar(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("status"),
        to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("status", "day")
      .agg(sum(col("p")).as("rev"), count(lit(1)).as("n_orders"))
    val cal = daily.groupBy("status")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("status"), explode(sequence(col("d0"), col("d1"))).as("day"))
    cal.join(daily, Seq("status", "day"), "left")
  }

  /** q63_interp_linear: LINEAR interpolation over the same densified
    * series — q62's lerp twin: a gap day takes
    * `prev + (next − prev) · (day − prev_day)/(next_day − prev_day)`
    * between its surrounding observations, an observed day keeps its
    * exact value (the coalesce also dodges the 0/0 a self-anchored lerp
    * would produce there). Both anchors always exist: span edges are
    * observed by construction (q62's argument), so a gap is strictly
    * interior. Same scale shape as q62 — the windows (one forward, one
    * backward, both over the pre-aggregated calendar rows) never see
    * fact volume. The "next observation" runs as a DESCENDING running
    * frame, not `CURRENT ROW .. UNBOUNDED FOLLOWING`: Spark evaluates an
    * unbounded-following frame by rescanning current→end for EVERY row —
    * O(n²) per partition — while both running frames are incremental
    * O(n) (measured 3× even on the 2.4k-day calendar). The lerp chain is
    * fixed-order IEEE double arithmetic on exact inputs (decimal revenue
    * → double, integer day offsets), so scores hash-match the oracle.
    */
  def q63(spark: SparkSession, dir: String): DataFrame = {
    val wPrev = Window.partitionBy(col("status")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("status")).orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsDay = when(col("rev").isNotNull, col("day_i"))
    val prevV = last(col("rev_d"), ignoreNulls = true).over(wPrev)
    val nextV = last(col("rev_d"), ignoreNulls = true).over(wNext)
    val prevD = last(obsDay, ignoreNulls = true).over(wPrev)
    val nextD = last(obsDay, ignoreNulls = true).over(wNext)
    dailyCalendar(spark, dir)
      .withColumn("rev_d", col("rev").cast("double"))
      .withColumn("day_i", datediff(col("day"), lit("1992-01-01").cast("date")))
      .select(col("status"), col("day"),
        coalesce(col("rev_d"),
          prevV + (nextV - prevV) *
            ((col("day_i") - prevD).cast("double") /
              (nextD - prevD).cast("double"))).as("rev_interp"),
        col("rev").isNull.as("is_gap"))
      .orderBy("status", "day")
  }

  val q63Sql: String =
    """WITH daily AS (
      |  SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS day,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1, 2),
      |cal AS (
      |  SELECT status, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |           CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT status, min(day) AS d0, max(day) AS d1
      |        FROM daily GROUP BY status)),
      |j AS (
      |  SELECT c.status, c.day, CAST(d.rev AS DOUBLE) AS rev_d,
      |         date_diff('day', DATE '1992-01-01', c.day) AS day_i,
      |         d.rev IS NULL AS is_gap
      |  FROM cal c LEFT JOIN daily d ON c.status = d.status AND c.day = d.day)
      |SELECT status, day,
      |       coalesce(rev_d,
      |         last_value(rev_d IGNORE NULLS) OVER wp
      |           + (first_value(rev_d IGNORE NULLS) OVER wn
      |              - last_value(rev_d IGNORE NULLS) OVER wp)
      |             * (CAST(day_i - last_value(CASE WHEN NOT is_gap THEN day_i END IGNORE NULLS) OVER wp AS DOUBLE)
      |                / CAST(first_value(CASE WHEN NOT is_gap THEN day_i END IGNORE NULLS) OVER wn
      |                       - last_value(CASE WHEN NOT is_gap THEN day_i END IGNORE NULLS) OVER wp AS DOUBLE))
      |       ) AS rev_interp,
      |       is_gap
      |FROM j
      |WINDOW wp AS (PARTITION BY status ORDER BY day
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |       wn AS (PARTITION BY status ORDER BY day
      |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |ORDER BY status, day""".stripMargin

  /** q66_rolling_zscore: rolling ANOMALY detection over the daily revenue
    * series — each observed (status, day) gets the mean of its last 7
    * observations, a z-score against that window, and an |z| > 2 outlier
    * flag. Completes the time-series family: densify (q62), interpolate
    * (q63), and now monitor.
    *
    * Cross-engine exactness, q30's moment discipline on a MOVING frame:
    * the rolling Σx and Σx² accumulate in exact decimal inside the ROWS
    * frame (associative ⇒ partitioning-independent), become doubles in
    * one correctly-rounded cast each (the oracle routes decimal→double
    * through VARCHAR — q30's discipline — because DuckDB's direct cast
    * double-rounds through int128/10^scale, observed one ulp off on the
    * rolling Σx²), and every double after that — mean,
    * variance `(sxx − sx·sx/cnt)/cnt`, the z lerp — is restated
    * operand-for-operand in the oracle. The `var > 0` branch is the same
    * IEEE comparison on identical doubles in both engines, so the
    * undefined-z rows (single-observation windows, constant windows —
    * where cancellation may land exactly on 0 or a signed epsilon) take
    * the same NULL branch everywhere.
    *
    * Scale shape: the (status, day) aggregate is the only fact-sized
    * stage (map-side partial); the rolling windows run over the
    * pre-aggregated days×statuses rows — q62's low-cardinality-window
    * defense — and a ROWS running frame is incremental, never a rescan.
    */
  def q66(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("status"),
        to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("status", "day")
      .agg(sum(col("p")).as("rev"))
    val w = Window.partitionBy(col("status")).orderBy(asc("day"))
      .rowsBetween(-6, Window.currentRow)
    val sx   = sum(col("rev")).over(w).cast("double")
    val sxx  = sum(col("rev") * col("rev")).over(w).cast("double")
    val cnt  = count(lit(1)).over(w).cast("double")
    val mean = sx / cnt
    val vr   = (sxx - sx * sx / cnt) / cnt
    val z    = (col("rev").cast("double") - mean) / sqrt(vr)
    daily.select(col("status"), col("day"),
        col("rev").cast("double").as("rev"),
        mean.as("mean7"),
        when(vr > 0, z).as("z"),
        when(vr > 0, abs(z) > lit(2.0)).otherwise(lit(false)).as("outlier"))
      .orderBy("status", "day")
  }

  val q66Sql: String =
    """WITH daily AS (
      |  SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS day,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1, 2),
      |m AS (
      |  SELECT status, day,
      |         CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS rev,
      |         CAST(CAST(sum(rev) OVER w AS VARCHAR) AS DOUBLE) AS sx,
      |         CAST(CAST(sum(CAST(rev * rev AS DECIMAL(38,4))) OVER w AS VARCHAR) AS DOUBLE) AS sxx,
      |         CAST(count(*) OVER w AS DOUBLE) AS cnt
      |  FROM daily
      |  WINDOW w AS (PARTITION BY status ORDER BY day
      |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT status, day, rev,
      |       sx / cnt AS mean7,
      |       CASE WHEN (sxx - sx * sx / cnt) / cnt > 0
      |            THEN (rev - sx / cnt) / sqrt((sxx - sx * sx / cnt) / cnt)
      |            END AS z,
      |       CASE WHEN (sxx - sx * sx / cnt) / cnt > 0
      |            THEN abs((rev - sx / cnt) / sqrt((sxx - sx * sx / cnt) / cnt)) > 2.0
      |            ELSE FALSE END AS outlier
      |FROM m
      |ORDER BY status, day""".stripMargin

  /** q72_transitions: per-user event-SEQUENCE statistics — the Markov
    * transition matrix (from_type, to_type, n, p) over each user's
    * time-ordered event stream, the "what follows what" table behind
    * session modeling, next-event prediction features, and funnel
    * hypothesis generation (q53 checks ONE ordained order; q72 measures
    * all of them).
    *
    * Scale shape: the lead() window partitions on user_id — the
    * HIGH-cardinality key, so partitions stay narrow at any corpus size —
    * and everything after is a map-side-combinable aggregate to ≤ |types|²
    * rows; the per-from-type normalization window runs on those tiny
    * aggregate rows, never on events. Cross-engine exactness: event ts
    * are exact microseconds with no (user, ts) collisions (measured at
    * sf0.1), so the (ts, event_id) order is identical in both engines
    * despite DuckDB keeping ns; p = n/tot is one IEEE divide of exact
    * longs.
    */
  def q72(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(asc("ts"), asc("event_id"))
    val wFrom = Window.partitionBy(col("from_type"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") / sum(col("n")).over(wFrom).cast("double"))
      .orderBy("from_type", "to_type")
  }

  val q72Sql: String =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts ASC, event_id ASC) AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
      |       CAST(n AS DOUBLE)
      |         / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      |FROM c
      |ORDER BY from_type, to_type""".stripMargin

  /** q76_cooccur: event-type CO-OCCURRENCE with conditional
    * probabilities — for every unordered type pair, how many users did
    * both, and P(b | did a) / P(a | did b). The SET-association
    * complement of q72's sequential transitions (q72 asks "what follows
    * what", q76 asks "what goes with what" regardless of order) — the
    * basket-analysis / feature-correlation table.
    *
    * Scale shape: the corpus collapses map-side to DISTINCT
    * (user, type) — at most |types| rows per user — so the self-join on
    * the high-cardinality user key fans out ≤ |types|²/2 per user, never
    * events²; co-occurrence counts aggregate map-side to ≤ |types)²
    * rows, and the per-type user counts attach by BROADCAST equi-joins
    * (5-row dim), no scalar cross join. Probabilities are single IEEE
    * divides of exact longs.
    */
  def q76(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val perType = ut.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
    val a = ut.select(col("user_id"), col("event_type").as("type_a"))
    val b = ut.select(col("user_id"), col("event_type").as("type_b"))
    a.join(b, Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("nu").as("n_a"))), Seq("type_a"))
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("nu").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_both"),
        (col("n_both").cast("double") / col("n_a").cast("double"))
          .as("p_b_given_a"),
        (col("n_both").cast("double") / col("n_b").cast("double"))
          .as("p_a_given_b"))
      .orderBy("type_a", "type_b")
  }

  val q76Sql: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |pt AS (SELECT event_type, count(*) AS nu FROM ut GROUP BY 1),
      |co AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         count(*) AS n_both
      |  FROM ut a JOIN ut b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
      |       CAST(n_both AS DOUBLE) / CAST(pa.nu AS DOUBLE) AS p_b_given_a,
      |       CAST(n_both AS DOUBLE) / CAST(pb.nu AS DOUBLE) AS p_a_given_b
      |FROM co JOIN pt pa ON pa.event_type = co.type_a
      |        JOIN pt pb ON pb.event_type = co.type_b
      |ORDER BY type_a, type_b""".stripMargin

  /** Suffix cumulative max: appends `out` = max(`value`) over all rows
    * whose `order` column is ≥ the current row's (peers INCLUDED — the
    * RANGE-frame semantics), without a global single-partition window.
    *
    * Decomposition (the q33c/q52 carry-in idiom): rows bucket by an
    * equi-width split of `order` (one bounded 1-row min/max probe — index
    * metadata, not corpus data); within a bucket a RANGE window partitioned
    * on the bucket computes the local suffix max; across buckets the
    * per-bucket maxima (≤ `nBuckets` rows) take a tiny prefix scan and
    * broadcast back as each bucket's carry-in. Bucketing by value keeps
    * order-ties in one bucket, so "higher bucket ⇒ strictly greater
    * `order`" holds and local ∪ carry is exactly the `order` ≥ current
    * suffix. O(n log(n/B)) in-bucket sorts vs the single-reducer global
    * window — the same reason q52 scans, not sorts. The split is
    * EQUI-WIDTH on the value range, so it is balanced only for roughly
    * uniform axes; a corpus concentrated in a narrow band lands in one
    * bucket and the local sort degrades toward the global one. The
    * skew-robust upgrade is `equiDepth = true`: approxQuantile cut points
    * instead of min/max width — same carry algebra, since only "higher
    * bucket ⇒ strictly greater `order`" is load-bearing (AnalyticsSpec
    * pins both modes equal on a pathologically skewed axis).
    *
    * PRECONDITION: `order` must be non-NULL and finite. A NULL order
    * yields a NULL bucket which the inner equi-join on __sb would
    * silently DROP, and NaN casts to bucket 0 while sorting highest. The
    * no-bounds path fails loudly on NULLs (the probe counts them);
    * callers passing precomputed `bounds` (skylineOf does, and checks
    * there) own the check.
    */
  private[graft] def suffixCumMax(df: DataFrame, order: String,
      value: String, out: String, nBuckets: Int = 64,
      bounds: Option[(Double, Double)] = None,
      groupCols: Seq[String] = Nil,
      equiDepth: Boolean = false,
      cuts: Option[Array[Double]] = None): DataFrame = {
    // bounds may be precomputed by the caller (skylineOf probes both axes
    // in ONE pass over the base relation — probing here on a derived df
    // would re-execute its whole upstream dataflow just to read min/max).
    // With groupCols the suffix is per group; GLOBAL bounds stay valid for
    // bucketing (the bucket is monotone in `order` within every group),
    // only the carry becomes per-(group, bucket).
    val mm = bounds.getOrElse {
      // count(*) vs count(order) piggybacks the NULL check on the probe
      // we already pay for — a NULL-bearing caller fails loudly here
      // instead of losing rows in the __sb equi-join below.
      val r = df.agg(min(col(order)).cast("double"),
        max(col(order)).cast("double"),
        count(lit(1)), count(col(order))).head()
      require(r.getLong(2) == r.getLong(3),
        s"suffixCumMax: order column '$order' has " +
          s"${r.getLong(2) - r.getLong(3)} NULL rows (precondition)")
      if (r.isNullAt(0)) (0.0, 0.0) else (r.getDouble(0), r.getDouble(1))
    }
    val grp = groupCols.map(col)
    if (mm._1 == mm._2) {
      // Empty input or a constant order column: one bucket, local =
      // global. NOTE this degenerate branch runs ONE unpartitioned (per
      // group) RANGE window — a pathological constant-axis corpus at
      // scale would serialize on a single reducer here. Fine for real
      // axes (a constant axis means every row ties, so there is no order
      // to decompose on); a caller feeding constant columns at corpus
      // scale should pre-aggregate instead.
      return df.withColumn(out, max(col(value)).over(
        Window.partitionBy(grp :+ lit(0): _*).orderBy(col(order).desc)
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
    }
    val (mn, mx) = mm
    val width = (mx - mn) / nBuckets
    // Equi-depth mode (the skew-robust upgrade the header documents): the
    // bucket key becomes "number of quantile cut points ≤ order" — an
    // O(nBuckets) codegen'd fold per row against a ≤64-double literal.
    // Ties still share a bucket (>= against fixed cuts is monotone and
    // tie-stable) so the carry algebra is untouched; duplicate cuts from
    // heavy ties dedup away (fewer, fuller buckets — correct, just less
    // parallel, degrading toward the degenerate branch as the axis
    // approaches constant). Costs one approxQuantile pass over the input,
    // which re-executes the upstream dataflow like the bounds probe would
    // — same caller caveat.
    val bk =
      if (!equiDepth)
        least(floor((col(order).cast("double") - lit(mn)) / lit(width)),
          lit(nBuckets - 1)).cast("int")
      else {
        // callers composing several passes (skylineOf) precompute `cuts`
        // on the BASE relation — probing here would re-execute the whole
        // upstream dataflow per pass, the same reason `bounds` exists
        // nBuckets < 2 means no interior cut points: skip the quantile
        // probe (approxQuantile rejects an empty probability list) and
        // let the empty cut set send every row to bucket 0
        val cs = cuts.getOrElse(
          if (nBuckets < 2) Array.empty[Double]
          else df.select(col(order).cast("double").as("__q"))
            .stat.approxQuantile("__q",
              (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.001))
          .distinct.sorted
        // native binary-search kernel: the HOF aggregate fold evaluates
        // its lambda interpreted (HOFs never whole-stage-codegen), which
        // put a 63-compare interpreted scan on every row of every pass —
        // cuts_bucket is ⌈log₂ 64⌉ compares inside codegen (ExtSpec pins
        // value parity with the fold, NaN/tie cases included)
        graft.ext.GraftFunctions.ensureCutsBucket(df.sparkSession)
        call_function("cuts_bucket",
          col(order).cast("double"), typedLit(cs))
      }
    val bucketed = df.withColumn("__sb", bk)
    val localW = Window.partitionBy(grp :+ col("__sb"): _*)
      .orderBy(col(order).desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // per-(group, bucket) maxima -> carry-in from strictly higher buckets
    // of the SAME group; the window runs over <= |groups|·nBuckets
    // aggregate rows (bounded by construction)
    val carry = bucketed.groupBy(grp :+ col("__sb"): _*)
      .agg(max(col(value)).as("__bm"))
      .select((grp :+ col("__sb")) :+ max(col("__bm")).over(
        Window.partitionBy(grp: _*).orderBy(col("__sb").desc)
          .rowsBetween(Window.unboundedPreceding, -1)).as("__carry"): _*)
    bucketed
      .join(broadcast(carry), groupCols :+ "__sb")
      .withColumn(out, greatest(max(col(value)).over(localW), col("__carry")))
      .drop("__sb", "__carry")
  }

  /** q90_skyline: the PARETO FRONTIER of lineitem on (price ↑, qty ↑) —
    * rows no other row strictly dominates (≥ on both axes, > on at least
    * one). The preference/dominance operator class: "best tradeoff"
    * curation (longest-AND-highest-quality documents, cheapest-AND-freshest
    * suppliers) that top-k on any single score cannot express, and that
    * the naive formulation (NOT EXISTS over all pairs) makes O(n²).
    *
    * Exact reduction to two suffix-max passes: a row is dominated iff
    * max(qty | price' ≥ price) > qty  OR  max(price | qty' ≥ qty) > price
    * — either witness is itself a strict dominator (the ≥-suffix includes
    * the tie cases a one-axis sweep mishandles), and any dominator implies
    * one of the two. Duplicates of a frontier point all survive, matching
    * the NOT-EXISTS semantics (spec-pinned against literal brute force).
    *
    * Scale shape: two [[suffixCumMax]] passes — range-bucketed local RANGE
    * windows plus a ≤64-row carry prefix — so the plan is two bucket-local
    * sorts and two broadcast stitches; no global window, no self-join, no
    * all-pairs anywhere. The oracle restates the frontier with DuckDB
    * global windows (a different evaluation path than the bucketed plan).
    */
  /** The skyline core over any relation: keeps exactly the rows not
    * strictly dominated on (`x` ↑, `y` ↑); all other columns pass through.
    */
  private[graft] def skylineOf(df: DataFrame, x: String, y: String,
      groupCols: Seq[String] = Nil,
      equiDepth: Boolean = false): DataFrame = {
    // both axes' bucket bounds from ONE bounded probe of the base
    // relation; the same probe counts NULLs on both axes so a NULL-bearing
    // caller fails loudly (suffixCumMax precondition) instead of the
    // __sb equi-join silently dropping rows.
    val r = df.agg(min(col(x)).cast("double"), max(col(x)).cast("double"),
      min(col(y)).cast("double"), max(col(y)).cast("double"),
      count(lit(1)), count(col(x)), count(col(y))).head()
    require(r.getLong(4) == r.getLong(5) && r.getLong(4) == r.getLong(6),
      s"skylineOf: axis columns '$x'/'$y' contain NULLs " +
        s"(${r.getLong(4) - r.getLong(5)}/${r.getLong(4) - r.getLong(6)} rows)")
    def b(i: Int) = if (r.isNullAt(i)) (0.0, 0.0)
      else (r.getDouble(i), r.getDouble(i + 1))
    // equi-depth: both axes' cut points from ONE approxQuantile pass over
    // the BASE relation — left inside suffixCumMax, the second pass's
    // probe would re-execute the first pass's whole plan (measured 3.9×
    // q90's cost at sf1 before this hoist)
    val (cutsX, cutsY) =
      if (!equiDepth) (None, None)
      else {
        val qs = df.select(col(x).cast("double").as("__qx"),
            col(y).cast("double").as("__qy"))
          .stat.approxQuantile(Array("__qx", "__qy"),
            (1 until 64).map(_.toDouble / 64).toArray, 0.001)
        (Some(qs(0)), Some(qs(1)))
      }
    suffixCumMax(
        suffixCumMax(df, order = x, value = y, out = "__my",
          bounds = Some(b(0)), groupCols = groupCols,
          equiDepth = equiDepth, cuts = cutsX),
        order = y, value = x, out = "__mx",
        bounds = Some(b(2)), groupCols = groupCols,
        equiDepth = equiDepth, cuts = cutsY)
      .where(col("__my") <= col(y) && col("__mx") <= col(x))
      .drop("__my", "__mx")
  }

  def q90(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice").as("price"), col("l_quantity").as("qty"))
    skylineOf(t, x = "price", y = "qty")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q90b_skyline_grouped: q90's frontier PER GROUP (l_returnflag) — the
    * "best tradeoff per category" shape a curation pipeline actually runs
    * (longest-AND-cleanest documents per language, cheapest-AND-freshest
    * per region). Same two-pass reduction with the group key prepended to
    * every window partition; global bucket bounds stay valid per group
    * (the bucket is monotone in the axis within any group), so the only
    * structural change is the carry becoming per-(group, bucket) —
    * |groups|·64 rows, still bounded, still a broadcast stitch. Group
    * skew is absorbed the same way as ungrouped q90: a hot group's rows
    * still spread over its 64 range buckets.
    */
  def q90b(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.lineitem(spark, dir).select(
      col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice").as("price"), col("l_quantity").as("qty"))
    skylineOf(t, x = "price", y = "qty", groupCols = Seq("l_returnflag"))
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
  }

  /** q90c_skyline_equidepth: q90's frontier through the EQUI-DEPTH bucket
    * split — the skew-robust form of the suffix-max decomposition
    * (approxQuantile cut points instead of equi-width ranges, so a corpus
    * concentrated in a narrow value band still spreads across all
    * buckets instead of collapsing into one local sort). Identical
    * semantics and oracle to q90 — the q41/q41b precedent of driver-gating
    * a second physical strategy for the same operator, so the equi-depth
    * path is hash-checked against DuckDB rather than only spec-pinned.
    * Costs two approxQuantile passes (one per axis) that re-execute the
    * upstream dataflow; a production caller on a skewed 100 TB corpus
    * caches the input or feeds precomputed cuts — the price buys local
    * sorts that stay balanced under ANY axis distribution.
    */
  def q90c(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice").as("price"), col("l_quantity").as("qty"))
    skylineOf(t, x = "price", y = "qty", equiDepth = true)
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q90bSql: String =
    """WITH t AS (
      |  SELECT l_returnflag, l_orderkey, l_linenumber,
      |         CAST(l_extendedprice AS DOUBLE) AS price,
      |         CAST(l_quantity AS DOUBLE) AS qty
      |  FROM lineitem),
      |w AS (
      |  SELECT *,
      |         max(qty) OVER (PARTITION BY l_returnflag ORDER BY price DESC
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS my,
      |         max(price) OVER (PARTITION BY l_returnflag ORDER BY qty DESC
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx
      |  FROM t)
      |SELECT l_returnflag, l_orderkey, l_linenumber, price, qty
      |FROM w WHERE my <= qty AND mx <= price
      |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin

  val q90Sql: String =
    """WITH t AS (
      |  SELECT l_orderkey, l_linenumber,
      |         CAST(l_extendedprice AS DOUBLE) AS price,
      |         CAST(l_quantity AS DOUBLE) AS qty
      |  FROM lineitem),
      |w AS (
      |  SELECT *,
      |         max(qty) OVER (ORDER BY price DESC
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS my,
      |         max(price) OVER (ORDER BY qty DESC
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx
      |  FROM t)
      |SELECT l_orderkey, l_linenumber, price, qty
      |FROM w WHERE my <= qty AND mx <= price
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
}
