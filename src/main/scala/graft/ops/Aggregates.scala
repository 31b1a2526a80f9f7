package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Aggregation + window operator set (SURVEY.md §2.3 q08–q12, q19, q20).
  *
  * All money/measure aggregation follows determinism rule D2: cast doubles to
  * DECIMAL before any sum (exact, order-independent), cast the final value to
  * DOUBLE. Averages are computed as sum/count explicitly, because DuckDB's
  * `avg(DECIMAL)` returns DOUBLE while Spark's stays DECIMAL.
  *
  * Scale notes (100 TB):
  *  - q08/q09: hash aggregates with map-side partial aggregation; the shuffle
  *    carries one row per group per mapper, not per input row.
  *  - exact count-distinct (q09) shuffles expanded keys; at 100 TB prefer
  *    `approx_count_distinct` (see XQueries) unless exactness is required.
  *  - q11/q12/q20: window functions shuffle once on the partition key and
  *    sort within partitions; skewed users/customers are handled by AQE.
  *  - q19: tumbling window is a plain groupBy on a derived bucket column —
  *    no special operator needed in batch; streaming variant in graft.streaming.
  */
object Aggregates {

  /** q08_agg_group: TPC-H Q1-shaped hash aggregate. */
  def q08(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val qty   = col("l_quantity").cast("decimal(18,2)")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc  = col("l_discount").cast("decimal(18,2)")
    val tax   = col("l_tax").cast("decimal(18,2)")
    val one   = lit(1).cast("decimal(18,2)")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (one - disc)).cast("double").as("sum_disc_price"),
        sum(price * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
        (sum(qty).cast("double") / count(lit(1)).cast("double")).as("avg_qty"),
        (sum(price).cast("double") / count(lit(1)).cast("double")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q08Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
      |       CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q09_agg_distinct: exact count-distinct per group. */
  def q09(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  val q09Sql: String =
    """SELECT o_orderstatus,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
      |       CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** q10_rollup: rollup with grouping indicators. NULLS FIRST is pinned
    * explicitly — Spark's ASC default, DuckDB's default is NULLS LAST.
    */
  def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(
        asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"),
        asc("g_status"), asc("g_priority"))

  val q10Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
      |         g_status ASC, g_priority ASC""".stripMargin

  /** q10b_cube: full cube over the same two dimensions — all four grouping
    * sets ((s,p),(s),(p),()) where rollup produces three; the remaining
    * cross-tab margin ((p) alone) is what a pivot-table consumer reads.
    * Same determinism contract as q10 (explicit NULLS FIRST, grouping ids
    * disambiguate real NULLs from subtotal rows).
    */
  def q10Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(
        asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"),
        asc("g_status"), asc("g_priority"))

  val q10CubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
      |         g_status ASC, g_priority ASC""".stripMargin

  /** q10c_grouping_sets: explicit GROUPING SETS — the general form rollup
    * and cube are shorthands of, with a set list neither shorthand can
    * express (the two one-dimension margins plus the grand total, no
    * finest-grain set). Uses the native Dataset.groupingSets operator.
    */
  def q10GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(
        asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"),
        asc("g_status"), asc("g_priority"))

  val q10GroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
      |         g_status ASC, g_priority ASC""".stripMargin

  /** q11_window_rank: latest order per customer (keep-first dedup pattern —
    * the incremental/dedup primitive behind R14/R15).
    */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .orderBy("o_custkey")
  }

  val q11Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** q37_window_ranks: the rank family — rank / dense_rank / percent_rank /
    * cume_dist over a TIE-RICH ordering (order month within priority), the
    * semantics q11's row_number cannot show (row_number breaks ties
    * arbitrarily; these are functions of the ORDER KEY VALUE alone, so
    * every peer row gets the same deterministic result regardless of
    * physical row order — which is also why ntile is excluded: it splits
    * peer groups by physical position). percent_rank = (rank−1)/(N−1) and
    * cume_dist = peers≤/N are single IEEE divisions of exact counts ⇒
    * bit-identical cross-engine (SQL-standard definitions in both).
    */
  def q37(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(asc("order_mo"))
    Tables.orders(spark, dir)
      .withColumn("order_mo", month(col("o_orderdate")).cast("int"))
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("order_mo"),
        rank().over(w).cast("int").as("rnk"),
        dense_rank().over(w).cast("int").as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"))
      .orderBy("o_orderkey")
  }

  /** q37b_ranks_hist: q37's rank family through the scale-safe histogram
    * plan (VERDICT r3 #1). q37's direct window partitions on o_orderpriority
    * — 5 distinct values — so five reducers sort the whole fact table
    * regardless of cluster size: correct at sf0.1, a serialization point at
    * 100×. Because rank/dense_rank/percent_rank/cume_dist over a tie-rich
    * ordering are functions of the ORDER-KEY VALUE alone (see q37's note),
    * they are all derivable from the (priority, month) count histogram:
    *
    *   1. one shuffle on the COMPOSITE (priority, month) key with map-side
    *      partial aggregation — full parallelism, ≤ 5×12 rows out;
    *   2. rank math over that ≤60-row histogram (rank = preceding-count+1,
    *      dense_rank = month index, percent_rank/cume_dist = one IEEE
    *      division of exact counts, identical to the window definitions) —
    *      the only priority-partitioned window in the plan runs on
    *      pre-aggregated data, so the 5-value key is harmless;
    *   3. broadcast the 60-row rank table back onto the fact rows — the
    *      fact side never shuffles and never sorts.
    *
    * Shares q37's oracle, so the plan equivalence is driver-verified at
    * every SF (the q20b/q33b precedent); ScaleSpec pins that no exchange
    * hash-partitions raw fact rows on the bare priority key.
    */
  def q37Hist(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .withColumn("order_mo", month(col("o_orderdate")).cast("int"))
    val hist = base.groupBy(col("o_orderpriority"), col("order_mo"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(col("o_orderpriority")).orderBy(asc("order_mo"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("o_orderpriority"))
    val ranks = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .select(
        col("o_orderpriority"), col("order_mo"),
        (col("cum") - col("c") + 1).cast("int").as("rnk"),
        row_number().over(wOrd).cast("int").as("drnk"),
        // SQL-standard (rank−1)/(N−1) with the single-row-partition guard
        // (0/0 would be NaN; the window function defines it as 0)
        when(col("n") === 1, lit(0.0))
          .otherwise((col("cum") - col("c")).cast("double") /
            (col("n") - 1).cast("double")).as("prnk"),
        (col("cum").cast("double") / col("n").cast("double")).as("cdist"))
    base.select("o_orderkey", "o_orderpriority", "order_mo")
      .join(broadcast(ranks), Seq("o_orderpriority", "order_mo"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("order_mo"),
        col("rnk"), col("drnk"), col("prnk"), col("cdist"))
      .orderBy("o_orderkey")
  }

  val q37Sql: String =
    """SELECT o_orderkey, o_orderpriority, order_mo,
      |       CAST(rank()         OVER w AS INTEGER) AS rnk,
      |       CAST(dense_rank()   OVER w AS INTEGER) AS drnk,
      |       percent_rank() OVER w AS prnk,
      |       cume_dist()    OVER w AS cdist
      |FROM (SELECT o_orderkey, o_orderpriority,
      |             CAST(month(o_orderdate) AS INTEGER) AS order_mo
      |      FROM orders)
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY order_mo ASC)
      |ORDER BY o_orderkey""".stripMargin

  /** q38_window_nav: the navigation window family — lead / first_value /
    * nth_value / ntile — over a UNIQUE per-partition ordering (orderdate
    * with an orderkey tiebreak), which is what makes every one of them
    * deterministic: lag is exercised by q20, and ntile is legitimately
    * excluded from the tie-rich q37 (it splits peer groups by physical
    * position) but is well-defined here where no peers exist. Partitioning
    * is by o_custkey — high cardinality, so the window parallelizes at any
    * scale (the q34/q37 low-cardinality concern doesn't apply).
    * first_value/nth_value run under the default standard frame (RANGE
    * UNBOUNDED PRECEDING..CURRENT ROW, identical in both engines); lead is
    * frame-less by definition; values are picked, never computed, so the
    * double column round-trips bit-identically.
    */
  def q38(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        lead(col("o_totalprice"), 1).over(w).as("next_spend"),
        first(col("o_orderkey")).over(w).as("first_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
        ntile(4).over(w).cast("int").as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q38Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |       lead(o_orderkey, 1) OVER w AS next_key,
      |       lead(o_totalprice, 1) OVER w AS next_spend,
      |       first_value(o_orderkey) OVER w AS first_key,
      |       nth_value(o_orderkey, 2) OVER w AS second_key,
      |       CAST(ntile(4) OVER w AS INTEGER) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q42_session_window: gap sessionization through Spark's NATIVE
    * `session_window` operator — the declarative form of q20's manual
    * lag + cumulative-sum plan (and the shared batch/streaming session
    * primitive: the same expression drives a streaming query with state).
    * The window START is the session's first event time (exact min), so
    * it cross-checks against the q20-style oracle; the window END is
    * last-event + gap by definition — derived, not compared, as
    * `max(ts) + interval` on both sides. One shuffle on user_id, then
    * Spark's session merge; counts/sums are exact.
    */
  def q42(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** Oracle restates gap sessions the q20 way (lag + running sum), then
    * aggregates per session — the cross-engine-checkable definition the
    * native operator must reproduce.
    */
  val q42Sql: String =
    """SELECT user_id,
      |       min(ts) AS session_start,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM (
      |  SELECT user_id, ts, value,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM (
      |    SELECT user_id, event_id, ts, value,
      |           CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 30 * 60 * 1000000
      |                THEN 1 ELSE 0 END AS new_session
      |    FROM (
      |      SELECT user_id, event_id, ts, value,
      |             lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
      |      FROM events)))
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_start""".stripMargin

  /** q45_window_range_frame: 30-day trailing spend per customer — a
    * VALUE-range frame (`rangeBetween`), the window surface q12's ROWS
    * frame cannot express: the frame is defined by the ORDER-KEY DISTANCE
    * (orders within 29 days), not a row count, so same-day peer rows share
    * one frame and the result is tie-deterministic by construction. The
    * range key is days-since-epoch (Spark's rangeBetween needs a numeric
    * key; 1 unit = 1 day ⇔ the oracle's RANGE BETWEEN INTERVAL 29 DAY).
    * One shuffle on the high-cardinality o_custkey, sums decimal-exact.
    */
  def q45(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit(java.sql.Date.valueOf("1992-01-01"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"))
      .rangeBetween(-29, 0)
    Tables.orders(spark, dir)
      .withColumn("day", datediff(to_date(col("o_orderdate")), epoch))
      .select(
        col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_day"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("spend_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q45Sql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_day,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d,
      |       CAST(count(*) OVER w AS BIGINT) AS n_orders_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
      |             RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q12_window_frame: running per-customer spend with an explicit row frame. */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_spend"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val q12Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** q19_window_tumbling: hourly tumbling-window aggregate over events —
    * batch analog of the streaming window (R24's hourly cadence). The window
    * is a derived bucket column, so this is a plain hash aggregate.
    */
  def q19(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour_start", "event_type")

  val q19Sql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_start, event_type""".stripMargin

  /** q81_window_hopping: HOPPING windows — 1-hour windows sliding every
    * 15 minutes, each event landing in exactly size/slide = 4 overlapping
    * windows; per (window_start, event_type): count, exact-decimal value
    * sum, distinct users. Completes the window family's missing member:
    * q19 tumbles (one window per event), q20/q42 sessionize (data-driven
    * bounds), q81 hops (fixed overlapping bounds) — the smoothing an
    * alerting dashboard reads when hourly tumbling is too coarse and
    * minutely too noisy.
    *
    * Scale shape: Spark plans `window(size, slide)` as an Expand (4
    * window-tagged copies per event) ABOVE the scan but BELOW a partial
    * aggregate, so the 4× fan-out collapses map-side to
    * ≤ 4·hops·types rows before any exchange — the shuffle carries
    * aggregate rows, never events. countDistinct adds the standard
    * two-phase expansion; value sums are exact decimal (D7), one output
    * cast to double.
    */
  def q81(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour", "15 minutes")
          .getField("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("window_start", "event_type")

  /** q81's restatement: the k = 0..3 hop expansion spelled out on exact
    * microsecond epochs (`make_timestamp` keeps the window starts naive —
    * DuckDB's `to_timestamp` would yield TIMESTAMPTZ and break the naive
    * compare), aligned to slide multiples exactly like Spark's window().
    */
  val q81Sql: String =
    """SELECT make_timestamp((epoch_us(ts) // 900000000 - k.k) * 900000000)
      |         AS window_start,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** q84_time_rollup: the TIME-HIERARCHY rollup — (day → hour →
    * event_type) subtotals over events in one pass, the temporal member
    * of the grouping-sets family (q10 rolls up CATEGORICAL dims; every
    * ops dashboard's "daily total with hourly drill-down" is this
    * query). Grouping ids disambiguate subtotal rows from real NULLs,
    * q10's discipline.
    *
    * Scale shape: rollup plans one Expand (4 grouping sets) below a
    * partial aggregate — subtotal rows collapse map-side exactly like
    * q81's hop fan-out; the hierarchy day ⊃ hour means the expansion
    * never multiplies distinct keys beyond ~4·hours·types.
    */
  def q84(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        date_trunc("day", col("ts")).as("day"),
        date_trunc("hour", col("ts")).as("hr"),
        col("event_type"), col("value"))
      .rollup(col("day"), col("hr"), col("event_type"))
      .agg(
        grouping(col("day")).cast("int").as("g_day"),
        grouping(col("hr")).cast("int").as("g_hr"),
        grouping(col("event_type")).cast("int").as("g_type"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(
        asc_nulls_first("day"), asc_nulls_first("hr"),
        asc_nulls_first("event_type"),
        asc("g_day"), asc("g_hr"), asc("g_type"))

  /** DuckDB's date_trunc('day', ts) yields a DATE where Spark keeps a
    * TIMESTAMP — the oracle casts the day level back so both engines
    * compare naive timestamps (GROUPING references the identical cast
    * expression, as ROLLUP requires).
    */
  val q84Sql: String =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |       date_trunc('hour', ts) AS hr,
      |       event_type,
      |       CAST(GROUPING(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS INTEGER) AS g_day,
      |       CAST(GROUPING(date_trunc('hour', ts)) AS INTEGER) AS g_hr,
      |       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS TIMESTAMP),
      |                 date_trunc('hour', ts), event_type)
      |ORDER BY day ASC NULLS FIRST, hr ASC NULLS FIRST,
      |         event_type ASC NULLS FIRST, g_day ASC, g_hr ASC, g_type ASC""".stripMargin

  /** q20_sessionize: gap-based sessionization (30-min gap) via lag + running
    * sum — the batch form of a streaming session window. Gap comparison runs
    * on microsecond epochs, identical in both engines.
    */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(asc("ts"), asc("event_id"))
    val sessionFrame = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 30L * 60 * 1000000
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(sessionFrame))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .orderBy("user_id", "session_seq")
  }

  /** Skew-safe sessionization: same output as [[q20]], computed with the
    * salt-then-merge pattern (SCALE.md; the as-of join's two-variant
    * precedent). [[q20]] windows over raw `user_id`, so one power-law user
    * (a bot with a billion events) serializes onto a single reducer. Here:
    *
    *  1. events window over (user_id, time-bucket) — the bucket is the
    *     salt, so a heavy user's history spreads across reducers; partial
    *     sessions are aggregated per bucket (map-side-sized rows out);
    *  2. per-bucket session SUMMARIES (start, end, count, value — not
    *     events) merge across bucket boundaries with the same gap rule,
    *     then renumber. Chain-merges collapse under the running sum
    *     because buckets partition time: partials sorted by start are
    *     disjoint, so lag(end) is the true previous end.
    *
    * Pass 2 still partitions by raw user, but over per-bucket session
    * summaries — volume reduced from |events| to ≈|sessions touching
    * bucket edges|; the degenerate every-event-its-own-session user
    * reduces nothing, which is inherent to exact sessionization.
    * Equivalence with [[q20]] is pinned in ScaleSpec at a bucket width
    * chosen to force boundary merges.
    */
  def q20Salted(
      spark: SparkSession,
      dir: String,
      bucketUs: Long = 6L * 3600 * 1000000): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val byUserBucket = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(asc("ts"), asc("event_id"))
    val frame1 = byUserBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val partials = Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("bucket", floor(col("us") / bucketUs))
      .withColumn("prev_us", lag(col("us"), 1).over(byUserBucket))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("part_seq", sum(col("new_session")).over(frame1))
      .groupBy(col("user_id"), col("bucket"), col("part_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("value_d"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(asc("session_start"), asc("session_end"))
    val frame2 = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    partials
      .withColumn("prev_end", lag(unix_micros(col("session_end")), 1).over(byUser))
      .withColumn("new_merge",
        when(col("prev_end").isNull ||
          unix_micros(col("session_start")) - col("prev_end") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_merge")).over(frame2))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("session_start")).as("session_start"),
        max(col("session_end")).as("session_end"),
        sum(col("n_events")).as("n_events"),
        sum(col("value_d")).cast("double").as("session_value"))
      .orderBy("user_id", "session_seq")
  }

  val q20Sql: String =
    """SELECT user_id, session_seq,
      |       min(ts) AS session_start,
      |       max(ts) AS session_end,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM (
      |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM (
      |    SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |                   THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_session
      |    FROM (
      |      SELECT *, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
      |      FROM events)))
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin
}
