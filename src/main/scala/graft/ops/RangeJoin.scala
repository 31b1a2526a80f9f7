package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins — the other join class, beside as-of
  * (AsOf.scala), that Spark has no native operator for. A naive
  * `p BETWEEN lo AND hi` join plans as BroadcastNestedLoopJoin (every point
  * evaluated against every interval) and degrades to a cartesian when the
  * interval side outgrows the broadcast threshold — the classic 100 TB
  * scale-killer.
  *
  * The scale-safe plan is BUCKET DECOMPOSITION: pick a bucket width, expand
  * each interval to the buckets it covers (explode — interval side grows by
  * its span/width, NOT by the point count), map each point to its single
  * bucket, equi-join on the bucket key (hash or sort-merge — Catalyst's
  * choice), and keep the exact BETWEEN as the residual filter. Each point
  * has exactly one bucket, so the join emits no duplicate pairs and needs
  * no dedup. Cost: one bounded shuffle on bucket; skew only if one bucket
  * holds a disproportionate share of points — pick the width so buckets
  * are fine relative to the data spread (here: month buckets over 7 years
  * of uniform dates).
  *
  * When the interval side is tiny (a handful of tiers or windows),
  * broadcasting the BETWEEN join IS the right plan — this operator is for
  * the many-intervals regime where nested-loop evaluation or a cartesian
  * would appear.
  */
object RangeJoin {

  /** Generic date point-in-interval join with bucket decomposition.
    * `points` rows join every `intervals` row whose [loCol, hiCol] (both
    * inclusive, DATE columns) contains their `pointCol` DATE. Output keeps
    * all columns of both inputs minus the internal bucket key.
    *
    * `bucket` (day | week | month) trades the two costs the width controls
    * (VERDICT r5 #8 — month was hardcoded): the interval side explodes to
    * ~span/width rows per interval, and each bucket gathers the points of
    * one width of time. Month fits quarter/year-grain intervals (small
    * explode, spread points). A DAY-grain interval set (delivery windows,
    * outage slots) under month buckets would concentrate every interval of
    * a month into one bucket key — the skew the decomposition exists to
    * avoid — and wants `day`, where the explode is only a handful of rows
    * per short interval. Rule of thumb: width ≈ typical interval span.
    */
  def rangeJoinDates(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucket: String = "month"): DataFrame = {
    val step = bucket match {
      case "day"   => expr("interval 1 day")
      case "week"  => expr("interval 7 days") // date_trunc(week) = Mondays
      case "month" => expr("interval 1 month")
      case other   => throw new IllegalArgumentException(
        s"bucket must be day, week, or month; got '$other'")
    }
    // an inverted interval (hi < lo) matches nothing under BETWEEN; drop it
    // up front — sequence() would otherwise throw on the negative span and
    // fail the whole job over one bad upstream row
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("bucket",
        explode(sequence(
          date_trunc(bucket, col(loCol)).cast("date"),
          date_trunc(bucket, col(hiCol)).cast("date"),
          step)))
    val p = points.withColumn("bucket",
      date_trunc(bucket, col(pointCol)).cast("date"))
    p.join(iv, Seq("bucket"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("bucket")
  }

  /** q44_range_join: lineitem shipments joined to fiscal-quarter intervals
    * (a generated 28-row interval dim — large enough to exercise the
    * bucketed plan, deterministic, and restatable in the oracle with
    * generate_series) via [[rangeJoinDates]]; revenue and shipment count
    * per quarter. Decimal-exact sums with a final DOUBLE cast, q08-style.
    */
  def q44(spark: SparkSession, dir: String): DataFrame = {
    val quarters = spark.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf("1992-01-01")),
        lit(java.sql.Date.valueOf("1998-10-01")),
        expr("interval 3 months"))).as("q_start"))
      .select(col("q_start"),
        date_sub(add_months(col("q_start"), 3), 1).as("q_end"))
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc  = col("l_discount").cast("decimal(18,2)")
    val one   = lit(1).cast("decimal(18,2)")
    val li = Tables.lineitem(spark, dir)
      .select(to_date(col("l_shipdate")).as("ship_day"),
        (price * (one - disc)).as("rev"))
    rangeJoinDates(li, "ship_day", quarters, "q_start", "q_end")
      .groupBy(col("q_start").as("quarter"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("rev")).cast("double").as("revenue"))
      .orderBy("quarter")
  }

  val q44Sql: String =
    """WITH quarters AS (
      |  SELECT CAST(q_start AS DATE) AS q_start,
      |         CAST(q_start + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS q_end
      |  FROM (SELECT unnest(generate_series(DATE '1992-01-01', DATE '1998-10-01',
      |                                      INTERVAL 3 MONTH)) AS q_start))
      |SELECT q_start AS quarter,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN quarters
      |  ON CAST(l_shipdate AS DATE) BETWEEN q_start AND q_end
      |GROUP BY q_start
      |ORDER BY q_start""".stripMargin
}
