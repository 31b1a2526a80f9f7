package graft

import org.apache.spark.sql.functions._

/** Range-join semantics and plan shape (SURVEY.md §2.3 q44). */
class RangeJoinSpec extends SparkSuite {
  import ops.RangeJoin

  test("bucketed range join equals the naive BETWEEN join on sf0.001") {
    val li = Tables.lineitem(spark, sf0001)
      .select(to_date(col("l_shipdate")).as("ship_day"), col("l_orderkey"))
    val quarters = spark.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf("1992-01-01")),
        lit(java.sql.Date.valueOf("1998-10-01")),
        expr("interval 3 months"))).as("q_start"))
      .select(col("q_start"),
        date_sub(add_months(col("q_start"), 3), 1).as("q_end"))
    val bucketed = RangeJoin
      .rangeJoinDates(li, "ship_day", quarters, "q_start", "q_end")
      .groupBy("q_start").count()
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val naive = li.join(quarters,
        col("ship_day").between(col("q_start"), col("q_end")))
      .groupBy("q_start").count()
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(bucketed == naive)
  }

  test("a point inside two overlapping intervals matches both, once each") {
    import spark.implicits._
    val points = Seq(java.sql.Date.valueOf("1995-06-15")).toDF("d")
    val ivs = Seq(
      ("wide", java.sql.Date.valueOf("1995-01-01"), java.sql.Date.valueOf("1995-12-31")),
      ("narrow", java.sql.Date.valueOf("1995-06-01"), java.sql.Date.valueOf("1995-06-30")),
      ("miss", java.sql.Date.valueOf("1996-01-01"), java.sql.Date.valueOf("1996-12-31")),
      // inverted bounds: BETWEEN matches nothing; must not crash the job
      ("inverted", java.sql.Date.valueOf("1995-12-31"), java.sql.Date.valueOf("1995-01-01")))
      .toDF("name", "lo", "hi")
    val out = RangeJoin.rangeJoinDates(points, "d", ivs, "lo", "hi")
      .select("name").as[String].collect().sorted.toList
    assert(out == List("narrow", "wide"))
  }

  test("day and week bucket widths match naive BETWEEN; bad width rejected") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // short boundary-straddling intervals: a Sun→Mon delivery window (week
    // edge), a month-end window, a single-day slot — the day-grain regime
    // the month default would pile into two bucket keys
    val ivs = Seq(
      ("wknd", d("1995-06-04"), d("1995-06-05")),
      ("eom",  d("1995-06-28"), d("1995-07-03")),
      ("spot", d("1995-06-15"), d("1995-06-15"))).toDF("name", "lo", "hi")
    val points = (1 to 40).map(i => d(f"1995-06-${(i % 30) + 1}%02d"))
      .concat(Seq(d("1995-07-01"), d("1995-07-02"), d("1995-07-05")))
      .toDF("p")
    val naive = points.join(ivs, col("p").between(col("lo"), col("hi")))
      .select("p", "name").collect().map(r => (r.getDate(0).toString, r.getString(1)))
      .sorted.toSeq
    for (w <- Seq("day", "week")) {
      val got = RangeJoin.rangeJoinDates(points, "p", ivs, "lo", "hi", bucket = w)
        .select("p", "name").collect().map(r => (r.getDate(0).toString, r.getString(1)))
        .sorted.toSeq
      assert(got == naive, s"width=$w diverged from naive BETWEEN")
    }
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoinDates(points, "p", ivs, "lo", "hi", bucket = "year")
    }
  }

  test("q44 plans as an equi-join on the bucket key — no nested loop, no cartesian") {
    val plan = ops.RangeJoin.q44(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
