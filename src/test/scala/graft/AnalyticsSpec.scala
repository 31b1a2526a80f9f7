package graft

import org.apache.spark.sql.functions._

/** Funnel / retention semantics (SURVEY.md §2.3 q53/q54) — invariants the
  * DuckDB oracle equality cannot state by itself.
  */
class AnalyticsSpec extends SparkSuite {

  test("q53 funnel stages are strictly ordered and only ever stall forward") {
    val rows = ops.Analytics.q53(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val view = r.getTimestamp(1)
      val click = Option(r.getTimestamp(2))
      val purchase = Option(r.getTimestamp(3))
      assert(view != null, "stage-1 population must have a view time")
      click.foreach(c => assert(c.after(view), s"click $c !after view $view"))
      purchase.foreach { p =>
        assert(click.isDefined, "purchase without click is impossible")
        assert(p.after(click.get), s"purchase $p !after click ${click.get}")
      }
    }
    // the funnel narrows monotonically
    val n1 = rows.length
    val n2 = rows.count(_.getTimestamp(2) != null)
    val n3 = rows.count(_.getTimestamp(3) != null)
    assert(n1 >= n2 && n2 >= n3)
    assert(n3 > 0, "fixture should carry some full conversions")
  }

  test("q54 cohort offsets are non-negative and offset-0 covers every cohort user") {
    val rows = ops.Analytics.q54(spark, sf001).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "activity cannot precede the first event")
    // a user is active in their own first week by definition, so the
    // offset-0 row of each cohort counts the whole cohort = the per-cohort max
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val byOffset = rs.map(r => r._2 -> r._3).toMap
      assert(byOffset.contains(0L), s"cohort $cohort lacks offset 0")
      assert(byOffset(0L) == rs.map(_._3).max,
        s"cohort $cohort offset-0 must be the cohort size")
    }
  }
}
