package graft

import graft.ops.Tpch

/** qh01–qh22 composition audit. Correctness is the driver's DuckDB gate
  * (the oracle is the IDENTICAL SQL body, so a pass is value-exact); what
  * this spec pins is the part a hash match can't see — that the
  * compositions PLAN the way a 100 TB run needs them to:
  *  - correlated aggregate subqueries (qh02/qh17/qh20) decorrelate to
  *    aggregate+join, never a per-row nested-loop re-execution;
  *  - nothing plans a CartesianProduct;
  *  - the semi/anti compositions (qh04/qh21/qh22) plan as hash semi/anti
  *    joins on the extracted equality keys.
  */
class TpchSpec extends SparkSuite {

  private def executedPlan(id: String): String = {
    val df = Tpch.run(spark, sf0001, id)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("all 22 compositions execute at sf0.001 with stable schemas") {
    // every query must run end-to-end; aggregate-without-groups queries
    // (qh06/14/17/19) may be single-row, the rest non-empty is not
    // guaranteed at this SF (10 suppliers) — the sf0.01 driver gate pins
    // values, this pins executability + column naming
    SparkEntry.queries.keys.filter(_.startsWith("qh")).foreach { id =>
      val df = SparkEntry.queries(id)(spark, sf0001)
      val cols = df.columns
      assert(cols.nonEmpty && cols.distinct.length == cols.length,
        s"$id: duplicate or empty output columns: ${cols.mkString(",")}")
      df.collect() // must not throw
    }
  }

  test("correlated subqueries decorrelate: no nested-loop join re-execution") {
    // qh02 (correlated min), qh17 (correlated avg), qh20 (correlated sum):
    // Catalyst must rewrite each correlated aggregate into an Aggregate
    // joined back on the correlation key. A BroadcastNestedLoopJoin or
    // CartesianProduct in the executed plan means the rewrite failed and
    // the plan is quadratic at scale.
    Seq("qh02_min_cost_supplier", "qh17_small_qty_revenue",
      "qh20_part_promotion").foreach { id =>
      val p = executedPlan(id)
      assert(!p.contains("CartesianProduct"), s"$id plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$id plans a nested loop — decorrelation failed:\n$p")
    }
  }

  test("no composition plans a cartesian product") {
    SparkEntry.queries.keys.filter(_.startsWith("qh")).foreach { id =>
      val p = executedPlan(id)
      assert(!p.contains("CartesianProduct"), s"$id plans a cartesian")
    }
  }

  test("exists/not-exists compositions plan as hash semi/anti joins") {
    val p04 = executedPlan("qh04_order_priority")
    assert(p04.contains("LeftSemi"), s"qh04 EXISTS must plan a semi join:\n$p04")
    val p21 = executedPlan("qh21_suppliers_waiting")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      s"qh21 needs both a semi (EXISTS) and an anti (NOT EXISTS) join:\n$p21")
    val p22 = executedPlan("qh22_global_sales")
    assert(p22.contains("LeftAnti"), s"qh22 NOT EXISTS must plan an anti join:\n$p22")
  }

  test("qh16's NOT IN plans a null-aware anti join, not a nested loop over parts") {
    // NOT IN over a nullable-free key column still needs the null-aware
    // variant; Spark plans BroadcastHashJoin ... LeftAnti, buildRight,
    // NOT the BroadcastNestedLoopJoin it falls back to when the key
    // can't be extracted
    val p = executedPlan("qh16_parts_supplier")
    assert(p.contains("LeftAnti"), s"qh16 must anti-join the complaints list:\n$p")
  }

  test("qh01 aggregates the full fixture exactly (spot pin vs direct compute)") {
    // one value-level anchor independent of the driver gate: count_order
    // for ('A','F') must equal a direct filter count on the base table
    val rows = Tpch.run(spark, sf0001, "qh01_pricing_summary").collect()
    val af = rows.find(r => r.getString(0) == "A" && r.getString(1) == "F").get
    val expected = Tables.lineitem(spark, sf0001)
      .filter("l_returnflag = 'A' AND l_linestatus = 'F' AND " +
        "l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'").count()
    assert(af.getLong(af.fieldIndex("count_order")) == expected)
  }
}
