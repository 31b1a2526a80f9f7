package graft

/** Behavioral pins for q36 (full outer join) and q37 (rank family) beyond
  * the oracle hash: the properties that make each operator the RIGHT one —
  * both-sided unmatched rows for full outer, tie semantics for the ranks.
  */
class RelationalWindowSpec extends SparkSuite {

  test("q36 full outer: unmatched rows surface from BOTH sides") {
    val rows = ops.Relational.q36(spark, sf0001).collect()
    val aOnly = rows.count(_.getDouble(2) == 0.0) // active 1995 only
    val bOnly = rows.count(_.getDouble(1) == 0.0) // active 1996 only
    assert(aOnly > 0 && bOnly > 0,
      s"full outer must keep both unmatched sides (a-only=$aOnly, b-only=$bOnly)")
    rows.foreach { r =>
      // delta is the EXACT decimal difference converted once to double —
      // deliberately not the (ulp-off) subtraction of the rounded doubles
      assert(math.abs(r.getDouble(3) - (r.getDouble(2) - r.getDouble(1))) < 1e-6,
        "delta must be the exact-decimal difference of the yearly spends")
    }
  }

  test("q37 ranks: peers share values; rank gaps where dense_rank is dense") {
    val out = ops.Aggregates.q37(spark, sf0001).collect()
    // every peer group (priority, month) carries ONE rank/dense/pct/cume
    val perPeer = out.groupBy(r => (r.getString(1), r.getInt(2)))
      .values.map(_.map(r => (r.getInt(3), r.getInt(4), r.getDouble(5), r.getDouble(6))).toSet)
    assert(perPeer.forall(_.size == 1), "peer rows must share all four rank values")
    // tie-rich ordering: rank must skip past peer groups, dense_rank must not
    val onePriority = out.filter(_.getString(1) == out.head.getString(1))
    val ranks  = onePriority.map(_.getInt(3)).distinct.sorted.toList
    val denses = onePriority.map(_.getInt(4)).distinct.sorted.toList
    assert(denses == (1 to denses.size).toList, "dense_rank must be gap-free")
    assert(ranks.last > denses.last, "rank must have gaps given ties")
    assert(out.forall(r => r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0))
    assert(out.forall(r => r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0))
  }
}
