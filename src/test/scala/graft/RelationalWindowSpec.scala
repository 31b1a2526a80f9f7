package graft

/** Behavioral pins for q36 (full outer join) and q37 (rank family) beyond
  * the oracle hash: the properties that make each operator the RIGHT one —
  * both-sided unmatched rows for full outer, tie semantics for the ranks.
  */
class RelationalWindowSpec extends SparkSuite {

  test("q45 range frame: day 30 falls out of the 30-day window, day 29 stays in") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ts = (d: String) => java.sql.Timestamp.valueOf(s"$d 00:00:00")
    val orders = Seq(
      (1L, 10L, ts("1995-01-01"), 100.0),
      (1L, 11L, ts("1995-01-30"), 10.0),  // day 29 after: inside [-29, 0]
      (1L, 12L, ts("1995-01-31"), 1.0),   // day 30 after key 10: outside
      (1L, 13L, ts("1995-01-31"), 2.0))   // same-day peer: shares 12's frame
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val epoch = lit(java.sql.Date.valueOf("1992-01-01"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("day")).rangeBetween(-29, 0)
    val out = orders
      .withColumn("day", datediff(to_date(col("o_orderdate")), epoch))
      .select(col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(11L) == 110.0, "29 days back is inside the frame")
    // keys 12/13 (same day): key 10 is 30 days back — excluded; peers included
    assert(out(12L) == 13.0 && out(13L) == 13.0,
      "day-30 row excluded; same-day peers share one frame")
  }

  test("x12 bloom prefilter keeps q06's exact answer and plans the prefilter") {
    val bloom = ops.Relational.x12(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val exact = ops.Relational.q06(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(bloom == exact, "bloom prefilter must never drop a true match")
    val plan = ops.Relational.x12(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "the prefilter must survive into the physical plan")
  }

  test("bloom sizing tracks build NDV: fpp stays low at capacity, " +
    "where a round-5-style undersized sketch saturates") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureBloom(spark)
    val n = 50000
    (1L to n).toDF("k").createOrReplaceTempView("bloom_build")
    // 50k non-members probed against both sketches
    ((n + 1L) to 2L * n).toDF("k").createOrReplaceTempView("bloom_probe")
    val (est, bits) = ops.Relational.bloomSizing(spark.table("bloom_build"), "k")
    assert(est >= n && est <= 4L * n, s"estimate $est should bracket NDV=$n")
    def fpCount(estItems: Long, numBits: Long): Long = spark.sql(
      s"""SELECT count(*) FROM bloom_probe p
         |WHERE graft_might_contain(
         |  (SELECT graft_bloom_agg(xxhash64(k), ${estItems}L, ${numBits}L)
         |   FROM bloom_build), xxhash64(p.k))""".stripMargin)
      .head().getLong(0)
    // derived sizing: ~8 bits/key at 2x headroom => fpp well under 2%
    assert(fpCount(est, bits) < n / 50,
      "NDV-derived sizing must keep the prefilter selective at capacity")
    // control: capacity 50x under the build (the hard-coded-constant
    // failure mode at scale) saturates — the prefilter stops pruning
    assert(fpCount(n / 50, 8L * n / 50) > n / 2,
      "an undersized sketch should saturate; if not, the control is broken")
  }

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
