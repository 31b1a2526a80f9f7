package graft

/** x05: HLL++ must stay within its advertised error of the exact count. */
class SketchesSpec extends SparkSuite {

  test("approx_count_distinct within 3 sigma of exact at sf0.01") {
    // default rsd = 0.05 is a *standard deviation*, not a bound; 3 sigma
    ops.Sketches.x05(spark, sf001).collect().foreach { r =>
      val approx = r.getLong(1)
      val exact  = r.getLong(3)
      assert(math.abs(approx - exact).toDouble / exact < 0.15,
        s"flag=${r.getString(0)} approx=$approx exact=$exact")
    }
  }

  test("x09 approx percentiles track q34's exact median/p90 per group") {
    // GK sketch guarantees a RANK error <= n/accuracy; on this near-uniform
    // price distribution a tiny rank slip moves the value very little, so a
    // 1% VALUE tolerance is a conservative pin that still catches a wrong
    // accuracy parameter, a wrong percentile argument, or group mixups
    val exact = ops.Analytics.q34(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = ops.Sketches.x09(spark, sf001).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (m, p90) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - m) / m < 0.01,
        s"status=${r.getString(0)} approx_median=${r.getDouble(1)} exact=$m")
      assert(math.abs(r.getDouble(2) - p90) / p90 < 0.01,
        s"status=${r.getString(0)} approx_p90=${r.getDouble(2)} exact=$p90")
    }
  }

  test("x09b exact regime: accuracy=MaxInt returns the rank-ceil(p*n) element bit-exactly") {
    import org.apache.spark.sql.functions._
    // independent exact computation: sort each group, pick rank ceil(p*n)
    val byGroup = graft.Tables.orders(spark, sf001)
      .select("o_orderstatus", "o_totalprice").collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted
      }
    def rankEl(xs: Array[Double], p: Double): Double =
      xs(math.ceil(p * xs.length).toInt - 1)
    val got = ops.Sketches.x09b(spark, sf001).collect()
    assert(got.length == byGroup.size)
    got.foreach { r =>
      val xs = byGroup(r.getString(0))
      assert(r.getDouble(1) == rankEl(xs, 0.5), s"${r.getString(0)} median")
      assert(r.getDouble(2) == rankEl(xs, 0.9), s"${r.getString(0)} p90")
      assert(r.getLong(3) == xs.length)
    }
    // adversarial partitioning: the merge path must not change the answer
    // (no compression ever fires, so partials concatenate losslessly)
    val repart = graft.Tables.orders(spark, sf001).repartition(7)
      .groupBy(col("o_orderstatus"))
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(Int.MaxValue))
        .as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    byGroup.foreach { case (k, xs) => assert(repart(k) == rankEl(xs, 0.5)) }
  }

  test("x05b exact regime: theta estimate equals count(distinct) under any partitioning") {
    import org.apache.spark.sql.functions._
    val exact = graft.Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = ops.Sketches.x05b(spark, sf001).collect()
    assert(got.length == exact.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == exact(r.getString(0)),
        s"group ${r.getString(0)}")
    }
    // adversarial partitioning: 13-way repartition changes which partials
    // exist, but every union stays under k so the merge is lossless
    graft.ext.GraftFunctions.ensureThetaDistinct(spark)
    val repart = graft.Tables.lineitem(spark, sf001).repartition(13)
      .groupBy(col("l_returnflag"))
      .agg(call_function("theta_distinct", col("l_orderkey"), lit(23)).as("o"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, (o, _, _)) => assert(repart(k) == o) }
  }

  test("theta_distinct estimation regime: above k the estimate stays within 3/sqrt(k)") {
    import org.apache.spark.sql.functions._
    graft.ext.GraftFunctions.ensureThetaDistinct(spark)
    // lgK=10 (k=1024) against ~15k distinct orderkeys: well past nominal,
    // so this exercises the sampling (theta < 1) path incl. merge trimming
    val r = graft.Tables.lineitem(spark, sf001).repartition(13)
      .agg(call_function("theta_distinct", col("l_orderkey"), lit(10)).as("est"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()(0)
    val (est, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(exact > 2048, s"fixture too small to leave the exact regime: $exact")
    val relErr = math.abs(est / exact - 1.0)
    assert(relErr < 3.0 / math.sqrt(1024.0), s"rel err $relErr")
  }

  test("x18b/x19b exact regime: stored-sketch lifecycle and profile equal the exact answers") {
    import org.apache.spark.sql.functions._
    // x18b: every per-day estimate and the union-only grand row must equal
    // the exact distinct counts
    val exactDaily = graft.Tables.events(spark, sf001)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => Option(r.getTimestamp(0)) -> r.getLong(1)).toMap
    val exactAll = graft.Tables.events(spark, sf001)
      .agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val got18 = ops.Sketches.x18b(spark, sf001).collect()
    assert(got18.length == exactDaily.size + 1)
    got18.foreach { r =>
      val key = Option(r.getTimestamp(0))
      val expected = if (key.isEmpty) exactAll else exactDaily(key)
      assert(r.getLong(1) == expected, s"day ${r.get(0)}")
    }
    // x19b: row-for-row equal to the oracle-gated exact q86
    val q86 = ops.Analytics.q86(spark, sf001).collect().map(_.toString).toSeq
    val got19 = ops.Sketches.x19b(spark, sf001).collect().map(_.toString).toSeq
    assert(got19 == q86)
  }

  test("x22 overlap: set identities hold, pair join is hash not BNLJ, estimation regime bounded") {
    import org.apache.spark.sql.functions._
    val rows = ops.Sketches.x22(spark, sf001).collect()
    assert(rows.length == 29) // 30 fixture days -> 29 consecutive pairs
    rows.foreach { r =>
      val (na, nb, both, either) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(both <= math.min(na, nb))
      // exact regime: inclusion-exclusion is an identity, not an estimate
      assert(either == na + nb - both)
      assert(r.getDouble(5) == both.toDouble / either.toDouble)
    }
    val plan = ops.Sketches.x22(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // x22b: the difference identities against x22's counts —
    // churned = n_a - both, new = n_b - both, retained = both
    val byDay = rows.map(r => r.getTimestamp(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val churn = ops.Sketches.x22b(spark, sf001).collect()
    assert(churn.length == rows.length)
    churn.foreach { r =>
      val (na, nb, both) = byDay(r.getTimestamp(0))
      assert(r.getLong(1) == both && r.getLong(2) == na - both &&
        r.getLong(3) == nb - both, s"day ${r.get(0)}")
    }
    // estimation regime: two lgK=8 sketches over ranges sharing half their
    // keys — the intersection estimate must land within a loose 3-sigma-ish
    // band (set-op error is wider than single-sketch error; 0.2 is lenient)
    graft.ext.GraftFunctions.ensureThetaDistinct(spark)
    val spark2 = spark
    import spark2.implicits._
    val est = (0L until 20000L).toDF("k")
      .agg(
        call_function("theta_estimate", call_function("theta_intersect",
          call_function("theta_sketch_agg",
            when(col("k") < 10000L, col("k")), lit(8)),
          call_function("theta_sketch_agg",
            when(col("k") >= 5000L, col("k")), lit(8))))
          .as("i"))
      .collect()(0).getLong(0)
    assert(math.abs(est / 5000.0 - 1.0) < 0.2, s"intersection est $est vs 5000")
  }

  test("x18 sketch columns: per-day estimates within HLL error; union answers ranges") {
    val rows = ops.Sketches.x18(spark, sf001).collect()
    val (grand, daily) = rows.partition(_.isNullAt(0))
    assert(grand.length == 1 && daily.nonEmpty)
    // lgK=12 HLL: relative standard error ~1.6%; pin a generous 3σ ≈ 5%
    (daily :+ grand.head).foreach { r =>
      val (est, exact) = (r.getLong(1).toDouble, r.getLong(2))
      assert(math.abs(est - exact) <= math.max(0.05 * exact, 2.0),
        s"day=${r.get(0)} est=$est exact=$exact")
    }
    // merge consistency: the union estimate covers at least the biggest
    // day and at most the sum of days (set algebra survives the sketch)
    val dayEsts = daily.map(_.getLong(1).toDouble)
    val g = grand.head.getLong(1).toDouble
    assert(g >= dayEsts.max * 0.95 && g <= dayEsts.sum * 1.05)
    // the grand row's exact equals the true overall distinct
    val exactAll = graft.Tables.events(spark, sf001)
      .select("user_id").distinct().count()
    assert(grand.head.getLong(2) == exactAll)
  }

  test("x19 sketch profile: per-column estimates within 3 sigma of exact q86") {
    import org.apache.spark.sql.functions._
    val exact = ops.Analytics.q86(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val sk = ops.Sketches.x19(spark, sf001).collect()
    assert(sk.map(_.getString(0)).toSeq == exact.keys.toSeq.sorted,
      "sketch profile must cover exactly q86's columns")
    // lgK=12 ⇒ relative standard error ≈ 1.04/√4096 ≈ 1.63%; 3σ ≈ 4.9%
    sk.foreach { r =>
      val (nRows, nNulls, nDistinct) = exact(r.getString(0))
      assert(r.getLong(1) == nRows && r.getLong(2) == nNulls,
        s"${r.getString(0)}: n_rows/n_nulls must be EXACT, not sketched")
      val rel = math.abs(r.getLong(3).toDouble / nDistinct - 1.0)
      assert(rel <= 0.049,
        s"${r.getString(0)}: est=${r.getLong(3)} exact=$nDistinct rel=$rel")
    }
  }

  test("q30b closed-form corr/slope/intercept agrees with Spark's streaming builtins") {
    import org.apache.spark.sql.functions._
    // the builtins are partition-order-dependent floats (why q30b exists);
    // they still define the SEMANTICS, so the exact-decimal closed form
    // must agree to float tolerance
    val builtin = graft.Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(
        corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("s"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("i"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    ops.Analytics.q30b(spark, sf0001).collect().foreach { r =>
      val (c, s, i) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(2) - c) < 1e-6, s"corr ${r.getDouble(2)} vs $c")
      assert(math.abs((r.getDouble(3) - s) / s) < 1e-6, s"slope ${r.getDouble(3)} vs $s")
      assert(math.abs((r.getDouble(4) - i) / i) < 1e-6, s"intercept ${r.getDouble(4)} vs $i")
    }
  }
}
