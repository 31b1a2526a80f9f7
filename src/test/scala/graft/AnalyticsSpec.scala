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

  test("q81 hopping windows: every event in exactly 4 aligned windows, counts exact") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(unix_micros(col("ts")).as("us"), col("event_type"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val hopUs = 900000000L // 15 min
    val expanded = ev.flatMap { case (us, tpe, uid) =>
      (0 until 4).map(k => ((us / hopUs - k) * hopUs, tpe, uid))
    }
    val expectN = expanded.groupBy(e => (e._1, e._2)).view
      .mapValues(_.length.toLong).toMap
    val expectU = expanded.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).distinct.length.toLong).toMap
    val got = ops.Aggregates.q81(spark, sf0001).collect()
    assert(got.map(_.getLong(2)).sum == 4L * ev.length,
      "each event must land in exactly size/slide = 4 windows")
    assert(got.length == expectN.size)
    got.foreach { r =>
      val startUs = r.getTimestamp(0).getTime * 1000L // 900s-aligned, ms exact
      assert(startUs % hopUs == 0, "window starts align to the slide")
      val key = (startUs, r.getString(1))
      assert(r.getLong(2) == expectN(key), s"$key n_events")
      assert(r.getLong(4) == expectU(key), s"$key n_users")
    }
  }

  test("q82 attribution matches a sequential latest-click-within-1h recount") {
    val ev = graft.Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = scala.collection.mutable.Map[Long, (Long, Long)]()
    ev.groupBy(_._2).values.foreach { rows =>
      // the window's (ts, event_id) order: a same-ts click with a SMALLER
      // id is visible to the purchase, a larger one is not
      var lastClick: Option[(Long, Long)] = None // (us, id)
      rows.sortBy(r => (r._3, r._1)).foreach { case (id, _, us, tpe) =>
        if (tpe == "click") lastClick = Some((us, id))
        else lastClick.foreach { case (cus, cid) =>
          if (us - cus <= 3600000000L) expect(id) = (cid, (us - cus) / 1000000L)
        }
      }
    }
    val got = ops.Analytics.q82(spark, sf0001).collect()
    assert(got.nonEmpty && got.map(_.getLong(0)).toSet == expect.keySet)
    got.foreach { r =>
      val (cid, gap) = expect(r.getLong(0))
      assert(r.getLong(3) == cid, s"purchase ${r.getLong(0)} credited click")
      assert(r.getLong(5) == gap, s"purchase ${r.getLong(0)} gap")
    }
  }

  test("q84 time rollup: hierarchy totals reconcile at every level") {
    val rows = ops.Aggregates.q84(spark, sf0001).collect()
    def n(r: org.apache.spark.sql.Row) = r.getLong(6)
    val grand = rows.filter(r => r.getInt(3) == 1 && r.getInt(4) == 1 &&
      r.getInt(5) == 1)
    assert(grand.length == 1, "exactly one grand-total row")
    val total = graft.Tables.events(spark, sf0001).count()
    assert(n(grand.head) == total)
    // each day subtotal equals the sum of its hour subtotals, and the
    // leaf (day, hr, type) rows sum to their (day, hr) subtotal
    val daySub = rows.filter(r => r.getInt(3) == 0 && r.getInt(4) == 1)
      .map(r => r.getTimestamp(0) -> n(r)).toMap
    val hourSub = rows.filter(r => r.getInt(3) == 0 && r.getInt(4) == 0 &&
      r.getInt(5) == 1)
    assert(hourSub.groupBy(_.getTimestamp(0)).forall { case (d, hs) =>
      hs.map(n).sum == daySub(d)
    }, "day subtotals must equal the sum of their hours")
    val leaves = rows.filter(r => r.getInt(5) == 0)
    assert(leaves.groupBy(r => (r.getTimestamp(0), r.getTimestamp(1)))
      .forall { case ((d, h), ls) =>
        ls.map(n).sum == hourSub.find(r =>
          r.getTimestamp(0) == d && r.getTimestamp(1) == h).map(n).get
      }, "hour subtotals must equal the sum of their type leaves")
  }

  test("q85 weighted median matches a brute-force cumulative-weight scan") {
    val rows = ops.Analytics.q85(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val base = graft.Tables.lineitem(spark, sf001)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1)
    rows.foreach { case (flag, med, totW) =>
      val grp = base(flag).map(t => (t._2, t._3)).sortBy(_._1)
      val tot = grp.map(_._2).sum
      assert(totW == tot.toDouble, s"$flag total weight")
      var cum = BigDecimal(0)
      val expected = grp.collectFirst {
        case (p, w) if { cum += w; cum * 2 >= tot } => p
      }.get
      assert(med == expected.toDouble, s"$flag weighted median")
    }
  }

  test("q86 profile matches per-column recounts, from exactly one scan") {
    val o = graft.Tables.orders(spark, sf0001)
    val rows = ops.Analytics.q86(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == o.columns.sorted.toSeq)
    val n = o.count()
    rows.foreach { r =>
      val c = r.getString(0)
      assert(r.getLong(1) == n, s"$c n_rows")
      assert(r.getLong(2) == o.filter(col(c).isNull).count(), s"$c n_nulls")
      assert(r.getLong(3) == o.select(c).distinct().count(), s"$c n_distinct")
    }
    // the Scaladoc claim: ALL per-column counts come from ONE pass — a
    // profile that scans once per column re-reads the table N times
    import org.apache.spark.sql.execution.FileSourceScanExec
    // sparkPlan, not executedPlan: AQE wraps the executed tree in an
    // AdaptiveSparkPlanExec whose children are invisible to collect
    val scans = ops.Analytics.q86(spark, sf0001).queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }
    assert(scans.length == 1, s"profile must scan once, got ${scans.length}")
  }

  test("q87 growth curve telescopes and ends at the exact distinct total") {
    val rows = ops.Analytics.q87(spark, sf0001).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sortBy(_.getTime).toSeq)
    // cum telescopes: each day's cum = previous cum + its new_users
    rows.foldLeft(0L) { case (prev, (_, nu, cum)) =>
      assert(cum == prev + nu); cum
    }
    // driver recount of first-seen days
    val firstSeen = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1))
      .groupBy(_._1).view.mapValues(_.map(_._2.getTime).min).toMap
    val perDay = firstSeen.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    rows.foreach { case (day, nu, _) =>
      assert(nu == perDay(day.getTime), s"$day new_users")
    }
    // the curve's endpoint IS the corpus's exact distinct user count —
    // the anchor x18's sketch estimates are judged against
    assert(rows.last._3 == firstSeen.size.toLong)
  }

  test("q88 integrity: clean fixture audits zero orphans; planted orphans counted") {
    import spark.implicits._
    val rows = ops.Analytics.q88(spark, sf0001).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)} checked nothing")
      assert(r.getLong(2) == 0L, s"${r.getString(0)} orphans on intact TPC-H")
    }
    // the helper counts planted violations, not just zeros
    val child = Seq(1L, 2L, 3L, 99L, 98L).toDF("fk")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val audited = ops.Analytics.orphanCounts("t", child, "fk", parent, "pk")
      .collect().head
    assert(audited.getLong(1) == 5L && audited.getLong(2) == 2L)
    // an EMPTY child relation audits (0, 0), not (0, NULL) — the sum over
    // zero rows is null without the coalesce (ADVICE r9)
    val empty = ops.Analytics.orphanCounts("t0",
      child.limit(0), "fk", parent, "pk").collect().head
    assert(!empty.isNullAt(2) && empty.getLong(1) == 0L &&
      empty.getLong(2) == 0L, "empty child must audit as (0, 0)")
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

  test("q62 gap fill: dense calendar, carry-forward values, gaps flagged") {
    val rows = ops.Analytics.q62(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (status, rs) =>
      val sorted = rs.sortBy(_._2.toEpochDay)
      // the calendar is DENSE: one row per day of the observed span
      sorted.map(_._2.toEpochDay).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b == a + 1, s"$status: day gap $a -> $b")
        case _         =>
      }
      // span edges are observed days, never gaps
      assert(!sorted.head._5 && !sorted.last._5, s"$status edge is a gap")
      // a gap has zero orders and carries the previous filled value;
      // an observed day resets the carry
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, _, prevFill, _, _), (_, d, fill, n, gap)) =>
          if (gap) {
            assert(n == 0L, s"$status $d: gap with orders")
            assert(fill == prevFill, s"$status $d: gap must carry forward")
          } else assert(n > 0L, s"$status $d: observed day without orders")
        case _ =>
      }
    }
    // sf0.001 is sparse enough that real gaps exist — the carry is exercised
    assert(rows.exists(_._5), "expected at least one gap at sf0.001")
  }

  test("q63 linear interpolation lies between its anchors and hits them exactly") {
    val rows = ops.Analytics.q63(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getDouble(2), r.getBoolean(3)))
    assert(rows.exists(_._4), "expected gaps at sf0.001")
    rows.groupBy(_._1).foreach { case (status, rs) =>
      val sorted = rs.sortBy(_._2.toEpochDay).toVector
      sorted.zipWithIndex.filter(_._1._4).foreach { case ((_, d, v, _), i) =>
        val (pi, pv) = sorted.zipWithIndex.take(i).filterNot(_._1._4)
          .map { case ((_, pd, x, _), _) => (pd.toEpochDay, x) }.last
        val (ni, nv) = sorted.zipWithIndex.drop(i + 1).filterNot(_._1._4)
          .map { case ((_, nd, x, _), _) => (nd.toEpochDay, x) }.head
        val expect = pv + (nv - pv) *
          ((d.toEpochDay - pi).toDouble / (ni - pi).toDouble)
        assert(math.abs(v - expect) < 1e-9,
          s"$status $d: $v vs recomputed lerp $expect")
        assert(v >= math.min(pv, nv) - 1e-9 && v <= math.max(pv, nv) + 1e-9,
          s"$status $d: interpolant outside its anchors")
      }
    }
  }

  test("q34c matches a driver-side exact percentile_cont, bit for bit") {
    val got = ops.Analytics.q34c(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty)
    val raw = Tables.orders(spark, sf001)
      .select(col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .collect()
      .map(r => (r.getString(0), r.getDecimal(1)))
      .groupBy(_._1)
      .map { case (s, rs) => s -> rs.map(_._2).sortBy(d => d).toVector }
    // the same scaled-integer rank + single-lerp arithmetic, on the driver:
    // pos×10 = (n−1)·m, lo = value at pos10/10 (0-indexed), f = (pos10%10)/10
    def pcont(v: Vector[java.math.BigDecimal], m: Int): Double = {
      val pos10 = (v.length - 1).toLong * m
      val lo = v((pos10 / 10).toInt).doubleValue
      val hi = if (pos10 / 10 + 1 < v.length) v((pos10 / 10).toInt + 1).doubleValue else lo
      lo + ((pos10 % 10).toDouble / 10.0) * (hi - lo)
    }
    got.foreach { case (s, p50, p90, n) =>
      val vs = raw(s)
      assert(n == vs.length, s"$s: n_orders $n vs ${vs.length}")
      assert(p50 == pcont(vs, 5), s"$s: p50 $p50 vs ${pcont(vs, 5)}")
      assert(p90 == pcont(vs, 9), s"$s: p90 $p90 vs ${pcont(vs, 9)}")
      // interpolated p50 is bracketed by the discrete order statistics
      assert(p50 >= vs.head.doubleValue && p50 <= vs.last.doubleValue)
      assert(p90 >= p50, s"$s: p90 $p90 < p50 $p50")
    }
  }

  test("q66 rolling z-scores match a driver-side exact recomputation") {
    val got = ops.Analytics.q66(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getBoolean(5)))
    assert(got.nonEmpty)
    // recompute the rolling moments with the same operand order: exact
    // decimal sums inside the frame, then the identical double formula
    got.groupBy(_._1).foreach { case (status, rows) =>
      val seq = rows.sortBy(_._2.toEpochDay).toVector
      val revD = seq.map(r => java.math.BigDecimal.valueOf(r._3).setScale(2))
      seq.indices.foreach { i =>
        val win = revD.slice(math.max(0, i - 6), i + 1)
        val sx = win.reduce(_ add _).doubleValue
        val sxx = win.map(v => v.multiply(v)).reduce(_ add _).doubleValue
        val cnt = win.length.toDouble
        val mean = sx / cnt
        val vr = (sxx - sx * sx / cnt) / cnt
        val (_, day, rev, mean7, z, outlier) = seq(i)
        assert(mean7 == mean, s"$status $day: mean $mean7 vs $mean")
        if (vr > 0) {
          val want = (rev - mean) / math.sqrt(vr)
          assert(z.contains(want), s"$status $day: z $z vs $want")
          assert(outlier == (math.abs(want) > 2.0))
        } else {
          assert(z.isEmpty && !outlier, s"$status $day: degenerate window")
        }
      }
    }
    // the fixture exercises real z-scores (degenerate-window nulls depend
    // on FP cancellation landing ≤ 0 — consistent across engines by the
    // shared formula, but not guaranteed to occur in a given fixture)
    assert(got.exists(_._5.isDefined), "expected some defined z-scores")
  }

  test("q72 transition matrix: rows partition the lead pairs, p sums to 1") {
    val rows = ops.Analytics.q72(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // every user with k events contributes exactly k-1 transitions
    val ev = Tables.events(spark, sf001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == expected,
      "transition count must be events minus users")
    rows.groupBy(_._1).foreach { case (from, rs) =>
      val pSum = rs.map(_._4).sum
      assert(math.abs(pSum - 1.0) < 1e-12, s"$from: p sums to $pSum")
      // p is the exact ratio of the row's n to the from-group total
      val tot = rs.map(_._3).sum.toDouble
      rs.foreach { case (_, _, n, p) => assert(p == n.toDouble / tot) }
    }
  }

  test("q76 co-occurrence: counts and conditionals match a driver recount") {
    val rows = ops.Analytics.q76(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val ut = Tables.events(spark, sf001)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    rows.foreach { case (a, b, nBoth, pba, pab) =>
      assert(a < b)
      val both = (byType(a) intersect byType(b)).size.toLong
      assert(nBoth == both, s"($a,$b)")
      assert(pba == both.toDouble / byType(a).size.toDouble)
      assert(pab == both.toDouble / byType(b).size.toDouble)
    }
    // all unordered pairs with at least one common user are present
    val types = byType.keys.toSeq.sorted
    val expectedPairs = (for {
      a <- types; b <- types if a < b
      if (byType(a) intersect byType(b)).nonEmpty
    } yield (a, b)).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == expectedPairs)
  }

  test("q77 MAD outliers match a brute-force median/fence recount") {
    val rows = ops.Analytics.q77(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val prices = Tables.orders(spark, sf001)
      .select("o_orderstatus", "o_totalprice").collect()
      // o_totalprice ships as DOUBLE in the fixture; mirror q77's own
      // cast-to-decimal(18,2) (Spark casts double->decimal HALF_UP)
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (status, med, mad, n, nOut) =>
      val ps = prices(status).sorted
      assert(n == ps.size.toLong)
      val lowerMedian = ps((ps.size + 1) / 2 - 1)
      assert(med == lowerMedian.toDouble, s"$status median")
      val ds = ps.map(p => (p - lowerMedian).abs).sorted
      val bMad = ds((ds.size + 1) / 2 - 1)
      assert(mad == bMad.toDouble, s"$status mad")
      assert(nOut == ds.count(_ > bMad * 3).toLong, s"$status fence count")
    }
  }

  test("q78 KS distance matches a brute-force pooled-ECDF sweep") {
    val rows = ops.Analytics.q78(spark, sf001).collect()
    assert(rows.length == 1)
    val (dStat, atP, nO, nF) = (rows(0).getDouble(0), rows(0).getDouble(1),
      rows(0).getLong(2), rows(0).getLong(3))
    val ps = Tables.orders(spark, sf001)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select("o_orderstatus", "o_totalprice").collect()
      // o_totalprice ships as DOUBLE; mirror q78's cast-to-decimal(18,2)
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val o = ps.filter(_._1 == "O").map(_._2)
    val f = ps.filter(_._1 == "F").map(_._2)
    assert(nO == o.length.toLong && nF == f.length.toLong)
    val support = (o ++ f).distinct.sorted
    val ds = support.map(p => (p,
      math.abs(o.count(_ <= p).toDouble / o.length -
        f.count(_ <= p).toDouble / f.length)))
    val bMax = ds.map(_._2).max
    assert(dStat == bMax)
    assert(atP == ds.filter(_._2 == bMax).map(_._1).min.toDouble)
    assert(dStat > 0 && dStat <= 1)
  }

  test("q70 winsorized prices clamp to real per-group order statistics") {
    val rows = ops.Analytics.q70(spark, sf001).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (status, rs) =>
      val ps = rs.map(_._2).sorted.toVector
      val lo = ps(((ps.length * 5 + 99) / 100) - 1)   // value at rank ⌈n·5/100⌉
      val hi = ps(((ps.length * 95 + 99) / 100) - 1)
      rs.foreach { case (_, p, w) =>
        val want = if (p < lo) lo else if (p > hi) hi else p
        assert(w == want, s"$status: $p -> $w, want $want")
      }
      // clipping touches at most ~10% of the group, and touches SOMETHING
      val clipped = rs.count { case (_, p, w) => p != w }
      assert(clipped <= (ps.length * 10) / 100 + 2, s"$status: $clipped clips")
    }
    assert(rows.exists { case (_, p, w) => p != w },
      "expected at least one clipped price in the fixture")
  }

  /** Brute-force NOT-EXISTS skyline: the textbook O(n²) definition q90's
    * two-pass reduction must reproduce exactly, ties and all.
    */
  private def bruteSkyline(pts: Seq[(Double, Double)]): Seq[(Double, Double)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }

  test("q90 skyline ≡ brute-force NOT EXISTS on a tie/duplicate-heavy fixture") {
    import spark.implicits._
    // hand-built edge cases: a frontier duplicate pair, an x-tie where only
    // the higher y survives, a y-tie where only the higher x survives, an
    // interior dominated point, and single-axis extremes
    val pts = Seq(
      (10.0, 1.0), (10.0, 1.0),      // duplicate frontier point (both survive)
      (10.0, 0.5),                    // x-tie, lower y: dominated
      (4.0, 4.0), (7.0, 4.0),        // y-tie: only x=7 survives
      (5.0, 3.0),                     // interior: dominated by (7,4)
      (1.0, 9.0),                     // y-extreme survives
      (2.0, 2.0), (0.0, 0.0))        // dominated
    val df = pts.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val got = ops.Analytics.skylineOf(df, "x", "y")
      .select("x", "y").as[(Double, Double)].collect().sorted.toSeq
    assert(got == bruteSkyline(pts).sorted,
      s"skyline mismatch: got $got want ${bruteSkyline(pts).sorted}")
  }

  test("q90 skyline ≡ brute force on sf0.001 lineitem, and none dominated") {
    import spark.implicits._
    val pts = Tables.lineitem(spark, sf0001)
      .select(col("l_extendedprice"), col("l_quantity"))
      .as[(Double, Double)].collect().toSeq
    val want = bruteSkyline(pts).sorted
    val got = ops.Analytics.q90(spark, sf0001)
      .select("price", "qty").as[(Double, Double)].collect().sorted.toSeq
    assert(got == want, s"got ${got.length} rows, want ${want.length}")
    assert(got.nonEmpty && got.length < pts.length)
  }

  test("property: skyline ≡ brute force on random tie-heavy integer grids") {
    import spark.implicits._
    // small integer grids force duplicate points, axis ties, and empty
    // equi-width buckets (12 distinct values across 64 buckets) — the
    // boundary conditions of the bucket decomposition
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val pts = Seq.fill(200 + rnd.nextInt(200))(
        (rnd.nextInt(12).toDouble, rnd.nextInt(12).toDouble))
      val df = pts.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val got = ops.Analytics.skylineOf(df, "x", "y")
        .select("x", "y").as[(Double, Double)].collect().sorted.toSeq
      assert(got == bruteSkyline(pts).sorted, s"seed $seed: got $got")
    }
  }

  test("q90b grouped skyline ≡ per-group brute force on sf0.001 lineitem") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .as[(String, Double, Double)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      bruteSkyline(rs.map(r => (r._2, r._3))).map { case (x, y) => (g, x, y) }
    }.sorted
    val got = ops.Analytics.q90b(spark, sf0001)
      .select("l_returnflag", "price", "qty")
      .as[(String, Double, Double)].collect().sorted.toSeq
    assert(got == want, s"got ${got.length} rows, want ${want.length}")
    // every group contributes a frontier, and grouping must not collapse
    // to the ungrouped frontier
    assert(got.map(_._1).distinct.size == rows.map(_._1).distinct.size)
    assert(got.length > ops.Analytics.q90(spark, sf0001).count())
  }

  test("suffixCumMax matches the naive suffix max, constant column included") {
    import spark.implicits._
    val data = Seq((1.0, 5.0), (2.0, 3.0), (2.0, 7.0), (3.0, 1.0),
      (0.5, 9.0), (3.0, 1.0))
    val out = ops.Analytics.suffixCumMax(
        data.toDF("o", "v"), "o", "v", "m", nBuckets = 2)
      .select("o", "v", "m").as[(Double, Double, Double)].collect()
    out.foreach { case (o, v, m) =>
      val want = data.filter(_._1 >= o).map(_._2).max
      assert(m == want, s"suffix max at o=$o v=$v: got $m want $want")
    }
    // constant order column takes the single-bucket degenerate path
    val const = Seq((1.0, 2.0), (1.0, 4.0), (1.0, 3.0))
    val cm = ops.Analytics.suffixCumMax(
        const.toDF("o", "v"), "o", "v", "m")
      .select("m").as[Double].collect()
    assert(cm.forall(_ == 4.0))
  }

  test("grouped + equiDepth skyline ≡ per-group brute force (the untested " +
      "parameter combination)") {
    import spark.implicits._
    // GLOBAL quantile cuts with per-group windows: validity rests on the
    // cuts being constants (monotone in the axis within EVERY group), the
    // same argument as the equi-width global bounds — pinned here rather
    // than argued
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .as[(String, Double, Double)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      bruteSkyline(rs.map(r => (r._2, r._3))).map { case (x, y) => (g, x, y) }
    }.sorted
    val t = Tables.lineitem(spark, sf0001).select(
      col("l_returnflag"), col("l_extendedprice").as("price"),
      col("l_quantity").as("qty"))
    val got = ops.Analytics.skylineOf(t, "price", "qty",
        groupCols = Seq("l_returnflag"), equiDepth = true)
      .select("l_returnflag", "price", "qty")
      .as[(String, Double, Double)].collect().sorted.toSeq
    assert(got == want)
  }

  test("q90c equi-depth skyline ≡ q90 equi-width on sf0.001 lineitem") {
    val a = ops.Analytics.q90(spark, sf0001).collect().map(_.toSeq)
    val b = ops.Analytics.q90c(spark, sf0001).collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b),
      "the equi-depth split changed the frontier")
  }

  test("q90c plan: the bucket key is the cuts_bucket kernel, not an " +
      "interpreted HOF fold") {
    // the kernel regression guard: if the equiDepth path ever reverts to
    // the ArrayAggregate formulation, every row of every pass pays an
    // interpreted 63-compare scan (measured 2.5x the whole query at sf1)
    val plan = ops.Analytics.q90c(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cuts_bucket"),
      "equi-depth bucket key must be the native kernel")
    assert(!plan.contains("aggregate(lambda"),
      "no interpreted HOF fold may remain in the bucket path")
  }

  test("suffixCumMax equiDepth: exact on a pathologically skewed axis, " +
      "and the buckets actually spread") {
    import spark.implicits._
    // 99% of the axis crammed into [0, 0.01], a 1% tail out to 1000 —
    // equi-width sends ~99% of rows to bucket 0 (the degradation the
    // header documents); equi-depth must stay exact AND spread the mass
    val rnd = new scala.util.Random(7)
    val data = (0 until 2000).map { i =>
      val o = if (i % 100 == 99) rnd.nextDouble() * 1000.0
              else rnd.nextDouble() * 0.01
      (o, math.sin(i.toDouble) * 100.0)
    }
    val df = data.toDF("o", "v")
    def run(ed: Boolean) = ops.Analytics.suffixCumMax(
        df, "o", "v", "m", nBuckets = 16, equiDepth = ed)
      .select("o", "v", "m").as[(Double, Double, Double)].collect().sorted
    val ew = run(false)
    val eq = run(true)
    assert(ew.sameElements(eq), "equiDepth changed the answer")
    eq.foreach { case (o, _, m) =>
      val want = data.filter(_._1 >= o).map(_._2).max
      assert(m == want, s"suffix max at o=$o: got $m want $want")
    }
    // the distributional claim: equi-width concentrates ≥ 90% of rows in
    // one bucket on this axis; equi-depth's largest bucket holds ≤ 20% —
    // probed with the same bucket keys the operator computes
    val mn = data.map(_._1).min; val mx = data.map(_._1).max
    val w = (mx - mn) / 16
    val ewMax = data.groupBy(d => math.min(((d._1 - mn) / w).toInt, 15))
      .values.map(_.size).max.toDouble / data.size
    assert(ewMax >= 0.9, f"fixture not skewed enough: $ewMax%.2f")
    val cuts = df.select(col("o")).stat
      .approxQuantile("o", (1 until 16).map(_ / 16.0).toArray, 0.001)
      .distinct.sorted
    val eqMax = data.groupBy(d => cuts.count(_ <= d._1))
      .values.map(_.size).max.toDouble / data.size
    assert(eqMax <= 0.2, f"equi-depth failed to spread: $eqMax%.2f")
    // nBuckets = 1 in equiDepth mode: no interior cuts, single bucket —
    // must not hit approxQuantile's empty-probability rejection
    import spark.implicits._
    val one = ops.Analytics.suffixCumMax(
        Seq((1.0, 5.0), (2.0, 3.0)).toDF("o", "v"), "o", "v", "m",
        nBuckets = 1, equiDepth = true)
      .select("o", "m").as[(Double, Double)].collect().toMap
    assert(one(1.0) == 5.0 && one(2.0) == 3.0)
  }
}
