package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** SCD2 family: build invariants, the one-shuffle plan pin, and the
  * merge-equals-rebuild contract (incl. the adversarial boundary cases
  * the fixture may not exercise).
  */
class ScdSpec extends SparkSuite {

  test("q91 build invariants: contiguous versions, no consecutive equal attrs, closed intervals chain") {
    val rows = ops.Scd.q91(spark, sf0001).collect()
    val byKey = rows.groupBy(_.getLong(0)).values
    byKey.foreach { vs =>
      val sorted = vs.sortBy(_.getInt(4))
      // versions are 1..n
      assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.length))
      // exactly one open (current) row, and it is the last version
      assert(sorted.count(_.getBoolean(5)) == 1 && sorted.last.getBoolean(5))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // consecutive versions never share the attribute (collapse)
          assert(a.getString(1) != b.getString(1))
          // each closed interval ends where the next begins
          assert(a.getTimestamp(3) == b.getTimestamp(2))
        case _ =>
      }
    }
  }

  test("q91 plan: one hash exchange — collapse, version and close share the window sort") {
    val p = ops.Scd.scd2Build(Tables.events(spark, sf001))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
  }

  test("q91b merge equals batch rebuild on the fixture") {
    val batch = ops.Scd.q91(spark, sf001).collect().map(_.toString).toSeq
    val merged = ops.Scd.q91b(spark, sf001).collect().map(_.toString).toSeq
    assert(merged == batch)
  }

  test("merge boundary cases: same-attr delta extends, changed closes, new key starts at 1") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // key 1: delta opens with the SAME attr -> current row extends, no new version
    // key 2: delta opens with a CHANGED attr -> current row closes at the delta ts
    // key 3: only in the delta -> versions start at 1
    // key 4: only in the dim -> untouched passthrough
    val hist = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "b", ts("2024-01-02 00:00:00"), 2L),
      (2L, "a", ts("2024-01-03 00:00:00"), 3L),
      (4L, "z", ts("2024-01-04 00:00:00"), 4L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val delta = Seq(
      (1L, "b", ts("2024-01-10 00:00:00"), 10L), // same as current -> collapse
      (1L, "c", ts("2024-01-11 00:00:00"), 11L),
      (2L, "b", ts("2024-01-12 00:00:00"), 12L), // change -> closes v1
      (3L, "x", ts("2024-01-13 00:00:00"), 13L),
      (3L, "x", ts("2024-01-14 00:00:00"), 14L)) // within-delta collapse
      .toDF("user_id", "event_type", "ts", "event_id")
    val all = hist.unionByName(delta)
    val rebuilt = ops.Scd.scd2Build(all)
      .orderBy("user_id", "version").collect().map(_.toString).toSeq
    val merged = ops.Scd.scd2Merge(ops.Scd.scd2Build(hist), delta)
      .orderBy("user_id", "version").collect().map(_.toString).toSeq
    assert(merged == rebuilt)
    // spot-check the collapse actually happened: key 1 has versions a, b, c
    // (the 01-10 same-attr row must NOT open a version)
    val k1 = ops.Scd.scd2Merge(ops.Scd.scd2Build(hist), delta)
      .filter(col("user_id") === 1L).orderBy("version").collect()
    assert(k1.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    assert(k1(1).getTimestamp(2) == ts("2024-01-02 00:00:00") &&
      k1(1).getTimestamp(3) == ts("2024-01-11 00:00:00"))
  }

  test("guardLateDeltas: a delta older than the current version fails " +
      "loudly; a conforming delta passes (ADVICE r12)") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val hist = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "b", ts("2024-01-05 00:00:00"), 2L),
      (2L, "a", ts("2024-01-03 00:00:00"), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val dim = ops.Scd.scd2Build(hist)
    // key 1's current version opened 01-05; a delta row at 01-04 is LATE
    val late = Seq(
      (1L, "c", ts("2024-01-04 00:00:00"), 10L),
      (2L, "b", ts("2024-01-10 00:00:00"), 11L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val ex = intercept[IllegalArgumentException] {
      ops.Scd.scd2Merge(dim, late, guardLateDeltas = true).collect()
    }
    assert(ex.getMessage.contains("late-arriving delta") &&
      ex.getMessage.contains("scd2Build"),
      s"guard error must name the contract and the fix: ${ex.getMessage}")
    // the same shape with conforming timestamps passes the guard and
    // still equals the batch rebuild
    val ok = Seq(
      (1L, "c", ts("2024-01-06 00:00:00"), 10L),
      (2L, "b", ts("2024-01-10 00:00:00"), 11L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val merged = ops.Scd.scd2Merge(dim, ok, guardLateDeltas = true)
      .orderBy("user_id", "version").collect().map(_.toString).toSeq
    val rebuilt = ops.Scd.scd2Build(hist.unionByName(ok))
      .orderBy("user_id", "version").collect().map(_.toString).toSeq
    assert(merged == rebuilt)
  }

  test("guardLateDeltas: a delta at ts EXACTLY equal to effective_from " +
      "fails loudly — equal-ts tie order vs the opening event is " +
      "unadjudicable without the retained tie (ADVICE r13)") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val hist = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val dim = ops.Scd.scd2Build(hist)
    // equal ts, SMALLER tie than the opening event: the rebuild would
    // order this delta first (tie 2 < 5) but the merge's carried
    // pseudo-row (tie Long.MinValue) always precedes it — divergent,
    // and the strict-precondition guard must refuse it
    val equalTs = Seq(
      (1L, "b", ts("2024-01-01 00:00:00"), 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val ex = intercept[IllegalArgumentException] {
      ops.Scd.scd2Merge(dim, equalTs, guardLateDeltas = true).collect()
    }
    assert(ex.getMessage.contains("not strictly after"),
      s"equality must trip the strict guard: ${ex.getMessage}")
  }

  test("q91c bucketed build equals the plain build; raw window keys on (key, bucket)") {
    val batch = ops.Scd.q91(spark, sf001).collect().map(_.toString).toSeq
    val bucketed = ops.Scd.q91c(spark, sf001).collect().map(_.toString).toSeq
    assert(bucketed == batch)
    // the raw-row window must partition on (key, bucket), never the bare
    // key — that is the whole point of the variant
    val plan = ops.Scd.scd2BuildBucketed(Tables.events(spark, sf001))
      .queryExecution.analyzed.toString
    assert(plan.contains("windowspecdefinition(user_id"), plan.take(500))
    assert("windowspecdefinition\\(user_id#\\d+L, __bkt".r
      .findFirstIn(plan).isDefined, "raw window not keyed on (key, bucket)")
  }

  test("q91c boundary cases: cross-bucket collapse, null attrs through the carry") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // key 1: same attr across a day boundary -> must collapse through the
    //        carry; then a null attr, repeated across ANOTHER day boundary
    //        (null-run collapses through the boxed carry), then back
    // key 2: single event (degenerate)
    val log = Seq(
      (1L, Option("a"), ts("2024-01-01 23:59:00"), 1L),
      (1L, Option("a"), ts("2024-01-02 00:01:00"), 2L), // boundary, same
      (1L, Option.empty[String], ts("2024-01-02 12:00:00"), 3L),
      (1L, Option.empty[String], ts("2024-01-03 12:00:00"), 4L), // boundary, null run
      (1L, Option("a"), ts("2024-01-04 00:00:00"), 5L),
      (2L, Option("z"), ts("2024-01-05 00:00:00"), 6L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val plain = ops.Scd.scd2Build(log)
      .orderBy("user_id", "version").collect().map(_.toString).toSeq
    val bucketed = ops.Scd.scd2BuildBucketed(log)
      .orderBy("user_id", "version").collect().map(_.toString).toSeq
    assert(bucketed == plain)
    val k1 = ops.Scd.scd2BuildBucketed(log)
      .filter(org.apache.spark.sql.functions.col("user_id") === 1L)
      .orderBy("version").collect()
    assert(k1.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("a"), None, Some("a")))
  }

  test("null attributes are values: null-run collapses, null<->value transitions version") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val log = Seq(
      (1L, Option("a"), ts("2024-01-01 00:00:00"), 1L),
      (1L, Option.empty[String], ts("2024-01-02 00:00:00"), 2L),
      (1L, Option.empty[String], ts("2024-01-03 00:00:00"), 3L),
      (1L, Option("a"), ts("2024-01-04 00:00:00"), 4L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = ops.Scd.scd2Build(log).orderBy("version").collect()
    assert(got.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("a"), None, Some("a")))
    assert(got.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
  }
}
