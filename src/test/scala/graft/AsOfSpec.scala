package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Generic as-of join semantics: latest version at-or-before, inclusive
  * ties, null before the first version, keys isolated.
  */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the prevailing version; ties inclusive; pre-history null") {
    val versions = Seq(
      ("USD", ts("2020-01-01 00:00:00"), 10),
      ("USD", ts("2020-06-01 00:00:00"), 20),
      ("GBP", ts("2020-03-01 00:00:00"), 77))
      .toDF("k", "valid_from", "v")
    val probes = Seq(
      (1L, "USD", ts("2019-12-31 00:00:00")), // before history -> null
      (2L, "USD", ts("2020-01-01 00:00:00")), // exact tie -> inclusive (10)
      (3L, "USD", ts("2020-05-31 00:00:00")), // between versions -> 10
      (4L, "USD", ts("2020-06-02 00:00:00")), // after reval -> 20
      (5L, "GBP", ts("2021-01-01 00:00:00")), // other key -> 77
      (6L, "JPY", ts("2021-01-01 00:00:00"))) // unknown key -> null
      .toDF("id", "k", "valid_from")
    val expected = Map(
      1L -> None, 2L -> Some(10), 3L -> Some(10),
      4L -> Some(20), 5L -> Some(77), 6L -> None)
    // all implementations must agree on the semantics; the bucketed form
    // runs at month AND day widths — the fixture spans empty buckets
    // (GBP probed 10 months after its only version), same-bucket ties,
    // and probe-only buckets, so the carry-in path is genuinely exercised
    Seq(
      ops.AsOf.asOfJoin(probes, versions, "k", "valid_from", Seq("v")),
      ops.AsOf.asOfJoinBroadcast(probes, versions, "k", "valid_from", Seq("v")),
      ops.AsOf.asOfJoinBucketed(probes, versions, "k", "valid_from", Seq("v"),
        c => year(c) * 12 + month(c)),
      ops.AsOf.asOfJoinBucketed(probes, versions, "k", "valid_from", Seq("v"),
        c => unix_date(to_date(c)))
    ).foreach { df =>
      val out = df.orderBy("id").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
      assert(out == expected)
    }
    // colliding probe/value column names are rejected, not mis-selected
    intercept[IllegalArgumentException] {
      ops.AsOf.asOfJoin(probes.withColumn("v", lit(0)), versions,
        "k", "valid_from", Seq("v"))
    }
  }

  test("a NULL value on the latest version carries as NULL in both forms") {
    // a version row whose value is legitimately NULL must WIN the as-of
    // race (not be skipped in favor of an older version's value) — the
    // union+window form boxes values in a struct so last(ignoreNulls)
    // skips only probe rows, matching the broadcast form's max_by
    val versions = Seq(
      ("USD", ts("2020-01-01 00:00:00"), Some(10)),
      ("USD", ts("2020-06-01 00:00:00"), None)) // latest: value is NULL
      .toDF("k", "valid_from", "v")
    val probes = Seq(
      (1L, "USD", ts("2020-03-01 00:00:00")), // before the null reval -> 10
      (2L, "USD", ts("2020-07-01 00:00:00"))) // after -> NULL, not 10
      .toDF("id", "k", "valid_from")
    val expected = Map(1L -> Some(10), 2L -> None)
    Seq(
      ops.AsOf.asOfJoin(probes, versions, "k", "valid_from", Seq("v")),
      ops.AsOf.asOfJoinBroadcast(probes, versions, "k", "valid_from", Seq("v")),
      ops.AsOf.asOfJoinBucketed(probes, versions, "k", "valid_from", Seq("v"),
        c => year(c) * 12 + month(c))
    ).foreach { df =>
      val out = df.orderBy("id").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
      assert(out == expected)
    }
  }

  test("as-of join plan shuffles once on the key, no range/theta join") {
    val versions = Seq(("USD", ts("2020-01-01 00:00:00"), 1))
      .toDF("k", "valid_from", "v")
    val probes = Seq((1L, "USD", ts("2020-02-01 00:00:00")))
      .toDF("id", "k", "valid_from")
    val plan = ops.AsOf.asOfJoin(probes, versions, "k", "valid_from", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the union+window as-of must not degrade to a product join")
  }
}
