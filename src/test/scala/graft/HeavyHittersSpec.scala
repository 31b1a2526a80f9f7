package graft

import org.apache.spark.sql.functions._

/** The Misra–Gries guarantee, pinned against exact counts: presence of
  * every item above the N/(k+1) bar and two-sided count bounds, under
  * adversarial repartitioning (merge order must not break the bound).
  */
class HeavyHittersSpec extends SparkSuite {
  import graft.functions.HeavyHitters
  import spark.implicits._

  // planted Zipf-ish stream: item i (of 200) appears ~N/(i+1) times
  private def stream: Seq[String] =
    (0 until 200).flatMap(i => Seq.fill(2000 / (i + 1))(s"w$i"))

  test("MG guarantee: heavy items present, counts two-sided bounded") {
    val data = stream
    val n = data.length.toLong
    val exact = data.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val k = 16
    for (parts <- Seq(1, 7, 32)) {
      val got = data.toDF("g").repartition(parts)
        .agg(HeavyHitters.topk_freq(col("g"), k).as("hh"))
        .select(explode(col("hh")).as(Seq("g", "c")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= k)
      val bar = n / (k + 1)
      exact.foreach { case (g, c) =>
        if (c > bar)
          assert(got.contains(g), s"parts=$parts: heavy item $g ($c > $bar) missing")
      }
      got.foreach { case (g, c) =>
        val t = exact(g)
        assert(c <= t && c >= t - bar,
          s"parts=$parts: $g reported $c, true $t, bar $bar")
      }
    }
  }

  test("MG is exact when the summary is not full") {
    val data = Seq("a", "b", "a", "c", "a", "b")
    val got = data.toDF("g").repartition(3)
      .agg(HeavyHitters.topk_freq(col("g"), 16).as("hh"))
      .select(explode(col("hh")).as(Seq("g", "c")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("x14 runs over the corpus trigram stream, bounded output") {
    val rows = HeavyHitters.x14(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 32)
    // ordered by (count desc, gram) and all lower bounds positive
    val cs = rows.map(_.getLong(1))
    assert(cs.toSeq == cs.sorted(Ordering[Long].reverse).toSeq)
    assert(cs.forall(_ > 0L))
  }
}
