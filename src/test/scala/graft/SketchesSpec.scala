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
}
