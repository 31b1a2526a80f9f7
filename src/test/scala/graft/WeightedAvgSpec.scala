package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edge cases for the typed Aggregator UDAF (ADVICE r1): nulls, zero weight,
  * and partition-merge associativity.
  */
class WeightedAvgSpec extends SparkSuite {
  import functions.WeightedAvg

  private val schema = StructType(Seq(
    StructField("g", StringType),
    StructField("x", DecimalType(18, 2)),
    StructField("w", DecimalType(18, 2))))

  private def bd(s: String) = new java.math.BigDecimal(s)

  private def run(rows: Seq[Row], partitions: Int = 1): Map[String, Option[Double]] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, partitions), schema)
    df.groupBy("g")
      .agg(WeightedAvg.weighted_avg(col("x"), col("w")).as("wa"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
  }

  test("hand-computed weighted average") {
    // (10*1 + 20*3) / (1+3) = 17.5
    val out = run(Seq(
      Row("a", bd("10.00"), bd("1.00")),
      Row("a", bd("20.00"), bd("3.00"))))
    assert(math.abs(out("a").get - 17.5) < 1e-12)
  }

  test("null x or w rows are skipped, not zeroed") {
    val out = run(Seq(
      Row("a", bd("10.00"), bd("1.00")),
      Row("a", null, bd("99.00")),
      Row("a", bd("30.00"), null)))
    assert(math.abs(out("a").get - 10.0) < 1e-12)
  }

  test("all-null / zero total weight yields NULL, not NaN or 0") {
    val out = run(Seq(
      Row("z", bd("10.00"), bd("0.00")),
      Row("n", null, null)))
    assert(out("z").isEmpty)
    assert(out("n").isEmpty)
  }

  test("merge across partitions equals single-partition result") {
    val rows = (1 to 40).map(i => Row("a", bd(s"$i.00"), bd(s"${i % 5 + 1}.00")))
    assert(run(rows, 1)("a").get === run(rows, 8)("a").get)
  }
}
