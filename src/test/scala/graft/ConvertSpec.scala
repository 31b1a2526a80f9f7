package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flagship fine-print semantics (SURVEY.md §2.1 items 1-4; FIXTURES.md §A):
  * the reference-exact conversion path `Convert.convertExact` and its
  * oracle-parity twin `convertDeclared`.
  */
class ConvertSpec extends SparkSuite {
  import ops.Convert

  private val inSchema = StructType(Seq(
    StructField("amount", DecimalType(28, 8)),
    StructField("currency", StringType),
    StructField("rate", DoubleType)))

  private def convert(rows: Seq[Row]): Seq[java.math.BigDecimal] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), inSchema)
    df.select(Convert.convertExact(col("amount"), col("currency"), col("rate"))
        .as("out"))
      .collect().toSeq.map(r => r.getDecimal(0))
  }

  private def bd(s: String) = new java.math.BigDecimal(s)

  test("EUR branch skips conversion AND rounding (dag :106-107)") {
    // 8-dp input passes through untouched — no /rate, no 2-dp round
    val out = convert(Seq(Row(bd("10.12345678"), "EUR", 2.0)))
    assert(out.head.compareTo(bd("10.12345678")) == 0)
  }

  test("missing rate defaults to 1.0 (dag :108 — unknown currency = EUR-like)") {
    val out = convert(Seq(Row(bd("42.73000000"), "XXX", null)))
    assert(out.head.compareTo(bd("42.73")) == 0)
  }

  test("banker's rounding HALF_EVEN, where round() would differ (dag :109)") {
    // quotient lands exactly on the .xx5 boundary: HALF_EVEN goes to even
    val out = convert(Seq(
      Row(bd("2.34500000"), "USD", 1.0), // 2.345 -> 2.34 (4 is even)
      Row(bd("2.35500000"), "USD", 1.0), // 2.355 -> 2.36 (6 is even)
      Row(bd("4.69000000"), "USD", 2.0))) // 2.345 again, via division
    assert(out(0).compareTo(bd("2.34")) == 0)
    assert(out(1).compareTo(bd("2.36")) == 0)
    assert(out(2).compareTo(bd("2.34")) == 0)
    // HALF_UP control: Spark round() on the same input gives 2.35, proving
    // the bround choice is load-bearing
    val df = spark.sql("SELECT round(CAST(2.345 AS DECIMAL(28,8)), 2) r, " +
      "bround(CAST(2.345 AS DECIMAL(28,8)), 2) b")
    val r = df.collect().head
    assert(r.getDecimal(0).compareTo(bd("2.35")) == 0)
    assert(r.getDecimal(1).compareTo(bd("2.34")) == 0)
  }

  test("declared path (reciprocal-multiply HALF_UP) stays within one cent of " +
    "the reference-exact path (ADVICE r1)") {
    // forward rate (units per EUR) = 1 / eur_per_unit, as the reference's
    // dict stores it; declared multiplies by the 6-dp reciprocal instead
    val mc = java.math.MathContext.DECIMAL64
    val rows = for {
      (cur, recip) <- Dims.rates
      amountCents <- Seq("10.00", "123.45", "999.99", "54321.07")
    } yield Row(bd(amountCents), cur, bd(recip),
      java.math.BigDecimal.ONE.divide(bd(recip), mc).doubleValue())
    val schema = StructType(Seq(
      StructField("amount", DecimalType(18, 2)),
      StructField("currency", StringType),
      StructField("eur_per_unit", DecimalType(10, 6)),
      StructField("fwd_rate", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val out = df.select(
      Convert.convertDeclared(col("amount"), col("currency"), col("eur_per_unit"))
        .cast("double").as("declared"),
      Convert.convertExact(col("amount"), col("currency"), col("fwd_rate"))
        .cast("double").as("exact"))
      .collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 0.011,
        s"declared=${r.getDouble(0)} exact=${r.getDouble(1)}")
    }
  }

  test("q03 uses one batch-constant timestamp (dag :74,:116)") {
    val n = Convert.q03(spark, sf0001)
      .select(countDistinct(col("exchange_rate_date")))
      .collect().head.getLong(0)
    assert(n == 1)
  }

  test("q03 flagship returns rows at sf0.001 (driver smoke mirror)") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
  }

  test("q46 pickup: ledgered ids excluded, cap binds, rows agree with q03") {
    val q46 = Convert.q46(spark, sf001)
      .select("order_id", "amount_eur").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // fixture ledger = every third order: none may be picked up
    assert(q46.forall(_._1 % 3 != 0))
    // sf0.01 has 10 000 unprocessed orders, so the 5 000 cap must BIND and
    // keep the LOWEST ids (deterministic orderBy-limit semantics)
    assert(q46.length == Convert.PickBatch)
    val maxPicked = q46.map(_._1).max
    val unpickedBelow = Convert.q03(spark, sf001)
      .filter(col("order_id") <= maxPicked && col("order_id") % 3 =!= 0)
      .count()
    assert(unpickedBelow == Convert.PickBatch,
      "pickup must take the first maxBatch unprocessed ids, no gaps")
    // converted values match the flagship conversion row-for-row
    val q03Map = Convert.q03(spark, sf001)
      .select("order_id", "amount_eur").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(q46.forall { case (id, eur) => q03Map(id) == eur })
  }
}
