package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Literal dimension tables shared by the Spark builders and the DuckDB
  * oracle SQL. One Scala constant is the single source of truth; it is
  * rendered both as a broadcastable DataFrame and as a SQL `VALUES` clause,
  * so the two engines can never drift.
  *
  * Mirrors the reference's exchange-rate dict
  * (`dags/order_currency_conversion_dag.py:54-60`): a `(currency, rate)`
  * key-value dimension, EUR-based. The reference stores units-of-currency-
  * per-EUR and divides; because DuckDB decimal division degrades to DOUBLE
  * (cross-engine nondeterminism), the declared dimension carries the
  * reciprocal `eur_per_unit` as an exact DECIMAL(10,6) and the engine
  * multiplies — semantically identical lookup-join + default (SURVEY.md R7,
  * R17), exact in both engines.
  */
object Dims {

  /** currency -> (display rate: units per EUR, source-of-truth reciprocal). */
  val rates: Seq[(String, String)] = Seq(
    "EUR" -> "1.000000",
    "USD" -> "0.913242",
    "GBP" -> "1.172515",
    "JPY" -> "0.006101",
    "CNY" -> "0.127424",
    "INR" -> "0.010958",
    "BRL" -> "0.182926",
    "CAD" -> "0.676032",
    "CHF" -> "1.052631",
    "SEK" -> "0.087719"
  )

  /** Currency codes assigned to nations; XXX and AUD are deliberately NOT in
    * `rates` to exercise the missing-rate default path (reference fine print:
    * unknown currency => rate 1.0, `dags/order_currency_conversion_dag.py:108`).
    */
  val nationCodes: Seq[String] = Seq(
    "EUR", "USD", "GBP", "JPY", "CNY", "INR",
    "BRL", "CAD", "CHF", "XXX", "AUD", "SEK")

  /** nation name -> currency, for the 25 synthetic nations NATION_0..24. */
  val nationCurrency: Seq[(String, String)] =
    (0 until 25).map(i => s"NATION_$i" -> nationCodes(i % nationCodes.size))

  /** Dated rate versions for the as-of join (q33): each currency's
    * eur_per_unit revalued at four known instants. Versions derive from the
    * base rate by exact BigDecimal arithmetic at scale 6, so the literal
    * set is identical in both engines.
    */
  val ratesHistory: Seq[(String, String, String)] = {
    val revals = Seq(
      "1995-01-01 00:00:00" -> "1.000000",
      "1996-07-01 00:00:00" -> "1.050000",
      "1998-01-01 00:00:00" -> "0.950000",
      "2000-06-01 00:00:00" -> "1.100000")
    for {
      (cur, base) <- rates
      (ts, factor) <- revals
    } yield (cur, ts,
      new java.math.BigDecimal(base)
        .multiply(new java.math.BigDecimal(factor))
        .setScale(6, java.math.RoundingMode.HALF_UP).toPlainString)
  }

  // ---- DataFrame renderings (broadcast-sized dims) ----

  def ratesDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("currency", StringType, nullable = false),
      StructField("eur_per_unit", DecimalType(10, 6), nullable = false)))
    val rows = rates.map { case (c, r) =>
      Row(c, new java.math.BigDecimal(r))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  def nationCurrencyDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("n_name_key", StringType, nullable = false),
      StructField("currency", StringType, nullable = false)))
    val rows = nationCurrency.map { case (n, c) => Row(n, c) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  def ratesHistoryDf(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("currency", StringType, nullable = false),
      StructField("valid_from", TimestampType, nullable = false),
      StructField("rate", DecimalType(10, 6), nullable = false)))
    val rows = ratesHistory.map { case (c, ts, r) =>
      Row(c, java.sql.Timestamp.valueOf(ts), new java.math.BigDecimal(r))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  // ---- SQL renderings (identical literals for the DuckDB oracle) ----

  /** `(VALUES ('EUR', CAST(1.000000 AS DECIMAL(10,6))), ...) AS <alias>(currency, eur_per_unit)` */
  def ratesSql(alias: String = "r"): String =
    rates.map { case (c, r) => s"('$c', CAST($r AS DECIMAL(10,6)))" }
      .mkString("(VALUES ", ", ", s") AS $alias(currency, eur_per_unit)")

  def nationCurrencySql(alias: String = "nc"): String =
    nationCurrency.map { case (n, c) => s"('$n', '$c')" }
      .mkString("(VALUES ", ", ", s") AS $alias(n_name_key, currency)")

  def ratesHistorySql(alias: String = "h"): String =
    ratesHistory.map { case (c, ts, r) =>
      s"('$c', TIMESTAMP '$ts', CAST($r AS DECIMAL(10,6)))"
    }.mkString("(VALUES ", ", ", s") AS $alias(currency, valid_from, rate)")
}
