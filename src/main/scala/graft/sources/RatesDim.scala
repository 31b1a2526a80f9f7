package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** The exchange-rate dimension source with the reference's acquisition
  * semantics (SURVEY.md §2.1 R16–R20, R25; §3.3):
  *
  *  - an external provider fetched at most once per calendar day — the
  *    reference memoizes the HTTP response in a day-keyed Airflow Variable
  *    (`dags/order_currency_conversion_dag.py:33-42`, 2-calls/day budget);
  *    here the memo is a parquet store keyed by day;
  *  - validation: the response must contain the base currency or the run
  *    fails fast (`:55-56`, R25);
  *  - EUR re-basing: rate[c] = usd_rate[c] / usd_rate["EUR"], a
  *    scalar-broadcast projection (`:58-60`, R17);
  *  - the result is a small (currency, rate) DataFrame meant for
  *    `broadcast()` into the conversion join (R7).
  *
  * The provider is an injection point: production would do the HTTP GET
  * (driver-side — a dimension of a few hundred rows has no business being
  * a distributed read); tests and this zero-egress environment plug in a
  * literal table.
  */
object RatesDim {

  /** External source of USD-based rates for a given day (R16's API). */
  trait RatesProvider {
    def fetch(day: LocalDate): Map[String, Double]
  }

  /** Zero-egress stand-in for the openexchangerates API: fixed USD-based
    * rates, any day. */
  object StaticProvider extends RatesProvider {
    override def fetch(day: LocalDate): Map[String, Double] = Map(
      "EUR" -> 0.92, "USD" -> 1.0, "GBP" -> 0.78, "JPY" -> 151.0,
      "CNY" -> 7.23, "INR" -> 83.9, "BRL" -> 5.03, "CAD" -> 1.36,
      "CHF" -> 0.87, "SEK" -> 10.5)
  }

  /** Day-memoized, EUR-rebased rates dimension (R17+R18). `resolve` hits
    * the provider only on a memo miss for that day; replays and retries
    * within the day are free, mirroring the reference's API-call budget.
    */
  final class DailyCachedRates(
      spark: SparkSession, storeDir: String, provider: RatesProvider) {

    /** Provider invocations, for tests asserting the once-per-day budget. */
    @volatile var fetchCount: Int = 0

    private def memoPath(day: LocalDate) = s"$storeDir/day=$day"

    def resolve(day: LocalDate): DataFrame = {
      val path = memoPath(day)
      // All memo-store probes go through the Hadoop FileSystem API so the
      // store may be hdfs://, s3a:// or file: — a java.io.File check against
      // a scheme-qualified URI always reports "missing", which would silently
      // re-fetch every resolve (blowing the 2-calls/day budget this class
      // exists to enforce) and never clear a partial write. Same fix class
      // as IncrementalPipeline.fsFor (VERDICT r3 #2).
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a memo hit requires the COMMITTED marker, not mere dir existence:
      // Spark creates the directory at job start, so a crash mid-write
      // would otherwise wedge the whole day on an unreadable partial memo
      if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
        fs.delete(dir, true) // clear any partial write from a crashed attempt
        val usdRates = provider.fetch(day)
        fetchCount += 1
        // R25: fail fast if the base currency is missing from the response
        val eurRate = usdRates.getOrElse("EUR",
          throw new IllegalStateException(
            s"EUR missing from rates response for $day"))
        // R17: re-base every rate to units-per-EUR
        val rebased = usdRates.view.mapValues(_ / eurRate).toSeq
        import spark.implicits._
        rebased.toDF("currency", "rate")
          .coalesce(1).write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }

    /** Rates ready for the conversion join: broadcast-hinted. */
    def broadcastable(day: LocalDate): DataFrame = broadcast(resolve(day))
  }
}
