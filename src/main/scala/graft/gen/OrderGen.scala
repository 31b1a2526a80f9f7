package graft.gen

import graft.Dims
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic order generator — seeded, deterministic mirror of the
  * reference's R21 (`dags/order_generator_dag.py:57-74`):
  * uuid order id, random `[a-z]\d{3,4}@example.com` email, order date
  * uniformly 0..7 days before a base time, amount U(10, 1000) at 2 dp,
  * random currency from the provided list.
  *
  * Unlike the reference's `random.*` (and unlike `rand()`), every column
  * derives from `xxhash64(seed, id, tag)` — the same (seed, n) always
  * yields the same rows, on any cluster at any parallelism, which is what
  * makes generated fixtures usable in tests and re-runnable backfills.
  * `spark.range(n)` distributes generation across executors; nothing is
  * materialized on the driver.
  */
object OrderGen {

  def orders(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      currencies: Seq[String] = Dims.nationCodes,
      baseTs: String = "2026-01-01 00:00:00"): DataFrame = {
    require(currencies.nonEmpty)
    val id = col("id")
    def h(tag: Int) = xxhash64(lit(seed), id, lit(tag))
    val base = lit(baseTs).cast("timestamp")

    spark.range(n).select(
      // uuid4 analog: 32-hex content-derived id (Spark's uuid() is
      // nondeterministic per D4)
      md5(concat_ws("-", lit(seed), id)).as("order_id"),
      // [a-z]\d{3,4}@example.com (dags/order_generator_dag.py:67)
      concat(
        chr(pmod(h(1), lit(26)) + 97),
        (pmod(h(2), lit(9900)) + 100).cast("string"),
        lit("@example.com")).as("customer_email"),
      // now - U{0..7} days (dags/order_generator_dag.py:68)
      timestamp_seconds(unix_timestamp(base) - pmod(h(3), lit(8)) * 86400L)
        .as("order_date"),
      // round(U(10, 1000), 2) (dags/order_generator_dag.py:69)
      ((pmod(h(4), lit(99001)) + 1000).cast("decimal(12,2)") /
        lit(100).cast("decimal(12,2)")).cast("decimal(12,2)").as("amount"),
      // random currency from the fetched list (dags/order_generator_dag.py:70)
      element_at(
        array(currencies.map(lit): _*),
        (pmod(h(5), lit(currencies.size)) + 1).cast("int")).as("currency"),
      base.as("created_at"),
      lit(null).cast("timestamp").as("processed_at"))
  }
}
