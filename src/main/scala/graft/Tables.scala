package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet test tables (TESTDATA.md).
  *
  * All declared queries take the scale-factor directory as a parameter so the
  * same plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench). At
  * cluster scale these would be partitioned-directory reads; the API shape is
  * identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Every table goes through [[sources.AdaptiveParquet]]: the driver has
    * regenerated fixtures across rounds with different temporal encodings
    * (TIMESTAMP(NANOS) → MICROS-NTZ), and a real lake mixes more — the
    * adaptive read probes one footer and normalizes every temporal column
    * to TimestampType under the project's UTC session, so no query plan
    * depends on which writer produced a file.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    sources.AdaptiveParquet.read(spark, s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts has shipped in TWO parquet encodings across fixture
    * generations — TIMESTAMP(NANOS) in rounds 1–7, TIMESTAMP(MICROS,
    * adjustedToUTC=false) since round 8 — which is exactly the failure
    * class [[sources.AdaptiveParquet]] exists for: footer-probed
    * dispatch, ns→µs integer floor (DuckDB's own narrowing) for nanos
    * files in ANY session (flag or no flag), NTZ→TIMESTAMP canonical
    * cast under the UTC session otherwise. Every (encoding × session
    * flag) combination is pinned in FormatsSpec against spec-written
    * fixtures of all three encodings.
    */
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
