package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query obeys the determinism rules of SURVEY.md §2.2:
  * total ORDER BY on a unique key, decimal-exact arithmetic with a final
  * cast to DOUBLE for money/float columns, UTC, no nondeterministic
  * functions, DuckDB-parity SQL in [[oracleSql]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Convert.q03(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.3. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q03_convert_currency" -> ((s, d) => ops.Convert.q03(s, d))
  )

  /** DuckDB-equivalent SQL per declared query (driver's correctness gate). */
  def oracleSql: Map[String, String] = Map(
    "q03_convert_currency" -> ops.Convert.q03Sql
  )
}
