package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.sql.{DriverManager, Timestamp}
import java.util.Properties

/** JDBC source/sink — the reference's actual wire (SURVEY.md §2.1 R1, R13,
  * R14, R22), testable here against embedded Derby and identical in shape
  * against Postgres:
  *
  *  - [[readTable]]: predicate/projection pushdown reach the database
  *    (Catalyst pushes `filter`/`select` into the generated SQL — R1+R2's
  *    `WHERE processed_at IS NULL` runs server-side, not in Spark);
  *  - [[appendBatched]]: chunked multi-row INSERT, the reference's
  *    `chunksize=1000` / `commit_every=1000` (R13/R22);
  *  - [[markProcessed]]: the UPDATE writeback (R14) — the one operation the
  *    DataFrame writer cannot express — as executor-side batched
  *    PreparedStatements, one connection and one commit per partition.
  *
  * Scale notes: reads parallelize via `partitionColumn`/`numPartitions`
  * options (each executor issues a range-bounded query); writes and the
  * writeback are per-partition batches, so throughput scales with
  * partitions up to what the database accepts.
  */
object Jdbc {

  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new Properties())

  /** Chunked append. `columnTypes` pins DDL for auto-created tables —
    * needed where the dialect's default string mapping is unqueryable
    * (Derby maps StringType to CLOB, which cannot even be compared).
    */
  def appendBatched(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, columnTypes: String = ""): Unit = {
    val w = df.write.mode("append").option("batchsize", batchSize)
    (if (columnTypes.nonEmpty) w.option("createTableColumnTypes", columnTypes)
     else w).jdbc(url, table, new Properties())
  }

  /** The writeback statement, identifier-quoted through Spark's own
    * `JdbcDialects` registry (VERDICT r9 #7): the registry dispatches on the
    * URL exactly as Spark's read/write paths do, so the one statement the
    * DataFrame writer cannot express stays dialect-correct without engine
    * changes — Derby and Postgres both resolve to ANSI double quotes, MySQL
    * to backticks. Pointing at a real Postgres is then URL + column-type
    * config only (spec-pinned in JdbcSpec's dialect matrix).
    */
  def updateSql(url: String, table: String): String = {
    val d = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    s"UPDATE $table SET ${d.quoteIdentifier("processed_at")} = ? " +
      s"WHERE ${d.quoteIdentifier("order_id")} = ?"
  }

  /** `UPDATE <table> SET processed_at = ? WHERE order_id = ?` for every id,
    * batched `batchSize` at a time (`dags/order_currency_conversion_dag.py:141-150`).
    * Idempotent: re-running with the same ids just rewrites the marker.
    */
  def markProcessed(ids: DataFrame, url: String, table: String,
      ts: Timestamp, batchSize: Int = 1000): Unit =
    ids.select("order_id").foreachPartition { rows: Iterator[Row] =>
      val conn = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        // quoted identifiers: Spark's JDBC writer creates quoted lowercase
        // columns, which unquoted names would not resolve; quoting style
        // comes from the dialect registry (see updateSql)
        val ps = conn.prepareStatement(updateSql(url, table))
        var n = 0
        rows.foreach { r =>
          ps.setTimestamp(1, ts)
          ps.setString(2, r.getString(0))
          ps.addBatch()
          n += 1
          if (n % batchSize == 0) ps.executeBatch()
        }
        ps.executeBatch()
        conn.commit()
        ps.close()
      } finally conn.close()
    }
}
