package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The ONE compatibility shim the V1 streaming-source contract forces:
  * `Source.getBatch` must return a frame flagged `isStreaming = true`
  * (MicroBatchExecution asserts it — "DataFrame returned by getBatch
  * … did not have isStreaming=true"), and the only constructor for
  * such a frame, `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming)`, is `private[sql]` — Spark's own file stream source
  * builds its batches through exactly this call
  * (FileStreamSource.getBatch). Placing this object under
  * `org.apache.spark.sql` is the standard V1-connector technique for
  * reaching it; nothing else in the repo lives outside `graft`.
  *
  * Used only by the gentable connector ([[graft.sources.GenTableStream]],
  * [[graft.sources.GenTableSink]], and the SQL command translations).
  */
object StreamingFrame {

  /** Wrap an already-planned batch (its `queryExecution.toRdd`) as a
    * streaming-flagged DataFrame with the given schema.
    */
  def wrap(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Re-plan a micro-batch handed to `Sink.addBatch` as a PLAIN batch
    * frame: the incoming frame is flagged streaming (batch-only
    * operators — joins, aggregates outside watermarks — reject it), so
    * the sink re-wraps its computed rows batch-side, exactly as Spark's
    * own ForeachBatchSink/console sink do before handing user code the
    * frame. Used only by [[graft.sources.GenTableSink]].
    */
  def unwrap(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = false)

  /** A DataFrame over a logical plan — `Dataset.ofRows`, which is
    * likewise `private[sql]`. Used only by the gentable MERGE INTO
    * command to resolve its (deferred, still-unanalyzed) source plan at
    * execution time.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
