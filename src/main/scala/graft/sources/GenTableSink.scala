package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions._

/** [[GenTable]] as a native STREAMING SINK (VERDICT r17 #5) —
  * `df.writeStream.format("gentable").option("keys", …)` makes the
  * whole CDC ingest loop one line, wrapping exactly the x24/x26
  * foreachBatch recipe ([[graft.streaming.CdcApply.applyGenBatch]]):
  * every micro-batch commits as ONE atomic generation through
  * [[GenTable.merge]], followed by the measured self-compaction policy
  * — the source-side symmetry x29 established, closed on the write
  * side.
  *
  * Options: `keys` (CSV, required — the merge keys), `partCol`
  * (defaults to the table's recorded column; required before the table
  * exists), `opCol` (default `_op`; a stream WITHOUT that column is
  * append-only and every row upserts), `seqCol`, `statsCols` (CSV),
  * `zorder`, `bloomCols` (CSV) — the layout choices thread into both
  * the merges and the self-compactions (ADVICE r16's lesson).
  *
  * AUTO-INIT: a first batch against a missing table creates it (its
  * delete rows dropped — there is nothing to delete from), so the
  * one-liner needs no out-of-band init.
  *
  * Delivery contract (exactly [[graft.streaming.CdcApply.streamGen]]'s,
  * restated): Structured Streaming replays at most the last uncommitted
  * batch, in order, and the keyed merge is idempotent under exact
  * redelivery (re-upserting the same payload rewrites the same rows;
  * re-deleting an absent key is the MERGE no-op) — effectively-once for
  * the table state, with `batchId` guarding in-process duplicates.
  * RECOVER-ON-START: the sink is the table's single writer by the
  * foreachBatch contract, so construction runs [[GenTable.recover]] —
  * a merge that died between publish rename and commit marker would
  * otherwise burn its claim and fail every replay loudly.
  */
class GenTableSink(spark: SparkSession, dir: String,
    keys: Seq[String], partColOpt: Option[String], opCol: String,
    seqCol: Option[String], statsCols: Seq[String], zorder: Boolean,
    bloomCols: Seq[String]) extends Sink {

  private val fs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableExists: Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir/commits"))

  // single-writer start-up healing (CdcApply.streamGen's rule)
  if (tableExists) GenTable.recover(spark, dir)

  private def partCol: String =
    partColOpt.getOrElse(GenTable.partColOf(spark, dir))

  @volatile private var lastBatch = -1L

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (batchId <= lastBatch) return // in-process duplicate
    // the handed frame is streaming-flagged; re-plan it batch-side (the
    // ForeachBatchSink technique) so the merge's joins are legal
    val batch = org.apache.spark.sql.graftshim.StreamingFrame
      .unwrap(spark, data)
    val withOp =
      if (batch.columns.contains(opCol)) batch
      else batch.withColumn(opCol, lit("upsert")) // append-only stream
    if (!tableExists) {
      val pc = partColOpt.getOrElse(throw new IllegalArgumentException(
        "gentable sink: option partCol is required when the sink " +
          "creates the table (no partcol record exists yet)"))
      // the first batch reduces EXACTLY like every later one (ADVICE
      // r18 medium: the old filter-out-deletes init resurrected an
      // upsert-then-delete key and kept duplicate upserts per key):
      // Merge.upsert against an EMPTY target applies the per-key
      // seqCol latest-wins resolution, the loud ambiguity checks, and
      // drops keys whose final op is delete — the merge path's
      // semantics, shared instead of approximated
      val payload = withOp.drop((opCol +: seqCol.toList): _*)
      val first = graft.ops.Merge.upsert(
        payload.filter(lit(false)), withOp, keys, opCol, seqCol)
      // an all-delete first batch has nothing to create the table from —
      // commit nothing and let a later batch init (init refuses empty)
      if (!first.isEmpty)
        GenTable.init(first, dir, pc, statsCols, zorder, bloomCols)
    } else
      graft.streaming.CdcApply.applyGenBatch(withOp, dir, keys, partCol,
        opCol, seqCol, statsCols, zorder, bloomCols)
    lastBatch = batchId
  }
}
