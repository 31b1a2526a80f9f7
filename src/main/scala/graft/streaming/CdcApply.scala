package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply — a change-data-capture log (upserts + deletes)
  * applied CONTINUOUSLY to a partitioned parquet target: `foreachBatch`
  * + [[graft.ops.Merge.upsertPartitioned]] per micro-batch. This is the
  * shape a warehouse ingest actually runs (VERDICT r13 #3): the
  * incremental pipeline ([[IncrementalPipeline]], x04b) covers
  * append-only facts; real dimension/state tables take upserts and
  * deletes, and their streaming form is exactly MERGE-into-stream.
  *
  * Delivery contract: Structured Streaming's checkpoint gives
  * at-least-once `foreachBatch` delivery, replaying only the LAST
  * uncommitted batch on restart — and the keyed merge is idempotent
  * under exact redelivery (re-upserting the same payload rewrites the
  * same row; re-deleting an absent key is the SQL MERGE no-op), so the
  * composition is effectively-once for the target state. Batch ORDER is
  * the source's contract, as with any CDC consumer: the checkpoint
  * replays batches in original order, never reorders.
  *
  * Scale shape: every micro-batch pays [[graft.ops.Merge
  * .upsertPartitioned]]'s copy-on-write bill — only delta-touched
  * partitions read and rewritten, untouched partition files never
  * opened — so a 100 TB target with day-partitioning absorbs a
  * continuous CDC feed at the cost of the days it touches, not the
  * table (the q92b bytes argument, applied per trigger).
  */
object CdcApply {

  /** Start the apply loop: each micro-batch of `cdc` (carrying the
    * target's columns + `partCol` + `opCol`, optionally `seqCol` for
    * intra-batch latest-wins) merges into the partitioned table at
    * `targetDir`. The checkpoint makes restarts resume at the first
    * unapplied batch.
    */
  def stream(
      cdc: DataFrame,
      targetDir: String,
      keys: Seq[String],
      partCol: String,
      checkpointDir: String,
      opCol: String = "_op",
      seqCol: Option[String] = None): StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Merge.upsertPartitioned(batch.sparkSession, targetDir,
          batch, keys, partCol, opCol, seqCol)
      }
      .start()

  /** The CDC apply loop onto a [[graft.sources.GenTable]] — the ingest
    * composition with the torn-write window CLOSED (r15): [[stream]]'s
    * foreachBatch × upsertPartitioned is effectively-once for the target
    * STATE, but each merge's dynamic overwrite is non-atomic on disk —
    * a crash mid-batch leaves a torn table until the replay heals it.
    * Here every micro-batch commits as one atomic GenTable generation:
    * a crash leaves the LAST COMMITTED state readable (never torn), the
    * replay re-merges idempotently (same delta onto the same snapshot ⇒
    * a new generation with identical content), and the table carries
    * as-of reads of every applied batch until compaction.
    *
    * Crash recovery is START-OF-STREAM, not per batch (ADVICE r15): a
    * merge that died between its publish rename and its commit marker
    * burns the snapshot+1 claim, and every replay of that batch would
    * fail the CAS loudly — availability lost until a manual compact.
    * Since foreachBatch makes this stream the table's single writer,
    * [[graft.sources.GenTable.recover]]'s maintenance-window contract
    * holds at start-up by construction, so the uncommitted (and by the
    * protocol, invisible) generation is rolled back here and the
    * replayed batch re-merges cleanly.
    */
  def streamGen(
      cdc: DataFrame,
      tableDir: String,
      keys: Seq[String],
      partCol: String,
      checkpointDir: String,
      opCol: String = "_op",
      seqCol: Option[String] = None,
      statsCols: Seq[String] = Nil,
      zorder: Boolean = false,
      bloomCols: Seq[String] = Nil): StreamingQuery = {
    graft.sources.GenTable.recover(cdc.sparkSession, tableDir)
    cdc.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyGenBatch(batch, tableDir, keys, partCol, opCol, seqCol,
          statsCols, zorder, bloomCols)
      }
      .start()
  }

  /** One micro-batch onto the GenTable, SELF-MAINTAINING (DedupStream's
    * precedent): after the merge, the measured compaction policy
    * ([[graft.sources.GenTable.shouldCompact]] — per-generation
    * metadata toll only, the data table's bytesAmplified = false rule)
    * decides whether to fold history now. The stream is the table's
    * single writer, so the compactors' maintenance-window contract
    * holds by construction; the check itself is driver-side metadata
    * per trigger, and a fold fires only past the measured crossover
    * (~6 tiny nightly generations at default cadence) — a continuous
    * CDC feed never piles up unbounded read-side generation tolls.
    */
  private[graft] def applyGenBatch(
      batch: DataFrame,
      tableDir: String,
      keys: Seq[String],
      partCol: String,
      opCol: String = "_op",
      seqCol: Option[String] = None,
      statsCols: Seq[String] = Nil,
      zorder: Boolean = false,
      bloomCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    // zorder AND bloomCols thread into BOTH the merge and the
    // self-maintenance compact (ADVICE r16's lesson: a layout/sidecar
    // choice that maintenance does not preserve silently degrades at
    // the first self-compaction)
    graft.sources.GenTable.merge(spark, tableDir, partCol, batch, keys,
      opCol, seqCol, statsCols, zorder, bloomCols = bloomCols)
    if (graft.sources.GenTable.shouldCompact(spark, tableDir))
      graft.sources.GenTable.compact(spark, tableDir, partCol, statsCols,
        zorder, bloomCols)
  }

  /** x26_stream_cdc_gentable: [[x24]]'s harness shape — q92b's deltas
    * as CDC files, checkpoint restart between them — applied through
    * [[streamGen]] to a GenTable target instead of the in-place
    * dynamic-overwrite table. Final view SHARES q92b's oracle, gating
    * the atomic ingest loop (stream → generation-committed MERGE →
    * restart-safe resume) end to end.
    */
  def x26(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = graft.ops.Merge.mergeFixture(spark, dir)
    val root = graft.TempRoots.create("graft_x26_")
    val (cdcDir, tbl, ckpt) = (s"$root/cdc", s"$root/table", s"$root/ckpt")
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    val sch = recent(d1).schema
    def startApply(): StreamingQuery = {
      val cdc = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(cdcDir)
      streamGen(cdc, tbl, Seq("o_orderkey"), "yr", ckpt)
    }
    recent(d1).coalesce(1).write.mode("append").parquet(cdcDir)
    val q1 = startApply()
    try q1.processAllAvailable() finally q1.stop()
    recent(d2).coalesce(1).write.mode("append").parquet(cdcDir)
    val q2 = startApply()
    try q2.processAllAvailable() finally q2.stop()
    graft.sources.GenTable.read(spark, tbl, "yr")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** x30_stream_gentable_sink: the NATIVE SINK gate (VERDICT r17 #5) —
    * x26's exact harness (q92b's deltas as CDC files, checkpoint
    * restart between them) with the apply loop as the one-liner
    * `writeStream.format("gentable").option("keys", …)` instead of the
    * hand-composed foreachBatch: [[graft.sources.GenTableSink]] merges
    * each micro-batch as one atomic generation, auto-inits the table
    * from the FIRST batch (no out-of-band init — t0 arrives as batch
    * 0), self-compacts past the measured crossover, and recovers
    * single-writer crashes on start. Final view SHARES q92b's oracle.
    */
  def x30(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = graft.ops.Merge.mergeFixture(spark, dir)
    val root = graft.TempRoots.create("graft_x30_")
    val (cdcDir, tbl, ckpt) = (s"$root/cdc", s"$root/table", s"$root/ckpt")
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    // t0 itself is the first CDC batch (all upserts) — the sink's
    // auto-init path creates the table from it
    val b0 = t0.withColumn("yr", year(col("o_orderdate")))
      .withColumn("_op", lit("upsert"))
    val sch = b0.schema
    def startApply(): StreamingQuery =
      spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(cdcDir)
        .writeStream.format("gentable")
        .option("path", tbl)
        .option("keys", "o_orderkey")
        .option("partCol", "yr")
        .option("checkpointLocation", ckpt)
        .start()
    b0.coalesce(1).write.mode("append").parquet(cdcDir)
    recent(d1).coalesce(1).write.mode("append").parquet(cdcDir)
    val q1 = startApply()
    try q1.processAllAvailable() finally q1.stop()
    recent(d2).coalesce(1).write.mode("append").parquet(cdcDir)
    val q2 = startApply()
    try q2.processAllAvailable() finally q2.stop()
    graft.sources.GenTable.read(spark, tbl, "yr")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** x24_stream_cdc_apply: the driver gate — q92b's two delta batches
    * arrive as CDC FILES over time (one parquet file each, a file
    * source with `maxFilesPerTrigger = 1`), applied to the same
    * year-partitioned on-disk target, WITH a checkpoint restart between
    * the batches: the first stream drains d1 and stops; a NEW stream on
    * the same checkpoint picks up d2 without re-applying d1. The final
    * target state must equal the chained-CTE rebuild — SHARES q92b's
    * oracle, so the production ingest loop (stream → merge →
    * partitioned target, restart-safe) is oracle-gated end to end.
    */
  def x24(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = graft.ops.Merge.mergeFixture(spark, dir)
    val root = graft.TempRoots.create("graft_x24_")
    val (cdcDir, tgt, ckpt) = (s"$root/cdc", s"$root/target", s"$root/ckpt")
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    t0.withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").parquet(tgt)
    val sch = recent(d1).schema
    def startApply(): StreamingQuery = {
      val cdc = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(cdcDir)
      stream(cdc, tgt, Seq("o_orderkey"), "yr", ckpt)
    }
    recent(d1).coalesce(1).write.mode("append").parquet(cdcDir)
    val q1 = startApply()
    try q1.processAllAvailable() finally q1.stop()
    recent(d2).coalesce(1).write.mode("append").parquet(cdcDir)
    val q2 = startApply()
    try q2.processAllAvailable() finally q2.stop()
    spark.read.parquet(tgt)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }
}
