package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The nightly dedup pipeline as a STREAM (VERDICT r14 #3) — a
  * continuously-ingesting corpus driving the full standing stack per
  * micro-batch: `foreachBatch { lshDelete; lshAppend; lshProbe;
  * ClusterStore.merge }`. x24 proved the foreachBatch × MERGE
  * composition for the warehouse table; this is the same shape for the
  * dedup stack — every piece existed (the LSH index appends and probes
  * delta-proportionally, ccMerge resolves delta-proportionally, the
  * ClusterStore persists changed rows only), and this operator is their
  * composition under a checkpoint.
  *
  * Per micro-batch of new documents:
  *  1. [[graft.ops.Text.lshDelete]] of the batch's OWN ids — the
  *     idempotency move (r15's tombstone machinery earning its keep):
  *     `foreachBatch` is at-least-once, and a replayed batch would
  *     otherwise double-append its docs into the index (duplicate bucket
  *     rows, duplicate verify rows). Tombstoning first masks every copy
  *     a crashed attempt left, at metadata + delta-proportional cost;
  *     for a first delivery the tombstones mask nothing (deleting
  *     absent ids is the documented no-op).
  *  2. [[graft.ops.Text.lshAppend]] — the batch joins the standing
  *     corpus under the frozen hash family.
  *  3. [[graft.ops.Text.lshProbe]] with the batch against the
  *     now-appended index: (probe, index) pairs at the threshold, self
  *     pairs dropped — exactly [[graft.ops.Text.ccMerge]]'s contract
  *     (cross pairs against corpus ∪ earlier batches, PLUS the
  *     batch-internal pairs, which surface because the batch probes an
  *     index that already contains it).
  *  4. [[graft.ops.ClusterStore.merge]] of those pairs — CAS-serialized,
  *     changed-rows-only. Replaying the same pairs is semantically
  *     idempotent (components are already merged; the re-written rows
  *     carry the same labels, latest-wins reads are unchanged). A claim
  *     left by a crashed merge is released by `recoverClaims` at batch
  *     entry — safe precisely because this stream is the store's single
  *     writer (the ownership contract a CDC consumer already has).
  *
  * Scale shape per trigger: tombstone + append are delta-proportional
  * writes; the probe's shuffles are delta-proportional and its scans
  * probe-proportional (the sub-bucket layout); the store merge writes
  * the changed label set. Nothing corpus-sized happens after the initial
  * build — the continuously-ingesting corpus runs at the cost of its
  * arrivals.
  */
object DedupStream {

  /** Start the loop: each micro-batch of `docs` (carrying `idCol` +
    * `textCol`) appends to the LSH index at `indexDir`, probes, and
    * merges the pairs into the ClusterStore at `storeDir`. Both standing
    * states must exist ([[graft.ops.Text.lshBuild]] /
    * [[graft.ops.ClusterStore.init]]); the checkpoint resumes at the
    * first unapplied batch and the tombstone-first apply makes the
    * replayed batch idempotent.
    */
  def stream(
      docs: DataFrame,
      indexDir: String,
      storeDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.9): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, indexDir, storeDir, idCol, textCol,
          threshold)
      }
      .start()

  /** One micro-batch's apply — the loop body, split out so the replay
    * contract is directly spec-pinned (StreamingSpec applies a batch
    * twice and asserts index probes and store view unchanged).
    *
    * The tombstone is RETRY-ONLY (review r15): an unconditional
    * delete-first would commit a tombs generation of every id ever
    * ingested, so every probe would pay the masking join against a
    * TOTAL-INGEST-sized table from the first batch on. Instead one
    * atomic attempt marker (`indexDir/stream_attempts/<batchId>`,
    * created BEFORE any apply work) distinguishes the cases: marker
    * freshly created ⇒ first delivery, nothing to mask, no tombstone;
    * marker already present ⇒ a previous attempt may have half-applied,
    * so tombstone the batch's ids first. The happy path therefore never
    * grows the tombs table at all — maskTombstones stays the free no-op
    * — while every crash point still replays idempotently (the marker
    * lands before the first append can).
    */
  private[graft] def applyBatch(
      batch: DataFrame,
      batchId: Long,
      indexDir: String,
      storeDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.9): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return // no generations for an empty trigger
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(
      s"$indexDir/stream_attempts/$batchId")
    fs.mkdirs(marker.getParent)
    val retry = !fs.createNewFile(marker)
    val b = batch.persist() // three consumers below; unpersisted per batch
    try {
      graft.ops.ClusterStore.recoverClaims(spark, storeDir)
      if (retry) graft.ops.Text.lshDelete(spark, indexDir, b, idCol)
      graft.ops.Text.lshAppend(spark, indexDir, b, idCol, textCol)
      val pairs = graft.ops.Text
        .lshProbe(spark, indexDir, b, idCol, textCol, threshold)
        .filter(col("probe_id") =!= col("index_id"))
        .select(col("probe_id").as("doc_a"),
          col("index_id").as("doc_b"))
      graft.ops.ClusterStore.merge(spark, storeDir, pairs)
      // SELF-MAINTAINING: the measured compaction policy (SCALE.md r15)
      // runs as part of the loop — the stream is both states' single
      // writer, so the compactors' maintenance-window contract holds by
      // construction. The checks are driver-side metadata per trigger;
      // a fold fires only past the measured crossover (~6 tiny nightly
      // generations at default cadence), amortizing its cost against the
      // per-generation read toll every subsequent probe would pay.
      if (graft.ops.Text.lshShouldCompact(spark, indexDir))
        graft.ops.Text.lshCompact(spark, indexDir)
      if (graft.ops.ClusterStore.shouldCompact(spark, storeDir))
        graft.ops.ClusterStore.compact(spark, storeDir)
      // prune attempt markers below the retained low-watermark (ADVICE
      // r15): Structured Streaming replays only the LAST uncommitted
      // batch, so a marker more than a few batches old can never be
      // consulted again — unpruned, the continuously-ingesting stream
      // this operator exists for accumulates one small file per trigger
      // forever, and a RESET checkpoint (batchIds restarting at 0) would
      // read every reused id as a retry, permanently forcing the
      // tombstone-first path and growing the tombs table on every batch.
      // The sweep is one bounded-dir listing per trigger (≤ the retention
      // window after the first sweep).
      fs.listStatus(marker.getParent).foreach { s =>
        val n = s.getPath.getName
        if (n.nonEmpty && n.forall(_.isDigit) &&
            n.toLong < batchId - RetainedAttempts)
          fs.delete(s.getPath, false)
      }
    } finally b.unpersist()
  }

  /** How many recent attempt markers survive pruning. Anything ≥ 1
    * preserves the retry contract (only the last uncommitted batch can
    * replay); a few extra keep the window honest across a stop between
    * commit and next trigger.
    */
  private val RetainedAttempts = 8L

  /** x25_stream_dedup_pipeline: the driver gate — the q41 fixture's
    * delta (`doc_id % 5 = 4`) arrives as TWO parquet files over a file
    * source (`maxFilesPerTrigger = 1`), applied to a standing index +
    * store built over the other 80%, WITH a checkpoint restart between
    * the chunks (x24's harness shape): the first stream drains chunk 1
    * and stops; a new stream on the same checkpoint picks up chunk 2
    * without re-applying chunk 1. The final store view must equal q41's
    * batch resolution over the FULL corpus — SHARES q41's oracle, so the
    * continuously-ingesting corpus loop (stream → index append → probe →
    * cluster merge, restart-safe) is oracle-gated end to end. Sequential
    * merges compose by ccMerge's contract: chunk 1's pairs cover every
    * edge with a chunk-1 endpoint vs corpus ∪ chunk 1; chunk 2's cover
    * chunk 2 vs corpus ∪ both — together the full rebuild's components.
    */
  def x25(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 4)
    val root = graft.TempRoots.create("graft_x25_")
    val (idx, store, src, ckpt) =
      (s"$root/idx", s"$root/store", s"$root/docs", s"$root/ckpt")
    graft.ops.Text.lshBuild(corpus, idx)
    graft.ops.ClusterStore.init(
      graft.ops.Text.dupComponentsStar(
        graft.ops.Text.minhashPairs(corpus)), store)
    val delta = docs.filter(pmod(col("doc_id"), lit(5L)) === 4)
      .select("doc_id", "text")
    def startApply(): StreamingQuery = {
      val in = spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      stream(in, idx, store, ckpt)
    }
    delta.filter(pmod(col("doc_id"), lit(10L)) === 4)
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = startApply()
    try q1.processAllAvailable() finally q1.stop()
    delta.filter(pmod(col("doc_id"), lit(10L)) === 9)
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = startApply()
    try q2.processAllAvailable() finally q2.stop()
    graft.ops.ClusterStore.read(spark, store)
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("comp"))).cast("long"))
      .select(col("id").as("doc_id"), col("comp").as("component"),
        col("cluster_size"))
      .orderBy("doc_id")
  }
}
