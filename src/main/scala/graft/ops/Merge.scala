package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic keyed MERGE (upsert/delete) — the warehouse verb the SCD2
  * family's machinery implies but never exposes directly: `MERGE delta
  * INTO target ON key` with insert, update and delete actions in one
  * delta batch (VERDICT r12 #3). The reference's ON CONFLICT upsert
  * (`init/postgres-2/init.sql:2` PK guard + the DAG's idempotent
  * re-writes) generalized to arbitrary keys and payloads.
  *
  * Spark-first shape: a MERGE against an immutable columnar target is a
  * COPY-ON-WRITE rewrite — `target ANTI-JOIN delta-keys` (rows the delta
  * does not touch pass through) `UNION ALL` the delta's surviving
  * upserts. Two delta-bounded shuffles at most: the anti join hashes on
  * the key (AQE converts it to a runtime broadcast when the resolved
  * delta is small — the common case — with no hint pinning the strategy,
  * scd2Merge's documented rationale), and the optional latest-wins
  * resolution windows over the delta only. The target is never sorted,
  * never windowed, never shuffled beyond the anti join. This operator is
  * the kernel a lake table format (Delta/Iceberg/Hudi) wraps with file
  * pruning; semantics and plan shape are what they execute per touched
  * file group.
  *
  * Delta contract: one payload row per key per batch. Exact FULL-ROW
  * duplicates collapse silently first — at-least-once redelivery of the
  * same record is unambiguous and must not abort the merge. Past that:
  * with `seqCol`, delta logs resolve LATEST-WINS per key (two DISTINCT
  * payloads tying on the max sequence fail loudly — two different
  * "latest" rows have no right answer); without it, conflicting rows
  * for a key fail loudly at execution (`assert_true` inside the plan —
  * no silent last-writer-wins). Ops: `upsert` (insert or replace) and
  * `delete` (absent keys a no-op, as in SQL MERGE's WHEN MATCHED THEN
  * DELETE); any other op value fails loudly, checked on the RAW delta
  * before resolution so a malformed non-latest row cannot vanish
  * unexamined.
  */
object Merge {

  /** Apply `delta` to `target` keyed by `keys`: the returned frame is the
    * post-merge target state. `delta` carries the target's payload
    * columns plus `opCol` ('upsert' | 'delete') and optionally `seqCol`
    * for latest-wins resolution of multi-row-per-key deltas.
    */
  def upsert(
      target: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      opCol: String = "_op",
      seqCol: Option[String] = None,
      evolveSchema: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "merge: at least one key column")
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*)
    // op validity is checked on the RAW delta, before any resolution —
    // a malformed op on a non-latest row must fail loudly, not be
    // silently dropped by the latest-wins filter (review r13). Exact
    // full-row duplicates collapse first: at-least-once redelivery of
    // the SAME record is unambiguous and must not trip the ambiguity
    // guards below.
    val checked = delta
      .withColumn("__op_chk", assert_true(
        col(opCol).isin("upsert", "delete"),
        concat(lit("merge: unknown op '"), col(opCol),
          lit("' (expected upsert|delete) for key "),
          concat_ws(",", keyCols: _*))))
      .filter(col("__op_chk").isNull).drop("__op_chk")
      .distinct()
    // resolve to exactly one row per key, loudly rejecting ambiguity
    val resolved = seqCol match {
      case Some(s) =>
        checked
          .withColumn("__rn", row_number().over(w.orderBy(col(s).desc)))
          .withColumn("__tie", count(lit(1)).over(
            Window.partitionBy((keyCols :+ col(s)): _*)))
          .filter(col("__rn") === 1)
          .withColumn("__chk", assert_true(col("__tie") === 1,
            concat(lit("merge: two DISTINCT delta rows tie on the max " +
              s + " for key "), concat_ws(",", keyCols: _*))))
          .filter(col("__chk").isNull)
          .drop("__rn", "__tie", "__chk", s)
      case None =>
        checked
          .withColumn("__n", count(lit(1)).over(w))
          .withColumn("__chk", assert_true(col("__n") === 1,
            concat(lit("merge: conflicting delta rows for key "),
              concat_ws(",", keyCols: _*),
              lit(" — pass seqCol for latest-wins resolution"))))
          .filter(col("__chk").isNull)
          .drop("__n", "__chk")
    }
    // schema evolution (VERDICT r13 #4, the lake `mergeSchema` write-side
    // counterpart of q89's readEvolved): delta columns ABSENT from the
    // target null-fill every old row when `evolveSchema` is on, and fail
    // loudly when it is off — never silently dropped. Target columns
    // absent from the delta remain a hard error either way (an upsert
    // that cannot state a row's full payload has no right answer).
    val newCols = resolved.columns
      .filterNot(c => c == opCol || target.columns.contains(c))
    require(newCols.isEmpty || evolveSchema,
      s"merge: delta adds column(s) ${newCols.mkString(", ")} not in the " +
        "target — pass evolveSchema = true to evolve the target (old rows " +
        "null-fill), or align the schemas")
    val dt = resolved.schema
    val base = newCols.foldLeft(target)((t, c) =>
      t.withColumn(c, lit(null).cast(dt(c).dataType)))
    val untouched = base.join(resolved.select(keyCols: _*),
      keys, "left_anti")
    val upserts = resolved.filter(col(opCol) =!= "delete").drop(opCol)
    // unionByName: the delta payload must carry exactly the (evolved)
    // target's columns — a missing column fails at analysis, not silently
    untouched.unionByName(upserts)
  }

  // ---- q92: the declared two-batch MERGE query ----

  /** q92_merge_upsert: two chained MERGE batches over the orders fixture,
    * final target state gated against a chained-CTE oracle (q46b's
    * precedent). The batches exercise every action path: update an
    * existing row, insert a new key, delete an existing key, delete a key
    * the PREVIOUS batch inserted, and re-insert a key the previous batch
    * deleted. Payload mutations stay in exact double arithmetic
    * (+10.0, *0.5, +0.25 — all IEEE-exact) so Spark and DuckDB agree
    * bit-for-bit.
    */
  /** The shared q92/q92b fixture: initial target (every key except
    * o_orderkey % 4 = 3) and the two delta batches exercising every
    * action path. q92b restricts the deltas to years ≥ 1996 so the
    * pre-1996 partitions (the fixture spans order years 1995–2001)
    * are genuinely untouched — the property its gate exists to prove.
    */
  private[graft] def mergeFixture(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val all = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
    val t0 = all.filter(col("o_orderkey") % 4 =!= 3)
    val k = col("o_orderkey")
    val d1 = all.filter(k % 8 === 1)
      .select(k, lit("U1").as("o_orderstatus"),
        (col("o_totalprice") + lit(10.0)).as("o_totalprice"),
        col("o_orderdate"), lit("upsert").as("_op"))
      .unionByName(all.filter(k % 8 === 3)
        .select(k, lit("I1").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), lit("upsert").as("_op")))
      .unionByName(all.filter(k % 8 === 2)
        .select(k, col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), lit("delete").as("_op")))
    val d2 = all.filter(k % 8 === 5)
      .select(k, lit("U2").as("o_orderstatus"),
        (col("o_totalprice") * lit(0.5)).as("o_totalprice"),
        col("o_orderdate"), lit("upsert").as("_op"))
      .unionByName(all.filter(k % 8 === 3)
        .select(k, col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), lit("delete").as("_op")))
      .unionByName(all.filter(k % 16 === 2)
        .select(k, lit("R2").as("o_orderstatus"),
          (col("o_totalprice") + lit(0.25)).as("o_totalprice"),
          col("o_orderdate"), lit("upsert").as("_op")))
    (t0, d1, d2)
  }

  def q92(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val m1 = upsert(t0, d1, Seq("o_orderkey"))
    val m2 = upsert(m1, d2, Seq("o_orderkey"))
    m2.orderBy("o_orderkey")
  }

  /** Partitioned copy-on-write MERGE against an ON-DISK parquet target —
    * the shape a 100 TB table actually merges in: the plain [[upsert]]
    * rewrites the WHOLE target per batch (linear in the target — the
    * measured 6.8× at sf10), which no nightly can afford at scale; here
    * only the partitions the delta TOUCHES are read (partition-pruned
    * scan, plan-asserted) and rewritten (Spark's dynamic partition
    * overwrite), and every other partition's files are left physically
    * untouched (spec-asserted at the file level). This is exactly the
    * per-touched-file-group behavior lake table formats implement over
    * this same kernel.
    *
    * Contract (the standard lake-merge constraint): `partCol` must be
    * functionally dependent on the key and IMMUTABLE under updates —
    * a delta row claiming a different partition than the key's current
    * row would leave the stale row in the old partition. Violations
    * whose current row sits inside the TOUCHED slice are caught loudly
    * (the partial guard below — both sides are already in hand); ones
    * against untouched partitions are undetectable without reading
    * every partition, which defeats the operator. Deletes must carry the row's partition for the same
    * reason. A touched partition whose rows are ALL deleted is removed
    * explicitly (dynamic overwrite only rewrites partitions PRESENT in
    * the output — without the cleanup, fully-deleted partitions would
    * silently survive). The staged-write ordering (stage the merged
    * slice, then overwrite) keeps the read and the overwrite of
    * `targetDir` in separate jobs; the overwrite itself is
    * per-partition, maintenance-window semantics as with any lake
    * rewrite.
    */
  def upsertPartitioned(
      spark: SparkSession,
      targetDir: String,
      delta: DataFrame,
      keys: Seq[String],
      partCol: String,
      opCol: String = "_op",
      seqCol: Option[String] = None): Unit = {
    val target = spark.read.parquet(targetDir)
    val touched = delta.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq // bounded by the table's partition count
    if (touched.isEmpty) return
    val slice = guardedSlice(target, delta, keys, partCol, touched)
    // the delta keeps partCol: the read-back target carries it too, and
    // unionByName inside upsert enforces the schemas match column-for-column
    val merged = upsert(slice, delta, keys, opCol, seqCol)
    // stage first: Spark refuses to overwrite a path it is reading from,
    // and a complete staged slice is also the crash-safe ordering
    val stage = graft.TempRoots.create("graft_merge_stage_")
    val fs = new org.apache.hadoop.fs.Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // delete the stage on EVERY exit: success (fully consumed below) and
    // failure alike — the in-plan guard aborts MID staged write, and a
    // CdcApply retrying a poisoned micro-batch would otherwise leak one
    // partial stage copy per attempt until JVM exit (review r14; the
    // success-path half is review r13)
    try {
      merged.write.mode("overwrite").parquet(stage)
      val staged = spark.read.parquet(stage)
      staged
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(targetDir)
      // fully-deleted partitions: present in touched, absent from output.
      // Directory names go through the SAME Hive-style escaping the writer
      // used — a raw s"$partCol=$v" misses escaped characters (':' →
      // '%3A') and nulls ('__HIVE_DEFAULT_PARTITION__'), leaving the ghost
      // partition alive with its delete silently ignored (review r13).
      val remaining = staged.select(col(partCol)).distinct()
        .collect().map(_.get(0)).toSet
      val gone = touched.filterNot(remaining)
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      gone.foreach { v =>
        val leaf =
          if (v == null) s"$partCol=${ExternalCatalogUtils.DEFAULT_PARTITION_NAME}"
          else ExternalCatalogUtils.getPartitionPathString(
            partCol, v.toString)
        val p = new org.apache.hadoop.fs.Path(s"$targetDir/$leaf")
        require(!fs.exists(p) || fs.delete(p, true),
          s"merge: could not remove fully-deleted partition $p")
      }
    } finally fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    ()
  }

  /** The touched-partition slice of `target`, move-guarded — shared by
    * [[upsertPartitioned]] and [[graft.sources.GenTable.merge]] so the
    * two partitioned-merge flavors cannot drift on the contract.
    *
    * NULL-SAFE membership: isin never matches null, so a delta touching
    * the null partition (__HIVE_DEFAULT_PARTITION__) would otherwise
    * read an EMPTY slice of it — the dynamic overwrite then drops every
    * untouched null-partition row, and a delete-only delta routes null
    * into `gone` and removes the whole directory (ADVICE r13).
    *
    * PARTIAL partCol-immutability guard (VERDICT r13): a delta key
    * whose current row sits in a touched partition under a DIFFERENT
    * partition value fails loudly instead of silently stranding the
    * stale row. The guard rides IN-PLAN (assert_true on a left join of
    * the small delta key→partition map, upsert's op-check technique) so
    * the touched slice is scanned exactly ONCE — a collect-based probe
    * would double the merge's read I/O, which CdcApply pays per
    * micro-batch (review r14). Violations whose current row lives in an
    * UNTOUCHED partition remain out of reach (detecting them needs a
    * full-table read, which defeats the operator) — that residue is the
    * documented contract.
    */
  private[graft] def guardedSlice(
      target: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      partCol: String,
      touched: Seq[Any]): DataFrame = {
    val touchedNonNull = touched.filter(_ != null)
    val sliceFilter = {
      val base =
        if (touchedNonNull.nonEmpty) col(partCol).isin(touchedNonNull: _*)
        else lit(false)
      if (touched.contains(null)) base || col(partCol).isNull else base
    }
    val deltaParts = delta
      .select(keys.map(col) :+ col(partCol).as("__delta_part"): _*)
      .distinct()
      // presence is a separate flag: a delta row may legitimately carry
      // a NULL partition value, which must still be move-checked — the
      // value column alone cannot distinguish "no delta row" from it
      .withColumn("__delta_present", lit(true))
    target.filter(sliceFilter)
      .join(deltaParts, keys, "left")
      .withColumn("__part_chk", assert_true(
        col("__delta_present").isNull ||
          col(partCol) <=> col("__delta_part"),
        // coalesce: concat is null if ANY operand is — and null
        // partition values are exactly one of the moves this guard
        // catches; without it the null-move case throws with a NULL
        // message instead of naming the contract (review r14)
        concat(lit("upsertPartitioned: delta moves key "),
          concat_ws(",", keys.map(col): _*),
          lit(s" from partition $partCol="),
          coalesce(col(partCol).cast("string"), lit("null")),
          lit(s" to $partCol="),
          coalesce(col("__delta_part").cast("string"), lit("null")),
          lit(" — partCol is immutable under merge; delete in the old " +
            "partition and insert in the new one"))))
      .filter(col("__part_chk").isNull)
      .drop("__part_chk", "__delta_part", "__delta_present")
  }

  /** q92b_merge_partitioned: the two q92 merge batches, restricted to
    * order years ≥ 1996, against a REAL parquet target partitioned by
    * order year — [[upsertPartitioned]]'s full path: partition-pruned
    * slice read, dynamic-overwrite rewrite of touched partitions only,
    * pre-1996 files physically untouched (MergeSpec pins the file-level
    * invariant and the pruning plan). Own oracle: q92's chained CTEs
    * with the year predicate on both deltas.
    */
  def q92b(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val root = graft.TempRoots.create("graft_q92b_")
    val tgt = s"$root/target"
    t0.withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").parquet(tgt)
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    upsertPartitioned(spark, tgt, recent(d1), Seq("o_orderkey"), "yr")
    upsertPartitioned(spark, tgt, recent(d2), Seq("o_orderkey"), "yr")
    spark.read.parquet(tgt)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** The two merges restated as chained CTEs: anti join == NOT EXISTS,
    * upsert union, same exact-double payload arithmetic. `pred` is the
    * extra delta-row predicate — empty for q92, the year restriction for
    * q92b — ONE template for both oracles so they cannot drift.
    */
  private def mergeSqlCte(pred: String, evolve: Boolean = false,
      batches: Int = 2, rowDeletePred: String = "",
      finalWhere: String = "", updatePred: String = "",
      insertPred: String = ""): String = {
    require(batches == 1 || batches == 2, s"batches: $batches")
    require(Seq(rowDeletePred, finalWhere, updatePred, insertPred)
      .count(_.nonEmpty) <= 1, "one final CTE flavor at a time")
    val rvD2 = if (evolve) ", 'rv-' || o_orderkey AS o_review" else ""
    val rvNull = if (evolve) ", NULL AS o_review" else ""
    val rvSel = if (evolve) ", o_review" else ""
    // the row-level DELETE batch (q92f): everything in the merged state
    // except the keys the takedown names — the masked read's semantics;
    // or the range predicate (q92g): the file-skipped read's semantics
    val del =
      if (rowDeletePred.nonEmpty)
        s",\nm3 AS (\n  SELECT * FROM m2 WHERE NOT ($rowDeletePred))"
      else if (finalWhere.nonEmpty)
        s",\nm3 AS (\n  SELECT * FROM m2 WHERE $finalWhere)"
      else if (updatePred.nonEmpty)
        // the SQL UPDATE's semantics (q92o): fixed assignments under the
        // predicate, every RHS against the pre-update row — scalar double
        // arithmetic, identical operand order both engines
        s""",
          |m3 AS (
          |  SELECT o_orderkey,
          |         CASE WHEN $updatePred THEN 'X9'
          |              ELSE o_orderstatus END AS o_orderstatus,
          |         CASE WHEN $updatePred THEN o_totalprice + 2.0
          |              ELSE o_totalprice END AS o_totalprice,
          |         o_orderdate
          |  FROM m2)""".stripMargin
      else if (insertPred.nonEmpty)
        // the SQL INSERT's semantics (q92p): plain bag append of rows
        // whose keys the merge chain never produced
        s""",
          |m3 AS (
          |  SELECT * FROM m2
          |  UNION ALL
          |  SELECT o_orderkey, 'N3' AS o_orderstatus, o_totalprice,
          |         o_orderdate
          |  FROM orders WHERE $insertPred)""".stripMargin
      else ""
    val finalCte =
      if (del.nonEmpty) "m3" else if (batches == 1) "m1" else "m2"
    s"""WITH t0 AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM orders WHERE o_orderkey % 4 <> 3),
      |d1 AS (
      |  SELECT o_orderkey, 'U1' AS o_orderstatus,
      |         o_totalprice + 10.0 AS o_totalprice, o_orderdate,
      |         'upsert' AS op
      |  FROM orders WHERE o_orderkey % 8 = 1$pred
      |  UNION ALL
      |  SELECT o_orderkey, 'I1', o_totalprice, o_orderdate, 'upsert'
      |  FROM orders WHERE o_orderkey % 8 = 3$pred
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate,
      |         'delete'
      |  FROM orders WHERE o_orderkey % 8 = 2$pred),
      |m1 AS (
      |  SELECT t.* FROM t0 t
      |  WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.o_orderkey = t.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM d1 WHERE op <> 'delete'),
      |d2 AS (
      |  SELECT o_orderkey, 'U2' AS o_orderstatus,
      |         o_totalprice * 0.5 AS o_totalprice, o_orderdate,
      |         'upsert' AS op$rvD2
      |  FROM orders WHERE o_orderkey % 8 = 5$pred
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate,
      |         'delete'$rvD2
      |  FROM orders WHERE o_orderkey % 8 = 3$pred
      |  UNION ALL
      |  SELECT o_orderkey, 'R2',
      |         o_totalprice + 0.25, o_orderdate, 'upsert'$rvD2
      |  FROM orders WHERE o_orderkey % 16 = 2$pred),
      |m2 AS (
      |  SELECT m.*$rvNull FROM m1 m
      |  WHERE NOT EXISTS (SELECT 1 FROM d2 WHERE d2.o_orderkey = m.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate$rvSel
      |  FROM d2 WHERE op <> 'delete')$del
      |SELECT * FROM $finalCte ORDER BY o_orderkey""".stripMargin
  }

  val q92Sql: String = mergeSqlCte("")

  /** [[q92b]] restated: the same template with both deltas restricted to
    * years ≥ 1996 (the pre-1996 partitions stay untouched on disk).
    */
  val q92bSql: String = mergeSqlCte(" AND year(o_orderdate) >= 1996")

  /** q92d_merge_gentable: q92b's two batches through [[graft.sources
    * .GenTable]] — every merge an ATOMIC generation (stage → manifest →
    * marker; the torn-write window of q92b's in-place dynamic overwrite
    * closed), plus a compaction, then the current view. Same final state
    * as q92b by construction: SHARES q92b's oracle, which gates init →
    * merge → merge → compact → read end to end (the x21b lifecycle
    * precedent for the warehouse table).
    */
  def q92d(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92d_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))
    graft.sources.GenTable.compact(spark, tbl, "yr")
    graft.sources.GenTable.read(spark, tbl, "yr")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** q92k_sql_gentable: q92d's exact write sequence, read back through
    * PURE SQL — `SELECT … FROM gentable.`dir`` (VERDICT r16 #1): the
    * multi-generation table resolves through the registered `gentable`
    * data source ([[graft.sources.GenTableSource]] — a custom FileIndex
    * under Spark's own HadoopFsRelation, so the scan is the native
    * vectorized parquet path), NOT the Scala object API. Same final
    * state as q92b/q92d by construction — SHARES q92b's oracle, gating
    * the whole SQL entry (analyzer rule → generation resolution →
    * pinned schema → pruned scan) end to end. Unlike q92d this read
    * happens BEFORE compaction, so the SQL path is gated on genuine
    * multi-generation resolution, not a folded single generation.
    */
  def q92k(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92k_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))
    spark.sql(
      s"""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
         |FROM gentable.`$tbl`
         |ORDER BY o_orderkey""".stripMargin)
  }

  /** q92m_merge_sql: q92b's two batches issued as SQL `MERGE INTO
    * gentable.`dir`` statements — the warehouse WRITE statement
    * (reads entered through q92k): the CDC-canonical shape (WHEN
    * MATCHED AND s._op = 'delete' THEN DELETE / WHEN MATCHED THEN
    * UPDATE SET * / WHEN NOT MATCHED AND s._op <> 'delete' THEN
    * INSERT *) translates through [[graft.sources.GenTableMerge]] into
    * [[graft.sources.GenTable.merge]]'s atomic generation commit, with
    * per-row MATCHED-ness computed exactly (one semi/anti key join —
    * the join MERGE semantics require). Same final state as q92b —
    * SHARES its oracle, read back through the SQL surface too.
    */
  def q92m(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92m_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    recent(d1).createOrReplaceTempView("gt_merge_sql_d1")
    recent(d2).createOrReplaceTempView("gt_merge_sql_d2")
    Seq("gt_merge_sql_d1", "gt_merge_sql_d2").foreach { v =>
      spark.sql(
        s"""MERGE INTO gentable.`$tbl` t USING $v s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND s._op = 'delete' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED AND s._op <> 'delete' THEN INSERT *
           |""".stripMargin)
    }
    spark.sql(
      s"""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
         |FROM gentable.`$tbl`
         |ORDER BY o_orderkey""".stripMargin)
  }

  /** q92n_delete_sql: q92f's scattered GDPR takedown issued as SQL
    * `DELETE FROM gentable.`dir` WHERE o_orderkey % 32 = 9` (VERDICT
    * r17 #1 — the single most common warehouse write after append,
    * previously Scala-only). [[graft.sources.GenTableDml]] routes the
    * statement onto [[graft.sources.GenTable.deleteRows]]: the WHERE
    * clause's referenced column (o_orderkey) becomes the tombstone key
    * shape and the distinct matching keys the tombstone generation — no
    * partition read or rewritten, exactly q92f's bill. Same final state
    * as q92f — SHARES its oracle, read back through SQL too.
    */
  def q92n(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92n_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))
    spark.sql(s"DELETE FROM gentable.`$tbl` WHERE o_orderkey % 32 = 9")
    spark.sql(
      s"""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
         |FROM gentable.`$tbl`
         |ORDER BY o_orderkey""".stripMargin)
  }

  /** q92r_delete_null_sql: the NULL-keyed takedown (VERDICT r18's one
    * correctness edge, now oracle-gated): a table whose `o_orderstatus`
    * is NULL for keys ≡ 1 (mod 8), then `DELETE FROM gentable.`dir`
    * WHERE o_orderstatus IS NULL OR o_orderstatus = 'P'` — the derived
    * tombstone keys are the distinct matching status values, which
    * include the (NULL) tuple. Under the old EqualTo mask the NULL-keyed
    * tombstone matched nothing and every NULL-status row kept being
    * served (a silently ineffective GDPR delete); the null-safe `<=>`
    * mask removes both the NULL-keyed and the 'P'-keyed rows in the one
    * tombstone generation. Own oracle: DuckDB's DELETE handles IS NULL
    * natively, restated as the complement filter.
    */
  def q92r(spark: SparkSession, dir: String): DataFrame = {
    val tbl = s"${graft.TempRoots.create("graft_q92r_")}/table"
    val t = Tables.orders(spark, dir).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 8 === 1, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"))
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(t, tbl, "yr")
    spark.sql(s"DELETE FROM gentable.`$tbl` " +
      "WHERE o_orderstatus IS NULL OR o_orderstatus = 'P'")
    spark.sql(
      s"""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
         |FROM gentable.`$tbl`
         |ORDER BY o_orderkey""".stripMargin)
  }

  val q92rSql: String =
    """WITH t AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 8 = 1 THEN NULL
      |              ELSE o_orderstatus END AS o_orderstatus,
      |         o_totalprice, o_orderdate
      |  FROM orders)
      |SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      |FROM t
      |WHERE NOT (o_orderstatus IS NULL OR o_orderstatus = 'P')
      |ORDER BY o_orderkey""".stripMargin

  /** q92o_update_sql: a predicate UPDATE issued as SQL — `UPDATE
    * gentable.`dir` SET o_orderstatus = 'X9', o_totalprice =
    * o_totalprice + 2.0 WHERE o_totalprice > 200000.0` (VERDICT r17
    * #1), routed onto [[graft.sources.GenTable.updateWhere]]: exactly
    * the partitions holding matches rewrite copy-on-write as one atomic
    * generation, all assignment RHS against the pre-update row. Own
    * oracle: the shared template with the CASE projection as the final
    * CTE (scalar double arithmetic, identical operand order both
    * engines).
    */
  def q92o(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92o_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))
    spark.sql(
      s"""UPDATE gentable.`$tbl`
         |SET o_orderstatus = 'X9', o_totalprice = o_totalprice + 2.0
         |WHERE o_totalprice > 200000.0""".stripMargin)
    spark.sql(
      s"""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
         |FROM gentable.`$tbl`
         |ORDER BY o_orderkey""".stripMargin)
  }

  val q92oSql: String = mergeSqlCte(" AND year(o_orderdate) >= 1996",
    updatePred = "o_totalprice > 200000.0")

  /** q92p_insert_sql: a keyless row APPEND issued as SQL — `INSERT INTO
    * gentable.`dir` SELECT …` (VERDICT r17 #1), routed onto
    * [[graft.sources.GenTable.insertRows]]: positional column matching,
    * each touched partition rewrites copy-on-write as content ∪ new
    * rows, one atomic generation. The inserted keys (o_orderkey % 8 =
    * 7) never appear in t0 (7 % 4 = 3) or either delta, so the final
    * state is exactly the merge chain's plus the appended rows. Own
    * oracle: the shared template with the UNION ALL as the final CTE.
    */
  def q92p(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92p_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))
    Tables.orders(spark, dir).createOrReplaceTempView("gt_insert_src")
    spark.sql(
      s"""INSERT INTO gentable.`$tbl`
         |SELECT o_orderkey, 'N3', o_totalprice, o_orderdate,
         |       year(o_orderdate)
         |FROM gt_insert_src WHERE o_orderkey % 8 = 7""".stripMargin)
    spark.sql(
      s"""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
         |FROM gentable.`$tbl`
         |ORDER BY o_orderkey""".stripMargin)
  }

  val q92pSql: String = mergeSqlCte(" AND year(o_orderdate) >= 1996",
    insertPred = "o_orderkey % 8 = 7")

  /** q92s_merge_named: q92m's SQL MERGE batches issued against a
    * CATALOG-NAMED table (r19 — VERDICT r18 #2): `CREATE TABLE …
    * USING gentable OPTIONS (path, partCol) AS SELECT …` creates the
    * name, and `MERGE INTO gt_named_s` (no `gentable.` path qualifier)
    * resolves through the session catalog — `genTarget` recovers the
    * path from the CatalogTable's storage options. The reference's own
    * writeback targets a NAMED table
    * (`dags/order_currency_conversion_dag.py:145`); until r19 every
    * write verb worked only on the path form. Read back through the
    * NAME too. Same final state as q92b — SHARES its oracle.
    */
  def q92s(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92s_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    t0.withColumn("yr", year(col("o_orderdate")))
      .createOrReplaceTempView("gt_named_s_t0")
    spark.sql("DROP TABLE IF EXISTS gt_named_s")
    spark.sql(
      s"""CREATE TABLE gt_named_s USING gentable
         |OPTIONS (path '$tbl', partCol 'yr')
         |AS SELECT * FROM gt_named_s_t0""".stripMargin)
    recent(d1).createOrReplaceTempView("gt_named_s_d1")
    recent(d2).createOrReplaceTempView("gt_named_s_d2")
    Seq("gt_named_s_d1", "gt_named_s_d2").foreach { v =>
      spark.sql(
        s"""MERGE INTO gt_named_s t USING $v s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND s._op = 'delete' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED AND s._op <> 'delete' THEN INSERT *
           |""".stripMargin)
    }
    spark.sql(
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM gt_named_s
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** q92t_delete_named: q92n's SQL DELETE against the catalog NAME —
    * the GDPR takedown on `DELETE FROM gt_named_t WHERE …`, tombstone
    * routing and all, plus the named read-back (which serves the
    * MASKED view through the catalog's stored schema). Same final
    * state as q92f — SHARES its oracle.
    */
  def q92t(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92t_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))
    spark.sql("DROP TABLE IF EXISTS gt_named_t")
    spark.sql(
      s"CREATE TABLE gt_named_t USING gentable OPTIONS (path '$tbl')")
    spark.sql("DELETE FROM gt_named_t WHERE o_orderkey % 32 = 9")
    spark.sql(
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM gt_named_t
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** q92u_asof_named: VERSION AS OF time travel on the catalog NAME —
    * q92e's write sequence, then `FROM gt_named_u VERSION AS OF 1`:
    * the travel clause's target resolves through the catalog to the
    * table's path and pins the batch-1 generation. SHARES q92e's
    * oracle (after batch 1, before batch 2).
    */
  def q92u(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92u_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))                                     // gen 1
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))                                     // gen 2
    spark.sql("DROP TABLE IF EXISTS gt_named_u")
    spark.sql(
      s"CREATE TABLE gt_named_u USING gentable OPTIONS (path '$tbl')")
    spark.sql(
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM gt_named_u VERSION AS OF 1
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** q92v_optimize_sql: the SQL MAINTENANCE verb (r19 — VERDICT r18
    * #3): q92d's write sequence with the compaction issued MID-SEQUENCE
    * as `OPTIMIZE gentable.`dir`` (the statement Delta users type;
    * parsed by the injected [[graft.ext.GraftSqlParser]], routed onto
    * [[graft.sources.GenTable.compact]] with the table's recorded
    * layout) — then a FURTHER merge lands on the compacted table and
    * the final read goes through SQL. Gates that the statement
    * compacts (history folds to one generation), that the fresh
    * history accepts later writers, and that content is untouched —
    * same final state as q92b: SHARES its oracle. IF NEEDED gating,
    * the VACUUM alias, named targets and the non-gentable refusal are
    * spec-pinned.
    */
  def q92v(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92v_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    spark.sql(s"OPTIMIZE gentable.`$tbl`")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))
    spark.sql(
      s"""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
         |FROM gentable.`$tbl`
         |ORDER BY o_orderkey""".stripMargin)
  }

  /** q92e_merge_asof: TIME TRAVEL on the merged table — both batches
    * applied, then read `asOfGen` = the batch-1 generation: the result
    * must be the state AFTER batch 1 and BEFORE batch 2 (batch 2's
    * updates, deletes and re-inserts all invisible). Own oracle: the
    * same chained-CTE template cut at m1 — the template's batch
    * parameter, so the two oracles cannot drift. A leaked batch-2
    * partition (the resolution rule's failure mode) changes rows and
    * hash-mismatches loudly.
    */
  def q92e(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92e_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))                                     // gen 1
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))                                     // gen 2
    graft.sources.GenTable.read(spark, tbl, "yr", asOfGen = Some(1L))
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** q92e's restatement: the shared template cut at batch 1, with the
    * year restriction on the applied delta.
    */
  val q92eSql: String =
    mergeSqlCte(" AND year(o_orderdate) >= 1996", batches = 1)

  /** q92q_asof_ts: TIMESTAMP time travel (VERDICT r17 #2 — Delta's
    * `TIMESTAMP AS OF`, the form auditors ask in) — q92e's write
    * sequence with DETERMINISTIC commit stamps injected through the
    * clock seam (D4 bans wall-clock reads in declared queries; the
    * stamps are literals so the oracle stays q92e's), then the state
    * read back through the SQL surface's `asOfTs` option pinned BETWEEN
    * batch 1's and batch 2's stamps: resolution must land on the
    * batch-1 generation — after batch 1, before batch 2, exactly
    * q92e's oracle. The monotonized-stamp rule, pre-history and
    * post-compaction loud failures are pinned in GenTableSqlSpec.
    */
  def q92q(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92q_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    val saved = graft.sources.GenCommit.clockMs
    try {
      graft.sources.GenCommit.clockMs = () => 1000L
      graft.sources.GenTable.init(
        t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
      graft.sources.GenCommit.clockMs = () => 2000L
      graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
        Seq("o_orderkey"))                                   // ts 2000
      graft.sources.GenCommit.clockMs = () => 3000L
      graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
        Seq("o_orderkey"))                                   // ts 3000
    } finally graft.sources.GenCommit.clockMs = saved
    spark.read.format("gentable").option("asOfTs", "2500").load(tbl)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** q92f_merge_rowdelete: q92d's GenTable flow plus a SCATTERED
    * row-level delete (VERDICT r15 #1) — the takedown keys
    * (`o_orderkey % 32 = 9`) span every year partition, including the
    * pre-1996 ones no merge ever touched. [[graft.sources.GenTable
    * .deleteRows]] commits them as ONE tombstone generation (no
    * partition read or rewritten — MergeSpec pins the file-level bill
    * at zero data files), and the read masks by the later-generation
    * rule. Own oracle: the shared chained-CTE template with a DELETE
    * CTE on top, so the four merge oracles cannot drift.
    */
  def q92f(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92f_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))
    graft.sources.GenTable.deleteRows(spark, tbl,
      Tables.orders(spark, dir).select(col("o_orderkey"))
        .filter(col("o_orderkey") % 32 === 9))
    graft.sources.GenTable.read(spark, tbl, "yr")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  val q92fSql: String = mergeSqlCte(" AND year(o_orderdate) >= 1996",
    rowDeletePred = "o_orderkey % 32 = 9")

  /** q92g_merge_skipping: the q92d flow written WITH per-file min/max
    * stats (`statsCols = o_totalprice` range-clusters each generation's
    * write and records the sidecar), then a RANGE read through
    * [[graft.sources.GenTable.readWhere]] — the scan opens only the
    * files whose recorded range intersects the predicate (file-level
    * data skipping, VERDICT r15 #2; GenTableSpec pins files-opened <
    * files-present and ScaleSpec measures the ratio). Own oracle: the
    * shared template with the same BETWEEN as the final CTE.
    */
  def q92g(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92g_")}/table"
    val stats = Seq("o_totalprice")
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr",
      statsCols = stats)
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"), statsCols = stats)
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"), statsCols = stats)
    graft.sources.GenTable.readWhere(spark, tbl, "yr",
      "o_totalprice", 50000.0, 100000.0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  val q92gSql: String = mergeSqlCte(" AND year(o_orderdate) >= 1996",
    finalWhere = "o_totalprice BETWEEN 50000.0 AND 100000.0")

  /** q92l_merge_bloom: q92g's flow with BLOOM sidecars on the
    * UNCLUSTERED key `o_orderkey` (VERDICT r16 #7) and a point lookup
    * through [[graft.sources.GenTable.readWhereEq]] — min/max stats
    * cannot skip here (every file of a key-scattered table spans the
    * whole key range; the bloom answers membership). Key 1 is in t0
    * (1 % 4 ≠ 3), upserted by batch 1 (1 % 8 = 1 → status U1,
    * price +10) and untouched by batch 2 — a row whose FINAL state only
    * the full merge chain produces, so a lookup served from a stale
    * generation's copy hash-mismatches. Oracle: the shared merge CTE
    * with the equality as the final filter. GenTableSpec pins
    * files-opened < files-present on a multi-file fixture.
    */
  def q92l(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92l_")}/table"
    val blooms = Seq("o_orderkey")
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr",
      bloomCols = blooms)
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"), bloomCols = blooms)
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"), bloomCols = blooms)
    graft.sources.GenTable.readWhereEq(spark, tbl, "yr",
      "o_orderkey", 1L)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  val q92lSql: String = mergeSqlCte(" AND year(o_orderdate) >= 1996",
    finalWhere = "o_orderkey = 1")

  /** q92h_merge_zorder: the q92d flow written Z-ORDERED on TWO stats
    * columns (`zorder = true` bit-interleaves each column's quantile
    * rank), then a range read on the SECOND one — the column the
    * lexicographic range layout cannot skip on (it only clusters within
    * ties of the first). Same machinery as q92g otherwise; GenTableSpec
    * pins that the z-layout skips on BOTH columns while the range
    * layout skips on the second not at all. Own oracle: the shared
    * template with the second column's BETWEEN as the final CTE.
    */
  def q92h(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92h_")}/table"
    val stats = Seq("o_totalprice", "o_orderkey")
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr",
      statsCols = stats, zorder = true)
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"), statsCols = stats, zorder = true)
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"), statsCols = stats, zorder = true)
    graft.sources.GenTable.readWhere(spark, tbl, "yr",
      "o_orderkey", 10000L, 20000L)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  val q92hSql: String = mergeSqlCte(" AND year(o_orderdate) >= 1996",
    finalWhere = "o_orderkey BETWEEN 10000 AND 20000")

  /** q92i_merge_gentable_evolve: schema evolution THROUGH the lake table
    * (r16) — batch 2 adds `o_review`, `GenTable.merge(evolveSchema =
    * true)` commits the widened generation, and the READ side pins the
    * newest resolved generation's schema so older generations' rows
    * null-fill the new column (without the pin, `spark.read.parquet`
    * takes an arbitrary file's footer and the evolved column silently
    * VANISHES from the view — the bug this gate exists to catch; and
    * `mergeSchema = true` would pay every file's footer per read).
    * Own oracle: the shared template with both the year restriction and
    * the evolution clauses on.
    */
  def q92i(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92i_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    val d2e = d2.withColumn("o_review",
      concat(lit("rv-"), col("o_orderkey")))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2e),
      Seq("o_orderkey"), evolveSchema = true)
    graft.sources.GenTable.read(spark, tbl, "yr")
      .select("o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_review")
      .orderBy("o_orderkey")
  }

  val q92iSql: String =
    mergeSqlCte(" AND year(o_orderdate) >= 1996", evolve = true)

  /** q92w_alter_add_sql: SQL schema evolution (r19 — VERDICT r18 #4):
    * q92i's final state reached through `ALTER TABLE gentable.`dir`
    * ADD COLUMNS (o_review STRING)` — the statement widens the footer
    * (one minimal-partition rewrite, [[graft.sources.GenTable
    * .addColumns]]), after which batch 2 carries `o_review` as a PLAIN
    * column of the target (no `WITH SCHEMA EVOLUTION` needed): rows the
    * batch doesn't upsert null-fill the new column at read, upserts
    * carry their values — exactly the merge-evolution semantics, via
    * the statement a SQL user types. SHARES q92i's oracle.
    */
  def q92w(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92w_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    spark.sql(
      s"ALTER TABLE gentable.`$tbl` ADD COLUMNS (o_review STRING)")
    val d2e = d2.withColumn("o_review",
      concat(lit("rv-"), col("o_orderkey")))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2e),
      Seq("o_orderkey")) // no evolveSchema: the ALTER already widened
    graft.sources.GenTable.read(spark, tbl, "yr")
      .select("o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_review")
      .orderBy("o_orderkey")
  }

  /** q92j_merge_history: the table's commit history as a query (the
    * lake DESCRIBE HISTORY surface) — q92f's write sequence (init over
    * the seven order-year partitions 1995–2001, two year-restricted
    * merges touching the six ≥ 1996, one scattered row delete claiming
    * none) read back
    * through [[graft.sources.GenTable.history]]. The sequence is
    * deterministic at every fixture SF (the orders table spans
    * 1995–2001 regardless of scale), so the oracle is the expected
    * rows as literals — gating the metadata surface itself: a wrong
    * generation id, misclassified op, or miscounted claim set
    * hash-mismatches.
    */
  def q92j(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val tbl = s"${graft.TempRoots.create("graft_q92j_")}/table"
    def recent(d: DataFrame) = d
      .filter(year(col("o_orderdate")) >= 1996)
      .withColumn("yr", year(col("o_orderdate")))
    graft.sources.GenTable.init(
      t0.withColumn("yr", year(col("o_orderdate"))), tbl, "yr")
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d1),
      Seq("o_orderkey"))
    graft.sources.GenTable.merge(spark, tbl, "yr", recent(d2),
      Seq("o_orderkey"))
    graft.sources.GenTable.deleteRows(spark, tbl,
      Tables.orders(spark, dir).select(col("o_orderkey"))
        .filter(col("o_orderkey") % 32 === 9))
    // explicit projection: history() also carries the commit stamp
    // column (ts — wall-clock, D4-banned from declared output)
    graft.sources.GenTable.history(spark, tbl)
      .select("gen", "op", "n_claimed").orderBy("gen")
  }

  val q92jSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), 'init',   CAST(7 AS INTEGER)),
      |  (CAST(1 AS BIGINT), 'merge',  CAST(6 AS INTEGER)),
      |  (CAST(2 AS BIGINT), 'merge',  CAST(6 AS INTEGER)),
      |  (CAST(3 AS BIGINT), 'delete', CAST(0 AS INTEGER))
      |) AS h(gen, op, n_claimed) ORDER BY gen""".stripMargin

  /** q92c_merge_evolve: q92's two batches with batch 2 ADDING a column
    * (`o_review = 'rv-' || key`) absent from the target — the
    * `evolveSchema` path: every row the second delta does not upsert
    * (the whole of m1's untouched set, including batch 1's inserts)
    * null-fills the new column, d2's surviving upserts carry it. Same
    * chained-CTE template with the evolution clauses switched on, so
    * the three oracles cannot drift.
    */
  def q92c(spark: SparkSession, dir: String): DataFrame = {
    val (t0, d1, d2) = mergeFixture(spark, dir)
    val m1 = upsert(t0, d1, Seq("o_orderkey"))
    val d2e = d2.withColumn("o_review",
      concat(lit("rv-"), col("o_orderkey")))
    upsert(m1, d2e, Seq("o_orderkey"), evolveSchema = true)
      .orderBy("o_orderkey")
  }

  val q92cSql: String = mergeSqlCte("", evolve = true)
}
