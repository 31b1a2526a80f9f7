package graft

import graft.sources.{GenCommit, GenTable}
import org.apache.spark.sql.functions._

/** The GenCommit-committed warehouse table (VERDICT r14 #2): every MERGE
  * batch one atomic generation, torn writes impossible by construction,
  * partition-granular merge-on-read resolution, emptied partitions, time
  * travel, and compaction-as-a-fresh-generation.
  */
class GenTableSpec extends SparkSuite {
  import spark.implicits._

  private def fixture() = Seq(
    (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "B", 40.0),
    (5L, "C", 50.0)).toDF("k", "p", "v")

  private def readSet(dir: String, asOf: Option[Long] = None) =
    GenTable.read(spark, dir, "p", asOf)
      .select("k", "p", "v").collect() // read-back puts partCol last
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("kill between claim and marker — BOTH crash points: the table " +
      "reads its pre-merge state exactly, never a torn mix") {
    val dir = s"${TempRoots.create("graft_gt_kill_")}/t"
    GenTable.init(fixture(), dir, "p")
    val before = readSet(dir)
    // crash point 1: claimed, staged (data + manifest), NOTHING renamed —
    // the old upsertPartitioned had no analog (it wrote in place); here
    // the stage is invisible garbage
    require(GenCommit.tryClaim(spark, dir, 1L, "w1"))
    Seq((3L, "B", 999.0)).toDF("k", "p", "v")
      .write.partitionBy("p")
      .parquet(GenCommit.stagePath(dir, 1L, "data", "w1"))
    assert(readSet(dir) == before, "a staged-only merge leaked")
    // the targeted unblock: no gen dir ⇒ recoverClaims frees the slot
    assert(GenTable.recoverClaims(spark, dir) == Seq(1L))
    // crash point 2: claimed, data RENAMED IN, manifest written, marker
    // never created — exactly where the in-place dynamic overwrite left
    // a torn half-new/half-old table; here the generation is invisible
    // AND partition-pruned away
    require(GenCommit.tryClaim(spark, dir, 1L, "w2"))
    Seq((3L, "B", 999.0)).toDF("k", "p", "v")
      .write.partitionBy("p")
      .parquet(GenCommit.stagePath(dir, 1L, "data", "w2"))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.rename(
      new org.apache.hadoop.fs.Path(GenCommit.stagePath(dir, 1L, "data", "w2")),
      new org.apache.hadoop.fs.Path(s"$dir/data/gen=1")))
    val out = f.create(new org.apache.hadoop.fs.Path(s"$dir/manifests/1"), true)
    try out.write("B".getBytes("UTF-8")) finally out.close()
    assert(readSet(dir) == before,
      "an unmarked generation leaked into the read")
    // the mid-publish id is burned (gen dir exists): the CAS slot stays
    // blocked, recoverClaims refuses it, and compact is the remedy
    assert(GenTable.recoverClaims(spark, dir).isEmpty)
    val e = intercept[IllegalArgumentException] {
      GenTable.merge(spark, dir, "p",
        Seq((9L, "C", 90.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    }
    assert(e.getMessage.contains("already claimed"))
    GenTable.compact(spark, dir, "p")
    assert(readSet(dir) == before, "compaction changed the view")
    // and the table merges again — the crashed generation is gone
    GenTable.merge(spark, dir, "p",
      Seq((9L, "C", 90.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    assert(readSet(dir) == before + ((9L, "C", 90.0)))
  }

  test("recover (single-writer): a mid-publish crash — gen dir renamed " +
      "in, marker never created — is rolled back at metadata cost, and " +
      "the replayed merge lands without a compact (ADVICE r15: the CDC " +
      "stream's burned-claim window)") {
    val dir = s"${TempRoots.create("graft_gt_recover_")}/t"
    GenTable.init(fixture(), dir, "p")
    val before = readSet(dir)
    // the crash: claimed, data renamed in, manifest written, NO marker
    require(GenCommit.tryClaim(spark, dir, 1L, "w1"))
    Seq((3L, "B", 999.0)).toDF("k", "p", "v")
      .write.partitionBy("p")
      .parquet(GenCommit.stagePath(dir, 1L, "data", "w1"))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.rename(
      new org.apache.hadoop.fs.Path(GenCommit.stagePath(dir, 1L, "data", "w1")),
      new org.apache.hadoop.fs.Path(s"$dir/data/gen=1")))
    val out = f.create(new org.apache.hadoop.fs.Path(s"$dir/manifests/1"), true)
    try out.write("B".getBytes("UTF-8")) finally out.close()
    // without recovery the slot is burned: merge fails loudly
    intercept[IllegalArgumentException] {
      GenTable.merge(spark, dir, "p",
        Seq((3L, "B", 31.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    }
    assert(GenTable.recover(spark, dir) == Seq(1L))
    assert(readSet(dir) == before, "recovery changed the committed view")
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dir/data/gen=1")) &&
      !f.exists(new org.apache.hadoop.fs.Path(s"$dir/manifests/1")),
      "the uncommitted generation's debris survived recovery")
    // the replay lands — no compact needed
    GenTable.merge(spark, dir, "p",
      Seq((3L, "B", 31.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    assert(readSet(dir) == before - ((3L, "B", 30.0)) + ((3L, "B", 31.0)))
    // idempotent when healthy: nothing to free, view unchanged
    assert(GenTable.recover(spark, dir).isEmpty)
  }

  test("emptied partition: a delete-all-rows batch removes the partition " +
      "via its manifest claim — no ghost rows, no in-place delete; " +
      "compact folds it away physically") {
    val dir = s"${TempRoots.create("graft_gt_empty_")}/t"
    GenTable.init(fixture(), dir, "p")
    GenTable.merge(spark, dir, "p",
      Seq((3L, "B", 30.0, "delete"), (4L, "B", 40.0, "delete"))
        .toDF("k", "p", "v", "_op"),
      Seq("k"))
    assert(readSet(dir) ==
      Set((1L, "A", 10.0), (2L, "A", 20.0), (5L, "C", 50.0)),
      "partition B must be gone from the current view")
    // gen 0's B files are still on disk (history) — the as-of read
    // proves they still serve time travel
    assert(readSet(dir, asOf = Some(0L)).exists(_._2 == "B"))
    GenTable.compact(spark, dir, "p")
    assert(readSet(dir) ==
      Set((1L, "A", 10.0), (2L, "A", 20.0), (5L, "C", 50.0)))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaves = f.listStatus(new org.apache.hadoop.fs.Path(
        s"$dir/data/gen=${GenCommit.lastCommitted(spark, dir)}"))
      .map(_.getPath.getName).filter(_.startsWith("p=")).toSet
    assert(leaves == Set("p=A", "p=C"),
      s"emptied partition survived compaction: $leaves")
    // a stale pin names vanished history and fails loudly (VACUUM rule)
    val e = intercept[IllegalArgumentException] {
      GenTable.read(spark, dir, "p", Some(0L)).collect()
    }
    assert(e.getMessage.contains("not a committed generation"))
    // the degenerate endpoint: delete EVERY remaining row, compact — the
    // table must read as an empty frame (not crash on empty.reduce or
    // schema inference; review r15), and still accept a new merge
    GenTable.merge(spark, dir, "p",
      Seq((1L, "A", 10.0, "delete"), (2L, "A", 20.0, "delete"),
        (5L, "C", 50.0, "delete")).toDF("k", "p", "v", "_op"),
      Seq("k"))
    assert(readSet(dir).isEmpty, "delete-all must read as empty")
    GenTable.compact(spark, dir, "p")
    assert(readSet(dir).isEmpty, "empty view must survive compaction")
    GenTable.merge(spark, dir, "p",
      Seq((8L, "D", 80.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    assert(readSet(dir) == Set((8L, "D", 80.0)),
      "an emptied-then-compacted table must accept new merges")
  }

  test("deleteRows: a scattered takedown costs ONE tombstone generation " +
      "and zero data files (the partition-rewrite bill is NOT paid); " +
      "as-of-before-delete still sees the rows; a later merge revives " +
      "the key; compact folds the tombstones away physically") {
    val dir = s"${TempRoots.create("graft_gt_rowdel_")}/t"
    GenTable.init(fixture(), dir, "p")
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = {
      val it = f.listFiles(new org.apache.hadoop.fs.Path(s"$dir/data"), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val s = it.next()
        b += s.getPath.toString + ":" + s.getModificationTime
      }
      b.result().toSet
    }
    val filesBefore = dataFiles()
    // the takedown: keys scattered over partitions A and B — the merge
    // path would rewrite both; this must rewrite NEITHER
    GenTable.deleteRows(spark, dir, Seq(1L, 3L).toDF("k"))     // gen 1
    assert(readSet(dir) == Set((2L, "A", 20.0), (4L, "B", 40.0),
      (5L, "C", 50.0)))
    assert(dataFiles() == filesBefore,
      "a row-level delete touched data files — the partition-rewrite " +
        "bill was paid after all")
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dir/data/gen=1")),
      "a delete generation must carry no data dir at all")
    // time travel: before the delete the rows are alive
    assert(readSet(dir, asOf = Some(0L)).map(_._1) ==
      Set(1L, 2L, 3L, 4L, 5L))
    // delete of an absent key: the SQL no-op, still one atomic gen
    GenTable.deleteRows(spark, dir, Seq(99L).toDF("k"))        // gen 2
    assert(readSet(dir).size == 3)
    // one key shape per table: a different delete key fails loudly
    val ks = intercept[IllegalArgumentException] {
      GenTable.deleteRows(spark, dir, Seq("A").toDF("p"))
    }
    assert(ks.getMessage.contains("one key shape per table"))
    // revival: a merge AFTER the delete re-inserts key 1 — its rows
    // outrank the tombstone (and key 3 stays dead through the rewrite
    // of partition B it does not touch... here partition A's rewrite)
    GenTable.merge(spark, dir, "p",
      Seq((1L, "A", 11.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    assert(readSet(dir) == Set((1L, "A", 11.0), (2L, "A", 20.0),
      (4L, "B", 40.0), (5L, "C", 50.0)),
      "the re-inserted key must revive; key 3 must stay dead")
    // the rewritten partition A physically dropped key 1's old copy and
    // key 3 (B) remains masked, not physically gone, until compact
    GenTable.compact(spark, dir, "p")
    assert(readSet(dir) == Set((1L, "A", 11.0), (2L, "A", 20.0),
      (4L, "B", 40.0), (5L, "C", 50.0)))
    assert(!f.exists(new org.apache.hadoop.fs.Path(
        s"$dir/${GenCommit.TombsTable}")) &&
      !f.exists(new org.apache.hadoop.fs.Path(s"$dir/tombkeys")),
      "compact must fold the tombstone state away")
    // post-compact reads carry NO mask join and the table deletes again
    GenTable.deleteRows(spark, dir, Seq(5L).toDF("k"))
    assert(readSet(dir) == Set((1L, "A", 11.0), (2L, "A", 20.0),
      (4L, "B", 40.0)))
  }

  test("readWhere: per-generation min/max stats turn a range predicate " +
      "into a file-pruned scan (files opened < files present); a " +
      "stats-less generation falls back to all its files; tombstones " +
      "and the empty range compose") {
    val dir = s"${TempRoots.create("graft_gt_skip_")}/t"
    val base = spark.range(1, 201).select(col("id").as("k"),
      when(col("id") <= 100, "A").otherwise("B").as("p"),
      col("id").cast("double").as("v"))
    // AQE's partition coalescing folds this tiny fixture to ~2 files —
    // right at scale (it targets the advisory bytes per file), but the
    // spec needs a multi-file generation to prove skipping; a 100 TB
    // table gets its many files from data volume instead
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val shuffleKey = "spark.sql.shuffle.partitions"
    val (oldCoalesce, oldShuffle) =
      (spark.conf.get(coalesceKey, "true"), spark.conf.get(shuffleKey))
    spark.conf.set(coalesceKey, "false")
    spark.conf.set(shuffleKey, "32")
    try {
    GenTable.init(base, dir, "p", statsCols = Seq("v"))
    val totalFiles = GenTable.read(spark, dir, "p").inputFiles.length
    assert(totalFiles > 8, s"vacuous: clustering wrote $totalFiles files")
    def rows(df: org.apache.spark.sql.DataFrame) = df.select("k", "p", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val got = GenTable.readWhere(spark, dir, "p", "v", 5.0, 10.0)
    assert(rows(got) ==
      rows(GenTable.read(spark, dir, "p").filter(col("v").between(5, 10))),
      "file skipping changed the answer")
    assert(got.inputFiles.length < totalFiles / 2,
      s"no files skipped: ${got.inputFiles.length} of $totalFiles opened")
    // a generation written WITHOUT stats: correct, just unskipped
    GenTable.merge(spark, dir, "p",
      Seq((5L, "A", 500.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    val after = GenTable.readWhere(spark, dir, "p", "v", 5.0, 10.0)
    assert(rows(after).map(_._1) == Set(6L, 7L, 8L, 9L, 10L),
      "the merged-away row must leave the range")
    assert(rows(GenTable.readWhere(spark, dir, "p", "v", 499.0, 501.0)) ==
      Set((5L, "A", 500.0)),
      "the stats-less generation's rows must still be found")
    // row tombstones mask through the pruned scan too
    GenTable.deleteRows(spark, dir, Seq(7L).toDF("k"))
    assert(rows(GenTable.readWhere(spark, dir, "p", "v", 5.0, 10.0))
      .map(_._1) == Set(6L, 8L, 9L, 10L))
    // a range no file intersects: the empty view, no scan crash
    assert(GenTable.readWhere(spark, dir, "p", "v", -10.0, -5.0).isEmpty)
    // compact WITH stats re-clusters the fold and skipping still holds
    GenTable.compact(spark, dir, "p", statsCols = Seq("v"))
    val post = GenTable.readWhere(spark, dir, "p", "v", 5.0, 10.0)
    assert(rows(post).map(_._1) == Set(6L, 8L, 9L, 10L))
    val postAll = GenTable.read(spark, dir, "p").inputFiles.length
    assert(post.inputFiles.length < postAll,
      "post-compact skipping must hold (stats recorded on the fold)")
    } finally {
      spark.conf.set(coalesceKey, oldCoalesce)
      spark.conf.set(shuffleKey, oldShuffle)
    }
  }

  test("schema evolution: the read pins the newest resolved " +
      "generation's schema — evolved columns null-fill old rows " +
      "instead of silently vanishing; an as-of read before the " +
      "evolution serves the HISTORICAL schema") {
    val dir = s"${TempRoots.create("graft_gt_evolve_")}/t"
    GenTable.init(fixture(), dir, "p")
    GenTable.merge(spark, dir, "p",
      Seq((3L, "B", 31.0, "note-3", "upsert"), (6L, "B", 60.0, "note-6",
        "upsert")).toDF("k", "p", "v", "note", "_op"),
      Seq("k"), evolveSchema = true)
    val cur = GenTable.read(spark, dir, "p")
    assert(cur.columns.contains("note"),
      "the evolved column vanished — the read took an old file's footer")
    val notes = cur.select("k", "note").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(notes(3L) == Some("note-3") && notes(6L) == Some("note-6") &&
      notes(1L).isEmpty && notes(5L).isEmpty,
      s"evolution null-fill wrong: $notes")
    // evolution without the flag still fails loudly through the table
    val e = intercept[IllegalArgumentException] {
      GenTable.merge(spark, dir, "p",
        Seq((5L, "C", 50.0, "x", 1, "upsert"))
          .toDF("k", "p", "v", "note", "extra2", "_op"), Seq("k"))
    }
    assert(e.getMessage.contains("evolveSchema"))
    // time travel BEFORE the evolution: the historical schema, not a
    // null-filled projection of today's
    val old = GenTable.read(spark, dir, "p", asOfGen = Some(0L))
    assert(!old.columns.contains("note"),
      "an as-of read must serve the schema of its snapshot")
    assert(old.count() == 5)
  }

  test("readWhere on a schema-evolved table: the stats column's type " +
      "resolves from the PINNED newest-generation schema, so a range " +
      "read on a column a later merge added works even though older " +
      "files lack it (ADVICE r16: the unpinned footer pick)") {
    val dir = s"${TempRoots.create("graft_gt_rw_evolve_")}/t"
    GenTable.init(fixture(), dir, "p")
    // the stats column 'score' EXISTS ONLY in generation 1's files
    GenTable.merge(spark, dir, "p",
      Seq((3L, "B", 31.0, 7.5, "upsert"), (6L, "B", 60.0, 2.0, "upsert"))
        .toDF("k", "p", "v", "score", "_op"),
      Seq("k"), evolveSchema = true, statsCols = Seq("score"))
    val hits = GenTable.readWhere(spark, dir, "p", "score", 5.0, 10.0)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(hits == Set(3L), s"evolved-column range read wrong: $hits")
    // gen-0 files (no 'score' column, no stats) are null-filled and the
    // range filter drops them — semantics identical to the full read's
    val full = GenTable.read(spark, dir, "p")
      .filter(col("score") >= 5.0 && col("score") <= 10.0)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(full == hits)
  }

  test("a fully-released claim hole is benign: recoverClaims frees a " +
      "pre-stage claim while a later (mid-publish) claim is still " +
      "outstanding, and a disjoint new writer commits through the gap " +
      "(ADVICE r16: the hole failed every new writer)") {
    val dir = s"${TempRoots.create("graft_gt_hole_")}/t"
    GenTable.init(fixture(), dir, "p")
    // claim 1: crashed PRE-STAGE (no gen dir) — recoverClaims frees it
    require(GenCommit.tryClaim(spark, dir, 1L, "w1", declare = Seq("A")))
    // claim 2: an in-flight writer mid-publish — data renamed in, no
    // marker yet; declares partition B only
    require(GenCommit.tryClaim(spark, dir, 2L, "w2", declare = Seq("B")))
    Seq((3L, "B", 999.0)).toDF("k", "p", "v")
      .write.partitionBy("p").parquet(s"$dir/data/gen=2")
    assert(GenTable.recoverClaims(spark, dir) == Seq(1L),
      "only the pre-stage claim may be freed — gen 2 began publishing")
    // id 1 is now a hole: not committed, not claimed, NO table state.
    // A new merge on partition C (disjoint from claim 2's declared B)
    // must commit through it, not fail on 'unknowable crashed writer'
    GenTable.merge(spark, dir, "p",
      Seq((5L, "C", 55.0, "upsert")).toDF("k", "p", "v", "_op"),
      Seq("k"))
    assert(readSet(dir).contains((5L, "C", 55.0)))
    // and the uncommitted mid-publish gen 2 stays invisible
    assert(!readSet(dir).contains((3L, "B", 999.0)))
  }

  test("bloom sidecars: a point lookup on an UNCLUSTERED key opens " +
      "fewer files than the table holds (membership skipping where " +
      "min/max never prunes), answers exactly read + filter, and a " +
      "bloom-less generation falls back to all its files") {
    val dir = s"${TempRoots.create("graft_gt_bloom_")}/t"
    // keys hash-scattered across files: every file spans the whole key
    // range, so min/max stats would prune NOTHING here
    val rows = (1 to 400).map(i => (i * 37 % 1000L, s"P${i % 2}",
      i.toDouble))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try GenTable.init(rows.toDF("k", "p", "v").repartition(8), dir, "p",
      bloomCols = Seq("k"))
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    val key = rows(17)._1
    val hit = GenTable.readWhereEq(spark, dir, "p", "k", key)
    val want = GenTable.read(spark, dir, "p")
      .filter(col("k") === key).collect().map(_.toSeq).toSet
    assert(hit.collect().map(_.toSeq).toSet == want && want.nonEmpty,
      "bloom lookup must equal read + filter")
    val present = GenTable.read(spark, dir, "p").inputFiles.length
    val opened = hit.inputFiles.length
    assert(opened < present,
      s"bloom skipping opened $opened of $present files — no pruning")
    // a generation written WITHOUT blooms reads correctly, unskipped
    GenTable.merge(spark, dir, "p",
      Seq((5000L, "P1", 1.0, "upsert")).toDF("k", "p", "v", "_op"),
      Seq("k"))
    assert(GenTable.readWhereEq(spark, dir, "p", "k", 5000L)
      .collect().map(r => r.getAs[Long]("k")).toSeq == Seq(5000L))
    // absent key: every file bloom-rejected → the empty view
    assert(GenTable.readWhereEq(spark, dir, "p", "k", -1L).count() == 0)
  }

  test("log checkpointing: past the cadence a resolution checkpoint " +
      "caps the metadata walk, checkpoint+tail resolution equals the " +
      "full-log walk — including a LATE LOW-ID commit landing after " +
      "the checkpoint — and as-of pins older than the checkpoint fall " +
      "back correctly; compaction drops the stale checkpoints") {
    val dir = s"${TempRoots.create("graft_gt_ckpt_")}/t"
    GenTable.init(fixture(), dir, "p")
    // hold a LOW id in-flight: a disjoint writer that will commit LAST
    require(GenCommit.tryClaim(spark, dir, 1L, "late", declare = Seq("D")))
    // 17 more commits — crosses the 16-commit cadence → checkpoint
    (0 until 17).foreach { i =>
      GenTable.merge(spark, dir, "p",
        Seq((100L + i, "A", i.toDouble, "upsert"))
          .toDF("k", "p", "v", "_op"), Seq("k"))
    }
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ckDir = new org.apache.hadoop.fs.Path(s"$dir/logckpts")
    assert(f.exists(ckDir) && f.listStatus(ckDir).nonEmpty,
      "no checkpoint written past the cadence")
    val expected = readSet(dir)
    // the late writer finishes: id 1 (below the checkpoint) commits a
    // NEW partition D — the checkpointed read must still see it, and a
    // later merge of D must outrank it despite the checkpoint winner
    val tk = GenCommit.newToken()
    Seq((50L, "D", 5.0)).toDF("k", "p", "v")
      .write.partitionBy("p")
      .parquet(GenCommit.stagePath(dir, 1L, "data", tk))
    // adopt the claim under our token (owner simulation), then publish
    GenCommit.releaseClaim(spark, dir, 1L)
    require(GenCommit.tryClaim(spark, dir, 1L, tk, declare = Seq("D")))
    val man = new org.apache.hadoop.fs.Path(s"$dir/manifests/1")
    val o = f.create(man, true)
    try o.write("D".getBytes("UTF-8")) finally o.close()
    GenCommit.publish(spark, dir, 1L, Seq("data"), tk, claimed = true)
    assert(readSet(dir) == expected + ((50L, "D", 5.0)),
      "a late low-id commit must surface through the checkpointed read")
    GenTable.merge(spark, dir, "p",
      Seq((50L, "D", 6.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    assert(readSet(dir) == expected + ((50L, "D", 6.0)),
      "a later merge must outrank the late commit under the checkpoint")
    // as-of BEFORE the checkpoint: subset test fails → full walk, right
    // answer (gen 2 = the first nightly merge)
    assert(readSet(dir, Some(2L)) ==
      readSet(dir, Some(2L)), "as-of fallback must not throw")
    assert(GenTable.read(spark, dir, "p", Some(0L)).count() == 5)
    // r18: timestamp resolution through the checkpoint's @ts stamp
    // lines equals the brute per-marker walk at every stamp boundary
    val committedGens = GenCommit.committed(spark, dir)
    def bruteAtTs(ts: Long): Long = {
      var eff = Long.MinValue; var pick = -1L
      committedGens.sorted.foreach { g =>
        GenCommit.commitTs(spark, dir, g).foreach(t => eff = eff max t)
        if (eff <= ts) pick = g
      }
      pick
    }
    committedGens.flatMap(GenCommit.commitTs(spark, dir, _))
      .flatMap(t => Seq(t, t + 1)).distinct.foreach { ts =>
        assert(GenTable.genAtTs(spark, dir, ts) == bruteAtTs(ts),
          s"checkpointed ts resolution diverged from marker walk at $ts")
      }
    GenTable.compact(spark, dir, "p")
    assert(!f.exists(ckDir), "compaction must drop stale checkpoints")
    assert(readSet(dir) == expected + ((50L, "D", 6.0)))
  }

  test("zorder layout: a range read skips files on BOTH clustered " +
      "columns, where the lexicographic range layout skips only on the " +
      "first; answers identical to the filtered read either way") {
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val shuffleKey = "spark.sql.shuffle.partitions"
    val (oldCoalesce, oldShuffle) =
      (spark.conf.get(coalesceKey, "true"), spark.conf.get(shuffleKey))
    spark.conf.set(coalesceKey, "false")
    spark.conf.set(shuffleKey, "32")
    try {
      // two INDEPENDENT dimensions: v2 is a pseudo-random permutation of
      // v1's domain, so sorting by v1 leaves v2 full-range in every file
      val base = spark.range(0, 4000).select(col("id").as("k"),
        when(col("id") < 2000, "A").otherwise("B").as("p"),
        col("id").cast("double").as("v1"),
        pmod(col("id") * 2654435761L, lit(4000L)).cast("double").as("v2"))
      def opened(dir: String, c: String) = GenTable
        .readWhere(spark, dir, "p", c, 100.0, 200.0).inputFiles.length
      def answers(dir: String, c: String) = GenTable
        .readWhere(spark, dir, "p", c, 100.0, 200.0)
        .select("k").collect().map(_.getLong(0)).toSet
      def expect(c: String) = base.filter(col(c).between(100.0, 200.0))
        .select("k").collect().map(_.getLong(0)).toSet
      val rangeDir = s"${TempRoots.create("graft_gt_zr_")}/t"
      GenTable.init(base, rangeDir, "p", statsCols = Seq("v1", "v2"))
      val zDir = s"${TempRoots.create("graft_gt_zz_")}/t"
      GenTable.init(base, zDir, "p", statsCols = Seq("v1", "v2"),
        zorder = true)
      val present = GenTable.read(spark, zDir, "p").inputFiles.length
      assert(present > 16, s"vacuous: only $present files")
      // correctness is layout-independent
      Seq(rangeDir, zDir).foreach { d =>
        assert(answers(d, "v1") == expect("v1"))
        assert(answers(d, "v2") == expect("v2"))
      }
      // the range layout: tight on v1, blind on v2
      assert(opened(rangeDir, "v1") < present / 2,
        s"range layout must skip on its lead column: ${
          opened(rangeDir, "v1")} of $present")
      assert(opened(rangeDir, "v2") > present * 3 / 4,
        s"vacuous fixture: the range layout skipped on v2 (${
          opened(rangeDir, "v2")} of $present) — dims not independent?")
      // the z layout: moderately tight on BOTH
      assert(opened(zDir, "v1") < present / 2,
        s"zorder must skip on v1: ${opened(zDir, "v1")} of $present")
      assert(opened(zDir, "v2") < present / 2,
        s"zorder must skip on v2: ${opened(zDir, "v2")} of $present")
    } finally {
      spark.conf.set(coalesceKey, oldCoalesce)
      spark.conf.set(shuffleKey, oldShuffle)
    }
  }

  test("deleteRows serializes against merges by the same snapshot+1 CAS " +
      "— a delete does NOT commute with a merge (the merge would " +
      "revive the masked rows)") {
    val dir = s"${TempRoots.create("graft_gt_rowdel_cas_")}/t"
    GenTable.init(fixture(), dir, "p")
    // a writer holds snapshot+1 (an in-flight merge)
    require(GenCommit.tryClaim(spark, dir, 1L, "w1"))
    val e = intercept[IllegalArgumentException] {
      GenTable.deleteRows(spark, dir, Seq(1L).toDF("k"))
    }
    assert(e.getMessage.contains("already claimed"))
    // nothing staged, nothing recorded: the loser left no tombkeys
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dir/tombkeys")))
    GenCommit.releaseClaim(spark, dir, 1L)
    // and recover() rolls back a delete that died mid-publish: tombkeys
    // recorded, tombs gen dir renamed in, marker never created (the
    // real write order — tombkeys always lands before the rename)
    require(GenCommit.tryClaim(spark, dir, 1L, "w2"))
    val out = f.create(new org.apache.hadoop.fs.Path(s"$dir/tombkeys"), true)
    try out.write("k".getBytes("UTF-8")) finally out.close()
    Seq(1L).toDF("k").write
      .parquet(GenCommit.stagePath(dir, 1L, GenCommit.TombsTable, "w2"))
    require(f.rename(
      new org.apache.hadoop.fs.Path(
        GenCommit.stagePath(dir, 1L, GenCommit.TombsTable, "w2")),
      new org.apache.hadoop.fs.Path(
        s"$dir/${GenCommit.TombsTable}/gen=1")))
    assert(readSet(dir).size == 5,
      "an unmarked tombstone generation must be invisible")
    assert(GenTable.recover(spark, dir) == Seq(1L))
    assert(!f.exists(new org.apache.hadoop.fs.Path(
        s"$dir/${GenCommit.TombsTable}")),
      "recovery must not leave a childless tombs root behind")
    assert(readSet(dir).size == 5)
    GenTable.deleteRows(spark, dir, Seq(1L).toDF("k"))
    assert(readSet(dir).size == 4)
  }

  test("disjoint-writer concurrency: a merge commits while another " +
      "writer's claim is OUTSTANDING on disjoint partitions; an " +
      "overlapping writer waits its budget then fails loudly (the " +
      "crashed-writer path — a live one rebases, pinned separately); " +
      "the in-flight writer then completes and both effects compose") {
    val dir = s"${TempRoots.create("graft_gt_disj_")}/t"
    GenTable.init(fixture(), dir, "p")
    // W1 in flight: claimed gen 1 declaring partition B, nothing staged
    require(GenCommit.tryClaim(spark, dir, 1L, "w1", declare = Seq("B")))
    // W2 touches C — disjoint from the declaration: commits at gen 2
    GenTable.merge(spark, dir, "p",
      Seq((6L, "C", 60.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    assert(readSet(dir).contains((6L, "C", 60.0)),
      "the disjoint merge must land while W1 is still in flight")
    // W3 touches B — overlaps W1's declaration: it WAITS for W1 (the
    // r17 rebase loop), and when the wait budget expires (a crashed
    // writer never commits) it fails loudly with the recover() advice
    val ov = intercept[IllegalArgumentException] {
      GenTable.merge(spark, dir, "p",
        Seq((3L, "B", 31.0, "upsert")).toDF("k", "p", "v", "_op"),
        Seq("k"), overlapWaitMs = 400L)
    }
    assert(ov.getMessage.contains("overlap"))
    // a row delete spans every partition: conflicts with W1 too
    val dl = intercept[IllegalArgumentException] {
      GenTable.deleteRows(spark, dir, Seq(5L).toDF("k"),
        overlapWaitMs = 400L)
    }
    assert(dl.getMessage.contains("overlap"))
    // W1 completes: stages its B rewrite, manifest, publishes gen 1
    Seq((3L, "B", 33.0)).toDF("k", "p", "v")
      .write.partitionBy("p")
      .parquet(GenCommit.stagePath(dir, 1L, "data", "w1"))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$dir/manifests/1"), true)
    try out.write("B".getBytes("UTF-8")) finally out.close()
    GenCommit.publish(spark, dir, 1L, Seq("data"), "w1", claimed = true)
    // both effects compose: B from gen 1 (W1's rewrite), C from gen 2
    assert(readSet(dir) == Set((1L, "A", 10.0), (2L, "A", 20.0),
      (3L, "B", 33.0), (5L, "C", 50.0), (6L, "C", 60.0)))
  }

  test("two genuinely concurrent merges on disjoint partitions both " +
      "commit, no compact, no retry-to-failure") {
    val dir = s"${TempRoots.create("graft_gt_conc_")}/t"
    GenTable.init(fixture(), dir, "p")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def runner(row: (Long, String, Double)) = new Thread(() =>
      try GenTable.merge(spark, dir, "p",
        Seq((row._1, row._2, row._3, "upsert")).toDF("k", "p", "v", "_op"),
        Seq("k"))
      catch { case t: Throwable => errs.add(t) })
    val (t1, t2) = (runner((3L, "B", 31.0)), runner((5L, "C", 51.0)))
    t1.start(); t2.start(); t1.join(120000); t2.join(120000)
    assert(errs.isEmpty, s"a disjoint concurrent merge failed: ${
      Option(errs.peek()).map(_.getMessage)}")
    assert(readSet(dir) == Set((1L, "A", 10.0), (2L, "A", 20.0),
      (3L, "B", 31.0), (4L, "B", 40.0), (5L, "C", 51.0)))
    assert(GenCommit.committed(spark, dir) == Seq(0L, 1L, 2L),
      "both merges must have committed their own generation")
  }

  test("rebase-and-retry: two merges on the SAME partition launched " +
      "concurrently both eventually commit, serialized — the loser " +
      "waits, re-reads the winner's snapshot and rebases, so content " +
      "equals sequential application (no loud fail, no lost update)") {
    val dir = s"${TempRoots.create("graft_gt_rebase_")}/t"
    GenTable.init(fixture(), dir, "p")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // both rewrite partition B: one upserts k=6, the other k=7. Under
    // rebase both survive — a lost update would drop the first
    // committer's row (the second writer's copy-on-write rewrite of B
    // would be based on a stale snapshot)
    def runner(k: Long, v: Double) = new Thread(() =>
      try GenTable.merge(spark, dir, "p",
        Seq((k, "B", v, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
      catch { case t: Throwable => errs.add(t) })
    val (t1, t2) = (runner(6L, 61.0), runner(7L, 71.0))
    t1.start(); t2.start(); t1.join(120000); t2.join(120000)
    assert(errs.isEmpty,
      s"an overlapping merge failed instead of rebasing: ${
        Option(errs.peek()).map(_.getMessage)}")
    assert(GenCommit.committed(spark, dir).size == 3,
      "both overlapping merges must commit their own generation")
    assert(readSet(dir) == Set((1L, "A", 10.0), (2L, "A", 20.0),
      (3L, "B", 30.0), (4L, "B", 40.0), (5L, "C", 50.0),
      (6L, "B", 61.0), (7L, "B", 71.0)),
      "content must equal sequential application of both merges")
  }

  test("merge-on-read resolution: untouched partitions keep serving " +
      "their ORIGINAL generation's files; the scan is pruned to one " +
      "generation per partition") {
    val dir = s"${TempRoots.create("graft_gt_res_")}/t"
    GenTable.init(fixture(), dir, "p")
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(gen: Long, part: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/data/gen=$gen/p=$part")
      if (!f.exists(p)) Set.empty[String]
      else f.listStatus(p).map(s =>
        s.getPath.getName + ":" + s.getModificationTime).toSet
    }
    val aBefore = files(0L, "A")
    GenTable.merge(spark, dir, "p",
      Seq((3L, "B", 31.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    // generation 1 holds ONLY the touched partition
    assert(files(1L, "B").nonEmpty && files(1L, "A").isEmpty &&
      files(1L, "C").isEmpty,
      "an untouched partition was rewritten into the new generation")
    // and gen 0's A files are bit-for-bit the ones still being served
    assert(files(0L, "A") == aBefore)
    assert(readSet(dir) == Set((1L, "A", 10.0), (2L, "A", 20.0),
      (3L, "B", 31.0), (4L, "B", 40.0), (5L, "C", 50.0)))
    // the move-guard is shared with upsertPartitioned: a delta that
    // claims a key under a different partition fails loudly (the partial
    // guard's reach: the delta must also TOUCH the key's current
    // partition — here via key 2's sibling write to A)
    val e = intercept[Exception] {
      GenTable.merge(spark, dir, "p",
        Seq((1L, "B", 11.0, "upsert"), (2L, "A", 21.0, "upsert"))
          .toDF("k", "p", "v", "_op"), Seq("k"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("partCol is immutable")),
      s"move-guard must fire through GenTable too: ${messages(e)}")
    // the failed merge released its CAS claim — the next merge lands
    GenTable.merge(spark, dir, "p",
      Seq((6L, "C", 60.0, "upsert")).toDF("k", "p", "v", "_op"), Seq("k"))
    assert(readSet(dir).contains((6L, "C", 60.0)))
  }

  test("z-order boundary record (r20): recorded once at init, reused " +
      "byte-identically by later statements, self-repairing on a " +
      "foreign record, re-recorded by compact") {
    val dir = s"${TempRoots.create("graft_gt_zb_")}/t"
    val stats = Seq("v", "k")
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val zb = new org.apache.hadoop.fs.Path(s"$dir/zbounds")
    def record(): String = {
      val in = f.open(zb)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    GenTable.init(fixture(), dir, "p", statsCols = stats, zorder = true)
    assert(f.exists(zb), "init must record the quantile boundaries")
    val rec0 = record()
    assert(rec0.split("\n").length == stats.length &&
      rec0.startsWith("v\t"), s"malformed record: $rec0")
    // a later z-ordered statement REUSES the record (no re-record: the
    // per-statement approxQuantile pass is the cost r20 removed)
    GenTable.merge(spark, dir, "p",
      Seq((9L, "C", 90.0, "upsert")).toDF("k", "p", "v", "_op"),
      Seq("k"), statsCols = stats, zorder = true)
    assert(record() == rec0,
      "a z-ordered merge must reuse the recorded boundaries verbatim")
    assert(readSet(dir).contains((9L, "C", 90.0)))
    // a foreign/corrupt record (column list mismatch) is recomputed and
    // overwritten, not trusted
    val out = f.create(zb, true)
    try out.write("bogus\t1.0,2.0".getBytes("UTF-8")) finally out.close()
    GenTable.merge(spark, dir, "p",
      Seq((10L, "C", 95.0, "upsert")).toDF("k", "p", "v", "_op"),
      Seq("k"), statsCols = stats, zorder = true)
    val repaired = record()
    assert(repaired.startsWith("v\t") &&
      repaired.split("\n").length == stats.length,
      s"mismatched record must be recomputed, got: $repaired")
    // compact is the drift remedy: it drops and re-records over the
    // full current view
    val stamp = f.getFileStatus(zb).getModificationTime
    Thread.sleep(1100) // HDFS-local mtime granularity
    GenTable.compact(spark, dir, "p", statsCols = stats, zorder = true)
    assert(f.exists(zb) && f.getFileStatus(zb).getModificationTime > stamp,
      "compact must re-record the boundaries")
    assert(record().startsWith("v\t"))
    assert(readSet(dir).contains((9L, "C", 90.0)))
  }

  test("row-granular diff replication (r20): a duplicate multiplicity " +
      "above the 2^16 block width replicates to EXACTLY n rows " +
      "(bounded-block explode, no array-length dependence on n)") {
    val root = TempRoots.create("graft_gt_rep_")
    val (dir, ckpt, sink) = (s"$root/t", s"$root/ckpt", s"$root/sink")
    GenTable.init(Seq((1L, "A", 1.0)).toDF("k", "p", "v"), dir, "p")
    val n = 70000 // > 65536: spans two replication blocks
    GenTable.insertRows(spark, dir, "p",
      spark.range(n).select(lit(9L).as("k"), lit("A").as("p"),
        lit(9.0).as("v")))
    val q = spark.readStream.format("gentable")
      .option("changeGranularity", "row").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", sink).start()
    try q.processAllAvailable() finally q.stop()
    val log = spark.read.parquet(sink)
    assert(log.filter(col("_gen") === 1 && col("_change") === "insert" &&
        col("k") === 9L).count() == n,
      "the signed-count diff must replicate the duplicate group exactly")
    // the unchanged row cancels in the bag diff (no spurious pair)
    assert(log.filter(col("_gen") === 1 && col("k") === 1L).count() == 0)
  }

  test("row-granular stream REFUSES a schema colliding with the " +
      "diff's scratch columns (r20 guard: previously silently " +
      "corrupted the diff)") {
    val dir = s"${TempRoots.create("graft_gt_scratch_")}/t"
    GenTable.init(Seq((1L, 5L, "A")).toDF("k", "__w", "p"), dir, "p")
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e = intercept[Throwable] {
      new graft.sources.GenTableStream(spark, dir, "p",
        rowGranularity = true)
    }
    assert(messages(e).exists(_.contains("reserves")),
      s"expected the reserved-column refusal, got: ${messages(e)}")
  }
}
