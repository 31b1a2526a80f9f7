package graft

import org.apache.spark.sql.functions._

/** The materialized inverted index (SURVEY.md §2.3 q61c/q58b): lifecycle
  * parity with the per-call retrieval queries, append-equals-rebuild,
  * compaction bit-identity, crash recovery, and the static
  * partition-pruning plan assertion.
  */
class InvertedSpec extends SparkSuite {
  import ops.Inverted

  test("q61c (indexed BM25) == q61; q58b (indexed phrase) == q58") {
    val gotB = ops.Inverted.q61c(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val wantB = ops.Text.q61(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(wantB.nonEmpty && gotB == wantB,
      "indexed BM25 must be bit-identical to the per-call form")
    val gotP = ops.Inverted.q58b(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val wantP = ops.Text.q58(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(wantP.nonEmpty && gotP == wantP,
      "indexed phrase search must match the direct bigram scan")
  }

  test("invAppend: build(A)+append(B) search-identical to build(A ∪ B)") {
    // N, avgdl and df are sums over disjoint doc sets, so generation
    // rows must merge EXACTLY — a stats row lost or double-counted
    // shifts every idf and surfaces here as a score drift
    val docs = Tables.documents(spark, sf001)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val dirApp = TempRoots.create("graft_inv_app_")
    Inverted.invBuild(a, dirApp)
    Inverted.invAppend(spark, dirApp, b)
    val dirFull = TempRoots.create("graft_inv_full_")
    Inverted.invBuild(docs, dirFull)
    def search(d: String) = Inverted.invSearch(spark, d,
      Seq("table", "hash", "merge")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val appended = search(dirApp)
    assert(appended.nonEmpty && appended == search(dirFull))
    // empty-delta append is a no-op
    Inverted.invAppend(spark, dirApp, docs.filter(col("doc_id") < 0))
    assert(search(dirApp) == appended)
  }

  test("invCompact: one file per bucket, one stats row, search bit-identical") {
    val docs = Tables.documents(spark, sf001)
    val dir = TempRoots.create("graft_inv_cmp_")
    Inverted.invBuild(docs.filter(col("doc_id") % 2 === 0), dir,
      nBuckets = 16)
    Inverted.invAppend(spark, dir, docs.filter(col("doc_id") % 2 === 1))
    def filesPerBucket(): Map[String, Int] = {
      val base = new java.io.File(s"$dir/postings")
      base.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("gen="))
        .flatMap(g => g.listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("tbucket="))
          .map(d => d.getName ->
            d.listFiles().count(_.getName.endsWith(".parquet"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    def search() = Inverted.invSearch(spark, dir, Seq("table", "hash"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = search()
    assert(before.nonEmpty)
    assert(filesPerBucket().values.exists(_ > 1),
      "fixture degenerate: append produced no multi-file bucket")
    assert(spark.read.parquet(s"$dir/stats").count() == 2)
    Inverted.invCompact(spark, dir)
    assert(filesPerBucket().values.forall(_ == 1),
      s"compaction left multi-file buckets")
    assert(spark.read.parquet(s"$dir/stats").count() == 1,
      "compaction must collapse stats generations")
    assert(search() == before, "compaction changed search results")
    // interrupted swap (live set aside, stage complete) rolls forward
    import java.nio.file.{Files, Paths, StandardCopyOption}
    spark.read.parquet(s"$dir/postings").repartition(col("tbucket"))
      .write.mode("overwrite").partitionBy("gen", "tbucket")
      .parquet(sources.SwapDir.stagePath(dir, "postings"))
    Files.move(Paths.get(s"$dir/postings"), Paths.get(s"$dir/postings_old"),
      StandardCopyOption.ATOMIC_MOVE)
    Inverted.invRecover(spark, dir)
    assert(new java.io.File(s"$dir/postings").exists())
    assert(!new java.io.File(s"$dir/postings_old").exists())
    assert(search() == before)
  }

  test("crashed append: uncommitted generation is invisible; retry + compact GC") {
    // simulate the half-applied append the GenCommit protocol exists
    // for: stage a delta generation and rename ONE table in, then "die"
    // before the commit marker — searches must not see it (stats AND
    // postings unchanged); the retry takes a fresh id; compaction
    // garbage-collects the orphan
    val docs = Tables.documents(spark, sf001)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val dir = TempRoots.create("graft_inv_crash_")
    Inverted.invBuild(a, dir, nBuckets = 16)
    def search() = Inverted.invSearch(spark, dir, Seq("table", "hash"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = search()
    // hand-run invAppend's staging for gen 1, then rename ONLY postings
    // in (the crash window: one table applied, no marker)
    val stagedP = sources.GenCommit.stagePath(dir, 1L, "postings")
    spark.read.parquet(s"$dir/postings").filter(col("gen") === 0)
      .drop("gen") // emulate a fresh delta's staged postings
      .write.mode("overwrite").partitionBy("tbucket").parquet(stagedP)
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.move(Paths.get(stagedP), Paths.get(s"$dir/postings/gen=1"),
      StandardCopyOption.ATOMIC_MOVE)
    assert(search() == before,
      "an uncommitted generation leaked into search results")
    // the retry must take a FRESH id past the orphan
    Inverted.invAppend(spark, dir, b)
    assert(new java.io.File(s"$dir/postings/gen=2").exists(),
      "retry must not reuse the orphan's generation id")
    val dirFull = TempRoots.create("graft_inv_crash_full_")
    Inverted.invBuild(docs, dirFull, nBuckets = 16)
    def searchFull() = Inverted.invSearch(spark, dirFull,
      Seq("table", "hash")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(search() == searchFull(),
      "post-retry search must equal the clean rebuild")
    // compaction wipes the orphan wholesale and stays search-identical;
    // the collapsed table keeps the HIGHEST committed id (2 — ids are
    // never reused across compaction, review r14), not 0
    Inverted.invCompact(spark, dir)
    assert(!new java.io.File(s"$dir/postings/gen=0").exists() &&
      !new java.io.File(s"$dir/postings/gen=1").exists() &&
      new java.io.File(s"$dir/postings/gen=2").exists())
    assert(search() == searchFull())
  }

  test("invSearch plan: posting scan statically pruned to the terms' buckets") {
    val docs = Tables.documents(spark, sf001)
    val dir = TempRoots.create("graft_inv_plan_")
    Inverted.invBuild(docs, dir, nBuckets = 64)
    val df = Inverted.invSearch(spark, dir, Seq("table", "hash"))
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    val postings = scans.find(_.metadata("Location").contains("postings"))
    assert(postings.nonEmpty, "expected a postings file scan in the plan")
    val pf = postings.get.partitionFilters.mkString(" ")
    assert(pf.contains("tbucket"),
      s"postings scan must carry a tbucket partition filter — got: $pf")
    // ≤ 2 distinct buckets for 2 terms; no other bucket value may appear
    def bucket(t: String): String = {
      val c = new java.util.zip.CRC32()
      c.update(t.getBytes("UTF-8"))
      "t" + (c.getValue % 64)
    }
    assert(Seq("table", "hash").forall(t => pf.contains(bucket(t))),
      s"pruning literals must name the query terms' buckets: $pf")
  }

  test("invPhrase: three-term phrase and duplicate-term phrase are exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a hash table merge here"),      // "hash table merge" at pos 1
      (2L, "hash table x table merge"),     // no 3-gram match
      (3L, "zz hash table merge hash table merge"), // matches at 1 and 4
      (4L, "do do do")                      // duplicate-term phrase target
    ).toDF("doc_id", "text")
    val dir = TempRoots.create("graft_inv_ph_")
    Inverted.invBuild(docs, dir, nBuckets = 8)
    val got3 = Inverted.invPhrase(spark, dir,
      Seq("hash", "table", "merge")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got3 == Seq((1L, 1), (3L, 1), (3L, 4)))
    val gotDup = Inverted.invPhrase(spark, dir, Seq("do", "do"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(gotDup == Seq((4L, 0), (4L, 1)))
  }

  test("token-less docs count in N and avgdl but carry no postings") {
    import spark.implicits._
    val docs = Seq((1L, "hash table"), (2L, ""), (3L, "hash")).toDF("doc_id", "text")
    val dir = TempRoots.create("graft_inv_stats_")
    Inverted.invBuild(docs, dir, nBuckets = 8)
    val s = spark.read.parquet(s"$dir/stats").head()
    assert(s.getLong(0) == 3 && s.getLong(1) == 3) // 3 docs, 3 tokens
    assert(spark.read.parquet(s"$dir/postings")
      .filter(col("doc_id") === 2L).isEmpty)
    // and the BM25 result equals the per-call form on the same frame
    val got = Inverted.invSearch(spark, dir, Seq("hash")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = ops.Text.bm25(docs, Seq("hash")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("invDelete tombstones: netted stats + masked postings ≡ a build " +
      "over the survivors; as-of-before-delete reads the old scores; " +
      "re-append restores them; compact folds (stats net to one row)") {
    val docs = Tables.documents(spark, sf001)
    val dropped = docs.filter(col("doc_id") % 5 >= 3)
    val kept = docs.filter(col("doc_id") % 5 < 3)
    def search(d: String, asOf: Option[Long] = None) =
      Inverted.invSearch(spark, d, Seq("table", "hash"), asOfGen = asOf)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dir = TempRoots.create("graft_inv_del_")
    Inverted.invBuild(docs, dir, nBuckets = 16)         // gen 0
    val before = search(dir)
    Inverted.invDelete(spark, dir, dropped)             // gen 1
    val after = search(dir)
    val ref = TempRoots.create("graft_inv_del_ref_")
    Inverted.invBuild(kept, ref, nBuckets = 16)
    assert(after == search(ref),
      "post-delete search must equal a build over the survivors — " +
        "scores included (a stats drift moves every avgdl-dependent score)")
    assert(before != after, "vacuous fixture: deletion moved no score")
    // phrase search masks through the same rule: post-delete phrase hits
    // equal the survivors' build's (same pruned-lookup code path)
    def phrase(d: String) =
      Inverted.invPhrase(spark, d, Seq("table", "hash")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(phrase(dir) == phrase(ref),
      "post-delete phrase search diverged from the survivors' build")
    assert(search(dir, asOf = Some(0L)) == before,
      "as-of-before-delete must reproduce the pre-delete scores")
    // the double-delete guard (ADVICE r15): re-deleting already-dead ids
    // must fail LOUDLY before anything commits — a silent second
    // tombstone generation would double-subtract N/avgdl and skew every
    // subsequent score
    val dd = intercept[IllegalArgumentException] {
      Inverted.invDelete(spark, dir, dropped.limit(3))
    }
    assert(dd.getMessage.contains("already tombstoned"))
    assert(search(dir) == after,
      "the rejected double-delete must leave the index untouched")
    // delete-then-re-append: the new generation re-adds exactly the
    // stats the delete subtracted and its postings outrank the tombstone
    Inverted.invAppend(spark, dir, dropped)             // gen 2
    assert(search(dir) == before,
      "re-append must restore the original scores bit for bit")
    // delete again, compact: postings rewrite drops dead rows, stats net
    // to ONE row equal to the survivors' build stats, tombs table goes
    Inverted.invDelete(spark, dir, dropped)             // gen 3
    Inverted.invCompact(spark, dir)
    assert(search(dir) == after, "compaction changed the search result")
    assert(!new java.io.File(s"$dir/tombs").exists(),
      "compaction must fold the tombstone table away")
    val st = spark.read.parquet(s"$dir/stats").collect()
    assert(st.length == 1)
    val refSt = spark.read.parquet(s"$ref/stats")
      .select("n_docs", "total_dl").head()
    assert(st.head.getAs[Long]("n_docs") == refSt.getLong(0) &&
      st.head.getAs[Long]("total_dl") == refSt.getLong(1),
      "netted stats must equal the survivors' build stats exactly")
    assert(spark.read.parquet(s"$dir/postings")
        .filter(col("doc_id") % 5 >= 3).count() == 0L,
      "dead posting rows survived the compaction rewrite")
  }

  test("asOfGen pins the committed snapshot: search/phrase at gen 0 " +
      "ignore an append; compaction invalidates old pins loudly") {
    import spark.implicits._
    val a = Seq((1L, "hash table lookup"), (2L, "hash join"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "hash hash hash"), (4L, "hash table"))
      .toDF("doc_id", "text")
    val dir = TempRoots.create("graft_inv_asof_")
    Inverted.invBuild(a, dir, nBuckets = 8)
    val pre = Inverted.invSearch(spark, dir, Seq("hash")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val prePh = Inverted.invPhrase(spark, dir, Seq("hash", "table"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    Inverted.invAppend(spark, dir, b)
    // pinned reads reproduce the pre-append results exactly — doc 3's
    // tf-3 postings AND its stats contribution (N, avgdl) must both be
    // invisible, or the BM25 scores drift even for old docs
    val pinned = Inverted.invSearch(spark, dir, Seq("hash"),
        asOfGen = Some(0L)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pinned == pre, s"pinned $pinned != pre-append $pre")
    val pinnedPh = Inverted.invPhrase(spark, dir, Seq("hash", "table"),
        asOfGen = Some(0L)).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(pinnedPh == prePh)
    // the unpinned read sees the append (the pin is not a default)
    val unpinned = Inverted.invSearch(spark, dir, Seq("hash")).collect()
      .map(_.getLong(0)).toSet
    assert(unpinned.contains(3L))
    // a pin at a never-committed generation fails loudly
    val e1 = intercept[IllegalArgumentException] {
      Inverted.invSearch(spark, dir, Seq("hash"), asOfGen = Some(9L))
    }
    assert(e1.getMessage.contains("not a committed generation"))
    // compaction collapses history into the HIGHEST committed id (1):
    // the pre-append pin (0) now names a state that no longer exists and
    // must fail loudly, never silently resolve to different content —
    // and because ids are never reused, no later append can resurrect it
    Inverted.invCompact(spark, dir)
    val e2 = intercept[IllegalArgumentException] {
      Inverted.invSearch(spark, dir, Seq("hash"), asOfGen = Some(0L))
    }
    assert(e2.getMessage.contains("compaction collapses"))
    // the surviving pin (1 = "everything through the append") denotes
    // the SAME data before and after the compaction
    val post = Inverted.invSearch(spark, dir, Seq("hash"),
        asOfGen = Some(1L)).collect().map(_.getLong(0)).toSet
    assert(post.contains(3L))
  }

  test("searching an EMPTY index fails loudly, not NaN scores (ADVICE r13)") {
    import spark.implicits._
    val dir = TempRoots.create("graft_inv_empty_")
    Inverted.invBuild(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      dir, nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      Inverted.invSearch(spark, dir, Seq("hash")).collect()
    }
    assert(e.getMessage.contains("empty") && e.getMessage.contains(dir),
      s"empty-index error must name the index: ${e.getMessage}")
  }
}
