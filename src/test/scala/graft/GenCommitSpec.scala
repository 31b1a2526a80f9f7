package graft

import graft.sources.GenCommit

/** The generation-commit protocol's concurrency contract (VERDICT r13
  * #6): writer-fenced optimistic commits — interleaved appends can race
  * a generation id, but the race is decided loudly at publish, never by
  * silent loss of either writer's data.
  */
class GenCommitSpec extends SparkSuite {
  import spark.implicits._

  test("two interleaved appends: first publish wins the generation, the " +
      "loser fails loudly with its stage intact, retry succeeds") {
    val dir = TempRoots.create("graft_fence_")
    def stage(gen: Long, token: String, v: Long): Unit =
      Seq(v).toDF("x").coalesce(1).write.mode("overwrite")
        .parquet(GenCommit.stagePath(dir, gen, "t", token))
    // both writers resolve the same next generation (the race)
    val gen = GenCommit.nextGen(spark, dir, Seq("t"))
    assert(gen == 0L)
    // both stage COMPLETELY before either publishes — the interleaving
    // that silently lost writer A's bytes before tokens existed (the
    // shared stage path let B's write clobber A's)
    stage(gen, "writerA", 1L)
    stage(gen, "writerB", 2L)
    GenCommit.publish(spark, dir, gen, Seq("t"), "writerA")
    val e = intercept[IllegalArgumentException] {
      GenCommit.publish(spark, dir, gen, Seq("t"), "writerB")
    }
    assert(e.getMessage.contains("concurrent writer"),
      s"loser must learn it lost: ${e.getMessage}")
    // the committed generation holds the WINNER's bytes
    assert(GenCommit.committed(spark, dir) == Seq(0L))
    assert(spark.read.parquet(s"$dir/t/gen=0").head().getLong(0) == 1L)
    // the loser's staged bytes survived the collision — nothing to
    // recompute, just re-stage under a fresh id (here: fresh stage write)
    assert(spark.read.parquet(GenCommit.stagePath(dir, gen, "t", "writerB"))
      .head().getLong(0) == 2L)
    val retry = GenCommit.nextGen(spark, dir, Seq("t"))
    assert(retry == 1L, "the burned id must not be reused")
    stage(retry, "writerB", 2L)
    GenCommit.publish(spark, dir, retry, Seq("t"), "writerB")
    assert(GenCommit.committed(spark, dir) == Seq(0L, 1L))
    // compaction-entry GC sweeps the orphan stage dirs
    GenCommit.gcStages(spark, dir)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = f.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath.getName).filter(_.startsWith(".gen"))
    assert(leftovers.isEmpty, s"stage orphans survived GC: $leftovers")
    // and the committed data is untouched by the GC
    assert(spark.read.parquet(s"$dir/t").select("x").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("a crashed publish burns the id: gen dir present without marker " +
      "is invisible to readers and never recommitted") {
    val dir = TempRoots.create("graft_fence_crash_")
    Seq(1L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, 0L, "t", "w"))
    GenCommit.publish(spark, dir, 0L, Seq("t"), "w")
    // simulate a crash BETWEEN rename and marker for gen 1: rename the
    // staged dir in by hand, create no marker
    Seq(9L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, 1L, "t", "w"))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.rename(
      new org.apache.hadoop.fs.Path(GenCommit.stagePath(dir, 1L, "t", "w")),
      new org.apache.hadoop.fs.Path(s"$dir/t/gen=1")))
    assert(GenCommit.committed(spark, dir) == Seq(0L),
      "unmarked generation must be invisible")
    // the next writer skips the burned id even though it never committed
    assert(GenCommit.nextGen(spark, dir, Seq("t")) == 2L)
    // a writer that died between CLAIMING and its first rename left
    // nothing but the claim file — the id is burned all the same
    require(f.createNewFile(
      new org.apache.hadoop.fs.Path(s"$dir/commits/.claim-5")))
    assert(GenCommit.committed(spark, dir) == Seq(0L),
      "a claim is not a commit")
    assert(GenCommit.nextGen(spark, dir, Seq("t")) == 6L,
      "a crashed claimant's id must stay burned")
  }

  test("claim-first appends: claimNextGen skips contended ids with " +
      "metadata-only retries and publish(claimed=true) needs no re-fence") {
    val dir = TempRoots.create("graft_claimfirst_")
    Seq(1L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, 0L, "t", "w"))
    GenCommit.publish(spark, dir, 0L, Seq("t"), "w")
    // a rival claims what would be the next id (1) — our claim loop must
    // lose that race once and land on 2 without staging anything
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.createNewFile(
      new org.apache.hadoop.fs.Path(s"$dir/commits/.claim-1")))
    val gen = GenCommit.claimNextGen(spark, dir, Seq("t"), token = "owner")
    assert(gen == 2L, s"claim loop must skip the rival's id: got $gen")
    // the claimed id is fenced: a publish that did NOT claim fails on it
    Seq(7L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, gen, "t", "rival"))
    val e = intercept[IllegalArgumentException] {
      GenCommit.publish(spark, dir, gen, Seq("t"), "rival")
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the owner stages and publishes without re-fencing
    Seq(2L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, gen, "t", "owner"))
    GenCommit.publish(spark, dir, gen, Seq("t"), "owner", claimed = true)
    assert(GenCommit.committed(spark, dir) == Seq(0L, 2L))
    assert(spark.read.parquet(s"$dir/t/gen=2").head().getLong(0) == 2L)
    // publish(claimed=true) on an UNclaimed id is a caller bug — loud
    Seq(3L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, 9L, "t", "w"))
    val e2 = intercept[IllegalArgumentException] {
      GenCommit.publish(spark, dir, 9L, Seq("t"), "w", claimed = true)
    }
    assert(e2.getMessage.contains("claimNextGen"))
  }

  test("the claim records its owner: publish(claimed=true) with a " +
      "different writer's token fails loudly instead of racing renames") {
    val dir = TempRoots.create("graft_claimowner_")
    Seq(1L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, 0L, "t", "w"))
    GenCommit.publish(spark, dir, 0L, Seq("t"), "w")
    // writer A claims generation 1 with its token
    val gen = GenCommit.claimNextGen(spark, dir, Seq("t"), token = "wrA")
    assert(gen == 1L)
    // writer B wrongly believes IT claimed gen 1 (the ADVICE r14 footgun:
    // an anonymous existence check would let it pass the fence here and
    // nest its renames into A's generation)
    Seq(2L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, gen, "t", "wrB"))
    val e = intercept[IllegalArgumentException] {
      GenCommit.publish(spark, dir, gen, Seq("t"), "wrB", claimed = true)
    }
    assert(e.getMessage.contains("belongs to writer 'wrA'"),
      s"foreign claim must be refused by owner token: ${e.getMessage}")
    // the true owner still publishes normally
    Seq(3L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, gen, "t", "wrA"))
    GenCommit.publish(spark, dir, gen, Seq("t"), "wrA", claimed = true)
    assert(spark.read.parquet(s"$dir/t/gen=1").head().getLong(0) == 3L)
  }

  // ——— the CommitStore adapter matrix (VERDICT r17 #3) ———

  /** An in-memory mutex service standing in for the conditional-put
    * table a raw-S3 deployment wires in (DynamoDB-style): putIfAbsent
    * is the conditional put.
    */
  private def inMemoryLock(): (String => Boolean, String => Unit) = {
    val held = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    (held.add _, (k: String) => { held.remove(k); () })
  }

  test("LockingCommitStore: the mutex restores a true fence over a " +
      "check-then-act base — N threads racing one claim yield exactly " +
      "one winner") {
    val dir = TempRoots.create("graft_lockstore_")
    val (tryL, unL) = inMemoryLock()
    val store = new graft.sources.LockingCommitStore(tryL, unL)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val p = new org.apache.hadoop.fs.Path(s"$dir/claim-race")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val done = (1 to 8).map { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            gate.await()
            if (store.createExclusive(f, p)) wins.incrementAndGet()
          }
        })
      }
      gate.countDown()
      done.foreach(_.get())
    } finally pool.shutdown()
    assert(wins.get() == 1, s"the fence must admit exactly one winner, " +
      s"got ${wins.get()}")
  }

  test("LockingCommitStore: the mutex wait is TIME-budgeted with " +
      "backoff (ADVICE r18) — a held lock outlasting the budget fails " +
      "naming the budget; contention shorter than the budget succeeds") {
    val dir = TempRoots.create("graft_lockwait_")
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(dir))
    // a lock nobody ever releases: the budget, not a spin count, decides
    val stuck = new graft.sources.LockingCommitStore(
      _ => false, _ => (), waitBudgetMs = 120L)
    val t0 = System.nanoTime()
    val e = intercept[IllegalStateException] {
      stuck.createExclusive(f, new org.apache.hadoop.fs.Path(s"$dir/a"))
    }
    assert(e.getMessage.contains("120 ms"), e.getMessage)
    assert((System.nanoTime() - t0) / 1000000L >= 100L,
      "must wait out the budget before giving up")
    // slow-but-live contention WITHIN the budget succeeds (the old 2 s
    // spin cap failed this shape spuriously)
    val free = System.currentTimeMillis() + 300L
    val slow = new graft.sources.LockingCommitStore(
      _ => System.currentTimeMillis() >= free, _ => (),
      waitBudgetMs = 10000L)
    assert(slow.createExclusive(f, new org.apache.hadoop.fs.Path(s"$dir/b")),
      "contention within the budget must win eventually")
  }

  test("crash matrix: both kill points (pre-promote, post-promote/" +
      "pre-marker) x both adapters leave the table readable at the last " +
      "committed state, and the documented recovery heals each") {
    import graft.sources.{CommitStore, GenTable, HdfsCommitStore,
      LockingCommitStore}
    val (tryL, unL) = inMemoryLock()
    val adapters: Seq[(String, CommitStore)] = Seq(
      ("hdfs", HdfsCommitStore),
      ("locking", new LockingCommitStore(tryL, unL)))
    // the fault-injecting store: armed, it throws at the chosen point
    class FaultStore(base: CommitStore) extends CommitStore {
      @volatile var failPromote = false
      @volatile var failMarker = false
      override def createExclusive(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path): Boolean = {
        // markers are the all-digit files under commits/
        if (failMarker && p.getParent.getName == "commits" &&
            p.getName.nonEmpty && p.getName.forall(_.isDigit))
          throw new RuntimeException("injected: died before the marker")
        base.createExclusive(f, p)
      }
      override def promote(f: org.apache.hadoop.fs.FileSystem,
          src: org.apache.hadoop.fs.Path,
          dst: org.apache.hadoop.fs.Path): Boolean = {
        if (failPromote)
          throw new RuntimeException("injected: died before any rename")
        base.promote(f, src, dst)
      }
    }
    val saved = GenCommit.store
    try {
      for ((tag, base) <- adapters; killAtMarker <- Seq(false, true)) {
        val fault = new FaultStore(base)
        GenCommit.store = fault
        val dir = s"${TempRoots.create(s"graft_crash_${tag}_")}/t"
        GenTable.init(Seq((1L, "A", 10.0), (2L, "B", 20.0))
          .toDF("k", "p", "v"), dir, "p")
        val delta = Seq((1L, "A", 11.0, "upsert"))
          .toDF("k", "p", "v", "_op")
        // arm the kill and crash the merge at the chosen point
        if (killAtMarker) fault.failMarker = true else fault.failPromote = true
        intercept[RuntimeException] {
          GenTable.merge(spark, dir, "p", delta, Seq("k"))
        }
        fault.failMarker = false; fault.failPromote = false
        // every crash point: the table still serves the LAST COMMITTED
        // state — never torn
        def state() = GenTable.read(spark, dir, "p")
          .select("k", "v").collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSet
        assert(state() == Set((1L, 10.0), (2L, 20.0)),
          s"[$tag killAtMarker=$killAtMarker] crash tore the table")
        // the documented healing: pre-stage crashes free via
        // recoverClaims, mid-publish ones via recover()
        if (killAtMarker) GenTable.recover(spark, dir)
        // pre-promote: merge's own catch released the claim (nothing
        // entered the table tree); recoverClaims is then a no-op sweep
        else GenTable.recoverClaims(spark, dir)
        // the retry lands cleanly
        GenTable.merge(spark, dir, "p", delta, Seq("k"))
        assert(state() == Set((1L, 11.0), (2L, 20.0)),
          s"[$tag killAtMarker=$killAtMarker] retry after heal failed")
      }
    } finally GenCommit.store = saved
  }

  test("recoverClaims releases only never-published claims: a claim with " +
      "a gen dir stays burned, a marker's residue claim stays untouched") {
    val dir = TempRoots.create("graft_recoverclaims_")
    // gen 0: fully committed via claim-first (its claim file remains as
    // normal residue and must NOT be released)
    val tk0 = GenCommit.newToken()
    val g0 = GenCommit.claimNextGen(spark, dir, Seq("t"), token = tk0)
    Seq(1L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, g0, "t", tk0))
    GenCommit.publish(spark, dir, g0, Seq("t"), tk0, claimed = true)
    // gen 1: claimed, publishing BEGAN (gen dir exists), no marker — a
    // crashed publish; the id must stay burned
    require(GenCommit.tryClaim(spark, dir, 1L, "crashed-mid-publish"))
    Seq(9L).toDF("x").write.mode("overwrite")
      .parquet(GenCommit.stagePath(dir, 1L, "t", "w1"))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.rename(
      new org.apache.hadoop.fs.Path(GenCommit.stagePath(dir, 1L, "t", "w1")),
      new org.apache.hadoop.fs.Path(s"$dir/t/gen=1")))
    // gen 2: claimed, NOTHING staged into the tables — a writer that died
    // between claim and first rename; exactly what recoverClaims frees
    require(GenCommit.tryClaim(spark, dir, 2L, "crashed-pre-stage"))
    assert(GenCommit.nextGen(spark, dir, Seq("t")) == 3L)
    val released = GenCommit.recoverClaims(spark, dir, Seq("t"))
    assert(released == Seq(2L), s"only the pre-stage crash frees: $released")
    // the partially-published id stays burned (its gen dir exists)...
    assert(GenCommit.nextGen(spark, dir, Seq("t")) == 2L)
    // ...and the released slot is claimable again at metadata cost
    require(GenCommit.tryClaim(spark, dir, 2L, "retry"))
    assert(GenCommit.committed(spark, dir) == Seq(0L),
      "recovery must not touch the committed set")
  }
}
