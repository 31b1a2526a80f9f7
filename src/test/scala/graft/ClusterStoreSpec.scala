package graft

import org.apache.spark.sql.functions._
import graft.ops.{ClusterStore, Text}

/** The standing cluster store's contracts: merge-on-read latest-wins
  * equals the batch rebuild, nightly generations carry only changed
  * rows, as-of reads reproduce any night, crashed nights are invisible,
  * and compaction preserves both content and pin semantics.
  */
class ClusterStoreSpec extends SparkSuite {
  import spark.implicits._

  // a two-night fixture with every interesting shape:
  //   night 0 (init): {1,2,3} (comp 1), {10,11} (comp 10), {30,31} (comp
  //   30, never touched again)
  //   night 1: bridge (3,10) merges the first two; new pair (20,21)
  //   night 2: new doc 4 joins the merged cluster via (4,11)
  private val night0 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (30L, 31L))
  private val night1 = Seq((3L, 10L), (20L, 21L))
  private val night2 = Seq((4L, 11L))

  private def pairsDf(p: Seq[(Long, Long)]) = p.toDF("doc_a", "doc_b")

  private def batchLabels(nights: Seq[(Long, Long)]*) =
    Text.dupComponentsStar(pairsDf(nights.flatten))

  private def readMap(dir: String, asOf: Option[Long] = None) =
    ClusterStore.read(spark, dir, asOf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def labelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two nightly merges ≡ batch rebuild; as-of reads reproduce " +
      "every night; night generations hold only changed rows") {
    val dir = TempRoots.create("graft_cstore_")
    ClusterStore.init(batchLabels(night0), dir)
    ClusterStore.merge(spark, dir, pairsDf(night1))
    ClusterStore.merge(spark, dir, pairsDf(night2))
    assert(readMap(dir) == labelMap(batchLabels(night0, night1, night2)),
      "current view must equal the batch rebuild over all pairs")
    // as-of reads ARE each night's state
    assert(readMap(dir, Some(0L)) == labelMap(batchLabels(night0)))
    assert(readMap(dir, Some(1L)) == labelMap(batchLabels(night0, night1)))
    // a stale pin must fail loudly, not guess
    val e = intercept[IllegalArgumentException] {
      ClusterStore.read(spark, dir, Some(7L)).collect()
    }
    assert(e.getMessage.contains("not a committed generation"))
    // changed-rows-only: night 2 touched the merged {1,2,3,10,11}
    // component and added doc 4 — 6 rows — but NOT {20,21} or {30,31}
    val g2 = spark.read.parquet(s"$dir/labels/gen=2")
    assert(g2.count() == 6L,
      s"night-2 generation must hold only the touched set, got ${g2.count()}")
    assert(g2.filter(col("id").isin(20L, 21L, 30L, 31L)).count() == 0L,
      "untouched components leaked into a nightly generation")
  }

  test("a crashed night is invisible; compaction folds history, keeps " +
      "content and the surviving pin, and rejects stale pins") {
    val dir = TempRoots.create("graft_cstore_crash_")
    ClusterStore.init(batchLabels(night0), dir)
    ClusterStore.merge(spark, dir, pairsDf(night1))
    val cur = readMap(dir)
    // a night that staged but never published: invisible to readers
    Seq((30L, 999L)).toDF("id", "comp").write.mode("overwrite")
      .parquet(graft.sources.GenCommit.stagePath(dir, 5L, "labels", "w"))
    assert(readMap(dir) == cur, "an unpublished night leaked into a read")
    ClusterStore.compact(spark, dir)
    assert(readMap(dir) == cur, "compaction changed the current view")
    // history folded into the single highest committed generation (1)
    assert(graft.sources.GenCommit.committed(spark, dir) == Seq(1L))
    assert(!new java.io.File(s"$dir/labels/gen=0").exists())
    assert(readMap(dir, Some(1L)) == cur,
      "the surviving pin must denote the same data across compaction")
    val e = intercept[IllegalArgumentException] {
      ClusterStore.read(spark, dir, Some(0L)).collect()
    }
    assert(e.getMessage.contains("compaction collapses"))
    // and the store still merges after compaction
    ClusterStore.merge(spark, dir, pairsDf(night2))
    assert(readMap(dir) == labelMap(batchLabels(night0, night1, night2)))
  }

  test("concurrent merges serialize by CAS: a claimed snapshot+1 slot " +
      "fails the second merge loudly; compact clears a crashed claim") {
    val dir = TempRoots.create("graft_cstore_cas_")
    ClusterStore.init(batchLabels(night0), dir)
    // a rival merge (or a crashed one) holds the snapshot+1 slot
    require(graft.sources.GenCommit.tryClaim(spark, dir, 1L))
    val e = intercept[IllegalArgumentException] {
      ClusterStore.merge(spark, dir, pairsDf(night1))
    }
    assert(e.getMessage.contains("concurrent merge"),
      s"CAS loser must learn why: ${e.getMessage}")
    assert(readMap(dir) == labelMap(batchLabels(night0)),
      "a failed CAS merge must leave the store untouched")
    // compaction (the documented remedy) wipes the crashed claim —
    // merges flow again
    ClusterStore.compact(spark, dir)
    ClusterStore.merge(spark, dir, pairsDf(night1))
    assert(readMap(dir) == labelMap(batchLabels(night0, night1)))
  }

  test("an in-process merge failure before publish releases its claim " +
      "— the next merge retries without a compaction") {
    val dir = TempRoots.create("graft_cstore_release_")
    ClusterStore.init(batchLabels(night0), dir)
    // malformed delta: no doc_b column → fails inside ccMergeParts,
    // AFTER the CAS claim was taken
    intercept[Exception] {
      ClusterStore.merge(spark, dir, Seq(1L).toDF("doc_a"))
    }
    // the slot must be free again: a valid merge lands as gen 1
    ClusterStore.merge(spark, dir, pairsDf(night1))
    assert(readMap(dir) == labelMap(batchLabels(night0, night1)),
      "claim release failed — the CAS slot stayed burned")
  }

  test("remove tombstones: view = labels minus removed rows (absent ids " +
      "a no-op); as-of-before-remove reads the old label; a later merge " +
      "RE-ADDS a removed doc its pairs touch; compact folds tombstones") {
    val dir = TempRoots.create("graft_cstore_rm_")
    ClusterStore.init(batchLabels(night0), dir)          // gen 0
    val full = labelMap(batchLabels(night0))
    // remove doc 2 (mid-cluster), 31 (pair cluster) and 999 (never held)
    ClusterStore.remove(spark, dir, Seq(2L, 31L, 999L).toDF("id")) // gen 1
    assert(readMap(dir) == full - 2L - 31L,
      "view must be the labels minus exactly the removed rows")
    // row-scoped: the survivors of the removed docs' clusters keep labels
    assert(readMap(dir)(3L) == full(3L) && readMap(dir)(30L) == full(30L))
    assert(readMap(dir, Some(0L)) == full,
      "as-of-before-remove must read the old label")
    // a merge whose delta pairs touch a removed doc re-adds it: (2, 11)
    // pulls doc 2 back into 11's cluster. Removal was ROW-SCOPED, so the
    // store holds no memory of 2's OLD membership — cluster {1, 3} stays
    // apart (re-linking it would need a re-detected (2, 1-or-3) pair),
    // which is exactly the documented takedown semantic
    ClusterStore.merge(spark, dir, pairsDf(Seq((2L, 11L))))  // gen 2
    val re = readMap(dir)
    assert(re.contains(2L) && re(2L) == re(11L) && re(2L) == re(10L),
      s"re-entered doc must land in the touched cluster: $re")
    assert(re(1L) == 1L && re(3L) == 1L,
      s"row-scoped removal must not re-link the old cluster: $re")
    assert(!re.contains(31L), "the un-touched removed doc must stay gone")
    // compact folds: tombstones vanish with the history, view unchanged
    ClusterStore.compact(spark, dir)
    assert(readMap(dir) == re, "compaction changed the view")
    assert(spark.read.parquet(s"$dir/labels")
        .filter(col("comp").isNull).count() == 0L,
      "tombstone rows survived the compaction rewrite")
  }

  test("recoverClaims unsticks a crashed nightly WITHOUT a compaction: " +
      "the orphan claim frees, a published gen's claim residue stays") {
    val dir = TempRoots.create("graft_cstore_recover_")
    ClusterStore.init(batchLabels(night0), dir)
    ClusterStore.merge(spark, dir, pairsDf(night1)) // gen 1, claim residue
    // a nightly that died between claim and staging: burns snapshot+1
    require(graft.sources.GenCommit.tryClaim(spark, dir, 2L, "crashed"))
    intercept[IllegalArgumentException] {
      ClusterStore.merge(spark, dir, pairsDf(night2))
    }
    // the targeted unblock: metadata-only, no label-table rewrite —
    // and it must not free gen 1's residue claim (its marker exists)
    assert(ClusterStore.recoverClaims(spark, dir) == Seq(2L))
    ClusterStore.merge(spark, dir, pairsDf(night2))
    assert(readMap(dir) == labelMap(batchLabels(night0, night1, night2)),
      "post-recovery merge diverged from the batch rebuild")
    // history intact: generation 0 still on disk, pins still serve
    assert(readMap(dir, Some(0L)) == labelMap(batchLabels(night0)),
      "recoverClaims must not disturb committed history")
  }

  test("shouldCompact crossover: a fresh store says no, a pile of " +
      "nightly generations says yes, compaction resets the signal") {
    val dir = TempRoots.create("graft_cstore_policy_")
    ClusterStore.init(batchLabels(night0), dir)          // G = 1
    assert(!ClusterStore.shouldCompact(spark, dir),
      "a single-generation store must never ask for a fold")
    ClusterStore.merge(spark, dir, pairsDf(night1))      // G = 2
    ClusterStore.merge(spark, dir, pairsDf(night2))      // G = 3
    assert(!ClusterStore.shouldCompact(spark, dir),
      "three generations sit under the measured fixed-cost floor " +
        "(CompactFixedSec) — folding buys less than it costs")
    // a month of tiny nightly generations: the per-generation read toll
    // (PerGenReadSec, Stress-measured) accumulates past the rewrite cost
    (0 until 12).foreach { k =>
      val lo = 1000L + k * 2
      ClusterStore.merge(spark, dir, pairsDf(Seq((lo, lo + 1))))
    }
    assert(ClusterStore.shouldCompact(spark, dir),
      "15 generations of nightly tolls must cross the measured threshold")
    val before = readMap(dir)
    ClusterStore.compact(spark, dir)
    assert(readMap(dir) == before)
    assert(!ClusterStore.shouldCompact(spark, dir),
      "the fold must reset the signal")
  }

  test("q41d end-to-end on the fixture corpus: store view after the " +
      "nightly merge equals q41's batch rebuild") {
    val got = Text.q41d(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Text.q41(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "q41d diverged from the batch resolution")
  }
}
