package graft

import org.apache.spark.sql.functions._

/** Text pipeline semantics: shingling, fingerprint dedup, and the minhash
  * LSH near-dup detector (SURVEY.md §2.3 q21/q22/x02).
  */
class TextSpec extends SparkSuite {
  import ops.Text
  import spark.implicits._

  test("bigram shingles of a known sentence") {
    val out = Seq("the quick brown fox").toDF("text")
      .select(Text.shingles(col("text"), 2).as("sh"))
      .collect().head.getSeq[String](0).toSet
    assert(out == Set("the quick", "quick brown", "brown fox"))
  }

  test("word-set fingerprint normalizes order, case and multiplicity") {
    val out = Seq("B a b C a", "a b c").toDF("text")
      .select(Text.wordSetFingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(out(0) == "a b c" && out(1) == "a b c")
  }

  test("q73 coverage curve: exact counts, monotone, TakeOrdered top-k cut") {
    val rows = Text.q73(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(100, 1000, 5000))
    // driver-side recount over the same lowercase space-split trigrams
    val grams = Tables.documents(spark, sf001).select("text").collect()
      .map(_.getString(0).toLowerCase)
      .flatMap(t => t.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")))
    val counts = grams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ordered = counts.toSeq.sortBy { case (g, c) => (-c, g) }
    val totAll = counts.values.sum
    rows.foreach { case (k, types, toks, cov) =>
      val top = ordered.take(k)
      assert(types == math.min(k.toLong, ordered.length.toLong))
      assert(toks == top.map(_._2).sum, s"k=$k token sum")
      assert(cov == toks.toDouble / totAll.toDouble)
    }
    // coverage is monotone nondecreasing in k and capped at 1
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted)
    assert(rows.forall(_._4 <= 1.0))
    // the top-k cut must plan as TakeOrdered, not a global sort shuffle
    val plan = Text.q73(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "orderBy+limit must compile to TakeOrderedAndProject")
  }

  test("q74 fuzzy names: matches brute-force edit distance, hash-join plan") {
    val rows = Text.q74(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(rows.nonEmpty)
    // brute force over the distinct-name dictionary
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sf001).select("p_name").distinct()
      .collect().map(_.getString(0)).sorted
    val want = (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).sorted.toSeq
    assert(rows.sorted.toSeq == want)
    // the length band must keep the dictionary join hash-shaped
    val plan = Text.q74(spark, sf001).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "length-band equi-key must prevent a nested-loop dictionary join")
  }

  test("q75 degree histogram: consistent with the pair list") {
    val pairs = Text.minhashPairs(Tables.documents(spark, sf001)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val degrees = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = degrees.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = Text.q75(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // every doc in the histogram has >= 1 neighbor, and totals agree
    assert(got.values.sum == degrees.size.toLong)
  }

  test("capClusterSizes: untriggered cap is the identity") {
    val labels = Seq((10L, 3L), (11L, 3L), (3L, 3L), (7L, 7L), (9L, 7L))
      .toDF("id", "comp")
    val out = Text.capClusterSizes(labels, maxClusterSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 3L), (11L, 3L), (3L, 3L), (7L, 7L), (9L, 7L)))
  }

  test("minhash LSH finds planted near-dup, not the unrelated doc") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val unrelated = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Text.minhashPairs(docs, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("identical docs detected with jaccard exactly 1.0") {
    val t = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val out = Text.minhashPairs(docs).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
  }

  test("x02 finds the planted near-dup pairs in the sf0.01 corpus") {
    val pairs = Text.x02(spark, sf001).collect()
    assert(pairs.length >= 20, s"expected >=20 near-dup pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getDouble(2) >= 0.9))
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("simhash LSH finds the planted near-dup, not the unrelated doc") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val unrelated = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    // radius-7 (x07's config): the one-word edit lands within the radius
    val wide = Text.simhashPairs(docs, maxHamming = 7, numChunks = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(wide == Set((1L, 2L)))
    // scale-safe default (radius 3): an exact duplicate still collides,
    // the unrelated doc still doesn't
    val dup = docs.union(Seq((4L, base)).toDF("doc_id", "text"))
    val tight = Text.simhashPairs(dup)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(tight.contains((1L, 4L)))
    assert(!tight.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("x21 delta pairs == the crossing subset of x02's self-join pairs") {
    // the asymmetric detector must see exactly the symmetric detector's
    // pairs that cross the delta/corpus boundary — a banding or side-mixup
    // bug would lose (or invent) crossing pairs silently; jaccard values
    // must agree exactly (same intersect/union integer arithmetic)
    val x02 = Text.x02(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = x02.flatMap { case (a, b, j) =>
      (a % 5 == 4, b % 5 == 4) match {
        case (true, false) => Some(((a, b), j))
        case (false, true) => Some(((b, a), j))
        case _ => None // both-delta pairs are out of x21's declared scope
      }
    }.toMap
    val got = Text.x21(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(expected.nonEmpty, "vacuous: no x02 pair crosses the 80/20 split")
    assert(got.keySet == expected.keySet,
      s"only-x21=${got.keySet -- expected.keySet} only-x02-crossing=${expected.keySet -- got.keySet}")
    got.foreach { case (k, j) => assert(j == expected(k), s"jaccard drift at $k") }
  }

  test("x21b: full index lifecycle (build+append+compact+probe) == x21") {
    // the materialized-LSH path must be pair-for-pair identical to the
    // in-memory delta detector: same frozen hash family, full-band probe
    // => same candidate law, same exact-jaccard verification. Any drift
    // (a parameter not frozen, a bucket lost in append or compaction)
    // shows up here as a missing/invented pair or a jaccard mismatch.
    val direct = ops.Text.x21(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val viaIndex = ops.Text.x21b(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(direct.nonEmpty, "vacuous: x21 found no crossing pairs")
    assert(viaIndex.keySet == direct.keySet,
      s"only-index=${viaIndex.keySet -- direct.keySet} " +
        s"only-direct=${direct.keySet -- viaIndex.keySet}")
    viaIndex.foreach { case (k, j) =>
      assert(j == direct(k), s"jaccard drift at $k") }
  }

  test("lshAppend: build(A)+append(B) probe-identical to build(A ∪ B)") {
    // ivfAppend's frozen-quantizer contract for text: appending under the
    // index's stored parameters must leave the persisted bucket set
    // exactly what a from-scratch build over the union would write
    val docs = Tables.documents(spark, sf001)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter((col("doc_id") % 2 === 1) && (col("doc_id") % 5 =!= 4))
    val probes = docs.filter(col("doc_id") % 5 === 4)
    def pairs(idx: String) =
      ops.Text.lshProbe(spark, idx, probes, threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    val dirApp = TempRoots.create("graft_lsh_app_")
    ops.Text.lshBuild(a, dirApp)
    ops.Text.lshAppend(spark, dirApp, b)
    val dirFull = TempRoots.create("graft_lsh_full_")
    ops.Text.lshBuild(a.union(b), dirFull)
    val appended = pairs(dirApp)
    assert(appended.nonEmpty && appended == pairs(dirFull),
      "append must be probe-indistinguishable from a rebuild over the union")
    // and the delta actually landed: some matched corpus doc is odd-id
    assert(appended.exists(_._2 % 2 == 1),
      "no delta (odd-id) match surfaced — append wrote nothing?")
    // empty-delta append is a no-op (the no-new-data nightly)
    ops.Text.lshAppend(spark, dirApp, docs.filter(col("doc_id") < 0))
    assert(pairs(dirApp) == appended)
  }

  test("lshDelete tombstones: delete ≡ pre-filtered build, as-of-before-" +
      "delete still reads the doc, re-append revives, compact folds") {
    val docs = Tables.documents(spark, sf001)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val probes = docs.filter(col("doc_id") % 5 === 4)
    val dropped = corpus.filter(col("doc_id") % 5 isin (2, 3))
    def pairs(idx: String, asOf: Option[Long] = None) =
      ops.Text.lshProbe(spark, idx, probes, threshold = 0.8, asOfGen = asOf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    val dir = TempRoots.create("graft_lsh_del_")
    ops.Text.lshBuild(corpus, dir)                      // gen 0
    val before = pairs(dir)
    ops.Text.lshDelete(spark, dir, dropped)             // gen 1
    val after = pairs(dir)
    val ref = TempRoots.create("graft_lsh_del_ref_")
    ops.Text.lshBuild(corpus.filter(!(col("doc_id") % 5 isin (2, 3))), ref)
    assert(after == pairs(ref),
      "post-delete probe must equal a build over the survivors")
    assert(before != after,
      "vacuous fixture: the drop slice matched no probe — widen it")
    // an as-of pin from BEFORE the delete still reads the dropped docs
    assert(pairs(dir, asOf = Some(0L)) == before,
      "as-of-before-delete must see the pre-delete world")
    // delete-then-re-append REVIVES: the re-appended generation outranks
    // the tombstone, the pre-delete copies stay masked (exactly one copy)
    ops.Text.lshAppend(spark, dir, dropped)             // gen 2
    assert(pairs(dir) == before, "re-append must revive the deleted docs")
    // delete again, then compact: dead rows physically drop, the tombs
    // table goes away, and the probe is bit-identical across the fold
    ops.Text.lshDelete(spark, dir, dropped)             // gen 3
    assert(pairs(dir) == after)
    ops.Text.lshCompact(spark, dir)
    assert(pairs(dir) == after, "compaction changed the probe result")
    assert(!new java.io.File(s"$dir/tombs").exists(),
      "compaction must fold the tombstone table away")
    assert(spark.read.parquet(s"$dir/docs")
        .filter(col("doc_id") % 5 isin (2, 3)).count() == 0L,
      "dead doc rows survived the compaction rewrite")
  }

  test("lshCompact: one file per band afterwards, probes bit-identical") {
    val docs = Tables.documents(spark, sf001)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val probes = docs.filter(col("doc_id") % 5 === 4)
    val dir = TempRoots.create("graft_lsh_cmp_")
    ops.Text.lshBuild(corpus.filter(col("doc_id") % 2 === 0), dir)
    ops.Text.lshAppend(spark, dir, corpus.filter(col("doc_id") % 2 === 1))
    // files per (band, sb) leaf — the compaction contract's unit
    def filesPerBand(): Map[String, Int] = {
      val base = new java.io.File(s"$dir/buckets")
      base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("gen="))
        .flatMap(g => g.listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("band="))
          .flatMap(b => b.listFiles()
            .filter(f => f.isDirectory && f.getName.startsWith("sb="))
            .map(d => s"${b.getName}/${d.getName}" ->
              d.listFiles().count(_.getName.endsWith(".parquet")))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    def probe() = ops.Text.lshProbe(spark, dir, probes, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    val before = probe()
    assert(before.nonEmpty, "vacuous: no pairs at threshold 0.8")
    assert(filesPerBand().values.exists(_ > 1),
      "fixture degenerate: append produced no multi-file band")
    ops.Text.lshCompact(spark, dir)
    val after = filesPerBand()
    assert(after.values.forall(_ == 1),
      s"compaction left multi-file sub-buckets: $after")
    assert(after.keys.map(_.takeWhile(_ != '/')).toSet.size == 8,
      s"compaction lost band partitions: ${after.keys}")
    assert(probe() == before, "compaction changed probe results")
  }

  test("lshCompact crash matrix: every interrupted-swap state recovers") {
    // the SwapDir ladder for the LSH index: whatever rename the writer
    // died between, lshRecover (or the next lshCompact, which runs it on
    // entry) must restore a COMPLETE index probing identically to a clean
    // compaction's. States: (a) staged-not-promoted — roll forward;
    // (b) live set aside, stage complete — roll forward; (c) stray _old
    // after promotion — cleanup.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def move(s: String, d: String): Unit =
      Files.move(Paths.get(s), Paths.get(d), StandardCopyOption.ATOMIC_MOVE)
    val docs = Tables.documents(spark, sf001)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4).filter(col("doc_id") < 6000)
    val probes = docs.filter(col("doc_id") % 5 === 4).filter(col("doc_id") < 6000)
    def mkIndex(): String = {
      val dir = TempRoots.create("graft_lsh_crash_")
      ops.Text.lshBuild(corpus.filter(col("doc_id") % 2 === 0), dir)
      ops.Text.lshAppend(spark, dir, corpus.filter(col("doc_id") % 2 === 1))
      dir
    }
    def probe(dir: String) =
      ops.Text.lshProbe(spark, dir, probes, threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    val ref = mkIndex()
    ops.Text.lshCompact(spark, ref)
    val want = probe(ref)
    assert(want.nonEmpty, "vacuous: crash-matrix fixture finds no pairs")

    // (a) buckets staged but live never set aside (crash before rename 1)
    val a = mkIndex()
    ops.Text.lshCompact(spark, a) // produce a staged set by hand:
    spark.read.parquet(s"$a/buckets").repartition(col("band"))
      .write.mode("overwrite").partitionBy("gen", "band")
      .parquet(sources.SwapDir.stagePath(a, "buckets"))
    ops.Text.lshRecover(spark, a) // healthy live wins; stray stage removed
    assert(!new java.io.File(sources.SwapDir.stagePath(a, "buckets")).exists())
    assert(probe(a) == want)

    // (b) crash between the two renames: live at _old, stage complete
    val b = mkIndex()
    spark.read.parquet(s"$b/buckets").repartition(col("band"))
      .write.mode("overwrite").partitionBy("gen", "band")
      .parquet(sources.SwapDir.stagePath(b, "buckets"))
    move(s"$b/buckets", s"$b/buckets_old")
    ops.Text.lshRecover(spark, b) // must roll FORWARD to the staged set
    assert(new java.io.File(s"$b/buckets").exists())
    assert(!new java.io.File(s"$b/buckets_old").exists())
    assert(probe(b) == want)

    // (c) crash after promotion, stray _old: next compact self-heals
    val c = mkIndex()
    ops.Text.lshCompact(spark, c)
    spark.read.parquet(s"$c/buckets").write.mode("overwrite")
      .parquet(s"$c/buckets_old_stage") // fabricate a stale old
    move(s"$c/buckets_old_stage", s"$c/buckets_old")
    ops.Text.lshCompact(spark, c) // runs lshRecover on entry
    assert(!new java.io.File(s"$c/buckets_old").exists())
    assert(probe(c) == want)
  }

  test("lshProbe probeBands: partition-pruned scan, pairs ⊆ full probe") {
    // the IVF-nprobe analog: a k-band probe must (1) touch only the k
    // probed band partitions on disk — pruning visible in the scan's
    // input files — and (2) return a subset of the full-band pair set
    // (fewer bands can only LOSE candidates, never invent them)
    val docs = Tables.documents(spark, sf001)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val probes = docs.filter(col("doc_id") % 5 === 4)
    val dir = TempRoots.create("graft_lsh_prune_")
    ops.Text.lshBuild(corpus, dir)
    val full = ops.Text.lshProbe(spark, dir, probes, threshold = 0.8)
    val two = ops.Text.lshProbe(spark, dir, probes, threshold = 0.8,
      probeBands = Some(2))
    // the bucket scan node must carry the band partition filter (the IVF
    // postings-pruning assertion's shape; inputFiles would list
    // pre-pruning files, so inspect the scan itself)
    val scans = two.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    val buckets = scans.find(_.metadata("Location").contains("buckets"))
    assert(buckets.nonEmpty, "expected a buckets file scan in the plan")
    assert(buckets.get.partitionFilters.nonEmpty,
      "buckets scan must be partition-pruned to the probed bands")
    val pf = buckets.get.partitionFilters.mkString(" ")
    assert(pf.contains("b0") && pf.contains("b1") && !pf.contains("b2"),
      s"2-band probe must prune to b0,b1 — got: $pf")
    val fullSet = full.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twoSet = two.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twoSet.subsetOf(fullSet),
      s"k-band probe invented pairs: ${twoSet -- fullSet}")
    intercept[IllegalArgumentException] {
      ops.Text.lshProbe(spark, dir, probes, probeBands = Some(9))
    }
    intercept[IllegalArgumentException] {
      ops.Text.lshProbe(spark, dir, probes, probeBands = Some(0))
    }
  }

  test("lshBuild sizes the sub-bucket layout to the corpus and freezes " +
      "it in meta; explicit params bypass the sizing count") {
    // the rule itself: smallest power of two ≥ x, clamped
    assert(ops.Text.pow2Clamp(0L, 128) == 1)
    assert(ops.Text.pow2Clamp(1L, 128) == 1)
    assert(ops.Text.pow2Clamp(2L, 128) == 2)
    assert(ops.Text.pow2Clamp(3L, 128) == 4)
    assert(ops.Text.pow2Clamp(152L, 128) == 128, "cap must clamp")
    assert(ops.Text.pow2Clamp(610L, 256) == 256)
    // auto path on the fixture corpus (≈5k docs): both tiers collapse
    // to the flat layout — small indexes must not pay directory
    // overhead (the r14 closing-bench lesson)
    val docs = Tables.documents(spark, sf001)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val dir = TempRoots.create("graft_lsh_size_")
    ops.Text.lshBuild(corpus, dir)
    val m = spark.read.parquet(s"$dir/meta").head()
    assert(m.getAs[Int]("sub_buckets") == 1 &&
      m.getAs[Int]("doc_buckets") == 1,
      s"fixture-sized corpus must get the flat layout: $m")
    // explicit params are frozen verbatim (no sizing count runs)
    val dir2 = TempRoots.create("graft_lsh_size_x_")
    ops.Text.lshBuild(corpus, dir2, subBuckets = 32, docBuckets = 8)
    val m2 = spark.read.parquet(s"$dir2/meta").head()
    assert(m2.getAs[Int]("sub_buckets") == 32 &&
      m2.getAs[Int]("doc_buckets") == 8)
    // and the layout choice never changes probe RESULTS
    val probes = docs.filter(col("doc_id") % 5 === 4)
    def run(d: String) = ops.Text.lshProbe(spark, d, probes,
      threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(run(dir) == run(dir2),
      "sub-bucket sizing changed probe results")
  }

  test("lshProbe small probe: bucket AND docs scans statically pruned " +
      "to the touched sub-buckets, result equals the full probe's slice") {
    val docs = Tables.documents(spark, sf001)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val probes = docs.filter(col("doc_id") % 5 === 4)
    val dir = TempRoots.create("graft_lsh_small_")
    ops.Text.lshBuild(corpus, dir)
    val full = ops.Text.lshProbe(spark, dir, probes, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full.nonEmpty, "vacuous fixture: full probe found no pairs")
    // probe with exactly ONE doc that the full probe matched
    val oneId = full.head._1
    val one = probes.filter(col("doc_id") === oneId)
    val small = ops.Text.lshProbe(spark, dir, one, threshold = 0.8)
    val scans = small.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc }
    // bucket scan: pruned to the single doc's (band, sb) combinations —
    // at most `bands` of the bands × sub_buckets on disk
    val buckets = scans.find(_.metadata("Location").contains("buckets"))
    assert(buckets.nonEmpty)
    val bpf = buckets.get.partitionFilters.mkString(" ")
    assert(bpf.contains("sb") && bpf.contains("band"),
      s"bucket scan must carry (band, sb) pruning literals — got: $bpf")
    // docs scan: pruned to the candidates' db sub-buckets
    val docScan = scans.find(_.metadata("Location").contains("docs"))
    assert(docScan.nonEmpty)
    val dpf = docScan.get.partitionFilters.mkString(" ")
    assert(dpf.contains("db#") || dpf.contains("db "),
      s"small-probe docs scan must carry db pruning literals — got: $dpf")
    // and pruning is LOSSLESS: the one-doc probe is exactly the full
    // probe's slice for that doc
    val got = small.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == full.filter(_._1 == oneId),
      s"pruned probe diverged for doc $oneId")
    // a probe with NO shingled docs returns empty, not an error
    assert(ops.Text.lshProbe(spark, dir,
      probes.filter(col("doc_id") < 0), threshold = 0.8).count() == 0L)
  }

  test("lshProbe with TOMBSTONES present: the pruned scans keep their " +
      "static (band, sb)/db literals — masking rides above the prune") {
    val docs = Tables.documents(spark, sf001)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val probes = docs.filter(col("doc_id") % 5 === 4)
    val dir = TempRoots.create("graft_lsh_delplan_")
    ops.Text.lshBuild(corpus, dir)
    ops.Text.lshDelete(spark, dir,
      corpus.filter(col("doc_id") % 7 === 3))
    val full = ops.Text.lshProbe(spark, dir, probes, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full.nonEmpty, "vacuous fixture")
    val one = probes.filter(col("doc_id") === full.head._1)
    val small = ops.Text.lshProbe(spark, dir, one, threshold = 0.8)
    val scans = small.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc }
    // the probe-proportional-reads property must SURVIVE deletion: the
    // masking join consumes the pruned scans, it must not widen them
    val bpf = scans.find(_.metadata("Location").contains("buckets"))
      .get.partitionFilters.mkString(" ")
    assert(bpf.contains("sb") && bpf.contains("band"),
      s"tombstoned bucket scan lost its (band, sb) pruning: $bpf")
    val dpf = scans.find(_.metadata("Location").contains("docs"))
      .get.partitionFilters.mkString(" ")
    assert(dpf.contains("db#") || dpf.contains("db "),
      s"tombstoned docs scan lost its db pruning: $dpf")
    // and the pruned one-doc probe equals the full probe's slice
    val got = small.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == full.filter(_._1 == full.head._1))
  }

  test("erMerge boundary matrix: bridge, pull-in, delta-only, recurring, untouched") {
    // the adversarial shapes an incremental ER must get right:
    //  - a delta spelling BRIDGING two standing clusters (>2 edits apart)
    //    merges them under the global lexicographic minimum;
    //  - a delta spelling pulls in an old SINGLETON (absent from labels);
    //  - two delta spellings form a delta-only cluster;
    //  - a RECURRING delta spelling adds count but no edges;
    //  - an untouched standing cluster passes through verbatim.
    val labels = Seq(
      ("abcdef", "abcdef"), ("abcdez", "abcdef"),   // cluster 1
      ("abqqqf", "abqqqf"), ("abqqqz", "abqqqf"),   // cluster 2 (3+ edits away)
      ("kkkkk1", "kkkkk1"), ("kkkkk2", "kkkkk1")    // untouched
    ).toDF("id", "comp")
    val oldNames = Seq(
      ("abcdef", 2L), ("abcdez", 1L), ("abqqqf", 1L), ("abqqqz", 1L),
      ("kkkkk1", 1L), ("kkkkk2", 1L), ("mmmmmm", 3L) // mmmmmm: old singleton
    ).toDF("p_name", "n")
    val deltaNames = Seq(
      ("abcqqf", 1L),      // bridges cluster 1 and cluster 2
      ("mmmmmx", 2L),      // pulls in the old singleton
      ("totallynew1", 1L), ("totallynew2", 1L), // delta-only cluster
      ("abcdef", 5L)       // recurring spelling: count only
    ).toDF("p_name", "n")
    val got = ops.Text.erMerge(labels, oldNames, deltaNames).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val bridged = Seq("abcdef" -> 7L, "abcdez" -> 1L, "abcqqf" -> 1L,
      "abqqqf" -> 1L, "abqqqz" -> 1L)
    val want =
      bridged.map { case (n, c) => n -> (("abcdef", 5L, c)) }.toMap ++
      Map(
        "kkkkk1" -> (("kkkkk1", 2L, 1L)), "kkkkk2" -> (("kkkkk1", 2L, 1L)),
        "mmmmmm" -> (("mmmmmm", 2L, 3L)), "mmmmmx" -> (("mmmmmm", 2L, 2L)),
        "totallynew1" -> (("totallynew1", 2L, 1L)),
        "totallynew2" -> (("totallynew1", 2L, 1L)))
    assert(got == want, s"got $got")
  }

  test("q83b merge == q83 rebuild; clusters cross the delta boundary") {
    val rebuild = ops.Text.q83(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val merged = ops.Text.q83b(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rebuild.nonEmpty && merged == rebuild)
    // non-vacuity: at least one cluster holds both an even-length (old)
    // and an odd-length (delta) spelling, so the merge path genuinely
    // stitched across the boundary
    val crossing = rebuild.groupBy(_._2).values
      .exists(c => c.exists(_._1.length % 2 == 0) &&
                   c.exists(_._1.length % 2 == 1))
    assert(crossing, "vacuous: no cluster spans the old/delta boundary")
  }

  test("ccMerge boundary matrix: bridge, pull-in, delta-only, untouched") {
    // the same adversarial shapes as erMerge's matrix, on doc ids:
    //  - a delta doc BRIDGING two standing clusters merges them under
    //    the global minimum id;
    //  - a delta doc pulls in an UNCLUSTERED old doc (absent from labels);
    //  - two delta docs form a delta-only cluster;
    //  - an untouched standing cluster passes through verbatim.
    val labels = Seq(
      (1L, 1L), (5L, 1L),   // cluster 1
      (2L, 2L), (8L, 2L),   // cluster 2
      (3L, 3L), (9L, 3L)    // untouched
    ).toDF("id", "comp")
    val deltaPairs = Seq(
      (10L, 5L), (10L, 8L), // doc 10 bridges clusters 1 and 2
      (11L, 7L),            // doc 11 pulls in unclustered old doc 7
      (12L, 13L)            // delta-only cluster
    ).toDF("doc_a", "doc_b")
    val got = ops.Text.ccMerge(labels, deltaPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Map(
      1L -> 1L, 5L -> 1L, 2L -> 1L, 8L -> 1L, 10L -> 1L, // bridged
      7L -> 7L, 11L -> 7L,                               // pulled in
      12L -> 12L, 13L -> 12L,                            // delta-only
      3L -> 3L, 9L -> 3L)                                // untouched
    assert(got == want, s"got $got")
  }

  test("q41c merge == q41 rebuild; q68b == q68; clusters cross the boundary") {
    val rebuild = ops.Text.q41(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val merged = ops.Text.q41c(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rebuild.nonEmpty && merged == rebuild)
    // non-vacuity: at least one cluster holds both an old (% 5 != 4) and
    // a delta (% 5 == 4) doc, so the merge genuinely stitched across
    val crossing = rebuild.groupBy(_._2).values
      .exists(c => c.exists(_._1 % 5 != 4) && c.exists(_._1 % 5 == 4))
    assert(crossing, "vacuous: no cluster spans the corpus/delta boundary")
    val keepRebuild = ops.Text.q68(spark, sf0001).collect()
      .map(_.getLong(0)).toSeq
    val keepMerged = ops.Text.q68b(spark, sf0001).collect()
      .map(_.getLong(0)).toSeq
    assert(keepMerged == keepRebuild)
  }

  test("nightly dedup end-to-end through the STANDING index: lshProbe " +
      "pairs + ccMerge == full rebuild") {
    // the production nightly: detection over the materialized LSH index
    // (delta-proportional probe), resolution via ccMerge (touched
    // components only) — the composed pipeline must equal the batch
    // rebuild exactly, completing x21b's pair-level gate at cluster level
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 4)
    val delta = docs.filter(pmod(col("doc_id"), lit(5L)) === 4)
    val dir = TempRoots.create("graft_ccmerge_idx_")
    Text.lshBuild(corpus, dir)
    val probePairs = Text.lshProbe(spark, dir, delta)
      .select(col("probe_id").as("doc_a"), col("index_id").as("doc_b"))
      .unionByName(Text.minhashPairs(delta).select(col("doc_a"), col("doc_b")))
    val standing = Text.dupComponentsStar(Text.minhashPairs(corpus))
    val merged = Text.ccMerge(standing, probePairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rebuild = Text.dupComponentsStar(Text.minhashPairs(docs))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rebuild.nonEmpty && merged == rebuild)
  }

  test("two-level wide banding is output-identical to single-level radius 7") {
    // both formulations are EXACT for radius <= 7 (pigeonhole arguments in
    // their docs), so their pair sets must be equal — a splice/shift bug in
    // the two-level key construction would silently lose recall here.
    val docs = Tables.documents(spark, sf001)
    val single = Text.simhashPairs(docs, maxHamming = 7, numChunks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val two = Text.simhashPairsWide(docs, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(single.nonEmpty, "vacuous: no radius-7 pairs in the sf0.01 corpus")
    assert(two == single,
      s"two-level-only: ${two -- single}; single-only: ${single -- two}")
  }

  test("x07 simhash agrees with the minhash detector on the sf0.01 corpus") {
    val mh = Text.x02(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Text.x07(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.size >= 20, s"expected >=20 simhash pairs, got ${sh.size}")
    // two independent detectors over the same corpus: simhash radius 7 is
    // the stricter criterion, so its pairs must be a subset of minhash's
    assert((sh -- mh).isEmpty, s"simhash-only pairs: ${sh -- mh}")
  }

  test("sf0.1: every simhash/minhash disagreement is a criterion-boundary case",
      org.scalatest.tagobjects.Slow) {
    // the sf0.01 agreement test above cross-checks the two detectors at
    // oracle scale; this pins the same invariant at BENCH scale (the
    // corpus the per-round numbers are measured on), so a banding or
    // signature regression that only shows up at volume can't hide.
    // The detectors measure DIFFERENT similarities — 64-bit hamming vs
    // exact shingle Jaccard — so on short documents radius-7 simhash
    // legitimately admits pairs just under x02's J>=0.9 bar (observed:
    // one 9-vs-11-shingle pair at J=0.82). The sound cross-check is:
    // every simhash-only pair must sit BELOW the threshold (minhash was
    // right to exclude it — anything at J>=0.9 missed by minhash would
    // be a banding recall bug) yet still be genuinely related (a random
    // pair would mean a simhash signature bug).
    val mh = Text.x02(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Text.x07(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.size >= 20, s"expected >=20 simhash pairs at sf0.1, got ${sh.size}")
    assert(mh.size >= 20, s"expected >=20 minhash pairs at sf0.1, got ${mh.size}")
    val only = (sh -- mh).toSeq
    if (only.nonEmpty) {
      val docs = Tables.documents(spark, sf01)
        .select(col("doc_id"), Text.shingles(col("text"), 2).as("s"))
      val inter = size(array_intersect(col("sa"), col("sb")))
      val jac = only.toDF("doc_a", "doc_b")
        .join(docs.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
        .select((inter.cast("double") /
          (size(col("sa")) + size(col("sb")) - inter).cast("double")).as("j"))
        .collect().map(_.getDouble(0))
      assert(jac.forall(j => j >= 0.5 && j < 0.9),
        s"simhash-only pairs must be sub-threshold-but-related, jaccards: ${jac.toSeq}")
    }
  }

  test("fingerprint dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val once = Text.q21(spark, sf001)
    // applying the same keep-first rule to an already-deduped set is a no-op
    val docs = Tables.documents(spark, sf001)
    val kept = once.select("doc_id")
    val deduped = docs.join(kept, Seq("doc_id"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(asc("doc_id"))
    val twice = deduped
      .withColumn("fp", Text.wordSetFingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(twice.count() == once.count())
  }

  test("prefix-filtered jaccard join equals brute force on the sf0.01 corpus") {
    // the prefix filter is an EXACT technique: candidate recall must be
    // 1.0 by the prefix theorem, so the output — ids AND jaccard values —
    // must equal the all-pairs restatement bit-for-bit
    val sh = Tables.documents(spark, sf001)
      .select(col("doc_id"), Text.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val pref = Text.jaccardJoin(Tables.documents(spark, sf001))
      .as[(Long, Long, Double)].collect().toSet
    assert(pref == brute, s"prefix=${pref.size} brute=${brute.size}")
  }

  test("jaccard join: broadcast-df and shuffle-df paths produce identical pairs") {
    // the df-lookup broadcast is CONDITIONAL (trigram vocabularies are not
    // reliably broadcast-sized at 100 TB): force each path via the byte
    // cap and pin value equality — the hint is a plan choice, never a
    // semantics choice
    val docs = Tables.documents(spark, sf001)
    val viaBroadcast = Text.jaccardJoin(docs, dfBroadcastMaxBytes = Long.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    val viaShuffle = Text.jaccardJoin(docs, dfBroadcastMaxBytes = 0L)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaBroadcast.nonEmpty && viaBroadcast == viaShuffle)
  }

  test("jaccardJoinSwept: same pairs as the raw form, zero blocks left behind") {
    val docs = Tables.documents(spark, sf001)
    val raw = Text.jaccardJoin(docs).as[(Long, Long, Double)].collect().toSet
    spark.sharedState.cacheManager.clearCache() // drop the raw form's caches
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val swept = Text.jaccardJoinSwept(docs)(
      _.as[(Long, Long, Double)].collect().toSet)
    assert(swept == raw && swept.nonEmpty)
    // the loan scope swept its own persists — nothing new outlives it
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  test("decontaminate flags exactly the train docs sharing an n-gram with eval") {
    val train = Seq(
      (1L, "a b c d e f g h i j"),                 // tail 8-gram sits in eval 12
      (2L, "totally different words here with no overlap at all present"),
      (3L, "x y z q r s t u v w"),                 // head 8-gram sits in eval 11
      (4L, "c d e f g h i")                        // 7 words: below the gram size
    ).toDF("doc_id", "text")
    val ev = Seq(
      (11L, "prefix x y z q r s t u more trailing content"),
      (12L, "c d e f g h i j k l")
    ).toDF("doc_id", "text")
    def run(capBytes: Long) = ops.TextAnalysis
      .decontaminate(train, ev, n = 8, evalBroadcastMaxBytes = capBytes)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val expect = Map(1L -> true, 2L -> false, 3L -> true, 4L -> false)
    assert(run(Long.MaxValue) == expect, "broadcast path")
    assert(run(0L) == expect, "shuffle-semi path must agree")
    // a longer gram length de-flags the partial overlaps
    val strict = ops.TextAnalysis.decontaminate(train, ev, n = 11)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(strict.values.forall(_ == false), s"no 11-gram is shared: $strict")
  }

  test("CC loops survive a UNION-shaped pair list (constraint-rewrite defect)") {
    // composing pair sources (minhash ∪ simhash) is routine; Spark 4.1's
    // UnionBase.rewriteConstraints dies on the loops' alias-swapped
    // self-unions over such inputs ("key not found: u#…") unless the
    // operator disables constraint propagation for the loop's duration
    val half = 2000L
    val blobBase = half + 10L
    val edges = spark.range(half)
      .select(col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
      .union(spark.range(half).select(
        (pmod(col("id") * 2654435761L, lit(half)) + blobBase).as("doc_a"),
        (pmod(col("id") * 48271L, lit(half)) + blobBase).as("doc_b")))
    // the caller acts AFTER the operator returns — both the loop and the
    // returned plan must be safe, with the session conf untouched
    val star = Text.dupComponentsStar(edges)
    assert(star.filter(col("id") <= half).select(min(col("comp")))
      .head().getLong(0) == 0L, "path side must collapse to component 0")
    assert(spark.conf.get("spark.sql.constraintPropagation.enabled") == "true",
      "operator must restore the session conf")
    // dupComponents is diameter-bounded — probe it with a short union input
    val smallUnion = spark.range(20L)
      .select(col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
      .union(spark.range(20L).select(
        (col("id") + 100L).as("doc_a"), (col("id") + 101L).as("doc_b")))
    val plain = Text.dupComponents(smallUnion, maxIters = 30)
    assert(plain.count() == 42L) // nodes 0..20 ∪ 100..120
  }

  test("q57 posting pads fail loudly on overflow instead of truncating") {
    // lpad silently TRUNCATES past the pad width in both engines — the
    // guard turns that corruption into an error (ADVICE r6)
    val ok = Seq((99999999L, 999999L)).toDF("d", "p")
      .select(Text.padOrFail(col("d"), 8, "doc_id").as("d8"),
        Text.padOrFail(col("p"), 6, "pos").as("p6"))
      .as[(String, String)].head()
    assert(ok == ("99999999", "999999"))
    assert(Seq(42L).toDF("d").select(Text.padOrFail(col("d"), 8, "doc_id"))
      .as[String].head() == "00000042")
    val err = intercept[Exception] {
      Seq(100000000L).toDF("d")
        .select(Text.padOrFail(col("d"), 8, "doc_id")).collect()
    }
    assert(err.getMessage.contains("overflows"),
      s"expected a loud pad-overflow error, got: ${err.getMessage}")
  }

  test("bm25: 1/2-term fold equals plain summation; inputs validated") {
    // the fixed-order fold must be bitwise what the two-term oracle always
    // computed — 0.0+a = a and a+b commutes — so q61's oracle is unchanged
    val docs = Tables.documents(spark, sf0001)
    val two = Text.bm25(docs, Seq("table", "hash"), topN = 1000).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // per-doc: every two-term score is the plain sum of the 1-term scores
    val ta = Text.bm25(docs, Seq("table"), topN = 100000).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val hb = Text.bm25(docs, Seq("hash"), topN = 100000).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    two.foreach { case (doc, s) =>
      val expect = ta.getOrElse(doc, 0.0) + hb.getOrElse(doc, 0.0)
      assert(s == expect, s"doc $doc: fold $s != sum-of-singles $expect")
    }
    intercept[IllegalArgumentException] { Text.bm25(docs, Seq.empty) }
    intercept[IllegalArgumentException] { Text.bm25(docs, Seq("a", "a")) }
  }

  test("jaccard join keeps a pair sitting EXACTLY on the threshold") {
    // |A∩B| = 8, |A∪B| = 10 ⇒ J = 0.8 exactly: the inclusive boundary and
    // the exact-decimal prefix length (⌈0.8·9⌉ = 8, prefix = 2) both bite
    val docs = Seq(
      (1L, "a b c d e f g h i"),
      (2L, "a b c d e f g h j"),
      (3L, "z y x w v u t s r")).toDF("doc_id", "text")
    val out = Text.jaccardJoin(docs, shingleN = 1, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 0.8)))
  }

  test("texts shorter than the shingle width yield empty shingles, no junk") {
    val out = Seq("one", "two words", "three word text").toDF("text")
      .select(Text.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == Nil && out(1) == Nil)
    assert(out(2) == List("three word text"))
    // two shingle-less docs must NOT pair with each other in either
    // detector: degenerate signatures (all-null minhash -> NaN jaccard;
    // zero-vote simhash -> shared all-ones signature) are filtered out
    val docs = Seq((1L, "tiny"), (2L, "small"), (3L, "also tiny"))
      .toDF("doc_id", "text")
    assert(Text.minhashPairs(docs).count() == 0)
    assert(Text.simhashPairs(docs, maxHamming = 7, numChunks = 8).count() == 0)
  }

  test("q35 repetition filter: ratio bounds, keep rule, repetition detected") {
    val rows = ops.TextAnalysis.q35(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, ratio, keep) =
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4))
      assert(d <= n && ratio >= 0.0 && ratio <= 1.0)
      assert(keep == (ratio <= 0.05))
      if (n > 0) assert(math.abs(ratio - (n - d).toDouble / n) == 0.0)
    }
    // the word-token corpus genuinely contains repeated bigrams
    assert(rows.exists(_.getDouble(3) > 0.0), "no repetition found in corpus")
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "threshold must actually split the corpus")
  }

  test("q22 token frequencies sum to the corpus token count") {
    val freqSum = Text.q22(spark, sf001).agg(sum("freq")).collect().head.getLong(0)
    val tokens = Tables.documents(spark, sf001)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").count()
    assert(freqSum == tokens)
  }

  test("ngramTopK heavy hitters: exact top-k on a Zipf corpus, tail pruned map-side") {
    import spark.implicits._
    // planted Zipf: 8 hot trigram patterns repeated 60-200x across docs,
    // plus a long tail of unique-per-doc trigrams — the regime the sampled
    // path exists for (boundary counts >> sampleMod*cMin)
    val hot = (0 until 8).map(h => s"hot$h alpha beta")
    val docs = (0 until 400).map { d =>
      val hots = (0 until (8 - d % 8)).map(h => hot(h)).mkString(" ")
      val tail = s"tail${d}a tail${d}b tail${d}c tail${d}d"
      (d.toLong, s"$hots $tail")
    }.toDF("doc_id", "text")
    val sampled = ops.Text.ngramTopK(docs, k = 8).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = docs.select(explode(ops.Text.ngrams(col("text"), 3)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("gram")).limit(8).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sampled == exact, "sampled candidates must cover the true top-k")
    assert(sampled.map(_._2).min >= 50, "fixture: heavy hitters must be heavy")
    // the candidate set (the only thing the verify pass hash-joins on) must
    // exclude the singleton tail — the map-side kill that bounds the plan
    val nTypes = docs.select(explode(ops.Text.ngrams(col("text"), 3)).as("g"))
      .select("g").distinct().count()
    val nCands = ops.Text.ngramCandidates(docs, "doc_id", "text", 3, 4, 2).count()
    assert(nCands < nTypes / 10,
      s"candidates $nCands should be a small fraction of $nTypes types")
    // the verify pass is a broadcast semi join on those candidates
    val plan = ops.Text.ngramTopK(docs, k = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  test("dupComponents labels a CHAIN correctly (multi-iteration propagation)") {
    // 10-20-30-40-50 is a path, not a clique: the min label must propagate
    // hop by hop (diameter 4), exercising the loop beyond one round; plus a
    // separate 2-clique and the pair (7,8) sharing no nodes with the chain
    val pairs = Seq(
      (10L, 20L), (20L, 30L), (30L, 40L), (40L, 50L),
      (7L, 8L)).toDF("doc_a", "doc_b")
    val got = Text.dupComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      50L -> 10L, 7L -> 7L, 8L -> 7L))
  }

  test("q41 clusters are consistent with x02's pair list at sf0.001") {
    val pairs = Text.x02(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Text.q41(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every paired doc appears, both ends share a component, and the
    // component label is the smallest member of its cluster
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split")
    }
    clusters.groupBy(_._2._1).foreach { case (comp, members) =>
      assert(members.keys.min == comp,
        s"component $comp is not its cluster's min id")
      members.values.foreach { case (_, size) =>
        assert(size == members.size.toLong)
      }
    }
  }

  test("q48 sample mix: stratified rates, exact weights, deterministic membership") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf001)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = ops.TextAnalysis.q48(spark, sf001)
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // zh (rate 1000‰) keeps every row; en (400‰) is genuinely downsampled
    assert(kept("zh") == totals("zh"), "zh stratum must be kept whole")
    assert(kept("en") < totals("en"), "en stratum must be downsampled")
    // weights are the exact inverse rates, nothing else
    val weights = out.select("lang", "weight").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(weights("en") == 2.5 && weights("zh") == 1.0)
    assert(Seq("de", "fr", "es").forall(l => weights(l) == 1.25))
    // bucket honors the rate bound on every kept row
    assert(out.filter(col("bucket") >= when(col("lang") === "en", 400)
      .when(col("lang") === "zh", 1000).otherwise(800)).isEmpty)
    // deterministic: a second evaluation is row-identical
    assert(out.except(ops.TextAnalysis.q48(spark, sf001)).isEmpty)
  }

  test("q51 chunking boundaries: short docs, exact multiples, full coverage") {
    import org.apache.spark.sql.functions._
    val out = ops.TextAnalysis.q51(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val words = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == words.keySet, "every doc must chunk")
    byDoc.foreach { case (id, chunks) =>
      val n = words(id)
      // starts at 0,15,30,… while < n ⇒ chunk count = ceil(n/15)
      assert(chunks.length == (n + 14) / 15, s"doc $id n=$n")
      val sorted = chunks.sortBy(_._2)
      assert(sorted.head._2 == 0 &&
        sorted.map(_._2).toSeq == sorted.indices.toSeq)
      // every chunk's token count is the clamped window over its start
      sorted.foreach { case (_, idx, tok, _) =>
        assert(tok == math.min(n - idx * 15, 20), s"doc $id chunk $idx")
      }
      // full coverage: the last chunk reaches the final word
      val (_, lastIdx, lastTok, _) = sorted.last
      assert(lastIdx * 15 + lastTok == n, s"doc $id tail uncovered")
    }
  }

  test("q56 tf-idf: 3 ranked terms per doc, scores reproduce the definition") {
    import org.apache.spark.sql.functions._
    val out = ops.Text.q56(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getDouble(5)))
    val nDocs = graft.Tables.documents(spark, sf001).count().toDouble
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1, 2, 3), s"doc $id ranks")
      val scores = sorted.map(_._6)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $id scores not non-increasing")
    }
    // recompute one document's winning score from raw tokens
    val (docId, _, term, cnt, dfOut, score) = out.head
    val toks = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "")
    val len = toks.filter(col("doc_id") === docId).count().toDouble
    val cntChk = toks.filter(col("doc_id") === docId && col("t") === term).count()
    val dfChk = toks.filter(col("t") === term).select("doc_id").distinct().count()
    assert(cntChk == cnt && dfChk == dfOut)
    assert(score == (cnt / len) * (nDocs / dfChk),
      s"score $score != ${(cnt / len) * (nDocs / dfChk)}")
  }

  test("q57 inverted index round-trips the token stream") {
    import org.apache.spark.sql.functions._
    val idx = ops.Text.q57(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val toks = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .collect().map(r => (r.getString(2), r.getLong(0), r.getInt(1)))
    // total postings == total tokens
    assert(idx.map(_._4).sum == toks.length)
    // every posting entry parses back to a real (term, doc, pos) occurrence
    val occ = toks.map { case (t, d, p) => (t, d, p.toLong) }.toSet
    idx.foreach { case (term, seg, postings, n) =>
      val entries = postings.split(",")
      assert(entries.length == n.toInt)
      assert(entries.toSeq == entries.sorted.toSeq, "postings must be ordered")
      entries.foreach { e =>
        val Array(doc, pos) = e.split(":")
        assert(doc.toLong / 1000 == seg)
        assert(occ.contains((term, doc.toLong, pos.toLong)),
          s"posting $term -> $e not in the corpus")
      }
    }
  }

  test("q61 BM25 scores reproduce the definition from raw tokens") {
    import org.apache.spark.sql.functions._
    val out = ops.Text.q61(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.nonEmpty && out.length <= 20)
    val scores = out.map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing")
    // recompute every returned doc's score from the corpus definition
    val toks = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val dl = toks.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val n = graft.Tables.documents(spark, sf001).count().toDouble
    val avgdl = dl.values.sum / n
    val terms = Seq("table", "hash")
    val df = terms.map(t =>
      t -> toks.filter(_._2 == t).map(_._1).distinct.length.toDouble).toMap
    out.foreach { case (doc, score) =>
      val expect = terms.map { t =>
        val tf = toks.count(p => p._1 == doc && p._2 == t).toDouble
        if (tf == 0) 0.0
        else (n - df(t) + 0.5) / (df(t) + 0.5) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * (dl(doc) / avgdl)))
      }.sum
      assert(math.abs(score - expect) < 1e-9,
        s"doc $doc: $score vs recomputed $expect")
    }
  }

  test("q79 cross-source matrix matches a driver recount of x02's pairs") {
    val pairs = ops.Text.x02(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val src = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sizes = src.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = pairs
      .map { case (a, b) =>
        val (sa, sb) = (src(a), src(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = ops.Text.q79(spark, sf0001).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == expect.keySet)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (na, nb) = (sizes(key._1), sizes(key._2))
      assert(r.getLong(2) == expect(key), s"$key n_pairs")
      assert((r.getLong(3), r.getLong(4)) == (na, nb), s"$key sizes")
      val possible = if (key._1 == key._2) na * (na - 1) / 2 else na * nb
      assert(r.getDouble(5) == expect(key).toDouble / possible.toDouble, s"$key rate")
    }
  }

  test("q80 novelty matches a driver 8-gram recount; plan joins no grams") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val gramsOf = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ", -1).toSeq.sliding(8)
        .filter(_.size == 8).map(_.mkString(" ")).toSet
    }.toMap
    val df = gramsOf.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val got = ops.Text.q80(spark, sf0001).collect()
    val expectIds = gramsOf.filter(_._2.nonEmpty).keySet
    assert(got.map(_.getLong(0)).toSet == expectIds, "short docs excluded")
    got.foreach { r =>
      val g = gramsOf(r.getLong(0))
      val shared = g.count(df(_) > 1).toLong
      assert(r.getLong(1) == g.size.toLong, s"doc ${r.getLong(0)} n_grams")
      assert(r.getLong(2) == shared, s"doc ${r.getLong(0)} n_shared")
      assert(r.getDouble(3) == shared.toDouble / g.size.toDouble)
    }
    // the Scaladoc's scale claim: no join operator keyed on the gram —
    // shared counts come from the map-side-combinable census, never a
    // per-(doc, gram) df join-back (the hot-key trap)
    val plan = ops.Text.q80(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin [gram") &&
      !plan.contains("ShuffledHashJoin [gram"),
      "q80 must not join on the gram key")
  }

  test("q83 entity clusters match a driver union-find over q74's pairs") {
    val pairs = ops.Text.q74(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.nonEmpty, "fixture must contain fuzzy name pairs")
    // min-rooted union-find: each union keeps the lexicographically
    // smaller root, so a component's root IS its minimum member — the
    // same canonical q83 declares
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byComp = members.groupBy(find)
    val got = ops.Text.q83(spark, sf001).collect()
    assert(got.map(_.getString(0)).toSet == members.toSet)
    got.foreach { r =>
      val comp = find(r.getString(0))
      assert(r.getString(1) == comp, s"${r.getString(0)} canonical spelling")
      assert(r.getLong(2) == byComp(comp).size.toLong,
        s"${r.getString(0)} cluster size")
    }
  }

  test("two CC loops run CONCURRENTLY on one session, deterministically") {
    // withoutConstraintPropagation save/restores SESSION-global conf; the
    // per-session lock serializes concurrent loops so one loop's restore
    // cannot re-enable propagation mid-iteration of the other (the window
    // that nondeterministically resurfaced the UnionBase.rewriteConstraints
    // crash). Both inputs are UNION-shaped — the exact shape that trips the
    // optimizer defect when propagation is on.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def unionPairs(off: Long) = {
      val chain = (0L until 15L).map(i => (off + i, off + i + 1))
        .toDF("doc_a", "doc_b")
      val skips = (0L until 14L by 2).map(i => (off + i, off + i + 2))
        .toDF("doc_a", "doc_b")
      chain.union(skips) // one 16-node component with shortcut edges
    }
    val f1 = Future(Text.dupComponents(unionPairs(0), maxIters = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))))
    val f2 = Future(Text.dupComponentsStar(unionPairs(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))))
    val r1 = Await.result(f1, 180.seconds)
    val r2 = Await.result(f2, 180.seconds)
    assert(r1.map(_._1).toSet == (0L to 15L).toSet &&
      r1.map(_._2).toSet == Set(0L), "plain loop labels its full chain")
    assert(r2.map(_._2).toSet == Set(1000L), "star loop labels its chain")
  }

  test("q49 pipeline output is consistent with its declared component stages") {
    import org.apache.spark.sql.functions._
    val out = ops.TextAnalysis.q49(spark, sf001)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty, "the pipeline must keep something")
    // every survivor passes BOTH gates, per the declared q26/q35 queries
    val q26Keep = ops.TextAnalysis.q26(spark, sf001)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val q35Keep = ops.TextAnalysis.q35(spark, sf001)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(q26Keep) && ids.subsetOf(q35Keep))
    // survivors carry distinct normalized fingerprints, and each is the
    // SMALLEST gated doc_id for its fingerprint (keep-first)
    val fp = graft.Tables.documents(spark, sf001)
      .withColumn("fp", ops.Text.wordSetFingerprint(col("text")))
      .select("doc_id", "fp").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val gated = (q26Keep intersect q35Keep)
    assert(ids.map(fp).size == ids.size, "one survivor per fingerprint")
    ids.foreach { id =>
      assert(gated.filter(g => fp(g) == fp(id)).min == id,
        s"$id is not the first gated doc of its fingerprint")
    }
    // split agrees with the declared q32 assignment for the same doc
    val split32 = ops.TextAnalysis.q32(spark, sf001)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.select("doc_id", "split").collect().foreach { r =>
      assert(split32(r.getLong(0)) == r.getString(1))
    }
  }
}
