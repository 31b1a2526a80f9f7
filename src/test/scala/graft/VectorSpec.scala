package graft

import org.apache.spark.sql.functions._

/** Vector similarity kernels (SURVEY.md §2.3 x01): higher-order-function
  * dot/norm/cosine and the broadcast brute-force top-k.
  */
class VectorSpec extends SparkSuite {
  import ops.Vector
  import spark.implicits._

  test("dot and l2Norm on known vectors") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(
      Vector.dot(col("a"), col("b")).as("dot"),
      Vector.l2Norm(col("a")).as("na")).collect().head
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-9)
  }

  test("cosine: identical = 1, orthogonal = 0, opposite = -1") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 3.0f), 0.0),
      (Array(1.0f, 2.0f), Array(-1.0f, -2.0f), -1.0)).toDF("a", "b", "want")
    df.select(
      Vector.cosine(col("a"), col("b"),
        Vector.l2Norm(col("a")), Vector.l2Norm(col("b"))).as("cos"),
      col("want")).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
    }
  }

  test("cosineTopK ranks an exact duplicate first, excludes self") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),   // duplicate of probe
      (3L, Array(0.9f, 0.1f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1L)
    val out = Vector.cosineTopK(corpus, probes, k = 3)
      .orderBy("rank")
      .select("neighbor_id", "rank").as[(Long, Int)].collect()
    assert(out.map(_._1).toSeq == Seq(2L, 3L, 4L)) // no self (1L)
  }

  test("x01 returns k rows per probe with descending scores at sf0.001") {
    val out = Vector.x01(spark, sf0001)
      .select("probe_id", "rank", "cosine").collect()
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.size == 8)
    byProbe.values.foreach { rows =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      assert(scores.size == 10)
      assert(scores == scores.sorted.reverse, "scores must be non-increasing")
    }
  }

  test("x06 LSH-ANN: k rows per probe, recall vs brute force pinned") {
    val brute = Vector.x01(spark, sf001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ann = Vector.x06(spark, sf001).collect()
    assert(ann.groupBy(_.getLong(0)).size == 8)
    val annSets = ann.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (p, bs) =>
      (bs intersect annSets.getOrElse(p, Set.empty)).size.toDouble / bs.size }
    val mean = recalls.sum / recalls.size
    // deterministic on fixed data; 4-bit simhash + Hamming-1 multiprobe
    // measured 0.45 on this corpus — pin a floor so regressions surface
    assert(mean >= 0.3, s"mean recall@10 = $mean")
  }

  test("cosinePairs finds planted near-identical vectors, never all-pairs misses") {
    import spark.implicits._
    // deterministic corpus: 30 spread-out vectors + one planted near-dup
    def vec(i: Int): Array[Float] =
      Array.tabulate(16)(d => math.sin(i * 16 + d).toFloat)
    val planted = vec(3).clone(); planted(0) = planted(0) + 0.001f
    val corpus = ((0 until 30).map(i => (i.toLong, vec(i))) :+ (99L, planted))
      .toDF("vec_id", "embedding")
    val pairs = Vector.cosinePairs(corpus, dim = 16, minCosine = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 99L)))
  }

  test("blockedCosinePairs: pairs only within a block, never across") {
    import spark.implicits._
    def vec(i: Int): Array[Float] =
      Array.tabulate(16)(d => math.sin(i * 16 + d).toFloat)
    // identical vectors planted in the SAME block (1,2) and across
    // DIFFERENT blocks (3,4): blocking must pair the former only
    val corpus = Seq(
      (1L, "blockA", vec(7)), (2L, "blockA", vec(7)),
      (3L, "blockA", vec(7)), (4L, "blockB", vec(7)),
      (5L, "blockB", vec(50))).toDF("vec_id", "label", "embedding")
    val pairs = Vector.blockedCosinePairs(corpus, "label", minCosine = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"cross-block pair must not appear, got $pairs")
    // the pair source is an equi-join on the block key, not a product
    val plan = Vector.blockedCosinePairs(corpus, "label", minCosine = 0.999)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("IVF top-k: recall beats the simhash path at equal candidate budget") {
    val emb = Tables.embeddings(spark, sf001)
    val probes = emb.filter(col("vec_id") < 8)
    val brute = Vector.x01(spark, sf001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // nprobe/nlist = 4/16 -> ~25% of the corpus searched per probe
    val ivf = Vector.ivfTopK(emb, probes, nlist = 16, nprobe = 4).collect()
    val ivfSets = ivf.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (p, bs) =>
      (bs intersect ivfSets.getOrElse(p, Set.empty)).size.toDouble / bs.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"IVF mean recall@10 = $mean")
    // determinism: same call twice, identical rows
    val again = Vector.ivfTopK(emb, probes, nlist = 16, nprobe = 4).collect()
    assert(ivf.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("IVF-PQ: recall at nprobe=4 over 16-byte codes; compressed " +
      "postings are a fraction of the full-vector index's bytes") {
    val brute = Vector.x01(spark, sf001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val pq = ops.VectorPq.x27(spark, sf001).collect()
    val pqSets = pq.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (p, bs) =>
      (bs intersect pqSets.getOrElse(p, Set.empty)).size.toDouble / bs.size }
    val mean = recalls.sum / recalls.size
    // nprobe/nlist = 4/16 (the x11 budget) THROUGH 16x compression:
    // the PQ floor sits at the plain-IVF pin (the 4-dim subquantizers
    // at k=256 are near-lossless on this corpus; the loss is cell
    // pruning, same as x11's)
    assert(mean >= 0.5, s"IVF-PQ mean recall@10 = $mean")
    // the storage claim, measured: build both indexes over the same
    // corpus and compare the postings payload on disk
    val emb = Tables.embeddings(spark, sf001)
    val root = TempRoots.create("graft_pq_bytes_")
    Vector.ivfBuild(emb, s"$root/flat", nlist = 16)
    ops.VectorPq.pqBuild(emb, s"$root/pq", nlist = 16, m = 16)
    def bytes(d: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(d))
    }
    val (full, coded) = (bytes(s"$root/flat/postings"),
      bytes(s"$root/pq/postings"))
    assert(coded * 2 < full,
      s"PQ postings must be well under half the flat index: $coded vs $full")
  }

  test("residual IVF-PQ (by_residual = true): recall at the raw-PQ " +
      "budget on the REAL corpus meets the 0.50 floor — the residual " +
      "codebook spends the same bytes on a tighter range") {
    val emb = Tables.embeddings(spark, sf001)
    val brute = Vector.x01(spark, sf001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val idx = s"${TempRoots.create("graft_pq_res_")}/ivfpq"
    ops.VectorPq.pqBuild(emb, idx, nlist = 16, m = 16, byResidual = true)
    val got = ops.VectorPq.pqSearch(spark, idx,
        emb.filter(col("vec_id") < 8), nprobe = 4).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (p, bs) =>
      (bs intersect got.getOrElse(p, Set.empty)).size.toDouble / bs.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"residual IVF-PQ mean recall@10 = $mean " +
      "(must meet the raw-PQ floor at nprobe 4/16)")
  }

  test("PQ refine (r19): exact re-rank of the ADC top-R meets or beats " +
      "the no-refine recall at equal nprobe on the real corpus; a " +
      "non-refinable index refuses refine loudly") {
    val emb = Tables.embeddings(spark, sf001)
    val probes = emb.filter(col("vec_id") < 8)
    val brute = Vector.x01(spark, sf001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val idx = s"${TempRoots.create("graft_pq_refine_")}/ivfpq"
    ops.VectorPq.pqBuild(emb, idx, nlist = 16, m = 16, refinable = true)
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val sets = rows.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = brute.map { case (p, bs) =>
        (bs intersect sets.getOrElse(p, Set.empty)).size.toDouble / bs.size }
      rs.sum / rs.size
    }
    val plain = recallOf(
      ops.VectorPq.pqSearch(spark, idx, probes, nprobe = 4).collect())
    val refined = recallOf(ops.VectorPq.pqSearch(spark, idx, probes,
      nprobe = 4, refine = 50).collect())
    assert(refined >= plain,
      s"refine must not lose recall: refined=$refined plain=$plain")
    assert(refined >= 0.5, s"refined recall@10 = $refined")
    info(f"recall@10 nprobe=4: plain=$plain%.3f refined(R=50)=$refined%.3f")
    // a non-refinable index refuses refine loudly
    val bare = s"${TempRoots.create("graft_pq_norefine_")}/ivfpq"
    ops.VectorPq.pqBuild(emb, bare, nlist = 16, m = 16)
    val e = intercept[Exception] {
      ops.VectorPq.pqSearch(spark, bare, probes, nprobe = 4, refine = 50)
        .collect()
    }
    assert(e.getMessage.contains("refinable"), e.getMessage)
    // lifecycle: append + delete + compact keep codes and refine
    // vectors in step — a refined search over the compacted index
    // serves only alive rows
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val lc = s"${TempRoots.create("graft_pq_refine_lc_")}/ivfpq"
    ops.VectorPq.pqBuild(half, lc, nlist = 16, m = 16, refinable = true,
      trainOn = Some(emb))
    ops.VectorPq.pqAppend(spark, lc, rest)
    ops.VectorPq.pqDelete(spark, lc,
      emb.filter(col("vec_id") % 10 === 3).select("vec_id"))
    ops.VectorPq.pqCompact(spark, lc)
    val alive = ops.VectorPq.pqSearch(spark, lc, probes, nprobe = 16,
      refine = 50, topK = 1000000).collect().map(_.getLong(1)).toSet
    assert(!alive.exists(_ % 10 == 3),
      "refined search must not serve deleted rows after compaction")
    assert(alive.exists(_ % 2 == 1),
      "refined search must serve appended rows")
  }

  test("OPQ IVF-PQ (opq = true): the learned variance-balanced " +
      "permutation meets the raw/residual recall floor at the same " +
      "byte budget on the REAL corpus, and rotated cosines equal " +
      "unrotated ones (orthogonal invariance)") {
    val emb = Tables.embeddings(spark, sf001)
    val brute = Vector.x01(spark, sf001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val idx = s"${TempRoots.create("graft_pq_opq_")}/ivfpq"
    // m = 16 over dim 64: sublen 4, so the permutation genuinely
    // remixes dimensions WITHIN subspaces (at sublen 1 it only
    // relabels them)
    ops.VectorPq.pqBuild(emb, idx, nlist = 16, m = 16, opq = true)
    val rows = ops.VectorPq.pqSearch(spark, idx,
      emb.filter(col("vec_id") < 8), nprobe = 4).collect()
    val got = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (p, bs) =>
      (bs intersect got.getOrElse(p, Set.empty)).size.toDouble / bs.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"OPQ IVF-PQ mean recall@10 = $mean " +
      "(must meet the raw-PQ floor at nprobe 4/16)")
    // orthogonal invariance: an exact-scoring OPQ index (m = 64,
    // lossless grid codebook) reproduces the unrotated index's scores
    val grid = emb.select(col("vec_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        x => floor(x.cast("double") * 8) / 8).as("embedding"))
    val (iA, iB) = (s"${TempRoots.create("graft_opq_inv_")}/a",
      s"${TempRoots.create("graft_opq_inv_")}/b")
    ops.VectorPq.pqBuild(grid, iA, nlist = 16, m = 64)
    ops.VectorPq.pqBuild(grid, iB, nlist = 16, m = 64, opq = true)
    def res(i: String) = ops.VectorPq.pqSearch(spark, i,
      grid.filter(col("vec_id") < 4), nprobe = 16)
      .orderBy("probe_id", "rank").collect().map(_.toString).toSeq
    assert(res(iA) == res(iB),
      "rotation must not change exact-space scores or ranks")
  }

  test("x27b lossless-codebook full-probe IVF-PQ equals the grid " +
      "brute force row for row (the gate twin's local pin)") {
    // triples only: the float-kernel reference rounds norms at float
    // precision while the PQ path scores in doubles, so cosines agree
    // to float rounding but not bit-for-bit (the DRIVER gate pins the
    // double path bit-exact against DuckDB; this is the local shape pin)
    def triples(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    val got = triples(ops.VectorPq.x27b(spark, sf001).collect())
    // reference: exact cosine top-k over the SAME grid-snapped corpus
    val grid = Tables.embeddings(spark, sf001).select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 8) / 8).cast("array<float>")
        .as("embedding"))
    val want = triples(Vector.cosineTopK(grid,
        grid.filter(col("vec_id") < 8))
      .orderBy("probe_id", "rank").collect())
    assert(got.nonEmpty && got == want,
      "ADC over lossless codes must reproduce exact cosine top-k")
  }

  test("IVF-PQ lifecycle: append ≡ build under the frozen quantizer + " +
      "codebooks (bit-exact search); delete masks, as-of pins the " +
      "pre-delete view; compact preserves results, folds tombs, one " +
      "file per cell") {
    val emb = Tables.embeddings(spark, sf001)
    val root = TempRoots.create("graft_pqlife_")
    val (inc, full) = (s"$root/inc", s"$root/full")
    ops.VectorPq.pqBuild(emb.filter(col("vec_id") % 2 === 0), inc,
      nlist = 8, m = 16, trainOn = Some(emb))
    ops.VectorPq.pqAppend(spark, inc, emb.filter(col("vec_id") % 2 === 1))
    ops.VectorPq.pqBuild(emb, full, nlist = 8, m = 16,
      trainOn = Some(emb))
    def search(d: String, asOf: Option[Long] = None) =
      ops.VectorPq.pqSearch(spark, d, emb.filter(col("vec_id") < 8),
          nprobe = 8, asOfGen = asOf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).sortBy(t => (t._1, t._4)).toSeq
    val incView = search(inc)
    assert(incView == search(full),
      "append under the frozen quantizer+codebooks must equal the build " +
        "over the union, bit for bit")
    val preDelete = graft.sources.GenCommit.lastCommitted(spark, inc)
    val dropped = emb.filter(col("vec_id") % 7 === 3)
    val droppedIds = dropped.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    ops.VectorPq.pqDelete(spark, inc, dropped.select("vec_id"))
    val masked = search(inc)
    assert(masked != incView && masked.forall(t => !droppedIds(t._2)),
      "deleted ids must vanish from every candidate list")
    assert(search(inc, asOf = Some(preDelete)) == incView,
      "as-of-before-delete must reproduce the pre-delete top-k")
    ops.VectorPq.pqCompact(spark, inc)
    assert(search(inc) == masked, "compaction changed the search result")
    assert(!new java.io.File(s"$inc/tombs").exists(),
      "compaction must fold the tombstone table away")
    val cells = new java.io.File(s"$inc/postings").listFiles
      .filter(_.getName.startsWith("gen=")).flatMap(_.listFiles)
      .filter(_.getName.startsWith("cell="))
    assert(cells.nonEmpty && cells.forall(
      _.listFiles.count(_.getName.endsWith(".parquet")) == 1),
      "compaction must leave one file per cell")
  }

  test("x11b full-probe IVF equals brute-force top-k row for row") {
    // nprobe = nlist: the candidate set is the whole corpus, so the same
    // quantize-assign-join pipeline must reproduce x01 exactly (cosines
    // bit-identical — same nCos kernel on the same pairs)
    val brute = Vector.x01(spark, sf001).collect().map(_.toString).toSeq
    val full = Vector.x11b(spark, sf001).collect().map(_.toString).toSeq
    assert(full == brute)
  }

  test("oversized block hands off to LSH: same planted pairs, bounded candidates") {
    import spark.implicits._
    // 4 tight clusters of 10 vectors in ONE 40-row block: every
    // within-cluster pair is a near-dup (4 * C(10,2) = 180 pairs), the
    // clusters are mutually near-orthogonal — the exact path would compare
    // all C(40,2) = 780 pairs
    def vec(c: Int, i: Int): Array[Float] =
      Array.tabulate(16) { d =>
        val base = if (d == 4 * c) 1.0f else 0.0f
        base + 0.001f * math.sin(c * 100 + i * 16 + d).toFloat
      }
    val rows = for (c <- 0 until 4; i <- 0 until 10)
      yield ((c * 10 + i).toLong, "big", vec(c, i))
    val corpus = rows.toDF("vec_id", "label", "embedding")
    val exact = Vector.blockedCosinePairs(corpus, "label",
        minCosine = 0.999, maxBlockSide = 10000, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 180, s"fixture: expected 180 planted pairs, got ${exact.size}")
    val handoff = Vector.blockedCosinePairs(corpus, "label",
        minCosine = 0.999, maxBlockSide = 16, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(handoff == exact, "handoff must find the same near-dup pairs")
    // the candidate join is bucket-bounded: well below the 780 exact
    // comparisons, but covering every true pair
    val v = corpus.select(col("vec_id"), col("label").as("block"),
        col("embedding").as("vec"))
      .withColumn("nrm", Vector.l2Norm(col("vec")))
    val cands = Vector.blockLshPairs(v, dim = 16, bits = 8).count()
    assert(cands >= 180 && cands < 400,
      s"candidate count $cands should be bucket-bounded, not quadratic")
  }

  test("IVF seeding spreads across clusters: nprobe=1 recall on a clustered corpus") {
    import spark.implicits._
    // 16 tight, mutually near-orthogonal clusters of 10, ids SORTED BY
    // CLUSTER — the adversarial layout for the old first-nlist-by-id
    // seeding (all 16 seeds landed in clusters 0-1 and nprobe<nlist recall
    // collapsed; r9 VERDICT #5). Farthest-point seeding must place
    // centroids across all clusters, so a 1-of-16-cell probe still finds
    // its brute-force neighbors (which are all within-cluster here).
    def vec(c: Int, i: Int): Array[Float] =
      Array.tabulate(64) { d =>
        val base = if (d == 4 * c) 1.0f else 0.0f
        base + 0.002f * math.sin(c * 131 + i * 17 + d).toFloat
      }
    val rows = for (c <- 0 until 16; i <- 0 until 10)
      yield ((c * 10 + i).toLong, vec(c, i))
    val corpus = rows.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 10 === 0) // one per cluster
    val brute = Vector.cosineTopK(corpus, probes, k = 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = Vector.ivfTopK(corpus, probes, nlist = 16, nprobe = 1, k = 5)
      .collect()
    val ivfSets = ivf.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (p, bs) =>
      (bs intersect ivfSets.getOrElse(p, Set.empty)).size.toDouble / bs.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9,
      s"clustered-corpus recall@5 at nprobe=1 = $mean — seeding collapsed")
  }

  test("IVF on an empty corpus returns empty, never throws") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val probes = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Vector.ivfTopK(empty, probes, nlist = 4, nprobe = 2).count() == 0)
  }

  test("IVF map-side assignment == the round-5 window-shuffle form, n=1 and n=4") {
    val c0 = Tables.embeddings(spark, sf001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val centsDf = c0.orderBy("id").limit(16)
      .select(col("id").as("cell"), col("vec").as("cvec"))
    val cents = centsDf.collect().toSeq
      .map(r => (r.get(0): Any, r.getSeq[Float](1)))
    for (n <- Seq(1, 4)) {
      val mapSide = Vector.nearestCells(c0, cents, n)
        .select("id", "cell", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      val shuffle = Vector.nearestCellShuffle(c0, centsDf, n)
        .select("id", "cell", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(mapSide == shuffle, s"assignment mismatch at n=$n")
    }
  }

  test("IVF: assignment is map-side — no nested-loop join, one window total") {
    val plan = Vector.x11(spark, sf001).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the 16x centroid cross join must not survive into the plan")
    // the ONLY window is the per-probe top-k over (probe, neighbor, cosine)
    // triples; the round-5 per-id assignment window (which shuffled the
    // 16x-amplified vector-carrying rows) must be gone
    val windows = "Window ".r.findAllIn(plan).size
    assert(windows == 1, s"expected exactly 1 window in the plan, got $windows")
  }

  test("a planted giant component star-splits to bounded clusters") {
    import spark.implicits._
    // a 100-node PATH: the worst transitive chain — every member joined
    // to the component by one hop, the shape a loose threshold produces
    val pairs = (0L until 99L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = ops.Text.dupComponentsStar(pairs)
    val comps = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.length == 100 && comps.forall(_._2 == 0L),
      "control: uncapped CC must chain the path into one giant component")
    val capped = ops.Text.capClusterSizes(labels, maxClusterSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.length == 100, "the cap must not lose members")
    val bySub = capped.groupBy(_._2)
    assert(bySub.size == 10 && bySub.values.forall(_.length == 10),
      "100-path at cap 10 must split into 10 sub-clusters of 10")
    bySub.foreach { case (comp, members) =>
      assert(members.map(_._1).min == comp,
        "each sub-cluster must be labeled by its own minimum id")
    }
    // consecutive id-ordered split: members of one sub-cluster are a
    // contiguous id range (deterministic, restatable rank arithmetic)
    bySub.values.foreach { ms =>
      val ids = ms.map(_._1).sorted
      assert(ids.last - ids.head == ids.length - 1)
    }
  }

  test("q69 centroids match a driver-side exact-decimal mean, bit for bit") {
    val cents = ops.Vector.q69(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (0 until 64).map(i => r.getDouble(2 + i)).toVector))
    assert(cents.nonEmpty)
    val members = ops.Vector.q47(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2)
    val vecs = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    cents.foreach { case (comp, n, centroid) =>
      val ids = members(comp).map(_._1).sorted
      assert(ids.length.toLong == n)
      // the same arithmetic: each float through its shortest repr into an
      // exact scale-18 decimal, summed (order-free: decimal + is
      // associative), back to double via a string parse (the VARCHAR
      // route), one final IEEE ÷n
      val want = (0 until 64).map { d =>
        val s = ids.map(id => BigDecimal(vecs(id)(d).toString)
          .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
        s.toString.toDouble / n.toDouble
      }.toVector
      assert(centroid == want, s"component $comp centroid mismatch")
      // and it lies inside the members' per-dimension envelope
      centroid.indices.foreach { d =>
        val vals = ids.map(id => vecs(id)(d).toDouble)
        assert(centroid(d) >= vals.min - 1e-12 && centroid(d) <= vals.max + 1e-12)
      }
    }
  }

  test("materialized IVF index: search-from-index == per-call ivfTopK, bit-exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    val emb = Tables.embeddings(spark, sf001)
    val probes = emb.filter(col("vec_id") < 8)
    Vector.ivfBuild(emb, dir, nlist = 16)
    val fromIndex = Vector.ivfSearch(spark, dir, probes, nprobe = 4, k = 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    val perCall = Vector.ivfTopK(emb, probes, nlist = 16, nprobe = 4, k = 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    assert(fromIndex.nonEmpty && fromIndex == perCall,
      "index search must reproduce the per-call IVF results exactly")
  }

  test("materialized IVF search plan: pruned postings scan, no corpus assignment") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_plan_").toString
    val emb = Tables.embeddings(spark, sf001)
    val probes = emb.filter(col("vec_id") < 8)
    Vector.ivfBuild(emb, dir, nlist = 16)
    val df = Vector.ivfSearch(spark, dir, probes, nprobe = 4, k = 10)
    // the postings read is partition-pruned to the probed cells: the scan
    // node must carry a partition filter on `cell` (sparkPlan: AQE wraps
    // executedPlan in an adaptive node that hides scans from collect)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    val posting = scans.find(_.metadata("Location").contains("postings"))
    assert(posting.nonEmpty, "expected a postings file scan in the plan")
    assert(posting.get.partitionFilters.nonEmpty,
      "postings scan must be partition-pruned to the probed cells")
    // no corpus-wide assignment stage: the only window is the per-probe
    // top-k, the only corpus-sized input is the pruned postings scan, and
    // the probe side arrives by broadcast
    val planStr = df.queryExecution.executedPlan.toString
    assert("Window ".r.findAllIn(planStr).size == 1,
      "search must not add an assignment window over the corpus")
    assert(planStr.contains("BroadcastHashJoin"),
      "probes must broadcast into the pruned postings")
    assert(!planStr.contains("CartesianProduct") &&
      !planStr.contains("BroadcastNestedLoopJoin"))
  }

  test("zero-norm vectors are excluded, not ranked first by NaN") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f)), // zero vector: cosine undefined
      (3L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1L)
    val out = Vector.cosineTopK(corpus, probes, k = 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(3L), "the zero vector must not appear in results")
  }

  test("simhashBucket: identical vectors collide, bucket is stable") {
    val df = Seq(
      (1L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (2L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (3L, Array.tabulate(8)(i => -(i + 1).toFloat))).toDF("vec_id", "embedding")
    val b = df.select(col("vec_id"),
        Vector.simhashBucket(col("embedding"), dim = 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(3L)) // opposite vector flips every sign bit
  }

  test("simhash_bucket native kernel == the per-plane HOF folds") {
    graft.ext.GraftFunctions.ensureSimHashBucket(spark)
    // realistic vectors plus every edge the HOF defines: exact-dim, a
    // shorter vector and an empty one (value side null-padded -> bucket 0),
    // a LONGER one (index side null-padded -> per-plane constant tail
    // coordinate), and a null element (every projection nulled -> bucket 0)
    val rows = (1 to 30).map(i =>
      s"(cast(array(${Array.tabulate(8)(j =>
        math.sin(i * 8 + j)).mkString(",")}) as array<float>))") ++ Seq(
      "(cast(array(1.0, -2.0) as array<float>))",
      "(cast(array() as array<float>))",
      "(cast(array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, -10.0) as array<float>))",
      "(cast(array(1.0, null, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0) as array<float>))")
    val df = spark.sql(s"SELECT * FROM VALUES ${rows.mkString(",")} AS t(v)")
    val out = df.select(
      Vector.simhashBucket(col("v"), dim = 8).as("native"),
      Vector.hofSimhashBucket(col("v"), dim = 8).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} hof=${r.getLong(1)}"))
  }

  test("q47 embed-dedup clusters are consistent with x08's pair list") {
    val pairs = Vector.x08(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must produce same-label cosine pairs")
    val clusters = Vector.q47(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exactly the paired ids appear; both ends of every pair share a
    // component; the label is the cluster's min id; sizes are group counts
    assert(clusters.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    pairs.foreach { case (a, b) =>
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

  test("q59 quantization: codes in [-127,127], reconstruction within scale/2") {
    val raw = graft.Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    ops.Vector.q59(spark, sf0001).collect().foreach { r =>
      val (id, scale, q8) = (r.getLong(0), r.getDouble(1), r.getString(2))
      val codes = q8.split(",").map(_.toInt)
      val vec = raw(id)
      assert(codes.length == vec.length)
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id code range")
      if (scale > 0) codes.zip(vec).foreach { case (c, x) =>
        assert(math.abs(c * scale - x.toDouble) <= scale / 2 + 1e-12,
          s"vec $id: code $c reconstructs ${c * scale} for $x (scale $scale)")
      }
    }
  }

  test("q60 quantized search keeps high recall against exact x01") {
    val exact = Vector.x01(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val quant = Vector.q60(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(quant.keySet == exact.keySet)
    val recalls = exact.map { case (p, ex) =>
      (quant(p) intersect ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // int8 reconstruction barely perturbs cosine order on 64-dim floats;
    // a collapse here means scale/code math drifted
    assert(mean >= 0.8, s"mean top-10 recall $mean vs exact search")
  }

  test("q47 star-form labels equal the propagation-form labels (independent algorithm)") {
    val pairs = ops.Vector.blockedCosinePairs(
      graft.Tables.embeddings(spark, sf0001), blockCol = "label", minCosine = 0.35)
    val star = ops.Text.dupComponentsStar(pairs, "vec_id_a", "vec_id_b")
      .select(col("id"), col("comp"))
    val prop = ops.Text.dupComponents(pairs, "vec_id_a", "vec_id_b")
      .select(col("id"), col("comp"))
    assert(star.except(prop).isEmpty && prop.except(star).isEmpty)
  }

  test("x20 embed-decontamination matches a driver recount and is non-vacuous") {
    // the oracle gate proves engine parity; this pins the SEMANTICS
    // against an independent driver-side recount (collect vectors, brute
    // double-precision cosines, same slice rule) and guards vacuity — an
    // empty result would hash-"pass" while testing nothing.
    val out = Vector.x20(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.nonEmpty, "vacuous: no contaminated train vectors at sf0.01")
    val vecs = graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val withN = vecs.map { case (id, v) => (id, v, math.sqrt(dot(v, v))) }
      .filter(_._3 > 0)
    val eval = withN.filter(_._1 % 20 == 0)
    val expected = withN.filter(_._1 % 20 != 0).flatMap { case (id, v, n) =>
      val hits = eval.map { case (_, ev, en) => dot(v, ev) / (n * en) }
        .filter(_ >= 0.35)
      if (hits.isEmpty) None else Some(id -> ((hits.length.toLong, hits.max)))
    }.toMap
    assert(out.keySet == expected.keySet,
      s"flag drift: only-engine=${out.keySet -- expected.keySet} " +
        s"only-recount=${expected.keySet -- out.keySet}")
    out.foreach { case (id, (n, mx)) =>
      assert(n == expected(id)._1, s"hit count drift at $id")
      assert(math.abs(mx - expected(id)._2) < 1e-12, s"max cosine drift at $id")
    }
  }

  test("LSH handoff quality: pair recall and component agreement vs exact " +
      "on a planted near-dup corpus (q47/q69 production path)") {
    // The declared q47/q69 pin exactness (maxBlockSide = Int.MaxValue);
    // their SCALE story is the production handoff. This pins the
    // handoff's QUALITY in its designed regime — near-dup thresholds —
    // instead of asserting it in scaladoc (VERDICT r10 #1): 30 planted
    // clusters × 20 perturbed copies (within-cluster cosine ≈ 0.99,
    // cross-cluster ≈ N(0, 1/64)) in ONE 600-row block that trips
    // maxBlockSide = 100, plus a 40-row block that stays exact, so the
    // anti/semi split runs both sides.
    val rnd = new scala.util.Random(42)
    def gauss64() = Array.fill(64)(rnd.nextGaussian().toFloat)
    def perturb(base: Array[Float], eps: Double) = {
      val g = gauss64()
      base.indices.map(i => (base(i) + eps * g(i)).toFloat).toArray
    }
    val bases = Seq.fill(30)(gauss64().map(x => (x / 8.0f)))
    val big = bases.zipWithIndex.flatMap { case (b, c) =>
      // noise norm ≈ 0.08 against unit-norm bases → within-cluster cosine
      // ≈ 0.994: the near-dup regime the handoff is designed for, loose
      // enough that the 8-bit simhash actually loses a few percent of
      // pairs (the measurement is non-trivial, the pin has margin)
      (0 until 20).map(m => (c * 100L + m, "big", perturb(b, 0.01)))
    }
    val small = (0 until 40).map(i => (100000L + i, "small", gauss64()))
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (big ++ small).map { case (id, blk, v) =>
          org.apache.spark.sql.Row(id, blk, v.toSeq) }, 8),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))

    def pairsOf(maxSide: Int) =
      Vector.blockedCosinePairs(corpus, blockCol = "label",
          minCosine = 0.9, maxBlockSide = maxSide)
        .select("vec_id_a", "vec_id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairsOf(Int.MaxValue)
    val prod = pairsOf(100)

    // the handoff prunes CANDIDATES only — exact cosine is attached and
    // thresholded after, so production pairs are a subset (precision 1)
    assert(prod.subsetOf(exact), "handoff must never invent pairs")
    assert(exact.nonEmpty && exact.size > 5000,
      s"fixture degenerate: ${exact.size} exact pairs")
    val recall = prod.size.toDouble / exact.size
    assert(recall >= 0.9, f"pair recall $recall%.4f < 0.9")

    // component-membership agreement: same partition of ids into
    // clusters, compared as canonical member-sets (transitive closure
    // heals most pruned pairs — THIS is the number q47's consumers see)
    def components(pairs: Set[(Long, Long)]) = {
      val df = pairs.toSeq.toDF("vec_id_a", "vec_id_b")
      ops.Text.dupComponentsStar(df, "vec_id_a", "vec_id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    }
    val exactComps = components(exact)
    val prodComps = components(prod)
    val agreeIds = exactComps.intersect(prodComps).toSeq.map(_.size).sum
    val totalIds = exactComps.toSeq.map(_.size).sum
    val agreement = agreeIds.toDouble / totalIds
    assert(agreement >= 0.95,
      f"component-membership agreement $agreement%.4f < 0.95")
    info(f"handoff pair recall = $recall%.4f, " +
      f"component agreement = $agreement%.4f " +
      f"(${exact.size} exact pairs, ${exactComps.size} exact clusters)")
    // the small block must be untouched by the handoff (exact both ways)
    assert(exact.filter(_._1 >= 100000L) == prod.filter(_._1 >= 100000L))
  }

  test("ivfAppend: append(A, B) ≡ build(A ∪ B) under the frozen quantizer") {
    val emb = Tables.embeddings(spark, sf001)
    val a = emb.filter(col("vec_id") % 2 === 0) // 'yesterday's corpus'
    val b = emb.filter(col("vec_id") % 2 === 1) // 'tonight's delta'
    val probes = emb.filter(col("vec_id") < 8)

    val dirApp = java.nio.file.Files.createTempDirectory("graft_ivf_app_").toString
    Vector.ivfBuild(a, dirApp, nlist = 16)
    // the FROZEN quantizer the index stores — appends must assign under it
    val frozen = spark.read.parquet(s"$dirApp/centroids")
      .collect().toSeq.map(r => (r.get(0), r.getSeq[Float](1)))
    Vector.ivfAppend(spark, dirApp, b)

    val dirFull = java.nio.file.Files.createTempDirectory("graft_ivf_full_").toString
    Vector.ivfBuild(emb, dirFull, nlist = 16, centroids = Some(frozen))

    def search(dir: String) =
      Vector.ivfSearch(spark, dir, probes, nprobe = 4, k = 10)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sorted.toSeq
    val appended = search(dirApp)
    val rebuilt = search(dirFull)
    assert(appended.nonEmpty && appended == rebuilt,
      "append must be search-indistinguishable from a same-centroid rebuild")
    // and the delta actually landed: appended results must include odd ids
    assert(appended.exists(_._2 % 2 == 1),
      "no delta (odd-id) neighbors surfaced — append wrote nothing?")
  }

  test("ivfDelete tombstones: delete ≡ same-centroid build over the " +
      "survivors; as-of-before-delete reads the old top-k; re-append " +
      "revives; compact folds the tombs away") {
    val emb = Tables.embeddings(spark, sf001)
    val probes = emb.filter(col("vec_id") < 8)
    val dropped = emb.filter(col("vec_id") % 5 === 3)
    def search(d: String, asOf: Option[Long] = None) =
      Vector.ivfSearch(spark, d, probes, nprobe = 16, k = 10,
          asOfGen = asOf)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sorted.toSeq
    val dir = TempRoots.create("graft_ivf_del_")
    Vector.ivfBuild(emb, dir, nlist = 16)               // gen 0
    val frozen = spark.read.parquet(s"$dir/centroids")
      .collect().toSeq.map(r => (r.get(0), r.getSeq[Float](1)))
    val before = search(dir)
    Vector.ivfDelete(spark, dir, dropped)               // gen 1
    val after = search(dir)
    val ref = TempRoots.create("graft_ivf_del_ref_")
    Vector.ivfBuild(emb.filter(col("vec_id") % 5 =!= 3), ref,
      nlist = 16, centroids = Some(frozen))
    assert(after == search(ref),
      "post-delete search must equal a same-centroid build over the survivors")
    assert(before != after, "vacuous fixture: the drop slice hit no top-k")
    assert(search(dir, asOf = Some(0L)) == before,
      "as-of-before-delete must read the pre-delete top-k")
    // delete-then-re-append revives (frozen quantizer ⇒ same cells)
    Vector.ivfAppend(spark, dir, dropped)               // gen 2
    assert(search(dir) == before, "re-append must revive the deleted vectors")
    // delete again, compact: dead rows physically drop, tombs table goes
    Vector.ivfDelete(spark, dir, dropped)               // gen 3
    Vector.ivfCompact(spark, dir)
    assert(search(dir) == after, "compaction changed the search result")
    assert(!new java.io.File(s"$dir/tombs").exists(),
      "compaction must fold the tombstone table away")
    assert(spark.read.parquet(s"$dir/postings")
        .filter(col("neighbor_id") % 5 === 3).count() == 0L,
      "dead posting rows survived the compaction rewrite")
  }

  test("ivfAppend: an EMPTY delta leaves search results untouched") {
    // the no-new-data nightly: append of zero rows must not disturb the
    // index (a stray overwrite or partition clobber would)
    val emb = Tables.embeddings(spark, sf001)
    val probes = emb.filter(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_empty_").toString
    Vector.ivfBuild(emb, dir, nlist = 16)
    def search() = Vector.ivfSearch(spark, dir, probes, nprobe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sorted.toSeq
    val before = search()
    Vector.ivfAppend(spark, dir, emb.filter(col("vec_id") < 0))
    assert(search() == before)
  }

  test("ivfAppend is generation-committed: an unmarked generation is " +
      "invisible, asOfGen pins the pre-append snapshot (r14 migration)") {
    val emb = Tables.embeddings(spark, sf001)
    val probes = emb.filter(col("vec_id") < 8)
    val dir = TempRoots.create("graft_ivf_gen_")
    Vector.ivfBuild(emb.filter(col("vec_id") % 2 === 0), dir, nlist = 16)
    def search(asOf: Option[Long] = None) =
      Vector.ivfSearch(spark, dir, probes, nprobe = 4, k = 10,
        asOfGen = asOf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sorted.toSeq
    val pre = search()
    Vector.ivfAppend(spark, dir, emb.filter(col("vec_id") % 2 === 1))
    val post = search()
    assert(post != pre, "fixture degenerate: append changed nothing")
    // the pinned read reproduces the pre-append result exactly
    assert(search(Some(0L)) == pre)
    // a generation dir WITHOUT a commit marker (a crash between rename
    // and marker, or a half-done copy) is invisible to searches
    val fake = TempRoots.create("graft_ivf_fakegen_")
    spark.read.parquet(s"$dir/postings").filter(col("gen") === 1L)
      .drop("gen")
      .write.mode("overwrite").partitionBy("cell").parquet(fake)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(new org.apache.hadoop.fs.Path(fake),
      new org.apache.hadoop.fs.Path(s"$dir/postings/gen=7")))
    assert(search() == post, "unmarked generation leaked into a search")
    // stale pins fail loudly after compaction collapses history into
    // the HIGHEST committed id (1); the pre-append pin (0) is gone for
    // good — ids are never reused (review r14)
    Vector.ivfCompact(spark, dir)
    val e = intercept[IllegalArgumentException] {
      Vector.ivfSearch(spark, dir, probes, asOfGen = Some(0L))
    }
    assert(e.getMessage.contains("compaction collapses"))
    assert(search(Some(1L)) == post,
      "the surviving pin must mean the same data across the compaction")
    assert(search() == post, "compaction (incl. orphan GC) changed results")
  }

  test("ivfCompact: one file per cell afterwards, search bit-identical") {
    val emb = Tables.embeddings(spark, sf001)
    val probes = emb.filter(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cmp_").toString
    Vector.ivfBuild(emb.filter(col("vec_id") % 2 === 0), dir, nlist = 16)
    Vector.ivfAppend(spark, dir, emb.filter(col("vec_id") % 2 === 1))
    def search() = Vector.ivfSearch(spark, dir, probes, nprobe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sorted.toSeq
    def filesPerCell(): Map[String, Int] = {
      // generations are the first partition level (GenCommit migration
      // r14): count each cell's files ACROSS generations — the small-
      // files problem is per-cell whatever gen dir the files sit in
      val base = new java.io.File(s"$dir/postings")
      base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("gen="))
        .flatMap(_.listFiles().filter(f =>
          f.isDirectory && f.getName.startsWith("cell=")))
        .groupBy(_.getName).view.mapValues(
          _.map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum)
        .toMap
    }
    val before = search()
    // the append laid a second file generation into occupied cells
    assert(filesPerCell().values.exists(_ > 1),
      "fixture degenerate: append produced no multi-file cell")
    Vector.ivfCompact(spark, dir)
    val after = filesPerCell()
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction left multi-file cells: $after")
    assert(search() == before, "compaction changed search results")
  }

  test("ivfCompact crash matrix: every interrupted-swap state recovers") {
    // simulate a crash at each point of the rename-aside swap (VERDICT
    // r11 #4 / ADVICE r11): whatever state the writer died in, ivfRecover
    // must restore a complete postings set with search results identical
    // to a clean compaction's
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def move(a: String, b: String): Unit =
      Files.move(Paths.get(a), Paths.get(b), StandardCopyOption.ATOMIC_MOVE)
    def deleteTree(p: String): Unit = {
      val d = new java.io.File(p)
      if (d.exists()) {
        org.apache.commons.io.FileUtils.deleteDirectory(d)
      }
    }
    val emb = Tables.embeddings(spark, sf001)
    val probes = emb.filter(col("vec_id") < 8)
    def mkIndex(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_ivf_crash_").toString
      Vector.ivfBuild(emb.filter(col("vec_id") % 2 === 0), dir, nlist = 16)
      Vector.ivfAppend(spark, dir, emb.filter(col("vec_id") % 2 === 1))
      dir
    }
    def search(dir: String) = Vector.ivfSearch(spark, dir, probes, nprobe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sorted.toSeq
    // the expected end state, from one clean compaction
    val ref = mkIndex()
    val expected = search(ref)
    Vector.ivfCompact(spark, ref)
    assert(search(ref) == expected)

    // state A — crash after writing the compacted set, before rename (1):
    // live postings untouched, complete tmp lingers
    val a = mkIndex()
    spark.read.parquet(s"$a/postings").drop("gen").repartition(col("cell"))
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").partitionBy("gen", "cell")
      .parquet(s"$a/postings_compacting")
    Vector.ivfRecover(spark, a)
    assert(!new java.io.File(s"$a/postings_compacting").exists(), "stray tmp kept")
    assert(search(a) == expected)

    // state B — crash between renames (1) and (2): canonical path MISSING,
    // old set at postings_old, complete new set at postings_compacting →
    // must roll FORWARD to the compacted generation
    val b = mkIndex()
    spark.read.parquet(s"$b/postings").drop("gen").repartition(col("cell"))
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").partitionBy("gen", "cell")
      .parquet(s"$b/postings_compacting")
    move(s"$b/postings", s"$b/postings_old")
    Vector.ivfRecover(spark, b)
    assert(new java.io.File(s"$b/postings").exists())
    assert(!new java.io.File(s"$b/postings_old").exists())
    assert(search(b) == expected)

    // state C — crash after rename (2), before the old-generation delete:
    // healthy new postings + stale postings_old
    val c = mkIndex()
    Vector.ivfCompact(spark, c) // clean swap first
    spark.read.parquet(s"$c/postings").limit(0).write
      .mode("overwrite").parquet(s"$c/postings_old") // plant a stale old gen
    Vector.ivfRecover(spark, c)
    assert(!new java.io.File(s"$c/postings_old").exists())
    assert(search(c) == expected)

    // state D — crash MID-write of the compacted set after rename (1)
    // had... (not reachable in program order; modeled anyway: tmp without
    // _SUCCESS + old present) → roll BACK to the old generation
    val d = mkIndex()
    val preCompact = search(d)
    spark.read.parquet(s"$d/postings").drop("gen").repartition(col("cell"))
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").partitionBy("gen", "cell")
      .parquet(s"$d/postings_compacting")
    Files.deleteIfExists(Paths.get(s"$d/postings_compacting/_SUCCESS"))
    move(s"$d/postings", s"$d/postings_old")
    Vector.ivfRecover(spark, d)
    assert(new java.io.File(s"$d/postings").exists())
    assert(!new java.io.File(s"$d/postings_compacting").exists())
    assert(search(d) == preCompact)

    // and a crashed compact self-heals on RETRY: state B again, but healed
    // implicitly by the next ivfCompact call instead of an explicit recover
    val e = mkIndex()
    spark.read.parquet(s"$e/postings").drop("gen").repartition(col("cell"))
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").partitionBy("gen", "cell")
      .parquet(s"$e/postings_compacting")
    move(s"$e/postings", s"$e/postings_old")
    Vector.ivfCompact(spark, e)
    assert(search(e) == expected)
    Seq(ref, a, b, c, d, e).foreach(deleteTree)
  }

  test("ivfAppend: second-generation append stays search-consistent") {
    // two successive deltas — the nightly cadence; associativity of the
    // append under one frozen quantizer
    val emb = Tables.embeddings(spark, sf001)
    val a = emb.filter(col("vec_id") % 3 === 0)
    val b1 = emb.filter(col("vec_id") % 3 === 1)
    val b2 = emb.filter(col("vec_id") % 3 === 2)
    val probes = emb.filter(col("vec_id") < 8)

    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app2_").toString
    Vector.ivfBuild(a, dir, nlist = 16)
    val frozen = spark.read.parquet(s"$dir/centroids")
      .collect().toSeq.map(r => (r.get(0), r.getSeq[Float](1)))
    Vector.ivfAppend(spark, dir, b1)
    Vector.ivfAppend(spark, dir, b2)

    val dirFull = java.nio.file.Files.createTempDirectory("graft_ivf_app2f_").toString
    Vector.ivfBuild(emb, dirFull, nlist = 16, centroids = Some(frozen))
    def search(d: String) =
      Vector.ivfSearch(spark, d, probes, nprobe = 4, k = 10)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sorted.toSeq
    assert(search(dir) == search(dirFull))
  }
}
