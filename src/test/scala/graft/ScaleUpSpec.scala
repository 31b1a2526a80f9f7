package graft

import org.apache.spark.sql.functions._

/** ScaleUp is load-bearing for every cross-SF scale claim (SCALE.md round
  * 10), and its first cut shipped a fidelity defect (the 7-cycle
  * permutation aliasing copies ≡ 0 mod 7) — so the fidelity contract its
  * header documents is pinned here, on a 12-copy derivation of sf0.001
  * (12 > 7 crosses the old aliasing boundary; 12 < 104 = lcm(8,13) keeps
  * every permutation distinct by construction).
  */
class ScaleUpSpec extends SparkSuite {

  private lazy val out: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_scaleup_spec_").toString
    ScaleUp.derive(spark, sf0001, dir, copies = 12)
    dir
  }
  private def t(name: String) = spark.read.parquet(s"$out/$name.parquet")
  private def base(name: String) = spark.read.parquet(s"$sf0001/$name.parquet")

  test("scaling tables replicate exactly copies x; fixed dims pass through") {
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings").foreach { n =>
      assert(t(n).count() == 12 * base(n).count(), s"$n rowcount")
    }
    Seq("region", "nation").foreach { n =>
      // byte-for-byte pass-through: same rows, not just same count
      assert(t(n).exceptAll(base(n)).isEmpty &&
        base(n).exceptAll(t(n)).isEmpty, s"$n must pass through unchanged")
    }
  }

  test("surrogate keys stay unique and referential integrity holds per copy") {
    Seq(("customer", "c_custkey"), ("orders", "o_orderkey"),
      ("documents", "doc_id"), ("embeddings", "vec_id")).foreach {
      case (n, k) =>
        val df = t(n)
        assert(df.select(k).distinct().count() == df.count(), s"$n.$k unique")
    }
    // FK offsets must track their TARGET's stride, not the fact table's
    val orphanOrders = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    val orphanItems = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphanOrders == 0 && orphanItems == 0,
      s"dangling FKs: orders->customer $orphanOrders, lineitem->orders $orphanItems")
  }

  test("every copy's text permutation is DISTINCT (the round-10 aliasing defect)") {
    val stride = base("documents").count()
    // docs whose base text touches the 13-cycle alphabet see a different
    // image under every rotation k=0..11, so their 12 copies must carry
    // 12 pairwise-distinct texts; the old 7-cycle form gave copies 7..11
    // the same text as copies 0..4 — caught exactly here
    val imgs = t("documents")
      .select(pmod(col("doc_id"), lit(stride)).as("base_id"), col("text"))
      .join(base("documents").filter(col("text").rlike("[rdlcumwfgypbv]"))
        .select(col("doc_id").as("base_id")), Seq("base_id"), "left_semi")
      .groupBy("base_id")
      .agg(countDistinct(col("text")).as("n"), count(lit(1)).as("c"))
    assert(imgs.count() > 0, "vacuous: no doc touches the permuted alphabet")
    val aliased = imgs.filter(col("n") =!= col("c")).count()
    assert(aliased == 0, s"$aliased base docs have colliding copy texts")
  }

  test("embedding perturbation is orthogonal: within-copy dots preserved") {
    val stride = base("embeddings").count()
    // rotation + sign flips preserve every pairwise inner product exactly
    // per term (s_i a_i)(s_i b_i) = a_i b_i — only fp summation ORDER
    // moves, so within-copy dots match base dots to fp-reassociation
    // tolerance; a non-orthogonal perturbation (e.g. per-coordinate
    // scaling) would shift them grossly
    val b = base("embeddings").orderBy("vec_id").limit(4)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val ids = b.map { case (id, _) => 5 * stride + id }
    val c5 = t("embeddings").filter(col("vec_id").isin(ids: _*))
      .collect().map(r => (r.getLong(0) - 5 * stride, r.getSeq[Float](1).toArray))
      .toMap
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }; s
    }
    for {
      (i, vi) <- b; (j, vj) <- b if i < j
    } {
      val d0 = dot(vi, vj)
      val d5 = dot(c5(i), c5(j))
      assert(math.abs(d0 - d5) <= 1e-4 * math.max(1.0, math.abs(d0)),
        s"pair ($i,$j): base dot $d0 vs copy-5 dot $d5")
      // and the copies are NOT the identical vectors (decorrelation is real)
      assert(!vi.sameElements(c5(i)), s"copy 5 of vec $i is unperturbed")
    }
  }

  test("skew mode: hot mass concentrates on copy-0 keys, PKs stay unique") {
    // VERDICT r11 #5: the uniform derivation cannot create NEW hot-key
    // mass; hotPct=90 must route ~91% of fact rows onto copy-0's key
    // space ((1 + 4·0.9)/5 at copies=5) while primary keys stay unique
    // and referential integrity holds (copy-0 targets exist)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_scaleup_skew_").toString
    ScaleUp.derive(spark, sf0001, dir, copies = 5, hotPct = 90)
    def d(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    val custN = base("customer").count()
    val o = d("orders")
    assert(o.count() == 5 * base("orders").count())
    assert(o.select("o_orderkey").distinct().count() == o.count(),
      "orders PK must stay unique in skew mode")
    val hotShare = o.filter(col("o_custkey") < custN).count().toDouble / o.count()
    assert(hotShare > 0.8 && hotShare < 0.99,
      s"expected ~0.91 of order mass on copy-0 customers, got $hotShare")
    // referential integrity: every o_custkey resolves
    assert(o.join(d("customer"), o("o_custkey") === col("c_custkey"),
      "left_anti").isEmpty, "skewed orders must keep FK integrity")
    // the value axis concentrates: the squash band holds the hot head
    val li = d("lineitem")
    // composite key survives skew with NO derivation-introduced
    // collisions: hot rows keep copy-0's l_orderkey, so their
    // l_linenumber shifts instead (ADVICE r12). The base fixture itself
    // does not enforce (l_orderkey, l_linenumber) uniqueness, so the
    // invariant is distinct-pair count scaling EXACTLY with copies —
    // every base collision is inherited, none is added across copies.
    val basePairs = base("lineitem")
      .select("l_orderkey", "l_linenumber").distinct().count()
    assert(li.select("l_orderkey", "l_linenumber").distinct().count()
      == 5 * basePairs,
      "skew mode must not introduce composite-key collisions beyond the " +
        "base fixture's own")
    val bandShare = li.filter(col("l_extendedprice") >= 500 &&
      col("l_extendedprice") < 501).count().toDouble / li.count()
    assert(bandShare > 0.6, s"expected a value-head band, got $bandShare")
    // events: user_id mass concentrates, event_id unique
    val ev = d("events")
    assert(ev.select("event_id").distinct().count() == ev.count())
    val userStride = base("events").agg(max(col("user_id"))).head().getLong(0) + 1
    val hotUsers = ev.filter(col("user_id") < userStride).count().toDouble / ev.count()
    assert(hotUsers > 0.8, s"expected hot sessionize users, got $hotUsers")
    // hotPct=0 path is untouched: the lazy `out` fixture above already
    // pins the uniform contract for the same code
  }

  test("timestamps are densified, not shifted: same span at 12x event density") {
    val Array(b0) = base("events").agg(min("ts"), max("ts")).collect()
    val Array(s0) = t("events").agg(min("ts"), max("ts")).collect()
    assert(b0 == s0, s"event span moved: base=$b0 scaled=$s0")
  }

  test("derived fixtures preserve ORACLE semantics: DuckDB gate on a " +
      "2-copy derivation (q08, q21, x02)") {
    // Belt-and-suspenders for every cross-SF claim (VERDICT r10 #7): the
    // property pins above say the derivation is structurally right; this
    // proves derived data still passes the DRIVER'S OWN gate — Spark
    // results vs DuckDB oracle SQL, column-sorted value compare — on a
    // fresh 2-copy derivation of sf0.01. Runs the real tools/selfcheck.py
    // in SELFCHECK_PRE mode (spark outputs dumped in-process first; the
    // default mode would recurse into sbt and deadlock on its lock).
    val pyOk = try {
      new ProcessBuilder("python3", "-c", "import duckdb")
        .start().waitFor() == 0
    } catch { case _: java.io.IOException => false }
    assume(pyOk, "python3+duckdb unavailable — driver-side tool missing")

    val derived = java.nio.file.Files
      .createTempDirectory("graft_scaleup_oracle_").toString
    ScaleUp.derive(spark, sf001, derived, copies = 2)
    val dumpDir = java.nio.file.Files
      .createTempDirectory("graft_scaleup_dump_").toString
    val gate = Set("q08_agg_group", "q21_dedup_exact", "x02_minhash_dedup")
    Verify.dump(spark, derived, dumpDir, only = gate)

    val pb = new ProcessBuilder(
      (Seq("python3", "tools/selfcheck.py", derived) ++ gate.toSeq.sorted): _*)
    pb.environment().put("SELFCHECK_PRE", dumpDir)
    pb.directory(new java.io.File("."))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val outText = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    info(outText.linesIterator.filter(l =>
      l.startsWith("PASS") || l.startsWith("FAIL") || l.contains("selfcheck"))
      .mkString("; "))
    assert(code == 0, s"derived-fixture oracle gate failed:\n$outText")
    assert(outText.contains("3 pass, 0 fail"), outText)
  }
}
