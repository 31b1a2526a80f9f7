package graft

import org.apache.spark.sql.functions._

/** Generic keyed MERGE semantics (SURVEY.md §2.3 q92): action paths,
  * latest-wins resolution, and the loud-failure contracts.
  */
class MergeSpec extends SparkSuite {
  import ops.Merge
  import spark.implicits._

  private def tgt() = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "s", "v")

  test("merge actions: update, insert, delete, delete-absent no-op") {
    val delta = Seq(
      (1L, "a2", 11.0, "upsert"),  // update existing
      (4L, "d", 40.0, "upsert"),   // insert new key
      (2L, "b", 20.0, "delete"),   // delete existing
      (9L, "x", 0.0, "delete")     // delete absent key: SQL MERGE no-op
    ).toDF("k", "s", "v", "_op")
    val out = Merge.upsert(tgt(), delta, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a2", 11.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("merge is a state fold: merge(merge(t,d1),d2) applies in order") {
    // a key updated then deleted is gone; deleted then re-upserted is back
    val d1 = Seq((1L, "a2", 11.0, "upsert"), (2L, "b", 0.0, "delete"))
      .toDF("k", "s", "v", "_op")
    val d2 = Seq((1L, "z", 0.0, "delete"), (2L, "b2", 22.0, "upsert"))
      .toDF("k", "s", "v", "_op")
    val out = Merge.upsert(Merge.upsert(tgt(), d1, Seq("k")), d2, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2))).toSeq
    assert(out == Seq((2L, "b2", 22.0), (3L, "c", 30.0)))
  }

  test("seqCol: latest-wins resolves an at-least-once delta log") {
    // key 1 sees upsert@1, upsert@3, delete@2 — the seq-3 upsert wins;
    // key 2 sees upsert@1 then delete@5 — the delete wins
    val delta = Seq(
      (1L, "old", 0.0, "upsert", 1L),
      (1L, "new", 99.0, "upsert", 3L),
      (1L, "mid", 0.0, "delete", 2L),
      (2L, "back", 0.0, "upsert", 1L),
      (2L, "gone", 0.0, "delete", 5L)
    ).toDF("k", "s", "v", "_op", "seq")
    val out = Merge.upsert(tgt(), delta, Seq("k"), seqCol = Some("seq"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2))).toSeq
    assert(out == Seq((1L, "new", 99.0), (3L, "c", 30.0)))
  }

  test("conflicting delta keys without seqCol fail loudly, not last-wins") {
    val delta = Seq((1L, "x", 1.0, "upsert"), (1L, "y", 2.0, "upsert"))
      .toDF("k", "s", "v", "_op")
    val e = intercept[Exception] {
      Merge.upsert(tgt(), delta, Seq("k")).collect()
    }
    assert(e.getMessage.contains("conflicting delta rows")
      || e.getCause != null &&
         e.getCause.getMessage.contains("conflicting delta rows"))
  }

  test("exact full-row redelivery collapses silently — in both paths") {
    // at-least-once redelivery of the SAME record is unambiguous and
    // must not abort the merge (review r13); only DIFFERING payloads are
    // a conflict
    val dup = Seq((1L, "a2", 11.0, "upsert"), (1L, "a2", 11.0, "upsert"))
      .toDF("k", "s", "v", "_op")
    val out = Merge.upsert(tgt(), dup, Seq("k")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    val dupSeq = Seq((1L, "a2", 11.0, "upsert", 7L),
        (1L, "a2", 11.0, "upsert", 7L))
      .toDF("k", "s", "v", "_op", "seq")
    val outSeq = Merge.upsert(tgt(), dupSeq, Seq("k"),
        seqCol = Some("seq")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(outSeq == Seq((1L, "a2"), (2L, "b"), (3L, "c")))
  }

  test("a malformed op on a NON-LATEST row still fails loudly") {
    // the op check runs on the raw delta, before latest-wins resolution
    // can drop the corrupted record unexamined (review r13)
    val delta = Seq((1L, "x", 1.0, "delte", 1L),
        (1L, "y", 2.0, "upsert", 2L))
      .toDF("k", "s", "v", "_op", "seq")
    val e = intercept[Exception] {
      Merge.upsert(tgt(), delta, Seq("k"), seqCol = Some("seq")).collect()
    }
    assert(e.getMessage.contains("unknown op")
      || e.getCause != null && e.getCause.getMessage.contains("unknown op"))
  }

  test("upsertPartitioned: escaped partition values still clean up fully") {
    // a partition value Spark escapes in directory names (':' -> '%3A')
    // must still be REMOVED when fully deleted — a raw string path would
    // miss the escaped dir and the ghost partition would survive
    import ops.Merge
    val root = TempRoots.create("graft_mergesc_")
    val tgt2 = s"$root/t"
    Seq((1L, "a", "p:1"), (2L, "b", "p:2")).toDF("k", "s", "pc")
      .write.partitionBy("pc").parquet(tgt2)
    assert(new java.io.File(s"$tgt2/pc=p%3A1").exists(),
      "fixture: expected Spark to escape ':' in the partition dir name")
    val delta = Seq((1L, "a", "p:1", "delete")).toDF("k", "s", "pc", "_op")
    Merge.upsertPartitioned(spark, tgt2, delta, Seq("k"), "pc")
    assert(!new java.io.File(s"$tgt2/pc=p%3A1").exists(),
      "fully-deleted escaped partition must be removed")
    val out = spark.read.parquet(tgt2).select("k").collect()
      .map(_.getLong(0)).toSeq
    assert(out == Seq(2L))
  }

  test("upsertPartitioned: a null-partition delta merges null-safely — " +
      "untouched null-partition rows survive (ADVICE r13)") {
    // isin never matches null: without the null-safe slice filter, a
    // delta touching __HIVE_DEFAULT_PARTITION__ reads an EMPTY slice of
    // it and the dynamic overwrite drops every untouched null-row
    import ops.Merge
    val root = TempRoots.create("graft_mergenull_")
    val tgt2 = s"$root/t"
    Seq((1L, "a", null), (2L, "b", null), (3L, "c", "p1"))
      .toDF("k", "s", "pc")
      .write.partitionBy("pc").parquet(tgt2)
    val delta = Seq((1L, "a2", null: String, "upsert"))
      .toDF("k", "s", "pc", "_op")
    Merge.upsertPartitioned(spark, tgt2, delta, Seq("k"), "pc")
    val out = spark.read.parquet(tgt2).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a2"), (2L, "b"), (3L, "c")),
      s"untouched null-partition row k=2 must survive the merge: $out")
    // delete-only delta on one null-partition key: the OTHER null-row
    // stays, the directory is not ghost-removed wholesale
    val del = Seq((1L, "a2", null: String, "delete"))
      .toDF("k", "s", "pc", "_op")
    Merge.upsertPartitioned(spark, tgt2, del, Seq("k"), "pc")
    val out2 = spark.read.parquet(tgt2).orderBy("k").collect()
      .map(_.getLong(0)).toSeq
    assert(out2 == Seq(2L, 3L))
    // and a delta deleting the LAST null row removes the default dir
    val del2 = Seq((2L, "b", null: String, "delete"))
      .toDF("k", "s", "pc", "_op")
    Merge.upsertPartitioned(spark, tgt2, del2, Seq("k"), "pc")
    assert(!new java.io.File(
      s"$tgt2/pc=__HIVE_DEFAULT_PARTITION__").exists())
    assert(spark.read.parquet(tgt2).collect().map(_.getLong(0)).toSeq
      == Seq(3L))
  }

  test("upsertPartitioned: a delta moving a key across TOUCHED " +
      "partitions fails loudly — partial partCol-immutability guard") {
    import ops.Merge
    val root = TempRoots.create("graft_mergemove_")
    val tgt2 = s"$root/t"
    Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("k", "s", "pc")
      .write.partitionBy("pc").parquet(tgt2)
    // key 1 currently lives in p1; the delta claims p2 for it while ALSO
    // touching p1 (via key 2's sibling write) — both sides are in the
    // slice, so the guard must catch the move
    val delta = Seq((1L, "a2", "p2", "upsert"), (2L, "b2", "p1", "upsert"))
      .toDF("k", "s", "pc", "_op")
    // the guard rides in-plan (assert_true — one pass over the slice),
    // so it surfaces as an execution-time failure during the staged write
    val e = intercept[Exception] {
      Merge.upsertPartitioned(spark, tgt2, delta, Seq("k"), "pc")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("partCol is immutable")),
      s"guard must name the contract: ${messages(e)}")
    // target unchanged — the guard fired before any write
    val out = spark.read.parquet(tgt2).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "b")))
    // a NULL-partition move must fire with the SAME named message —
    // concat over a null partition value would otherwise null the whole
    // message (review r14: coalesce in the guard)
    val tgt3 = s"$root/t3"
    Seq((1L, "a", null: String), (2L, "b", "p1"))
      .toDF("k", "s", "pc").write.partitionBy("pc").parquet(tgt3)
    // the delta touches BOTH p1 and the null partition (the guard only
    // sees moves within the touched slice — the documented residue), so
    // key 1's current null-partition row is in-slice and the move fires
    val nullMove = Seq((1L, "a2", "p1", "upsert"),
      (3L, "c", null: String, "upsert")).toDF("k", "s", "pc", "_op")
    val e2 = intercept[Exception] {
      Merge.upsertPartitioned(spark, tgt3, nullMove, Seq("k"), "pc")
    }
    assert(messages(e2).exists(m => m.contains("partCol is immutable") &&
        m.contains("null")),
      s"null-move guard must name the contract and the null: ${messages(e2)}")
  }

  test("CDC replay: re-applying the SAME batch is a no-op — the " +
      "at-least-once foreachBatch contract CdcApply relies on") {
    import ops.Merge
    val root = TempRoots.create("graft_mergereplay_")
    val tgt2 = s"$root/t"
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"))
      .toDF("k", "s", "pc").write.partitionBy("pc").parquet(tgt2)
    val batch = Seq((1L, "a2", "p1", "upsert"), (2L, "b", "p1", "delete"))
      .toDF("k", "s", "pc", "_op")
    Merge.upsertPartitioned(spark, tgt2, batch, Seq("k"), "pc")
    val once = spark.read.parquet(tgt2).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // a restart replays the last uncommitted batch: same file, same rows
    Merge.upsertPartitioned(spark, tgt2, batch, Seq("k"), "pc")
    val twice = spark.read.parquet(tgt2).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(once == Seq((1L, "a2"), (3L, "c")) && twice == once,
      s"replay must be idempotent: once=$once twice=$twice")
  }

  test("schema evolution: new delta column null-fills old rows with " +
      "evolveSchema on, fails loudly with it off") {
    val delta = Seq((1L, "a2", 11.0, "fresh", "upsert"),
        (4L, "d", 40.0, "new", "upsert"))
      .toDF("k", "s", "v", "tag", "_op")
    // off (the default): loud, names the offending column
    val e = intercept[IllegalArgumentException] {
      ops.Merge.upsert(tgt(), delta, Seq("k"))
    }
    assert(e.getMessage.contains("tag") &&
      e.getMessage.contains("evolveSchema"))
    // on: untouched rows 2 and 3 null-fill, upserts carry the value
    val out = ops.Merge.upsert(tgt(), delta, Seq("k"), evolveSchema = true)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSeq
    assert(out == Seq((1L, "a2", "fresh"), (2L, "b", null),
      (3L, "c", null), (4L, "d", "new")))
    // a delta MISSING a target column stays a hard error either way
    val narrow = Seq((1L, "a3", "upsert")).toDF("k", "s", "_op")
    intercept[Exception] {
      ops.Merge.upsert(tgt(), narrow, Seq("k"), evolveSchema = true)
        .collect()
    }
  }

  test("a tie on the max seq fails loudly — no arbitrary winner") {
    val delta = Seq(
      (1L, "x", 1.0, "upsert", 7L), (1L, "y", 2.0, "upsert", 7L)
    ).toDF("k", "s", "v", "_op", "seq")
    val e = intercept[Exception] {
      Merge.upsert(tgt(), delta, Seq("k"), seqCol = Some("seq")).collect()
    }
    assert(e.getMessage.contains("tie on the max")
      || e.getCause != null && e.getCause.getMessage.contains("tie on the max"))
  }

  test("unknown op value fails loudly") {
    val delta = Seq((1L, "x", 1.0, "UPSERT")).toDF("k", "s", "v", "_op")
    val e = intercept[Exception] {
      Merge.upsert(tgt(), delta, Seq("k")).collect()
    }
    assert(e.getMessage.contains("unknown op")
      || e.getCause != null && e.getCause.getMessage.contains("unknown op"))
  }

  test("composite keys merge on the full key tuple") {
    val target = Seq((1L, "eu", 10.0), (1L, "us", 11.0)).toDF("k1", "k2", "v")
    val delta = Seq((1L, "eu", 99.0, "upsert"), (2L, "ap", 5.0, "upsert"))
      .toDF("k1", "k2", "v", "_op")
    val out = Merge.upsert(target, delta, Seq("k1", "k2"))
      .orderBy("k1", "k2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "eu", 99.0), (1L, "us", 11.0), (2L, "ap", 5.0)))
  }

  test("empty delta is the identity merge") {
    val out = Merge.upsert(tgt(), tgt().limit(0)
        .withColumn("_op", lit("upsert")), Seq("k"))
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("upsertPartitioned: untouched partition files are physically untouched") {
    import ops.Merge
    val root = TempRoots.create("graft_mergep_")
    val tgt = s"$root/t"
    Seq((1L, "a", 10.0, 1996), (2L, "b", 20.0, 1997), (3L, "c", 30.0, 1998))
      .toDF("k", "s", "v", "yr").write.partitionBy("yr").parquet(tgt)
    def files(yr: Int) = {
      val d = new java.io.File(s"$tgt/yr=$yr")
      if (!d.exists()) Map.empty[String, Long]
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before96 = files(1996)
    val before97 = files(1997)
    assert(before96.nonEmpty && before97.nonEmpty)
    // touch only 1997 and 1998: update k=2, delete k=3
    val delta = Seq((2L, "b2", 22.0, 1997, "upsert"),
        (3L, "c", 0.0, 1998, "delete"))
      .toDF("k", "s", "v", "yr", "_op")
    Merge.upsertPartitioned(spark, tgt, delta, Seq("k"), "yr")
    assert(files(1996) == before96,
      "the untouched 1996 partition was rewritten")
    assert(files(1997) != before97, "the touched partition must rewrite")
    assert(files(1998).isEmpty,
      "a fully-deleted partition must be removed, not survive stale")
    val out = spark.read.parquet(tgt).select("k", "s", "v")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b2", 22.0)))
  }

  test("upsertPartitioned slice read is partition-pruned to touched years") {
    import ops.Merge
    val root = TempRoots.create("graft_mergepp_")
    val tgt = s"$root/t"
    Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").parquet(tgt)
    // the slice plan upsertPartitioned builds: target filtered to touched
    val slice = spark.read.parquet(tgt).filter(col("yr").isin(1996, 1997))
    val scan = slice.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.head
    assert(scan.partitionFilters.nonEmpty &&
      scan.partitionFilters.mkString(" ").contains("yr"),
      "touched-partition read must prune on the partition column")
    // end-to-end: q92b equals the in-memory chained merges on the same
    // year-restricted deltas (its oracle's statement, pinned locally)
    val got = ops.Merge.q92b(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty)
    val years = got.map(_._1).toSet
    val dates = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).toLocalDateTime.getYear)
      .toMap
    // pre-1996 keys follow q92-with-empty-delta semantics: t0 survives as-is
    val pre96InT0 = dates.filter { case (k, y) => y < 1996 && k % 4 != 3 }
    assert(pre96InT0.keySet.subsetOf(years),
      "pre-1996 target rows must pass through untouched")
  }

  test("q92 plan: the target is never sorted or windowed — delta-only windows") {
    // the copy-on-write contract: windows (dup guards) run over the DELTA;
    // the target side contributes scans + the anti join only. q92 chains
    // two merges => at most the deltas' guard windows appear, and no sort
    // precedes the final presentation orderBy on the target lineage.
    val df = ops.Merge.q92(spark, sf0001)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), "cartesian in merge plan")
    val got = df.collect()
    assert(got.nonEmpty)
    // spot semantics at the boundary classes (driver-recomputed)
    val orders = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byK = got.map(r => r.getLong(0) -> r.getString(1)).toMap
    orders.foreach { case (k, _, _) =>
      (k % 16, k % 8) match {
        case (2, _) => assert(byK(k) == "R2")          // deleted then re-inserted
        case (_, 1) => assert(byK(k) == "U1")          // updated in batch 1
        case (_, 5) => assert(byK(k) == "U2")          // updated in batch 2
        case (_, 3) => assert(!byK.contains(k))        // inserted then deleted
        case (_, 2) => assert(!byK.contains(k))        // deleted in batch 1
        case _ => ()
      }
    }
  }
}
