package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-mechanics checks that don't fit a declared query: salted
  * aggregation correctness + shape, and partition-pruned reads.
  */
class ScaleSpec extends SparkSuite {

  test("saltedSum: exact on skewed data, two aggregate phases in the plan") {
    import spark.implicits._
    // power-law: one hot key with 50k rows — all carrying the SAME value,
    // the case where a value-derived salt would collapse to one bucket
    val hot  = (1 to 50000).map(_ => ("hot", 1L))
    val cold = (1 to 100).flatMap(k => (1 to 10).map(i => (s"k$k", i.toLong)))
    val df = (hot ++ cold).toDF("key", "v")

    val salted = ops.Skew.saltedSum(df, Seq("key"), col("v"), buckets = 8)
    val direct = df.groupBy("key")
      .agg(sum("v").as("total"), count(lit(1)).as("n_rows"))

    val s = salted.orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d = direct.orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(s.toSeq == d.toSeq)

    // two-phase: the plan must contain two distinct shuffles (salted + final)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(salted.queryExecution.executedPlan.toString).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }

  test("saltedJoin: exact on a hot key, shuffle partitions on (key, salt)") {
    import spark.implicits._
    // one hot key owning 90% of the fact rows — the shape a plain hash
    // join funnels through a single reducer
    val fact = ((1 to 45000).map(_ => (7L, "hot")) ++
      (1 to 5000).map(i => (i.toLong % 97, "cold"))).toDF("fk", "tag")
    val dim = (0L to 99L).map(k => (k, s"d$k")).toDF("dk", "payload")

    val salted = ops.Skew.saltedJoin(fact, dim, "fk", "dk", buckets = 8)
    val plain = fact.join(dim, fact("fk") === dim("dk"))
    // MULTISET equality — the hot key joins with huge multiplicities, and
    // a salting bug's signature is compensating duplicate/missing matches
    // that count() + DISTINCT-based except() cannot see
    def hist(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("fk", "tag", "dk", "payload").count()
    assert(hist(salted).except(hist(plain)).isEmpty &&
      hist(plain).except(hist(salted)).isEmpty)

    // the one fact shuffle must carry the salt alongside the key — that IS
    // the mitigation (hot key spread over `buckets` reducers). The tiny
    // test dim would auto-broadcast (no shuffle at all — the case where
    // salting is pointless), so pin the shuffle-join path for the shape
    // assertion.
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      val parts = ops.Skew.saltedJoin(fact, dim, "fk", "dk", buckets = 8)
        .queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e.outputPartitioning
        }.collect { case h: HashPartitioning =>
          h.expressions.flatMap(_.references.toSeq.map(_.name)).toSet
        }
      assert(parts.nonEmpty && parts.forall(_.size == 2),
        s"every join shuffle must partition on (key, salt), got $parts")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
    }
  }

  test("salted sessionization == raw-key q20, with boundary merges forced") {
    // 1-hour buckets against a 30-min gap: sessions routinely span bucket
    // edges, so the cross-bucket merge pass is genuinely exercised
    val bucketUs = 3600L * 1000000
    val base = ops.Aggregates.q20(spark, sf0001)
      .collect().map(_.toSeq)
    val salted = ops.Aggregates.q20Salted(spark, sf0001, bucketUs)
      .collect().map(_.toSeq)
    assert(salted.toSeq == base.toSeq,
      "salt-then-merge sessionization must reproduce the raw-key output")
    // guard: the fixture actually contains bucket-spanning sessions —
    // otherwise this test would pass without testing the merge
    val spanning = ops.Aggregates.q20(spark, sf0001)
      .filter(floor(unix_micros(col("session_start")) / bucketUs) =!=
        floor(unix_micros(col("session_end")) / bucketUs))
      .count()
    assert(spanning > 0, "fixture has no bucket-spanning sessions")
  }

  /** Shuffles that hash-partition on EXACTLY the given key must carry
    * pre-aggregated rows (an aggregate somewhere below the exchange): a
    * 3–5-value key is a serialization point when raw fact rows shuffle on
    * it, but harmless once the data under it is a count histogram.
    */
  private def rawKeyShuffles(
      df: org.apache.spark.sql.DataFrame, key: String) = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // executedPlan: ENSURE_REQUIREMENTS exchanges (the window/agg shuffles
    // under test) only exist after plan preparation — sparkPlan has none.
    // Callers disable AQE so the tree isn't an opaque AdaptiveSparkPlanExec.
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.filter(_.outputPartitioning match {
      case h: HashPartitioning =>
        h.expressions.nonEmpty &&
          h.expressions.flatMap(_.references.toSeq.map(_.name)).toSet == Set(key)
      case _ => false
    }).filterNot(_.child.collectFirst { case a: BaseAggregateExec => a }.isDefined)
  }

  /** Vacuity guard for [[rawKeyShuffles]]: every hash exchange whose
    * partitioning references `key` AT ALL (alone or inside a composite).
    * A shape test should assert this is nonEmpty before asserting
    * rawKeyShuffles is empty — otherwise a renamed column makes the
    * bare-key check match nothing and pass against any plan.
    */
  private def hashShufflesReferencing(
      df: org.apache.spark.sql.DataFrame, key: String) = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.filter(_.outputPartitioning match {
      case h: HashPartitioning =>
        h.expressions.flatMap(_.references.toSeq.map(_.name)).contains(key)
      case _ => false
    })
  }

  test("q81: the 4x hop Expand collapses into a partial agg below every exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the Scaladoc claim at Aggregates.q81: window(size, slide) fans out
      // 4 tagged copies per event, but the fan-out must aggregate
      // map-side BEFORE any shuffle — an Expand above an exchange would
      // ship 4x the events
      import org.apache.spark.sql.execution.ExpandExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
      val plan = ops.Aggregates.q81(spark, sf0001).queryExecution.executedPlan
      val expands = plan.collect { case e: ExpandExec => e }
      assert(expands.nonEmpty, "vacuity guard: the hop fan-out must plan as Expand")
      // every exchange's subtree must already contain an aggregate above
      // any Expand it carries (partial agg between Expand and shuffle)
      plan.collect { case ex: ShuffleExchangeExec => ex }.foreach { ex =>
        val hasExpand = ex.child.collectFirst { case e: ExpandExec => e }.isDefined
        if (hasExpand) {
          val agg = ex.child.collectFirst { case a: BaseAggregateExec => a }
          assert(agg.isDefined &&
            agg.get.collectFirst { case e: ExpandExec => e }.isDefined,
            "Expand must sit below a partial aggregate, not ship raw fan-out")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q85: weighted census on the composite — no raw-row shuffle on the flag key") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q85 aliases l_returnflag to `g`; same guard discipline as q77 —
      // prove a g-composite shuffle exists, then that no raw-row exchange
      // partitions on the bare 3-value key
      val plan = ops.Analytics.q85(spark, sf0001)
      assert(hashShufflesReferencing(plan, "g").nonEmpty,
        "vacuity guard: q85's census must shuffle on a g-containing composite")
      assert(rawKeyShuffles(plan, "g").isEmpty,
        "q85 must only hash-partition the flag key above an aggregate")
      assert(plan.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "q85 must broadcast the bucket offsets back onto census rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q82: one user-key window, no join anywhere in the plan") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = ops.Analytics.q82(spark, sf0001).queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      val hashEx = plan.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
      assert(hashEx.length == 1, s"q82 must shuffle exactly once, got ${hashEx.length}")
      assert(hashEx.head.outputPartitioning.asInstanceOf[HashPartitioning]
        .expressions.flatMap(_.references.toSeq.map(_.name)) == Seq("user_id"),
        "the one shuffle must key on user_id for the running window")
      assert(!plan.toString.contains("Join"),
        "attribution must carry the latest click in the window, never a self-join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q34b/q37b: no shuffle of raw rows on the low-cardinality key") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try assertRawKeyShuffleShapes()
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q70: thresholds broadcast back — no raw-row shuffle on the 3-value status key") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the Scaladoc claim at Analytics.q70: thresholds come from histCum's
      // composite-key census; the fact table never hash-partitions on the
      // bare status key, and the [lo, hi] clamp attaches by broadcast
      assert(rawKeyShuffles(ops.Analytics.q70(spark, sf0001), "o_orderstatus").isEmpty,
        "q70 must only hash-partition o_orderstatus above an aggregate")
      assert(ops.Analytics.q70(spark, sf0001).queryExecution.sparkPlan
        .toString.contains("BroadcastHashJoin"),
        "q70 must broadcast the [p5, p95] thresholds back onto fact rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q77: med/MAD dims broadcast back — no raw-row shuffle on the status key") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the Scaladoc claim at Analytics.q77: both median passes run the
      // histogram-rank census on the (status, value) composite; raw rows
      // never hash-partition on the bare 3-value status key, and the
      // med/MAD fences attach by broadcast for the map-side count.
      // q77 aliases o_orderstatus to `g` in its first projection, so the
      // shape check must use the alias — and guard its own non-vacuity:
      // at least one composite shuffle must actually REFERENCE g, else
      // the isEmpty assert would pass trivially against a renamed plan.
      val plan = ops.Analytics.q77(spark, sf0001)
      assert(hashShufflesReferencing(plan, "g").nonEmpty,
        "vacuity guard: q77's census must shuffle on a g-containing composite")
      assert(rawKeyShuffles(plan, "g").isEmpty,
        "q77 must only hash-partition the status key above an aggregate")
      assert(ops.Analytics.q77(spark, sf0001).queryExecution.sparkPlan
        .toString.contains("BroadcastHashJoin"),
        "q77 must broadcast the med/MAD fences back onto fact rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q55: moments broadcast back — no raw-row shuffle on the 3-value status key") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      assert(rawKeyShuffles(ops.Analytics.q55(spark, sf0001), "o_orderstatus").isEmpty,
        "q55 must only hash-partition o_orderstatus above an aggregate")
      assert(ops.Analytics.q55(spark, sf0001).queryExecution.sparkPlan
        .toString.contains("BroadcastHashJoin"),
        "q55 must broadcast the stats back onto fact rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q33c: no raw-row shuffle on the bare currency key") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // control: the union+window form DOES partition raw rows by currency
      assert(rawKeyShuffles(ops.AsOf.q33b(spark, sf0001), "currency").nonEmpty,
        "control: q33b's window should shuffle raw rows on currency")
      // bucketed form: the big window partitions on (currency, bucket);
      // the only bare-currency exchange carries bucket SUMMARIES (an
      // aggregate below it), never per-row history
      assert(rawKeyShuffles(ops.AsOf.q33c(spark, sf0001), "currency").isEmpty,
        "q33c must not hash-partition raw rows on the 10-value key")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def assertRawKeyShuffleShapes(): Unit = {
    // the direct window forms DO shuffle raw rows on the 3/5-value key —
    // the control proving the detector distinguishes the two plan shapes
    assert(rawKeyShuffles(ops.Analytics.q34(spark, sf0001), "o_orderstatus").nonEmpty,
      "control: q34's full-partition window should shuffle raw rows on status")
    assert(rawKeyShuffles(ops.Aggregates.q37(spark, sf0001), "o_orderpriority").nonEmpty,
      "control: q37's window should shuffle raw rows on priority")
    // the histogram plans never shuffle un-aggregated rows on the bare key
    assert(rawKeyShuffles(ops.Analytics.q34Hist(spark, sf0001), "o_orderstatus").isEmpty,
      "q34b must only hash-partition on o_orderstatus above an aggregate")
    assert(rawKeyShuffles(ops.Aggregates.q37Hist(spark, sf0001), "o_orderpriority").isEmpty,
      "q37b must only hash-partition on o_orderpriority above an aggregate")
    // and the fact side re-attaches by BROADCAST join — no fact shuffle/sort
    val q37bPlan = ops.Aggregates.q37Hist(spark, sf0001)
      .queryExecution.sparkPlan.toString
    assert(q37bPlan.contains("BroadcastHashJoin"),
      "q37b must broadcast the rank histogram back onto fact rows")
  }

  test("q50: salted per-group top-N == direct window; raw rows never funnel on the bare key") {
    import org.apache.spark.sql.expressions.Window
    val base = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"),
        ops.TextAnalysis.rollingHash(spark, col("text")).as("h"))
    // direct single-window restatement (the oracle's shape)
    val direct = base
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(asc("h"), asc("doc_id"))).cast("int"))
      .filter(col("rk") <= 50)
      .select("doc_id", "lang", "rk")
    val out = ops.TextAnalysis.q50(spark, sf001).select("doc_id", "lang", "rk")
    assert(out.except(direct).isEmpty && direct.except(out).isEmpty)
    // salt-independence: 1 salt (degenerate = direct) and 7 salts agree
    Seq(1, 7).foreach { s =>
      val v = ops.TextAnalysis.sampleTopNPerGroup(base, "lang", 50, salts = s)
        .select("doc_id", "lang", "rk")
      assert(v.except(out).isEmpty && out.except(v).isEmpty, s"salts=$s diverged")
    }
    // the bare-lang exchange exists but carries only local-top-N survivors:
    // every such exchange must have the phase-1 rank filter below it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      import org.apache.spark.sql.execution.FilterExec
      val bare = ops.TextAnalysis.q50(spark, sf001)
        .queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning match {
          case h: HashPartitioning =>
            h.expressions.flatMap(_.references.toSeq.map(_.name)).toSet == Set("lang")
          case _ => false
        })
      assert(bare.nonEmpty, "phase 2 should shuffle on the bare lang key")
      bare.foreach { e =>
        assert(e.child.collectFirst {
          case f: FilterExec if f.condition.toString.contains("_lr") => f
        }.isDefined, "bare-lang shuffle must sit above the local top-N prune")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q52: two-phase prefix scan == one global window; raw rows never single-partition") {
    import org.apache.spark.sql.expressions.Window
    val base = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n_tokens"),
        ops.TextAnalysis.rollingHash(spark, col("text")).as("h"))
    val direct = base
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.orderBy(asc("h"), asc("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
        expr("(cum - n_tokens) div 512").as("bin"))
    val out = ops.TextAnalysis.q52(spark, sf001)
      .select("doc_id", "n_tokens", "bin")
    assert(out.except(direct).isEmpty && direct.except(out).isEmpty)
    // the only SinglePartition exchange may carry bucket TOTALS (an
    // aggregate below it) — never the corpus (the direct form's sin)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
      import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
      val single = ops.TextAnalysis.q52(spark, sf001)
        .queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
        }
      assert(single.nonEmpty, "the offsets window needs one tiny single-partition exchange")
      single.foreach { e =>
        assert(e.child.collectFirst { case a: BaseAggregateExec => a }.isDefined,
          "single-partition exchange must sit above the bucket-totals aggregate")
      }
      // control: the direct global window DOES single-partition raw rows
      val directSingle = direct.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
      }
      assert(directSingle.exists(_.child.collectFirst {
        case a: BaseAggregateExec => a }.isEmpty),
        "control: the naive form should funnel raw rows through one partition")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q48: the mix sampler is pure map-side — no hash-partition exchange at all") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val hashEx = ops.TextAnalysis.q48(spark, sf0001)
        .queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
        }
      // scan → filter → project → (range-exchange for the total sort) only:
      // membership is decided per row from content, so nothing groups,
      // joins, or hash-shuffles at any scale
      assert(hashEx.isEmpty,
        s"q48 must not hash-shuffle, found: ${hashEx.mkString(";")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("partitionBy write + filter read prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part_").toString + "/orders"
    Tables.orders(spark, sf0001)
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("yr") === 1998)
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("yr"), s"expected a partition filter on yr, plan line: $pf")

    val expected = Tables.orders(spark, sf0001)
      .filter(year(col("o_orderdate")) === 1998).count()
    assert(pruned.count() == expected)
    // control: directory layout actually split by year
    val years = new java.io.File(dir).list().count(_.startsWith("yr="))
    assert(years >= 3, s"expected one subdir per year, got $years")
  }

  test("q64: no shuffle of raw rows on the bare lang key") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // control: the oracle's per-group row_number DOES funnel raw rows
      // through #langs reducers
      val base = Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("lang"),
          ops.TextAnalysis.rollingHash(spark, col("text")).as("h"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(asc("h"), asc("doc_id"))
      val naive = base.withColumn("rk", row_number().over(w))
      assert(rawKeyShuffles(naive, "lang").nonEmpty,
        "control: the direct window should shuffle raw rows on lang")
      // histogram-rank selection: raw rows only ever hash-partition on the
      // composite (lang, bkt) — the bare-lang exchanges carry census rows
      // (an aggregate below them), and the classification joins back by
      // broadcast
      assert(rawKeyShuffles(ops.TextAnalysis.q64(spark, sf0001), "lang").isEmpty,
        "q64 must not hash-partition raw rows on the bare lang key")
      // q67's FULL ranking holds the same discipline: raw rows only ever
      // partition on (lang, bkt); bare-lang exchanges carry census rows
      assert(rawKeyShuffles(ops.TextAnalysis.q67(spark, sf0001), "lang").isEmpty,
        "q67 must not hash-partition raw rows on the bare lang key")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("star CC converges in ≤ log₂(n)+2 rounds on a planted component mix") {
    import spark.implicits._
    // the three shapes that stress the round bound differently, together:
    //  - a 4096-node PATH (diameter = n: plain propagation's worst case)
    //  - a 512-node near-clique (diameter 1–2: trivially fast, but its
    //    high-degree minimum stresses the large-star rewiring volume)
    //  - 200 disjoint 16-node rings (many components at once)
    val path = (0L until 4095L).map(i => (i, i + 1))
    val cliqueBase = 100000L
    val clique = (1L until 512L).flatMap(i =>
      Seq((cliqueBase + i, cliqueBase + (i * 7919L) % i), // random-ish back edge
          (cliqueBase + i, cliqueBase)))                  // plus the hub
    val ringBase = 200000L
    val rings = (0L until 200L).flatMap { r =>
      val b = ringBase + r * 16L
      (0L until 16L).map(i => (b + i, b + (i + 1) % 16L))
    }
    val edges = (path ++ clique ++ rings).toDF("doc_a", "doc_b")
    val nNodes = 4096 + 512 + 200 * 16
    val bound = (math.log(nNodes) / math.log(2)).ceil.toInt + 2

    val (labels, roundSecs) =
      ops.Text.dupComponentsStarTimed(edges, "doc_a", "doc_b")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // correctness: each planted component resolves to its minimum id
    assert((0L to 4095L).forall(got(_) == 0L), "path must collapse to 0")
    assert((cliqueBase until cliqueBase + 512L).forall(got(_) == cliqueBase))
    (0L until 200L).foreach { r =>
      val b = ringBase + r * 16L
      assert((b until b + 16L).forall(got(_) == b), s"ring $r broken")
    }
    // the round bound the 100 TB argument rests on — measured, not cited
    assert(roundSecs.nonEmpty && roundSecs.length <= bound,
      s"star CC took ${roundSecs.length} rounds (bound $bound): " +
        roundSecs.map(s => f"$s%.2fs").mkString(", "))
  }
}
