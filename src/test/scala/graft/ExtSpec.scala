package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Catalyst extension demo (SURVEY.md §7.5): the codegen'd EurConvert
  * expression must match the pure-DataFrame kernel exactly, and the
  * identity-conversion rule must fold the EUR-literal case out of the plan.
  */
class ExtSpec extends SparkSuite {
  import graft.ext.{EliminateIdentityConvert, GraftFunctions}

  private def registered(): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      GraftFunctions.identifier, GraftFunctions.info,
      GraftFunctions.eurConvertBuilder _)

  private val schema = StructType(Seq(
    StructField("amount", DecimalType(18, 2)),
    StructField("currency", StringType),
    StructField("rate", DoubleType)))

  private def bd(s: String) = new java.math.BigDecimal(s)

  private val fixtures = Seq(
    Row(bd("10.12"), "EUR", 2.0),       // identity branch
    Row(bd("2.35"), "USD", 1.0),        // rate-1 round-trip
    Row(bd("4.69"), "USD", 2.0),        // 2.345 -> HALF_EVEN -> 2.34
    Row(bd("4.71"), "USD", 2.0),        // 2.355 -> HALF_EVEN -> 2.36
    Row(bd("42.73"), "XXX", null),      // missing rate -> 1.0
    Row(bd("100.00"), "JPY", 163.0))

  test("eur_convert expression == pure-DataFrame kernel, under codegen") {
    registered()
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fixtures, 1), schema)
    val out = df.select(
      call_function("eur_convert",
        col("amount"), col("currency"), col("rate")).as("native"),
      ops.Convert.convertExact(
        col("amount").cast("decimal(28,8)"), col("currency"), col("rate"))
        .as("composed")).collect()
    out.foreach { r =>
      assert(r.getDecimal(0).compareTo(r.getDecimal(1)) == 0,
        s"native=${r.getDecimal(0)} composed=${r.getDecimal(1)}")
    }
    // spot-check the banker's boundary through the native path
    val vals = out.map(_.getDecimal(0).setScale(2).toString)
    assert(vals(2) == "2.34" && vals(3) == "2.36")
  }

  test("results identical with whole-stage codegen disabled (interpreted eval)") {
    registered()
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fixtures, 1), schema)
    def run() = df.select(call_function("eur_convert",
      col("amount"), col("currency"), col("rate"))).collect().map(_.getDecimal(0))
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = run()
      withCodegen.zip(interpreted).foreach { case (a, b) =>
        assert(a.compareTo(b) == 0)
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("vec_dot native kernel is bit-identical to the higher-order fold") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureVecDot(spark)
    val df = (1 to 50).map { i =>
      (Array.tabulate(64)(d => math.sin(i * 64 + d).toFloat),
        Array.tabulate(64)(d => math.cos(i * 64 + d).toFloat))
    }.toDF("a", "b")
    val out = df.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      ops.Vector.dot(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      // bit-identical, not approximately equal: same IEEE operation order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot_d double kernel is bit-identical to the higher-order fold") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureVecDotD(spark)
    val df = (1 to 50).map { i =>
      (Array.tabulate(64)(d => math.sin(i * 64 + d)),
        Array.tabulate(64)(d => math.cos(i * 64 + d)))
    }.toDF("a", "b")
    val out = df.select(
      call_function("vec_dot_d", col("a"), col("b")).as("native"),
      ops.Vector.dot(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dequant_sym kernel is bit-identical to the HOF reconstruction chain") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureDequantSym(spark)
    val rnd = new scala.util.Random(42)
    val vecs: Seq[Array[Float]] =
      (1 to 50).map(_ => Array.fill(64)((rnd.nextFloat() - 0.5f) * 8f)) ++
        Seq(Array.fill(64)(0.0f),       // all-zero: otherwise-arm everywhere
          Array.empty[Float],           // empty: empty out, no NPE
          Array.tabulate(8)(i => (i - 4).toFloat * 0.3f))
    val df = vecs.toDF("embedding")
    val mx = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val hof = df
      .withColumn("mx", mx)
      .withColumn("scale", col("mx") / lit(127.0))
      .select(transform(col("embedding"),
        x => when(col("mx") > 0,
          round(x.cast("double") / col("scale")) * col("scale"))
          .otherwise(lit(0.0))).as("hof"),
        call_function("dequant_sym", col("embedding")).as("native"))
      .collect()
    hof.foreach { r =>
      val h = r.getSeq[Double](0)
      val n = r.getSeq[Double](1)
      assert(h.length == n.length)
      h.zip(n).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b))
      }
    }
  }

  test("quant8_sym kernel matches the HOF encode chain bit/string-exactly") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureQuant8Sym(spark)
    val rnd = new scala.util.Random(7)
    val vecs: Seq[Array[Float]] =
      (1 to 50).map(_ => Array.fill(64)((rnd.nextFloat() - 0.5f) * 8f)) ++
        Seq(Array.fill(64)(0.0f), Array.empty[Float],
          Array.tabulate(8)(i => (i - 4).toFloat * 0.3f))
    val df = vecs.toDF("embedding")
    val mx = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val rows = df
      .withColumn("mx", mx)
      .withColumn("q", call_function("quant8_sym", col("embedding")))
      .select(
        (col("mx") / lit(127.0)).as("hof_scale"),
        concat_ws(",", transform(col("embedding"),
          x => when(col("mx") > 0,
            round(x.cast("double") / (col("mx") / lit(127.0))).cast("int"))
            .otherwise(lit(0)).cast("string"))).as("hof_q8"),
        col("q.scale").as("n_scale"), col("q.q8").as("n_q8"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(2))
      if (!r.isNullAt(0)) {
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)))
      }
      assert(r.getString(1) == r.getString(3))
    }
  }

  test("pq kernels == the HOF reference forms: codes, norms, ADC scores " +
      "and bucket ranks bit/value-identical") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensurePqEncode(spark)
    graft.ext.GraftFunctions.ensurePqAdc(spark)
    graft.ext.GraftFunctions.ensureBucketRank(spark)
    val (m, k, sublen) = (4, 8, 2)
    val rnd = new scala.util.Random(7)
    val flat = Array.fill(m * k * sublen)(rnd.nextDouble() * 2 - 1)
    val df = (1 to 40).map(i =>
      Tuple1(Array.tabulate(m * sublen)(d => math.sin(i * 8 + d))))
      .toDF("v")
    val enc = df.select(
      call_function("pq_encode", col("v"), lit(flat), lit(m), lit(k),
        lit(sublen)).as("n"),
      ops.VectorPq.hofEncodeExpr(col("v"), flat, m, k, sublen).as("h"))
    enc.collect().foreach { r =>
      val (nr, hof) = (r.getStruct(0), r.getSeq[Int](1))
      assert(nr.getSeq[Int](0) == hof, "codes diverge from the HOF form")
    }
    // kernel c_norm == sqrt(Σ recon²) over the HOF reconstruction
    val norms = df.select(
      col("v"),
      call_function("pq_encode", col("v"), lit(flat), lit(m), lit(k),
        lit(sublen)).as("n"))
      .select(col("n.c_norm").as("kn"),
        sqrt(aggregate(zip_with(
          ops.VectorPq.hofReconExpr(col("n.codes"), flat, k, sublen),
          ops.VectorPq.hofReconExpr(col("n.codes"), flat, k, sublen),
          (a, b) => a * b), lit(0.0), (s, x) => s + x)).as("hn"))
      .collect()
    norms.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
      "kernel norm diverges from the HOF reconstruction norm"))
    // the RESIDUAL kernel: codes == the HOF argmin over (v − base);
    // c_norm == sqrt(Σ (base + recon)²) — the full-reconstruction norm
    graft.ext.GraftFunctions.ensurePqEncodeRes(spark)
    val base = Array.tabulate(m * sublen)(d => math.cos(d) * 0.5)
    val res = df.select(
      col("v"),
      call_function("pq_encode_res",
        zip_with(col("v"), lit(base), (a, b) => a - b), lit(base),
        lit(flat), lit(m), lit(k), lit(sublen)).as("n"))
      .select(col("n.codes").as("kc"), col("n.c_norm").as("kn"),
        ops.VectorPq.hofEncodeExpr(
          zip_with(col("v"), lit(base), (a, b) => a - b),
          flat, m, k, sublen).as("hc"),
        sqrt(aggregate(transform(zip_with(lit(base),
          ops.VectorPq.hofReconExpr(col("n.codes"), flat, k, sublen),
          (b, r) => b + r), x => x * x), lit(0.0),
          (s, x) => s + x)).as("hn"))
      .collect()
    res.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](2),
        "residual codes diverge from the HOF form")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        "residual kernel norm diverges from base + HOF reconstruction")
    }
    // ADC == the aggregate-over-lookups fold, bit for bit
    val lut = Array.fill(m * k)(rnd.nextDouble())
    val adc = df.select(
      call_function("pq_encode", col("v"), lit(flat), lit(m), lit(k),
        lit(sublen)).getField("codes").as("codes"))
      .select(
        call_function("pq_adc", col("codes"), lit(lut), lit(k)).as("n"),
        aggregate(transform(col("codes"),
          (x, i) => element_at(lit(lut), i * k + x + 1)),
          lit(0.0), (s, v) => s + v).as("h"))
      .collect()
    adc.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    // bucket_rank == the strictly-greater count, repeats included
    val bounds = Array(1.0, 2.0, 2.0, 5.0, 5.0, 9.0)
    val xs = Seq(0.0, 1.0, 1.5, 2.0, 2.1, 5.0, 9.0, 10.0).toDF("x")
    val br = xs.select(
      call_function("bucket_rank", col("x"), lit(bounds)).as("n"),
      aggregate(lit(bounds), lit(0),
        (acc, b) => acc + when(col("x") > b, 1).otherwise(0)).as("h"))
      .collect()
    br.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"bucket_rank diverges: ${r.getInt(0)} vs ${r.getInt(1)}"))
  }

  test("vec_dot yields NULL on malformed embeddings, exactly like the fold") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureVecDot(spark)
    // length mismatch: a plausible-but-wrong truncated score would be the
    // silent-corruption failure mode; the contract is NULL, as the
    // zip_with/aggregate fold produces
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f)), // mismatch -> NULL
      (Array(1f, 2f), Array(3f, 4f)))     // control  -> 11.0
      .toDF("a", "b")
    val out = df.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      ops.Vector.dot(col("a"), col("b")).as("hof")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).getDouble(0) == 11.0 && out(1).getDouble(1) == 11.0)
    // null element -> NULL through both the interpreted and codegen paths
    val r = spark.sql(
      """SELECT vec_dot(cast(array(1.0, null) as array<float>),
        |               cast(array(1.0, 2.0) as array<float>)) AS s""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("simhash_sig native kernel == the 64-filter HOF formulation, per bit") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureSimHashSig(spark)
    val rows = (1 to 40).map(i =>
      Array.tabulate(1 + i % 23)(j => scala.util.hashing.byteswap64(i * 131 + j)))
    val df = (rows :+ Array.empty[Long]).toDF("hs") // empty = all-ones, both
    val out = df.select(
      call_function("simhash_sig", col("hs")).as("native"),
      ops.Text.hofSimhash(col("hs")).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} hof=${r.getLong(1)}"))
    // a null ELEMENT (reachable via the public SQL cast) yields NULL, not
    // an NPE or a storage-dependent wrong signature
    val nul = spark.sql(
      "SELECT simhash_sig(cast(array(1, null) as array<bigint>)) AS s")
      .collect()(0)
    assert(nul.isNullAt(0))
  }

  test("simhash_tables native kernel == the Column splice formulation, per key") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureSimHashTables(spark)
    // adversarial signatures: all-ones, zero, sign bit, byte-boundary
    // patterns, plus pseudo-random longs — a splice/shift mismatch at the
    // j=0/j=7 wrap edges or in the packed-key layout shows up key-for-key
    val sigs = Seq(0L, -1L, Long.MinValue, Long.MaxValue,
      0xFF00FF00FF00FF00L, 0x00FF00FF00FF00FFL, 0x8000000000000001L) ++
      (1 to 40).map(i => scala.util.hashing.byteswap64(i * 2654435761L))
    val out = sigs.toDF("sig").select(
      call_function("simhash_tables", col("sig")).as("native"),
      ops.Text.hofWideKeys(col("sig")).as("hof")).collect()
    out.foreach { r =>
      val native = r.getSeq[Long](0)
      val hof = r.getSeq[Long](1)
      assert(native == hof, s"native=$native hof=$hof")
    }
  }

  test("minhash_bands native kernel == the HOF band signatures, per band") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureMinHashBands(spark)
    // real shingle-ish strings plus edge rows: empty array (every minhash
    // "null" -> band sig folds nothing past its seed) and a null element
    // (hashes as the bare seed, since xxhash64 skips null children)
    val rows: Seq[Seq[String]] = (1 to 30).map(i =>
      (0 to i % 7).map(j => s"w${i * 13 + j} w${i * 13 + j + 1}")) ++
      Seq(Seq.empty[String], Seq("alpha beta", null, "beta gamma"))
    val df = rows.toDF("sh")
    val out = df.select(
      call_function("minhash_bands", col("sh"), lit(32), lit(8)).as("native"),
      ops.Text.hofBandSigs(col("sh"), 32, 8).as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"native=${r.getSeq[Long](0)} hof=${r.getSeq[Long](1)}")
    }
  }

  test("rolling_hash native kernel == the per-character HOF fold") {
    import spark.implicits._
    graft.ext.GraftFunctions.ensureRollingHash(spark)
    // ordinary text plus the quirk cases the kernel must reproduce exactly:
    // empty string (hash 0), line terminators (Java-regex '.' skips them),
    // multi-byte BMP text, and a supplementary code point (ascii() yields
    // the HIGH SURROGATE unit of the matched character, not the code point)
    val rows = Seq(
      "the quick brown fox", "a", "", "line one\nline two\r\nthree",
      "uv w x", "café über straße",
      "你好 world", "emoji 😀 tail", "  double  spaces  ",
      "punct: 1,2;3!") ++ (1 to 30).map(i => s"doc $i body " * (i % 5 + 1))
    val out = rows.toDF("t").select(
      call_function("rolling_hash", col("t")).as("native"),
      ops.TextAnalysis.hofRollingHash(col("t")).as("hof")).collect()
    out.zip(rows).foreach { case (r, t) =>
      assert(r.getLong(0) == r.getLong(1),
        s"native=${r.getLong(0)} hof=${r.getLong(1)} for '$t'")
    }
  }

  test("optimizer rule folds the EUR-literal conversion to a cast") {
    registered()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ EliminateIdentityConvert
    try {
      val df = spark.createDataFrame(
          spark.sparkContext.parallelize(fixtures, 1), schema)
        .select(call_function("eur_convert",
          col("amount"), lit("EUR"), col("rate")).as("out"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("eur_convert"),
        s"rule should have folded the conversion:\n$optimized")
      // and the fold preserves values: identity on every amount
      df.collect().zip(fixtures).foreach { case (r, f) =>
        assert(r.getDecimal(0).compareTo(f.getDecimal(0)) == 0)
      }
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == EliminateIdentityConvert)
    }
  }

  test("fold preserves NULL-propagation for a directly-built nullable rate") {
    // the registered builder coalesces rate to non-null; a hand-built
    // EurConvert keeps a nullable rate child, and EurConvert propagates
    // that NULL — the fold must too (If(IsNull(rate), null, cast)), not
    // silently turn NULL results into pass-through amounts
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
    val rawId = FunctionIdentifier("eur_convert_raw")
    if (!spark.sessionState.functionRegistry.functionExists(rawId)) {
      spark.sessionState.functionRegistry.registerFunction(
        rawId,
        new ExpressionInfo(classOf[graft.ext.EurConvert].getName, "eur_convert_raw"),
        (args: Seq[Expression]) => graft.ext.EurConvert(
          Cast(args(0), DecimalType(28, 8)), args(1),
          Cast(args(2), DoubleType)))
    }
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ EliminateIdentityConvert
    try {
      val df = spark.createDataFrame(
          spark.sparkContext.parallelize(fixtures, 1), schema)
        .select(col("rate"), call_function("eur_convert_raw",
          col("amount"), lit("EUR"), col("rate")).as("out"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("eur_convert"),
        s"rule should still fold the nullable-rate case:\n$optimized")
      df.collect().zip(fixtures).foreach { case (r, f) =>
        if (r.isNullAt(0)) assert(r.isNullAt(1),
          "NULL rate must stay NULL after the fold")
        else assert(r.getDecimal(1).compareTo(f.getDecimal(0)) == 0)
      }
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == EliminateIdentityConvert)
    }
  }

  test("cuts_bucket == the HOF aggregate fold, ties/extremes/NaN included") {
    import org.apache.spark.sql.functions.{aggregate, call_function, col, lit,
      typedLit, when}
    graft.ext.GraftFunctions.ensureCutsBucket(spark)
    val cuts = Array(1.0, 2.0, 2.0, 3.5, 10.0).distinct.sorted
    // values straddling every cut, exact ties, both extremes, and NaN
    // (Spark ordering: NaN > everything → top bucket)
    val vals = Seq(0.0, 1.0, 1.5, 2.0, 2.1, 3.5, 9.99, 10.0, 11.0,
      Double.MinValue, Double.MaxValue, Double.NaN)
    import spark.implicits._
    val df = vals.toDF("v")
    val out = df.select(
      call_function("cuts_bucket", col("v"), typedLit(cuts)).as("k"),
      aggregate(typedLit(cuts), lit(0),
        (acc, c) => acc + when(col("v") >= c, 1).otherwise(0)).as("f"))
      .collect()
    out.zip(vals).foreach { case (r, v) =>
      assert(r.getInt(0) == r.getInt(1),
        s"kernel ${r.getInt(0)} != fold ${r.getInt(1)} at v=$v")
    }
  }

  test("cuts_bucket rejects unsorted and null-bearing cut arrays loudly") {
    // ADVICE r11: cuts_bucket is a session-registered SQL function, so an
    // arbitrary caller can hand it an unsorted or null-bearing array — a
    // binary search over one returns silently wrong buckets, and
    // ArrayData.getDouble on a null slot reads undefined memory. The
    // kernel must throw a named error, not guess.
    import org.apache.spark.sql.functions.{call_function, col, typedLit}
    graft.ext.GraftFunctions.ensureCutsBucket(spark)
    import spark.implicits._
    val df = Seq(1.0, 5.0).toDF("v")
    val unsorted = intercept[Exception] {
      df.select(call_function("cuts_bucket", col("v"),
        typedLit(Array(3.0, 1.0, 2.0)))).collect()
    }
    assert(unsorted.getMessage.contains("not ascending-sorted") ||
      Option(unsorted.getCause).exists(_.getMessage.contains("not ascending-sorted")),
      s"wrong error: ${unsorted.getMessage}")
    val withNull = intercept[Exception] {
      df.selectExpr("cuts_bucket(v, array(1.0d, CAST(NULL AS DOUBLE), 3.0d))")
        .collect()
    }
    assert(withNull.getMessage.contains("NULL at index") ||
      Option(withNull.getCause).exists(_.getMessage.contains("NULL at index")),
      s"wrong error: ${withNull.getMessage}")
    val nan = intercept[Exception] {
      df.select(call_function("cuts_bucket", col("v"),
        typedLit(Array(1.0, Double.NaN)))).collect()
    }
    assert(nan.getMessage.contains("NaN-free") ||
      Option(nan.getCause).exists(_.getMessage.contains("NaN-free")),
      s"wrong error: ${nan.getMessage}")
    // ties inside the cuts stay legal (quantile cut arrays repeat values
    // pre-distinct) — must not throw
    df.select(call_function("cuts_bucket", col("v"),
      typedLit(Array(1.0, 1.0, 2.0)))).collect()
  }

  test("every ext expression codegen-compiles — no silent interpreter fallback") {
    // Round-9 review found Quant8Sym/DequantSym emitting a call to a
    // companion helper named `eval`: scalac suppresses the static forwarder
    // when the class inherits a member of that name (Expression.eval), so
    // Janino failed at runtime and Spark silently fell back to interpreted
    // mode — answers right, whole-stage fusion lost. This guard compiles
    // EVERY ext expression through GenerateUnsafeProjection, which has no
    // fallback layer: a suppressed forwarder (or any emit typo) fails the
    // build here instead of warning in a log nobody reads. It then checks
    // the COMPILED output equals the interpreted eval on a sample row, so
    // an emit that compiles but calls the wrong helper also fails.
    import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression => CExpr}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.ext._

    def ref(i: Int, dt: DataType) = BoundReference(i, dt, nullable = true)
    val fa = ArrayType(FloatType)
    val da = ArrayType(DoubleType)
    val la = ArrayType(LongType)
    val sa = ArrayType(StringType)
    def arr(vs: Any*) = new GenericArrayData(vs.toArray)
    def utf(s: String) = UTF8String.fromString(s)

    val cases: Seq[(String, CExpr, InternalRow)] = Seq(
      ("eur_convert",
        EurConvert(ref(0, DecimalType(28, 8)), ref(1, StringType), ref(2, DoubleType)),
        InternalRow(org.apache.spark.sql.types.Decimal("10.12345678"), utf("USD"), 2.0)),
      ("vec_dot", VecDot(ref(0, fa), ref(1, fa)),
        InternalRow(arr(1.0f, 2.0f, 3.0f), arr(0.5f, -1.0f, 2.0f))),
      ("vec_dot_d", VecDotD(ref(0, da), ref(1, da)),
        InternalRow(arr(1.0, 2.0, 3.0), arr(0.5, -1.0, 2.0))),
      ("quant8_sym", Quant8Sym(ref(0, fa)),
        InternalRow(arr(0.25f, -1.5f, 0.0f, 0.75f))),
      ("dequant_sym", DequantSym(ref(0, fa)),
        InternalRow(arr(0.25f, -1.5f, 0.0f, 0.75f))),
      ("simhash_sig", SimHashSig(ref(0, la)),
        InternalRow(arr(0x1234L, 0x8421L, -7L))),
      ("simhash_tables", SimHashTables(ref(0, LongType)),
        InternalRow(java.lang.Long.valueOf(0xDEADBEEFCAFE1234L))),
      ("simhash_bucket", SimHashBucket(ref(0, da), 4, 12),
        InternalRow(arr(0.1, -0.2, 0.3, -0.4))),
      ("rolling_hash", RollingHash(ref(0, StringType)),
        InternalRow(utf("the quick brown fox"))),
      ("minhash_bands", MinHashBands(ref(0, sa), 32, 8),
        InternalRow(arr(utf("sh a"), utf("sh b"), utf("sh c")))),
      ("word_ngrams", WordNgrams(ref(0, StringType), 3, true),
        InternalRow(utf("one two three four five"))),
      ("cuts_bucket", CutsBucket(ref(0, DoubleType), ref(1, da)),
        InternalRow(java.lang.Double.valueOf(2.5), arr(1.0, 2.0, 3.0))),
      ("pq_encode", PqEncode(ref(0, da),
        Array(0.0, 1.0, 2.0, 3.0, 10.0, 11.0, 12.0, 13.0), 2, 2, 2),
        InternalRow(arr(2.1, 2.9, 11.2, 13.4))),
      ("pq_encode_res", PqEncodeRes(ref(0, da), ref(1, da),
        Array(0.0, 1.0, 2.0, 3.0, 10.0, 11.0, 12.0, 13.0), 2, 2, 2),
        InternalRow(arr(2.1, 2.9, 11.2, 13.4), arr(0.5, 0.5, 0.5, 0.5))),
      ("pq_adc", PqAdc(ref(0, ArrayType(IntegerType)), ref(1, da), 2),
        InternalRow(arr(1, 0), arr(0.5, -1.0, 2.0, 4.0))),
      ("bucket_rank", BucketRank(ref(0, DoubleType),
        Array(1.0, 2.0, 2.0, 5.0)),
        InternalRow(java.lang.Double.valueOf(2.0))),
      ("theta_estimate", ThetaEstimate(ref(0, BinaryType)), {
        val sk = org.apache.datasketches.theta.UpdateSketch.builder().build()
        (1L to 10L).foreach(sk.update)
        InternalRow(sk.compact().toByteArray)
      }))

    cases.foreach { case (name, e, row) =>
      val proj =
        try GenerateUnsafeProjection.generate(Seq(e))
        catch {
          case t: Throwable =>
            fail(s"$name failed codegen compile (silent-fallback regression): $t")
        }
      val conv = CatalystTypeConverters.createToScalaConverter(e.dataType)
      val compiled = conv(proj(row).get(0, e.dataType))
      val interpreted = conv(e.eval(row))
      assert(compiled == interpreted,
        s"$name compiled/interpreted divergence: $compiled vs $interpreted")
    }
  }

  test("theta family through the SQL surface: build, store, set algebra, estimate") {
    graft.ext.GraftFunctions.ensureThetaDistinct(spark)
    val spark2 = spark
    import spark2.implicits._
    (0L until 1000L).toDF("k").createOrReplaceTempView("theta_t")
    // inline distinct, exact regime (lgK 14, k = 16384 >> 1000)
    assert(spark.sql("SELECT theta_distinct(k, 14) FROM theta_t")
      .collect()(0).getLong(0) == 1000L)
    // stored sketches: [0, 600) and [400, 1000) — every set-op count is
    // an exact small integer in this regime
    val row = spark.sql(
      """WITH s AS (
        |  SELECT theta_sketch_agg(CASE WHEN k < 600 THEN k END, 14) AS a,
        |         theta_sketch_agg(CASE WHEN k >= 400 THEN k END, 14) AS b
        |  FROM theta_t),
        |u AS (
        |  SELECT theta_union_agg(sk, 14) AS all_sk FROM (
        |    SELECT theta_sketch_agg(k, 14) AS sk FROM theta_t GROUP BY k % 7))
        |SELECT theta_estimate(a) AS na, theta_estimate(b) AS nb,
        |       theta_estimate(theta_intersect(a, b)) AS ni,
        |       theta_estimate(theta_union2(a, b)) AS nu,
        |       theta_estimate(theta_anotb(a, b)) AS nab,
        |       theta_estimate(theta_anotb(b, a)) AS nba,
        |       theta_estimate(all_sk) AS nall
        |FROM s, u""".stripMargin).collect()(0)
    assert((0 until 7).map(row.getLong) ==
      Seq(600L, 600L, 200L, 1000L, 400L, 400L, 1000L))
    // misuse fails loudly with the function's own message, never an NPE
    val err = intercept[Exception] {
      spark.sql("SELECT theta_distinct(k, CAST(NULL AS INT)) FROM theta_t")
        .collect()
    }
    assert(err.getMessage.contains("lgK must not be NULL"),
      s"wrong error: ${err.getMessage}")
  }
}
