package graft

import java.nio.file.Files

/** Source/sink format fidelity: orders survive CSV and JSON round-trips
  * with explicit schemas (timestamps, decimals, nullable marker columns) —
  * the interchange formats a pipeline meets beside parquet and JDBC.
  */
class FormatsSpec extends SparkSuite {

  /** Writes one parquet file under `dir` with the exact logical types of
    * `schema` — the only way to produce encodings Spark itself cannot
    * write (TIMESTAMP(NANOS)). Row values are (columnName -> value) in
    * schema order; Long/String/Double/Int/Boolean supported.
    */
  private def writeNanosParquet(
      dir: String,
      schema: org.apache.parquet.schema.MessageType,
      rows: Seq[Seq[(String, Any)]]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val gf = new SimpleGroupFactory(schema)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/part-0.parquet"))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withType(schema).build()
    rows.foreach { r =>
      val g = gf.newGroup()
      r.foreach {
        case (n, v: Long)    => g.add(n, v)
        case (n, v: String)  => g.add(n, v)
        case (n, v: Double)  => g.add(n, v)
        case (n, v: Int)     => g.add(n, v)
        case (n, v: Boolean) => g.add(n, v)
        case (n, v) => fail(s"unsupported test value $n=$v")
      }
      w.write(g)
    }
    w.close()
  }

  test("orders round-trip csv and json losslessly under an explicit schema") {
    val root = Files.createTempDirectory("graft_fmt_").toString
    val orders = gen.OrderGen.orders(spark, 60, seed = 29)
    val schema = orders.schema

    orders.write.option("header", "true").csv(s"$root/csv")
    val fromCsv = spark.read.option("header", "true")
      .schema(schema).csv(s"$root/csv")
    // file-source readers force nullable=true; names and types must hold
    assert(fromCsv.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    assert(fromCsv.except(orders).isEmpty && orders.except(fromCsv).isEmpty)

    orders.write.json(s"$root/json")
    val fromJson = spark.read.schema(schema).json(s"$root/json")
    assert(fromJson.except(orders).isEmpty && orders.except(fromJson).isEmpty)
  }

  test("Tables.events adapts to ns/µs/UTC-µs encodings, flag or no flag") {
    // The driver's events fixture has shipped as TIMESTAMP(NANOS) (rounds
    // 1–7) and TIMESTAMP(MICROS, adjustedToUTC=false) (round 8+). Never
    // assume the shared testdata's encoding: write our OWN tiny fixture in
    // every encoding a lake can hold and assert Tables.events reads all of
    // them to identical TimestampType values, with and without the
    // spark.sql.legacy.parquet.nanosAsLong session flag.
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.TimestampType
    val root = Files.createTempDirectory("graft_evt_").toString
    val micros: Seq[Long] =
      (0 until 7).map(i => 1704067200000000L + i * 987654321L) // 2024-01-01+
    def rows(i: Int) = (i.toLong, micros(i), (i % 3).toLong, s"t$i", i * 1.5, "{}")

    // --- µs NTZ fixture (the round-8 driver encoding) ------------------
    import spark.implicits._
    val base = micros.indices.map(rows).toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props")
    base.withColumn("ts", expr("timestamp_micros(ts)").cast("timestamp_ntz"))
      .coalesce(1).write.parquet(s"$root/ntz/events.parquet")

    // --- µs adjustedToUTC=true fixture ---------------------------------
    val prevOut = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      base.withColumn("ts", expr("timestamp_micros(ts)"))
        .coalesce(1).write.parquet(s"$root/utc/events.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevOut)

    // --- TIMESTAMP(NANOS) fixture (rounds 1–7), via parquet-hadoop -----
    // Spark cannot write nanos; drive the example writer directly. A +437ns
    // remainder checks the ns→µs floor (DuckDB narrows the same way).
    {
      import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      val schema = Types.buildMessage()
        .required(INT64).named("event_id")
        .required(INT64).as(LogicalTypeAnnotation.timestampType(
          false, LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
        .required(INT64).named("user_id")
        .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
        .required(DOUBLE).named("value")
        .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
        .named("events")
      writeNanosParquet(s"$root/ns/events.parquet", schema,
        micros.indices.map { i =>
          val (id, us, uid, et, v, p) = rows(i)
          Seq("event_id" -> id, "ts" -> (us * 1000L + 437L), "user_id" -> uid,
            "event_type" -> et, "value" -> v, "props" -> p)
        })
    }

    val noFlag = spark.newSession()
    noFlag.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    // control: the failure mode the adaptive reader guards — flag-off
    // INFERENCE on a nanos file is illegal (the int64 read itself is not)
    intercept[Exception] { noFlag.read.parquet(s"$root/ns/events.parquet") }

    for {
      enc <- Seq("ntz", "utc", "ns")
      sess <- Seq(spark /* nanosAsLong=true */, noFlag)
    } {
      val df = Tables.events(sess, s"$root/$enc")
      assert(df.schema("ts").dataType == TimestampType, s"$enc type")
      val got = df.select(col("event_id"), expr("unix_micros(ts)"))
        .orderBy("event_id").collect().map(_.getLong(1)).toSeq
      assert(got == micros, s"$enc values (flag=${sess eq spark})")
    }
  }

  test("Tables.orders adapts to ntz/µs/ms/ns o_orderdate encodings") {
    // the same discipline for the next table the driver may regenerate:
    // orders across FOUR temporal encodings, all normalized by the
    // adaptive read to TimestampType with identical values
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.TimestampType
    val root = Files.createTempDirectory("graft_ord_").toString
    val micros: Seq[Long] =
      (0 until 5).map(i => 1735689600000000L + i * 86400000000L) // 2025-01-01+, day-aligned (ms-safe)
    import spark.implicits._
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, i.toLong % 3, "O", 100.0 + i, us, s"$i-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

    base.withColumn("o_orderdate",
        expr("timestamp_micros(o_orderdate)").cast("timestamp_ntz"))
      .coalesce(1).write.parquet(s"$root/ntz/orders.parquet")
    val prevOut = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      base.withColumn("o_orderdate", expr("timestamp_micros(o_orderdate)"))
        .coalesce(1).write.parquet(s"$root/us/orders.parquet")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      base.withColumn("o_orderdate", expr("timestamp_micros(o_orderdate)"))
        .coalesce(1).write.parquet(s"$root/ms/orders.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevOut)
    locally {
      import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      val schema = Types.buildMessage()
        .required(INT64).named("o_orderkey")
        .required(INT64).named("o_custkey")
        .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("o_orderstatus")
        .required(DOUBLE).named("o_totalprice")
        .required(INT64).as(LogicalTypeAnnotation.timestampType(
          false, LogicalTypeAnnotation.TimeUnit.NANOS)).named("o_orderdate")
        .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("o_orderpriority")
        .named("orders")
      writeNanosParquet(s"$root/ns/orders.parquet", schema,
        micros.zipWithIndex.map { case (us, i) =>
          Seq("o_orderkey" -> i.toLong, "o_custkey" -> (i.toLong % 3),
            "o_orderstatus" -> "O", "o_totalprice" -> (100.0 + i),
            "o_orderdate" -> (us * 1000L + 250L), "o_orderpriority" -> s"$i-URGENT")
        })
    }

    val noFlag = spark.newSession()
    noFlag.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    for {
      enc <- Seq("ntz", "us", "ms", "ns")
      sess <- Seq(spark, noFlag)
    } {
      val df = Tables.orders(sess, s"$root/$enc")
      assert(df.schema("o_orderdate").dataType == TimestampType, s"$enc type")
      val got = df.select(col("o_orderkey"), expr("unix_micros(o_orderdate)"),
          col("o_totalprice"))
        .orderBy("o_orderkey").collect()
      assert(got.map(_.getLong(1)).toSeq == micros, s"$enc dates")
      assert(got.map(_.getDouble(2)).toSeq == micros.indices.map(100.0 + _),
        s"$enc prices survive the explicit-schema path")
    }
  }

  test("readEvolved unions generations by name, null-filling and re-encoding") {
    // the round-8 driver event in one test: generation 1 is nanos-encoded
    // AND lacks a column that generation 2 (µs-NTZ) adds — the evolved
    // read must normalize both encodings to TimestampType, align columns
    // by NAME, and null-fill the missing one
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.TimestampType
    val root = Files.createTempDirectory("graft_evo_").toString
    val us1 = 1704067200000000L
    val us2 = 1704153600000000L
    locally {
      import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      val v1 = Types.buildMessage()
        .required(INT64).named("o_orderkey")
        .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("o_orderstatus")
        .required(INT64).as(LogicalTypeAnnotation.timestampType(
          false, LogicalTypeAnnotation.TimeUnit.NANOS)).named("o_orderdate")
        .named("orders")
      writeNanosParquet(s"$root/v1/orders.parquet", v1, Seq(Seq(
        "o_orderkey" -> 1L, "o_orderstatus" -> "O",
        "o_orderdate" -> (us1 * 1000L + 9L))))
    }
    import spark.implicits._
    Seq((2L, "F", us2, "1-URGENT"))
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate",
        expr("timestamp_micros(o_orderdate)").cast("timestamp_ntz"))
      .coalesce(1).write.parquet(s"$root/v2/orders.parquet")

    val df = sources.AdaptiveParquet.readEvolved(spark,
      s"$root/v1/orders.parquet", s"$root/v2/orders.parquet")
    assert(df.schema("o_orderdate").dataType == TimestampType)
    val rows = df.select(col("o_orderkey"), expr("unix_micros(o_orderdate)"),
        col("o_orderpriority"))
      .orderBy("o_orderkey").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == us1 && rows(0).isNullAt(2),
      "generation-1 rows null-fill the added column, ns floored to µs")
    assert(rows(1).getLong(1) == us2 && rows(1).getString(2) == "1-URGENT")
  }

  test("footer-probe memo re-probes a fixture regenerated at the same path") {
    // ADVICE r9: the memo was keyed by path string alone, so regenerating
    // a fixture in place with a DIFFERENT temporal encoding (the exact
    // driver-regeneration scenario AdaptiveParquet exists for) reused the
    // stale profile. The key now includes the probed file's length+mtime.
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.TimestampType
    val root = Files.createTempDirectory("graft_regen_").toString
    val dir = s"$root/t.parquet"
    val us = 1704067200000000L

    // generation A: Spark-native µs-NTZ — profiles as "native read"
    import spark.implicits._
    Seq((1L, us)).toDF("id", "ts")
      .withColumn("ts", expr("timestamp_micros(ts)").cast("timestamp_ntz"))
      .coalesce(1).write.parquet(dir)
    val a = sources.AdaptiveParquet.read(spark, dir)
    assert(a.schema("ts").dataType == TimestampType)
    assert(a.select(expr("unix_micros(ts)")).head().getLong(0) == us)

    // regenerate IN PLACE as TIMESTAMP(NANOS): a stale "native" profile
    // would read raw int64 ns (values 1000x off) instead of re-probing
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete()
    }
    rmrf(new java.io.File(dir))
    locally {
      import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      val schema = Types.buildMessage()
        .required(INT64).named("id")
        .required(INT64).as(LogicalTypeAnnotation.timestampType(
          false, LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
        .named("t")
      writeNanosParquet(dir, schema,
        Seq(Seq("id" -> 2L, "ts" -> (us * 1000L + 437L))))
    }
    val b = sources.AdaptiveParquet.read(spark, dir)
    assert(b.schema("ts").dataType == TimestampType,
      "stale memo: regenerated nanos fixture not re-probed")
    assert(b.select(expr("unix_micros(ts)")).head().getLong(0) == us,
      "regenerated fixture must re-probe and floor ns to µs")
  }
}
