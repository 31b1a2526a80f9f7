package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** qh01–qh22: the 22 canonical TPC-H queries (public TPC-H v3 spec,
  * adapted to the driver fixtures) as oracle-gated COMPOSITION queries.
  *
  * Every individual operator these queries need is already a declared,
  * oracle-green query (multiway joins q04, semi/anti q06/q07, correlated
  * and scalar subqueries q39, grouped agg q08, top-k q13, decimal
  * discipline D2/D7). What qh01–qh22 prove is that the operators COMPOSE
  * under Catalyst — decorrelation of the correlated aggregates
  * (qh02/qh17/qh20/qh21/qh22), multi-join ordering over 6–8 relations
  * (qh05/qh07/qh08/qh09), null-aware anti join (qh16's NOT IN), and
  * left-outer + re-aggregation (qh13) — with the same DuckDB-hash
  * exactness gate as every other declared query (VERDICT r11 next-round
  * item #1).
  *
  * == Fixture adaptation (documented substitutions, all deterministic) ==
  * The driver fixtures (FIXTURES.md §B) are TPC-H-shaped but omit some
  * columns and the `partsupp` table. Rather than weaken the queries, the
  * missing surface is DERIVED by pure integer/string arithmetic over the
  * columns that do exist — the SAME SQL text runs in Spark (as temp
  * views) and in the DuckDB oracle (as WITH-prelude CTEs), so the
  * derivation cannot drift between engines:
  *  - `partsupp` := DISTINCT (l_partkey, l_suppkey) from lineitem
  *    ("suppliers that ever supplied the part"), with ps_availqty /
  *    ps_supplycost as key-hash formulas (exact DECIMAL(18,2) cents).
  *  - lineitem: l_commitdate / l_receiptdate as key-hashed day offsets
  *    from l_shipdate; l_shipmode / l_shipinstruct as key-hashed picks
  *    of the spec's value lists.
  *  - orders: o_comment (so qh13's NOT LIKE '%special%requests%' stays a
  *    real LIKE filter), o_shippriority := 0 (spec constant).
  *  - customer/supplier: c_phone with a real 2-digit country code block
  *    (qh22 substrings it), addresses/comments for projection parity;
  *    s_comment seeds qh16's '%Customer%Complaints%' anti-filter.
  *  - part: p_mfgr, p_container from the spec's value lists.
  * Parameter substitutions for fixture value domains: date windows shift
  * to the fixtures' 1995–2001 range; nation literals are the fixtures'
  * NATION_k names; p_type is single-token (ECONOMY/…/PROMO — qh14's
  * 'PROMO' prefix exists verbatim); qh22's "never placed an order" is
  * "no order since 2000-06-01" because every fixture customer has SOME
  * order (the anti-join shape is unchanged, the result non-degenerate).
  *
  * == Determinism (SURVEY §2.2) ==
  * Money math casts doubles to DECIMAL(12,2)/(4,2) before multiplying
  * (D2; products stay ≤ decimal(38,x) so neither engine saturates
  * precision), aggregates exit via CAST(… AS DOUBLE) (D7), averages are
  * decimal-sum→double ÷ count (never native avg over doubles — except
  * qh17/qh20's correlated avg/sum over l_quantity, which is exact
  * because fixture quantities are integral doubles and integer-valued
  * double sums are order-independent). Every multi-row result ends in a
  * total ORDER BY (D1).
  *
  * == Scale (100 TB) ==
  * All table references are views over the parquet scans — Catalyst
  * inlines them, so base-column predicates (shipdate windows, brand,
  * segment) still push into the scan, and derived-column predicates
  * (shipmode, container) evaluate map-side on the scan output; dims
  * broadcast under the threshold/AQE exactly as in q04. The one derived
  * SHUFFLE is partsupp's DISTINCT pair build (qh02/09/11/16/20): one
  * hash aggregate over (l_partkey, l_suppkey) — at warehouse scale
  * partsupp is a real table (bucketed on ps_partkey) and the derivation
  * disappears; its cost here is visible honestly in the bench numbers.
  * Correlated subqueries decorrelate to aggregate+join (no per-row
  * re-execution): verified by TpchSpec's no-nested-loop plan assertions
  * on qh02/qh17/qh20.
  */
object Tpch {

  /** Derived-table definitions, shared VERBATIM between the Spark views
    * and the DuckDB oracle prelude (the whole point: one text, two
    * engines, zero drift).
    */
  private[graft] val derivations: Seq[(String, String)] = Seq(
    "ord_x" ->
      """SELECT o.*,
        |  CASE WHEN o_orderkey % 19 = 0 THEN 'handle with special requests care' ELSE 'ordinary courier note' END AS o_comment,
        |  0 AS o_shippriority
        |FROM orders o""".stripMargin,
    "line_x" ->
      """SELECT l.*,
        |  l_shipdate + INTERVAL '1' DAY * CAST((l_orderkey * 3 + l_linenumber) % 30 AS INT) AS l_commitdate,
        |  l_shipdate + INTERVAL '1' DAY * CAST((l_orderkey * 5 + l_linenumber * 7) % 30 + 1 AS INT) AS l_receiptdate,
        |  CASE CAST((l_orderkey + l_linenumber) % 7 AS INT) WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR' WHEN 3 THEN 'TRUCK' WHEN 4 THEN 'RAIL' WHEN 5 THEN 'FOB' ELSE 'REG AIR' END AS l_shipmode,
        |  CASE CAST(l_partkey % 4 AS INT) WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD' WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END AS l_shipinstruct
        |FROM lineitem l""".stripMargin,
    "cust_x" ->
      """SELECT c.*,
        |  lpad(CAST(10 + c_custkey % 25 AS VARCHAR(40)), 2, '0') || '-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR(40)), 4, '0') AS c_phone,
        |  'addr#' || CAST(c_custkey AS VARCHAR(40)) AS c_address,
        |  'steady account' AS c_comment
        |FROM customer c""".stripMargin,
    "supp_x" ->
      """SELECT s.*,
        |  'dock#' || CAST(s_suppkey AS VARCHAR(40)) AS s_address,
        |  lpad(CAST(10 + s_suppkey % 25 AS VARCHAR(40)), 2, '0') || '-777-' || lpad(CAST(s_suppkey % 10000 AS VARCHAR(40)), 4, '0') AS s_phone,
        |  CASE WHEN s_suppkey % 13 = 0 THEN 'unresolved Customer Complaints pending' ELSE 'reliable partner' END AS s_comment
        |FROM supplier s""".stripMargin,
    "part_x" ->
      """SELECT p.*,
        |  'Manufacturer#' || CAST(1 + p_partkey % 5 AS VARCHAR(40)) AS p_mfgr,
        |  CASE CAST(p_partkey % 8 AS INT) WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'SM BOX' WHEN 2 THEN 'MED BAG' WHEN 3 THEN 'MED BOX' WHEN 4 THEN 'LG CASE' WHEN 5 THEN 'LG BOX' WHEN 6 THEN 'JUMBO PKG' ELSE 'WRAP CASE' END AS p_container
        |FROM part p""".stripMargin,
    "partsupp" ->
      """SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |  CAST((l_partkey * 31 + l_suppkey * 17) % 9999 + 1 AS INT) AS ps_availqty,
        |  CAST(CAST((l_partkey * 7 + l_suppkey * 13) % 100000 + 100 AS DECIMAL(18,0)) / 100 AS DECIMAL(18,2)) AS ps_supplycost
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) base""".stripMargin)

  /** The DuckDB oracle prelude: the identical derivations as CTEs. */
  private val prelude: String =
    derivations.map { case (n, s) => s"$n AS ($s)" }
      .mkString("WITH ", ",\n", "\n")

  /** Registers the base parquet tables plus the derived views. Plain
    * base names are safe: no other declared query registers views (the
    * few that do use prefixed names, e.g. x12_customer).
    */
  private def register(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
    derivations.foreach { case (n, s) =>
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $n AS $s")
    }
  }

  /** Exact-decimal discounted revenue (D2): the casts keep both engines'
    * products inside native decimal precision, so the sums are exact.
    */
  private val REV =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  // ---------------------------------------------------------------- bodies

  private val qh01Body = s"""SELECT l_returnflag, l_linestatus,
    |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
    |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
    |  CAST(sum($REV) AS DOUBLE) AS sum_disc_price,
    |  CAST(sum($REV * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
    |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
    |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
    |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
    |  CAST(count(*) AS BIGINT) AS count_order
    |FROM line_x
    |WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
    |GROUP BY l_returnflag, l_linestatus
    |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private val qh02Body = """SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address, s_phone, s_comment
    |FROM part_x, supp_x, partsupp, nation, region
    |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
    |  AND p_size = 15 AND p_type LIKE '%ARD%'
    |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
    |  AND ps_supplycost = (
    |    SELECT min(ps_supplycost)
    |    FROM partsupp, supp_x, nation, region
    |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
    |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
    |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    |LIMIT 100""".stripMargin

  private val qh03Body = s"""SELECT l_orderkey, CAST(sum($REV) AS DOUBLE) AS revenue, o_orderdate, o_shippriority
    |FROM cust_x, ord_x, line_x
    |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
    |  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00' AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
    |GROUP BY l_orderkey, o_orderdate, o_shippriority
    |ORDER BY revenue DESC, o_orderdate, l_orderkey
    |LIMIT 10""".stripMargin

  private val qh04Body = """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    |FROM ord_x
    |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
    |  AND EXISTS (SELECT 1 FROM line_x WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate)
    |GROUP BY o_orderpriority
    |ORDER BY o_orderpriority""".stripMargin

  private val qh05Body = s"""SELECT n_name, CAST(sum($REV) AS DOUBLE) AS revenue
    |FROM cust_x, ord_x, line_x, supp_x, nation, region
    |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
    |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    |  AND r_name = 'ASIA'
    |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    |GROUP BY n_name
    |ORDER BY revenue DESC, n_name""".stripMargin

  private val qh06Body = """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    |FROM line_x
    |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    |  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN CAST(0.04 AS DECIMAL(4,2)) AND CAST(0.06 AS DECIMAL(4,2))
    |  AND l_quantity < 24""".stripMargin

  private val qh07Body = s"""SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
    |FROM (
    |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    |         CAST(extract(year FROM l_shipdate) AS INT) AS l_year,
    |         $REV AS volume
    |  FROM supp_x, line_x, ord_x, cust_x, nation n1, nation n2
    |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
    |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    |) shipping
    |GROUP BY supp_nation, cust_nation, l_year
    |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  private val qh08Body = s"""SELECT o_year,
    |  CAST(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
    |     / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    |FROM (
    |  SELECT CAST(extract(year FROM o_orderdate) AS INT) AS o_year, $REV AS volume, n2.n_name AS nation
    |  FROM part_x, supp_x, line_x, ord_x, cust_x, nation n1, nation n2, region
    |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    |    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    |    AND p_type = 'ECONOMY'
    |) all_nations
    |GROUP BY o_year
    |ORDER BY o_year""".stripMargin

  private val qh09Body = s"""SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    |FROM (
    |  SELECT n_name AS nation, CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
    |         $REV - ps_supplycost * CAST(l_quantity AS DECIMAL(12,2)) AS amount
    |  FROM part_x, supp_x, line_x, partsupp, ord_x, nation
    |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
    |    AND p_partkey = l_partkey AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    |    AND p_name LIKE '%red%'
    |) profit
    |GROUP BY nation, o_year
    |ORDER BY nation, o_year""".stripMargin

  private val qh10Body = s"""SELECT c_custkey, c_name, CAST(sum($REV) AS DOUBLE) AS revenue,
    |  c_acctbal, n_name, c_address, c_phone, c_comment
    |FROM cust_x, ord_x, line_x, nation
    |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
    |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
    |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    |GROUP BY c_custkey, c_name, c_acctbal, c_phone, n_name, c_address, c_comment
    |ORDER BY revenue DESC, c_custkey
    |LIMIT 20""".stripMargin

  private val qh11Body = """SELECT ps_partkey, CAST(sum(ps_supplycost * CAST(ps_availqty AS DECIMAL(12,0))) AS DOUBLE) AS part_value
    |FROM partsupp, supp_x, nation
    |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
    |GROUP BY ps_partkey
    |HAVING CAST(sum(ps_supplycost * CAST(ps_availqty AS DECIMAL(12,0))) AS DECIMAL(38,2)) * 2000 >
    |  (SELECT CAST(sum(ps_supplycost * CAST(ps_availqty AS DECIMAL(12,0))) AS DECIMAL(38,2))
    |   FROM partsupp, supp_x, nation
    |   WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7')
    |ORDER BY part_value DESC, ps_partkey""".stripMargin

  private val qh12Body = """SELECT l_shipmode,
    |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
    |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    |FROM ord_x, line_x
    |WHERE o_orderkey = l_orderkey AND l_shipmode IN ('MAIL', 'SHIP')
    |  AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
    |  AND l_receiptdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_receiptdate < TIMESTAMP '1997-01-01 00:00:00'
    |GROUP BY l_shipmode
    |ORDER BY l_shipmode""".stripMargin

  private val qh13Body = """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    |FROM (
    |  SELECT c_custkey, count(o_orderkey) AS c_count
    |  FROM cust_x LEFT OUTER JOIN ord_x ON c_custkey = o_custkey AND o_comment NOT LIKE '%special%requests%'
    |  GROUP BY c_custkey
    |) c_orders
    |GROUP BY c_count
    |ORDER BY custdist DESC, c_count DESC""".stripMargin

  private val qh14Body = s"""SELECT CAST(CAST(100 AS DOUBLE) *
    |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $REV ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
    |  / CAST(sum($REV) AS DOUBLE) AS DOUBLE) AS promo_revenue
    |FROM line_x, part_x
    |WHERE l_partkey = p_partkey
    |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  private val rev15 =
    s"""SELECT l_suppkey AS supplier_no, CAST(sum($REV) AS DOUBLE) AS total_revenue
       |  FROM line_x
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey""".stripMargin

  private val qh15Body = s"""SELECT s_suppkey, s_name, s_address, s_phone, total_revenue
    |FROM supp_x, ($rev15) revenue0
    |WHERE s_suppkey = supplier_no
    |  AND total_revenue = (SELECT max(total_revenue) FROM ($rev15) revenue1)
    |ORDER BY s_suppkey""".stripMargin

  private val qh16Body = """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    |FROM partsupp, part_x
    |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#4' AND p_type NOT LIKE 'MED%'
    |  AND p_size IN (1, 4, 7, 10, 14, 19, 25, 28, 31, 35)
    |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supp_x WHERE s_comment LIKE '%Customer%Complaints%')
    |GROUP BY p_brand, p_type, p_size
    |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  private val qh17Body = """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    |FROM line_x, part_x
    |WHERE p_partkey = l_partkey AND p_brand = 'Brand#2' AND p_container = 'MED BOX'
    |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity) FROM line_x l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  private val qh18Body = """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
    |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    |FROM cust_x, ord_x, line_x
    |WHERE o_orderkey IN (
    |    SELECT l_orderkey FROM line_x GROUP BY l_orderkey
    |    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
    |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    |ORDER BY o_totalprice DESC, o_orderkey
    |LIMIT 100""".stripMargin

  private val qh19Body = s"""SELECT CAST(sum($REV) AS DOUBLE) AS revenue
    |FROM line_x, part_x
    |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
    |    AND p_container IN ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
    |    AND l_quantity >= 5 AND l_quantity <= 15 AND p_size BETWEEN 1 AND 10
    |    AND l_shipmode IN ('AIR', 'REG AIR') AND l_shipinstruct = 'DELIVER IN PERSON')
    |  OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
    |    AND p_container IN ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
    |    AND l_quantity >= 14 AND l_quantity <= 24 AND p_size BETWEEN 1 AND 20
    |    AND l_shipmode IN ('AIR', 'REG AIR') AND l_shipinstruct = 'DELIVER IN PERSON')
    |  OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
    |    AND p_container IN ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
    |    AND l_quantity >= 26 AND l_quantity <= 36 AND p_size BETWEEN 1 AND 30
    |    AND l_shipmode IN ('AIR', 'REG AIR') AND l_shipinstruct = 'DELIVER IN PERSON')""".stripMargin

  private val qh20Body = """SELECT s_name, s_address
    |FROM supp_x, nation
    |WHERE s_suppkey IN (
    |    SELECT ps_suppkey FROM partsupp
    |    WHERE ps_partkey IN (SELECT p_partkey FROM part_x WHERE p_name LIKE 'red%')
    |      AND ps_availqty > (
    |        SELECT CAST(0.5 AS DOUBLE) * sum(l_quantity) FROM line_x
    |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
    |  AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
    |ORDER BY s_name""".stripMargin

  private val qh21Body = """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    |FROM supp_x, line_x l1, ord_x, nation
    |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    |  AND l1.l_receiptdate > l1.l_commitdate
    |  AND EXISTS (SELECT 1 FROM line_x l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    |  AND NOT EXISTS (SELECT 1 FROM line_x l3 WHERE l3.l_orderkey = l1.l_orderkey
    |    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_receiptdate > l3.l_commitdate)
    |  AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
    |GROUP BY s_name
    |ORDER BY numwait DESC, s_name
    |LIMIT 100""".stripMargin

  private val qh22Body = """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
    |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    |FROM (
    |  SELECT substring(c_phone, 1, 2) AS cntrycode, c_acctbal
    |  FROM cust_x
    |  WHERE substring(c_phone, 1, 2) IN ('11', '14', '17', '20', '23', '26', '29')
    |    AND c_acctbal > (
    |      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
    |      FROM cust_x
    |      WHERE c_acctbal > 0.00 AND substring(c_phone, 1, 2) IN ('11', '14', '17', '20', '23', '26', '29'))
    |    AND NOT EXISTS (SELECT 1 FROM ord_x WHERE o_custkey = c_custkey
    |      AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
    |) custsale
    |GROUP BY cntrycode
    |ORDER BY cntrycode""".stripMargin

  /** id → shared body. Keys are the declared inventory ids. */
  private val bodies: Seq[(String, String)] = Seq(
    "qh01_pricing_summary"      -> qh01Body,
    "qh02_min_cost_supplier"    -> qh02Body,
    "qh03_shipping_priority"    -> qh03Body,
    "qh04_order_priority"       -> qh04Body,
    "qh05_local_supplier_volume" -> qh05Body,
    "qh06_revenue_forecast"     -> qh06Body,
    "qh07_volume_shipping"      -> qh07Body,
    "qh08_market_share"         -> qh08Body,
    "qh09_product_profit"       -> qh09Body,
    "qh10_returned_items"       -> qh10Body,
    "qh11_important_stock"      -> qh11Body,
    "qh12_shipmode_priority"    -> qh12Body,
    "qh13_customer_distribution" -> qh13Body,
    "qh14_promo_effect"         -> qh14Body,
    "qh15_top_supplier"         -> qh15Body,
    "qh16_parts_supplier"       -> qh16Body,
    "qh17_small_qty_revenue"    -> qh17Body,
    "qh18_large_volume_customer" -> qh18Body,
    "qh19_discounted_revenue"   -> qh19Body,
    "qh20_part_promotion"       -> qh20Body,
    "qh21_suppliers_waiting"    -> qh21Body,
    "qh22_global_sales"         -> qh22Body)

  /** Declared-query entries (merged into SparkEntry.queries). */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    bodies.map { case (id, body) =>
      id -> { (spark: SparkSession, dir: String) =>
        register(spark, dir)
        spark.sql(body)
      }
    }.toMap

  /** Oracle SQL (merged into SparkEntry.oracleSql): the SAME body text
    * under the CTE prelude.
    */
  val oracles: Map[String, String] =
    bodies.map { case (id, body) => id -> (prelude + body) }.toMap

  /** Body lookup for tests (plan assertions run the body, not the oracle). */
  private[graft] def body(id: String): String =
    bodies.find(_._1 == id).get._2

  private[graft] def run(spark: SparkSession, dir: String, id: String): DataFrame = {
    register(spark, dir)
    spark.sql(body(id))
  }
}
