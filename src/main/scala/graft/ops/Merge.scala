package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic keyed MERGE (upsert/delete) — the warehouse verb the SCD2
  * family's machinery implies but never exposes directly: `MERGE delta
  * INTO target ON key` with insert, update and delete actions in one
  * delta batch (VERDICT r12 #3). The reference's ON CONFLICT upsert
  * (`init/postgres-2/init.sql:2` PK guard + the DAG's idempotent
  * re-writes) generalized to arbitrary keys and payloads.
  *
  * Spark-first shape: a MERGE against an immutable columnar target is a
  * COPY-ON-WRITE rewrite — `target ANTI-JOIN delta-keys` (rows the delta
  * does not touch pass through) `UNION ALL` the delta's surviving
  * upserts. Two delta-bounded shuffles at most: the anti join hashes on
  * the key (AQE converts it to a runtime broadcast when the resolved
  * delta is small — the common case — with no hint pinning the strategy,
  * scd2Merge's documented rationale), and the optional latest-wins
  * resolution windows over the delta only. The target is never sorted,
  * never windowed, never shuffled beyond the anti join. This operator is
  * the kernel a lake table format (Delta/Iceberg/Hudi) wraps with file
  * pruning; semantics and plan shape are what they execute per touched
  * file group.
  *
  * Delta contract: one payload row per key per batch. With `seqCol`,
  * at-least-once delta logs resolve LATEST-WINS per key (ties on the
  * max sequence fail loudly — two "latest" payloads have no right
  * answer); without it, a duplicate key fails loudly at execution
  * (`assert_true` inside the plan — no silent last-writer-wins). Ops:
  * `upsert` (insert or replace) and `delete` (absent keys a no-op, as in
  * SQL MERGE's WHEN MATCHED THEN DELETE); any other op value fails
  * loudly.
  */
object Merge {

  /** Apply `delta` to `target` keyed by `keys`: the returned frame is the
    * post-merge target state. `delta` carries the target's payload
    * columns plus `opCol` ('upsert' | 'delete') and optionally `seqCol`
    * for latest-wins resolution of multi-row-per-key deltas.
    */
  def upsert(
      target: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      opCol: String = "_op",
      seqCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "merge: at least one key column")
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*)
    // resolve to exactly one row per key, loudly rejecting ambiguity
    val resolved = (seqCol match {
      case Some(s) =>
        delta
          .withColumn("__rn", row_number().over(w.orderBy(col(s).desc)))
          .withColumn("__tie", count(lit(1)).over(
            Window.partitionBy((keyCols :+ col(s)): _*)))
          .filter(col("__rn") === 1)
          .withColumn("__chk", assert_true(col("__tie") === 1,
            concat(lit("merge: two delta rows tie on the max " + s +
              " for key "), concat_ws(",", keyCols: _*))))
          .filter(col("__chk").isNull)
          .drop("__rn", "__tie", "__chk", s)
      case None =>
        delta
          .withColumn("__n", count(lit(1)).over(w))
          .withColumn("__chk", assert_true(col("__n") === 1,
            concat(lit("merge: duplicate delta rows for key "),
              concat_ws(",", keyCols: _*),
              lit(" — pass seqCol for latest-wins resolution"))))
          .filter(col("__chk").isNull)
          .drop("__n", "__chk")
    }).withColumn("__op_chk", assert_true(
        col(opCol).isin("upsert", "delete"),
        concat(lit("merge: unknown op '"), col(opCol),
          lit("' (expected upsert|delete) for key "),
          concat_ws(",", keyCols: _*))))
      .filter(col("__op_chk").isNull).drop("__op_chk")
    val untouched = target.join(resolved.select(keyCols: _*),
      keys, "left_anti")
    val upserts = resolved.filter(col(opCol) =!= "delete").drop(opCol)
    // unionByName: the delta payload must carry exactly the target's
    // columns — a missing or extra column fails at analysis, not silently
    untouched.unionByName(upserts)
  }

  // ---- q92: the declared two-batch MERGE query ----

  /** q92_merge_upsert: two chained MERGE batches over the orders fixture,
    * final target state gated against a chained-CTE oracle (q46b's
    * precedent). The batches exercise every action path: update an
    * existing row, insert a new key, delete an existing key, delete a key
    * the PREVIOUS batch inserted, and re-insert a key the previous batch
    * deleted. Payload mutations stay in exact double arithmetic
    * (+10.0, *0.5, +0.25 — all IEEE-exact) so Spark and DuckDB agree
    * bit-for-bit.
    */
  def q92(spark: SparkSession, dir: String): DataFrame = {
    val t0 = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
      .filter(col("o_orderkey") % 4 =!= 3)
    val all = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
    val k = col("o_orderkey")
    val d1 = all.filter(k % 8 === 1)
      .select(k, lit("U1").as("o_orderstatus"),
        (col("o_totalprice") + lit(10.0)).as("o_totalprice"),
        col("o_orderdate"), lit("upsert").as("_op"))
      .unionByName(all.filter(k % 8 === 3)
        .select(k, lit("I1").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), lit("upsert").as("_op")))
      .unionByName(all.filter(k % 8 === 2)
        .select(k, col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), lit("delete").as("_op")))
    val d2 = all.filter(k % 8 === 5)
      .select(k, lit("U2").as("o_orderstatus"),
        (col("o_totalprice") * lit(0.5)).as("o_totalprice"),
        col("o_orderdate"), lit("upsert").as("_op"))
      .unionByName(all.filter(k % 8 === 3)
        .select(k, col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), lit("delete").as("_op")))
      .unionByName(all.filter(k % 16 === 2)
        .select(k, lit("R2").as("o_orderstatus"),
          (col("o_totalprice") + lit(0.25)).as("o_totalprice"),
          col("o_orderdate"), lit("upsert").as("_op")))
    val m1 = upsert(t0, d1, Seq("o_orderkey"))
    val m2 = upsert(m1, d2, Seq("o_orderkey"))
    m2.orderBy("o_orderkey")
  }

  /** The two merges restated as chained CTEs: anti join == NOT EXISTS,
    * upsert union, same exact-double payload arithmetic.
    */
  val q92Sql: String =
    """WITH t0 AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM orders WHERE o_orderkey % 4 <> 3),
      |d1 AS (
      |  SELECT o_orderkey, 'U1' AS o_orderstatus,
      |         o_totalprice + 10.0 AS o_totalprice, o_orderdate,
      |         'upsert' AS op
      |  FROM orders WHERE o_orderkey % 8 = 1
      |  UNION ALL
      |  SELECT o_orderkey, 'I1', o_totalprice, o_orderdate, 'upsert'
      |  FROM orders WHERE o_orderkey % 8 = 3
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate,
      |         'delete'
      |  FROM orders WHERE o_orderkey % 8 = 2),
      |m1 AS (
      |  SELECT t.* FROM t0 t
      |  WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.o_orderkey = t.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM d1 WHERE op <> 'delete'),
      |d2 AS (
      |  SELECT o_orderkey, 'U2' AS o_orderstatus,
      |         o_totalprice * 0.5 AS o_totalprice, o_orderdate,
      |         'upsert' AS op
      |  FROM orders WHERE o_orderkey % 8 = 5
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate,
      |         'delete'
      |  FROM orders WHERE o_orderkey % 8 = 3
      |  UNION ALL
      |  SELECT o_orderkey, 'R2',
      |         o_totalprice + 0.25, o_orderdate, 'upsert'
      |  FROM orders WHERE o_orderkey % 16 = 2),
      |m2 AS (
      |  SELECT m.* FROM m1 m
      |  WHERE NOT EXISTS (SELECT 1 FROM d2 WHERE d2.o_orderkey = m.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM d2 WHERE op <> 'delete')
      |SELECT * FROM m2 ORDER BY o_orderkey""".stripMargin
}
