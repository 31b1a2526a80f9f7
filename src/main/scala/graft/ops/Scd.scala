package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension operators (SURVEY.md §2.3 q91 family)
  * — the BUILD side of the reference's R18 daily-versioned dimension
  * (`dags/order_currency_conversion_dag.py:33-42`: a memo keyed by day is
  * an SCD2 whose versions happen to be days) and the inverse of the q33
  * as-of family: q33 CONSUMES a versioned dim (point-in-time lookup),
  * q91 PRODUCES one from a change log, and q91b maintains it
  * incrementally the way a warehouse actually runs (append a delta batch,
  * never rebuild history).
  *
  * Scale shape (q91): ONE hash shuffle on the key — the change-collapse
  * lag, the version row_number and the effective_to lead all run over the
  * SAME (key, ts, tie) window spec, so Catalyst plans a single
  * Exchange+Sort and the filter between the two Window operators
  * preserves both (pinned in ScdSpec: exactly one hash exchange).
  * History length per key is bounded by the change count, not the event
  * count — the collapse happens BEFORE the second window touches rows.
  *
  * q91b's contract is the warehouse invariant: merge(dim(log < cutoff),
  * log ≥ cutoff) ≡ build(log) row for row — closed versions are immutable
  * (they pass through untouched), only each touched key's CURRENT row can
  * extend, close, or sprout new versions. The driver gate runs the merge
  * path against the full-rebuild oracle (q46b's incremental-equals-batch
  * precedent).
  */
object Scd {

  /** Build an SCD2 dimension from a change log: collapse consecutive
    * equal `attrCol` values per `keyCol` (ordered by `tsCol`, ties by
    * `tieCol`), then number the surviving versions and close each with
    * the next version's start. Null-safe on the attribute (a null attr
    * is a value, compared with <=>); the first row per key always opens
    * version 1.
    *
    * Output: (key, attr, effective_from, effective_to, version,
    * is_current) — effective_to NULL on the open row, half-open
    * [from, to) intervals exactly as q33's as-of consumes them.
    */
  def scd2Build(
      log: DataFrame,
      keyCol: String = "user_id",
      attrCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(asc(tsCol), asc(tieCol))
    log
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // change rows: the key's first event, or a null-safe attr change
      .filter(col("__rn") === 1 || !(col(attrCol) <=> col("__prev")))
      .withColumn("version", row_number().over(w))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("effective_from"), col("effective_to"),
        col("version"), col("effective_to").isNull.as("is_current"))
  }

  /** Merge a delta change log into a stored SCD2 dim — the incremental
    * maintenance path. Keys absent from the delta pass through untouched;
    * for touched keys the closed versions pass through verbatim and the
    * current row re-enters the collapse as a pseudo log row (tie
    * Long.MinValue — it strictly precedes every delta row because the dim
    * was built from ts < cutoff ≤ delta ts), so a delta that opens with
    * the same attribute extends it (no new version) and a changed one
    * closes it, exactly as the batch rebuild would. Version numbers
    * continue from the current row's (base = version − 1, joined per key;
    * new keys start at 1).
    *
    * The key-set and per-key-base joins carry NO broadcast hint on
    * purpose: a hint would PIN the strategy (AQE never demotes an
    * explicit hint, so a huge delta would force-collect its key set to
    * the driver), while the unhinted plan lets AQE convert to a runtime
    * broadcast exactly when the delta is actually small — the common
    * case — and degrade to a shuffle join when it is not.
    *
    * PRECONDITION (the merge ≡ rebuild contract): every delta row's ts
    * must be STRICTLY greater than the touched key's current
    * `effective_from` — the carried pseudo row's Long.MinValue tie only
    * orders correctly then (at ts equality the rebuild orders by the
    * REAL opening tie, which the dim does not retain). A
    * late-arriving delta older than the current version would otherwise
    * produce a dim that silently diverges from the batch rebuild
    * (ADVICE r12). `guardLateDeltas = true` enforces it at runtime with
    * one delta-bounded aggregate + join (min delta ts per touched key vs
    * the current row's effective_from) and fails loudly with an offending
    * key; the default leaves the check to the caller for pipelines whose
    * batch boundary proves it by construction (q91b's cutoff split). A
    * violated key needs a rebuild ([[scd2Build]] over its full log), not
    * a merge.
    */
  def scd2Merge(
      dim: DataFrame,
      deltaLog: DataFrame,
      keyCol: String = "user_id",
      attrCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      guardLateDeltas: Boolean = false): DataFrame = {
    val touched = deltaLog.select(col(keyCol)).distinct()
    val untouched = dim.join(touched, Seq(keyCol), "left_anti")
    val dimTouched = dim.join(touched, Seq(keyCol), "left_semi")
    val closed = dimTouched.filter(!col("is_current"))
    val current = dimTouched.filter(col("is_current"))
    if (guardLateDeltas) {
      // STRICT precondition (ts > effective_from), and the guard matches
      // it with <=. At ts EQUALITY the carried pseudo-row's
      // Long.MinValue tie always orders the current version first, but
      // the batch rebuild orders equal-ts events by tieCol — a delta
      // event with a smaller tie than the version's OPENING event would
      // make merge diverge from rebuild, and the dim does not retain the
      // opening tie to adjudicate it (ADVICE r13). Equality therefore
      // fails loudly: rebuild that key instead of merging.
      val viol = deltaLog.groupBy(col(keyCol))
        .agg(min(col(tsCol)).as("__delta_min_ts"))
        .join(current.select(col(keyCol), col("effective_from")), Seq(keyCol))
        .filter(col("__delta_min_ts") <= col("effective_from"))
      val bad = viol.select(col(keyCol), col("__delta_min_ts"),
        col("effective_from")).limit(1).collect()
      require(bad.isEmpty,
        s"scd2Merge: late-arriving delta violates the merge contract — " +
          s"key ${bad.head.get(0)} has a delta row at ${bad.head.get(1)} " +
          s"not strictly after the current version's effective_from " +
          s"${bad.head.get(2)}; rebuild that key's history with scd2Build " +
          "instead of merging")
    }
    val carried = current.select(col(keyCol), col(attrCol),
      col("effective_from").as(tsCol),
      lit(Long.MinValue).cast("long").as(tieCol))
    val logAll = carried.unionByName(
      deltaLog.select(col(keyCol), col(attrCol), col(tsCol), col(tieCol)))
    val bases = current.select(col(keyCol),
      (col("version") - lit(1)).as("__base"))
    val tail = scd2Build(logAll, keyCol, attrCol, tsCol, tieCol)
      .join(bases, Seq(keyCol), "left")
      .withColumn("version", col("version") + coalesce(col("__base"), lit(0)))
      .drop("__base")
    untouched.unionByName(closed).unionByName(tail)
  }

  /** The q91b batch boundary: dim = events before day 21, delta = the
    * last 10 days — a 2:1 history-to-delta split on the 30-day fixture.
    */
  private val cutoff: Column = lit("2024-01-21 00:00:00").cast("timestamp")

  /** q91_scd2_build: per-user event_type version history off the events
    * log. Oracle-checked — windows and IS DISTINCT FROM restate exactly.
    */
  def q91(spark: SparkSession, dir: String): DataFrame =
    scd2Build(Tables.events(spark, dir))
      .orderBy("user_id", "version")

  /** q91b_scd2_merge: the incremental path, gated against the batch
    * rebuild — merge(build(< cutoff), ≥ cutoff) must equal build(all),
    * so it SHARES q91's oracle.
    */
  def q91b(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = scd2Build(ev.filter(col("ts") < cutoff))
    // the cutoff split proves the no-late-delta precondition by
    // construction; the guard is ON anyway so the declared query also
    // exercises the loud-failure path's plumbing every round
    scd2Merge(dim, ev.filter(col("ts") >= cutoff), guardLateDeltas = true)
      .orderBy("user_id", "version")
  }

  /** q91c_scd2_bucketed: the few-keys × long-history scale path — q91's
    * raw-row window partitions on the bare key, so ONE key's entire
    * history sorts in one task (fine until a hot key's history outgrows
    * it; the q33b→q33c situation exactly). Here CHANGE DETECTION runs
    * within (key, day-bucket) partitions and the cross-bucket dependency
    * — "what attribute was in force when this bucket opened?" — is
    * restored by a carry-in from a per-key window over bucket SUMMARIES
    * (one row per occupied bucket, never history; q33c's boxed-struct
    * trick distinguishes "no previous bucket" from "previous attribute
    * was null"). The version/close windows then run per key over the
    * COLLAPSED change rows only — bounded by the change count, which is
    * the quantity SCD2 exists to keep small — so no per-key task ever
    * sees raw history. Identical change set ⇒ identical output ⇒ SHARES
    * q91's oracle (the q41/q90c two-strategy precedent).
    */
  def scd2BuildBucketed(
      log: DataFrame,
      keyCol: String = "user_id",
      attrCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val base = log.select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__bkt", date_trunc("day", col(tsCol)))
    val wB = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(asc(tsCol), asc(tieCol))
    // one row per occupied (key, bucket): the attribute in force when the
    // bucket closes, boxed so a null attribute survives the carry
    val summaries = base
      .groupBy(col(keyCol), col("__bkt"))
      .agg(max_by(struct(col(attrCol).as("a")),
        struct(col(tsCol), col(tieCol))).as("__last"))
    val wKeyBkt = Window.partitionBy(col(keyCol)).orderBy(asc("__bkt"))
    val carries = summaries
      .withColumn("__carry", lag(col("__last"), 1).over(wKeyBkt))
      .select(col(keyCol), col("__bkt"), col("__carry"))
    // within-bucket prev, boxed the same way; the bucket's first row takes
    // the carry (null carry = the key's very first row)
    val withPrev = base
      .withColumn("__prevIn", lag(struct(col(attrCol).as("a")), 1).over(wB))
      .join(carries, Seq(keyCol, "__bkt"))
      .withColumn("__prev", coalesce(col("__prevIn"), col("__carry")))
      .filter(col("__prev").isNull || !(col(attrCol) <=> col("__prev.a")))
    // per-key windows over CHANGE rows only (bounded by version count)
    val wChange = Window.partitionBy(col(keyCol))
      .orderBy(asc(tsCol), asc(tieCol))
    withPrev
      .withColumn("version", row_number().over(wChange))
      .withColumn("effective_to", lead(col(tsCol), 1).over(wChange))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("effective_from"), col("effective_to"),
        col("version"), col("effective_to").isNull.as("is_current"))
  }

  def q91c(spark: SparkSession, dir: String): DataFrame =
    scd2BuildBucketed(Tables.events(spark, dir))
      .orderBy("user_id", "version")

  /** The batch SCD2 restatement WITHOUT the final ORDER BY — the single
    * source both q91's oracle and x23b's closed-rows oracle derive from
    * (a tie-break or null-semantics change edits exactly one text).
    */
  private[graft] val q91Body: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |changes AS (
      |  SELECT user_id, event_type, ts AS effective_from, event_id
      |  FROM ordered
      |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
      |SELECT user_id, event_type, effective_from,
      |       lead(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from, event_id) AS effective_to,
      |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY effective_from, event_id) AS INTEGER) AS version,
      |       lead(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from, event_id) IS NULL AS is_current
      |FROM changes""".stripMargin

  /** Batch SCD2 restatement — q91's oracle (and q91b's by the merge
    * contract, q91c's by change-set identity).
    */
  val q91Sql: String = q91Body + "\nORDER BY user_id, version"
}
