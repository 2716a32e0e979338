package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.GraftTable

/** SQL `MERGE INTO` front end for [[MergeTable]] — Spark's own parser
  * produces the [[MergeIntoTable]] AST (so the full statement grammar is
  * supported verbatim), and this translator maps its clause surface onto
  * [[MergeTable.mergeUpsert]]'s transactional engine:
  *
  * {{{
  *   MERGE INTO graft.`/abs/path` AS t USING batch_view AS s
  *   ON t.event_id = s.event_id
  *   WHEN MATCHED AND s.value > t.value THEN UPDATE SET value = s.value
  *   WHEN MATCHED AND t.event_type = 'error' THEN DELETE
  *   WHEN NOT MATCHED AND s.value >= 0 THEN INSERT *
  *   WHEN NOT MATCHED BY SOURCE THEN DELETE
  * }}}
  *
  * Two doors, one translator:
  *
  *  - [[GraftSql.mergeInto]] — parse + execute a statement directly.
  *  - `spark.sql("MERGE INTO graft...")` — [[GraftMergeRule]] (installed
  *    by [[graft.functions.GraftExtensions]]) intercepts any analyzed
  *    [[MergeIntoTable]] whose target is a graft-catalog table and swaps
  *    in [[GraftMergeCommand]], exactly the lakehouse-engine pattern for
  *    commands Spark's own planner declines (the target does not
  *    implement `SupportsRowLevelOperations`; its commit protocol is the
  *    engine's CAS log, not a V2 row-level write).
  *
  * The FULL clause surface maps through: any number of conditional
  * clauses per kind in statement order (the engine's clause lists are
  * first-match-wins per row, [[MergeTable.merge]]), arbitrary
  * expressions in `WHEN MATCHED UPDATE SET` (both `t.` and `s.` in
  * scope — `SET t.cnt = t.cnt + s.cnt` accumulates), and explicit
  * `INSERT (cols) VALUES (exprs)` column lists (`s.` expressions;
  * unlisted non-key columns insert as NULL, SQL semantics; merge keys
  * must be identity `s.<k>` — the key-unique table model).
  *
  * The ON condition accepts the two everyday generalizations beyond
  * same-named equi keys:
  *
  *  - CROSS-NAMED keys — `ON t.id = s.customer_id`: the source column is
  *    renamed to the target key name before the merge (and every
  *    `s.customer_id` reference in clause expressions rewrites with it),
  *    so the engine's one key namespace holds. The target-side names must
  *    still equal the table's merge-key set. One Spark-owned limit:
  *    `UPDATE SET *` / `INSERT *` through the `spark.sql` door fail in
  *    SPARK'S analyzer (star expands by name against the source, which
  *    has no `id`) — use explicit column lists there, or the
  *    [[mergeInto]] parse door, which renames before analysis.
  *  - RESIDUAL conjuncts — `ON t.id = s.id AND s.ts > X`: every non-key
  *    conjunct folds into each MATCHED clause's condition
  *    (`AND <residual>`). In the key-unique table model "matched" is
  *    KEY-scoped, so a key-matched pair failing the residual takes NO
  *    action — where strict SQL would call the source row unmatched and
  *    duplicate-insert its key, which this table model cannot represent
  *    (the one documented divergence). `WHEN NOT MATCHED` inserts are
  *    NOT gated by the residual: a source row whose key exists nowhere
  *    in the target is unmatched under ANY residual value (no target row
  *    satisfies the full ON), so standard MERGE inserts it — and so does
  *    this translator. One shape is rejected loudly instead of silently
  *    re-read: a residual alongside `WHEN NOT MATCHED BY SOURCE` clauses
  *    (strict SQL would count a key-matched-but-residual-failing target
  *    row as not-matched-by-source; the key-scoped engine cannot).
  *  - OR-OF-KEY-TUPLES — `ON (t.id = s.primary_id) OR (t.id = s.alias_id)`:
  *    multi-key batch addressing (update/delete a record by ANY of its
  *    identifiers in one statement). Each disjunct must be a pure
  *    key-tuple equality over the same target key set; the source
  *    EXPLODES into one addressing per disjunct (exact duplicates
  *    collapse), so standard-MERGE semantics hold — including the
  *    cardinality violation when two addressings hit one target key.
  *    Matched-only by construction: `WHEN NOT MATCHED` (which candidate
  *    key would the new row take?) and `WHEN NOT MATCHED BY SOURCE`
  *    (quantifies over ALL addressings) are rejected with the rewrite
  *    spelled out, as are residuals inside disjuncts. Address-only
  *    source columns are dropped after addressing — clauses reference
  *    the target key (`t.id`/`s.id`), never a bare alias column.
  *
  * Rejected loudly: rekeying UPDATEs, duplicate SET columns, an
  * unconditional clause followed by more clauses of its group (dead code
  * under first-match-wins), unattributable ON columns (qualify them).
  */
object GraftSql {

  /** Parse and execute one `MERGE INTO` statement. Returns true when a
    * new version committed (false = `txn` already applied — replay). */
  def mergeInto(s: SparkSession, sql: String,
      txn: Option[(String, Long)] = None): Boolean =
    s.sessionState.sqlParser.parsePlan(sql) match {
      case m: MergeIntoTable => runMerge(s, m, txn)
      case other => throw new IllegalArgumentException(
        s"GraftSql.mergeInto expects a MERGE INTO statement, got: " +
          other.getClass.getSimpleName)
    }

  /** Outermost alias (the user's `AS t`) + the fully-unwrapped core plan —
    * the analyzer nests aliases (`SubqueryAlias t → SubqueryAlias
    * graft.`path` → RelationV2`), so one-layer stripping misses the
    * relation. */
  private def unalias(p: LogicalPlan): (Option[String], LogicalPlan) = {
    def strip(q: LogicalPlan): LogicalPlan = q match {
      case SubqueryAlias(_, c) => strip(c)
      case other => other
    }
    p match {
      case SubqueryAlias(ident, child) => (Some(ident.name), strip(child))
      case other => (None, strip(other))
    }
  }

  /** Is this plan a merge-table target this front end owns? (either still
    * unresolved under the `graft` catalog prefix, or already resolved to
    * a [[GraftTable]] V2 relation) */
  private[graft] def graftTargetPath(p: LogicalPlan): Option[String] =
    unalias(p)._2 match {
      case u: UnresolvedRelation
          if u.multipartIdentifier.length >= 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
        Some(u.multipartIdentifier.tail.mkString("/"))
      case r: DataSourceV2Relation => r.table match {
        case g: GraftTable => Some(g.tablePath)
        case _ => None
      }
      case _ => None
    }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE INTO: $what")

  /** Parse and execute one `DELETE FROM graft.`…` [WHERE cond]`
    * statement. Returns the number of rows deleted (0 on replay). */
  def deleteFrom(s: SparkSession, sql: String,
      txn: Option[(String, Long)] = None): Long =
    s.sessionState.sqlParser.parsePlan(sql) match {
      case d: DeleteFromTable => runDelete(s, d, txn)
      case other => throw new IllegalArgumentException(
        s"GraftSql.deleteFrom expects a DELETE statement, got: " +
          other.getClass.getSimpleName)
    }

  /** Parse and execute one `UPDATE graft.`…` SET … [WHERE cond]`
    * statement. Returns true when a new version committed. */
  def update(s: SparkSession, sql: String,
      txn: Option[(String, Long)] = None): Boolean =
    s.sessionState.sqlParser.parsePlan(sql) match {
      case u: UpdateTable => runUpdate(s, u, txn)
      case other => throw new IllegalArgumentException(
        s"GraftSql.update expects an UPDATE statement, got: " +
          other.getClass.getSimpleName)
    }

  /** Rewrite a single-table statement's attribute references to BARE
    * names (strip the target alias / resolved qualifiers) and render to
    * SQL evaluable against the snapshot frame. */
  private def renderBare(e: Expression, alias: Option[String]): String =
    e.transformUp {
      case ua: UnresolvedAttribute
          if ua.nameParts.length >= 2 &&
            alias.exists(_.equalsIgnoreCase(ua.nameParts.head)) =>
        UnresolvedAttribute(ua.nameParts.tail)
      case ar: AttributeReference => UnresolvedAttribute(Seq(ar.name))
    }.sql

  private def lastName(e: Expression): String = e match {
    case ar: AttributeReference => ar.name
    case ua: UnresolvedAttribute => ua.nameParts.last
    case other => unsupported(s"expected a column reference, got: ${other.sql}")
  }

  /** The find-affected snapshot scan behind UPDATE/DELETE, FILE-SKIPPED:
    * the rendered condition is resolved against the full snapshot frame,
    * its conjuncts translated to source filters, and the manifest's
    * per-file stats prune the files the scan opens — a predicate on any
    * stats-indexed column turns the find phase from O(table) into
    * O(overlapping files), the same skipping the DSv2 read applies.
    * Untranslatable conjuncts simply don't prune (the full predicate is
    * still applied row-wise). */
  private[graft] def prunedSnapshot(s: SparkSession, path: String,
      head: MergeTable.TableManifest, condSql: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val full = MergeTable.readManifest(s, path, head)
    val resolved = full.where(expr(condSql))
      .queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // the ANALYZED (pre-optimizer) condition still carries literal
    // casts — `value > 90.0` analyzes to `value > cast(90.0 as double)`
    // — and the source-filter translator requires plain literals; fold
    // deterministic foldable subtrees first (what ConstantFolding would
    // do one phase later)
    def fold(e: Expression): Expression = e.transformUp {
      case sub if sub.foldable && sub.deterministic &&
          !sub.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] =>
        // foldable-but-Unevaluable nodes exist pre-optimizer
        // (current_timestamp() waits for ComputeCurrentTime) — leave
        // them in place rather than crash; they just don't prune
        scala.util.Try(org.apache.spark.sql.catalyst.expressions.Literal
          .create(sub.eval(null), sub.dataType)).getOrElse(sub)
    }
    val filters = resolved.toSeq.map(fold).flatMap(conjuncts).flatMap(
      org.apache.spark.sql.graftbridge.Bridge.translateFilter)
    val kept = BloomIndex.prune(s, path,
      StatsPruning.prune(head.files, filters,
        c => MergeTable.physOf(head.columnMap, c)),
      filters, c => MergeTable.physOf(head.columnMap, c))
    val scan =
      if (kept.size == head.files.size) full
      else MergeTable.readManifest(s, path, head.copy(files = kept))
    scan.where(expr(condSql))
  }

  /** `DELETE FROM t WHERE cond` (SQL row-level delete, any predicate) →
    * derive the matching rows' MERGE KEYS from one stats-pruned snapshot
    * scan, then the engine's keyed [[MergeTable.mergeDelete]] rewrites
    * (or DV-marks) only the box-overlapping files — the Delta
    * find-touched-then-rewrite shape. */
  private[graft] def runDelete(s: SparkSession, d: DeleteFromTable,
      txn: Option[(String, Long)] = None): Long = {
    val (alias, _) = unalias(d.table)
    val path = graftTargetPath(d.table).getOrElse(unsupported(
      "DELETE target must be a graft table"))
    val condSql = Option(d.condition).map(renderBare(_, alias)).getOrElse("true")
    import org.apache.spark.sql.functions.col
    // find-then-commit under a pinned version: the WHERE scan and the
    // commit must see the SAME snapshot, or a concurrent commit landing
    // between them is silently half-deleted (the lost-update TOCTOU).
    // A conflict re-runs the WHOLE find phase against the new head.
    refindLoop {
      val head = MergeTable.latestManifest(path).getOrElse(
        sys.error(s"no committed version under $path"))
      val delKeys = prunedSnapshot(s, path, head, condSql)
        .select(head.keys.map(col): _*)
      MergeTable.mergeDelete(s, path, delKeys, txn = txn,
        requireVersion = Some(head.version))
    }
  }

  /** Bounded find-phase retry: re-runs `body` while the commit path
    * reports the head moved past the snapshot the find phase read. */
  private def refindLoop[A](body: => A): A = {
    val maxFinds = 10
    var attempt = 0
    while (true) {
      attempt += 1
      try return body
      catch {
        case e: MergeTable.ConcurrentMergeException =>
          if (attempt >= maxFinds) throw e
      }
    }
    sys.error("unreachable")
  }

  /** `UPDATE t SET c = e, … WHERE cond` → batch = the matching rows with
    * every SET expression evaluated against the OLD row (one projection,
    * so `SET a = b, b = a` swaps), merged back under the table's keys.
    * Unmatched-at-commit rows (a concurrent delete won the race) are
    * dropped, never resurrected as inserts. Key columns reject — a
    * rekeying UPDATE is a delete + insert, not an update. */
  private[graft] def runUpdate(s: SparkSession, u: UpdateTable,
      txn: Option[(String, Long)] = None): Boolean = {
    val (alias, _) = unalias(u.table)
    val path = graftTargetPath(u.table).getOrElse(unsupported(
      "UPDATE target must be a graft table"))
    // find-then-commit under a pinned version (see runDelete): the SET
    // expressions evaluate against the find phase's snapshot rows, so a
    // head that moved before the commit would silently clobber the
    // winner's values with ones derived from a stale read
    refindLoop {
      val head = MergeTable.latestManifest(path).getOrElse(
        sys.error(s"no committed version under $path"))
      val sets = u.assignments.map { a =>
        val c = lastName(a.key)
        if (head.keys.exists(_.equalsIgnoreCase(c))) unsupported(
          s"UPDATE must not SET merge key '$c' — rekeying a row is a " +
            "delete + insert")
        c -> renderBare(a.value, alias)
      }
      require(sets.nonEmpty, "UPDATE needs at least one SET assignment")
      // a duplicate SET column would silently collapse in the projection
      // map — last writer wins is NOT SQL, which rejects the statement
      val dup = sets.groupBy(_._1.toLowerCase(java.util.Locale.ROOT))
        .collectFirst { case (c, vs) if vs.size > 1 => c }
      dup.foreach(c => unsupported(s"duplicate SET assignment for column '$c'"))
      val condSql = u.condition.map(renderBare(_, alias)).getOrElse("true")
      import org.apache.spark.sql.functions.expr
      val batch = prunedSnapshot(s, path, head, condSql)
        .withColumns(sets.map { case (c, e) => c -> expr(e) }.toMap)
      // update-all on matched, no inserts (an unmatched-at-commit row —
      // a concurrent delete won the race — is dropped, never resurrected)
      MergeTable.merge(s, path, batch, head.keys, head.clusterBy,
        matched = Seq(MergeTable.MergeClause(None,
          MergeTable.UpdateSet(Map.empty))),
        notMatched = Seq.empty, txn = txn,
        requireVersion = Some(head.version))
    }
  }

  /** `INSERT INTO graft.`…`` (upsert — the key-unique table model) and
    * `INSERT OVERWRITE` (the one-commit full sync: matched rows update,
    * new rows insert, absent rows delete; time travel keeps history).
    * The query arrives ALIGNED to the table schema (the analyzer's
    * output resolution ran before the rule swap — see [[GraftMergeRule]]'s
    * `outputResolved` gate). */
  private[graft] def runInsert(s: SparkSession, path: String,
      query: LogicalPlan, overwrite: Boolean): Unit = {
    val head = MergeTable.latestManifest(path).getOrElse(unsupported(
      s"INSERT target $path does not exist — a graft table is created by " +
        "its first transactional commit (df.write.format(\"graft\")" +
        ".option(\"keys\", …) or MergeTable.mergeUpsert), which pins the " +
        "merge keys"))
    val batch = org.apache.spark.sql.graftbridge.Bridge.ofRows(s, query)
    if (overwrite)
      MergeTable.merge(s, path, batch, head.keys, head.clusterBy,
        matched = Seq(MergeTable.MergeClause(None,
          MergeTable.UpdateSet(Map.empty))),
        notMatched = Seq(MergeTable.InsertClause(None, Map.empty)),
        notMatchedBySource = Seq(MergeTable.MergeClause(None,
          MergeTable.DeleteRow)))
    else
      MergeTable.mergeUpsert(s, path, batch, head.keys, head.clusterBy)
    ()
  }

  /** Execute a parsed (resolved or unresolved) [[MergeIntoTable]] whose
    * target is a graft table. */
  private[graft] def runMerge(s: SparkSession, m: MergeIntoTable,
      txn: Option[(String, Long)] = None): Boolean = {
    val (tAlias, _) = unalias(m.targetTable)
    val (sAlias, _) = unalias(m.sourceTable)
    val path = graftTargetPath(m.targetTable).getOrElse(unsupported(
      "target must be a graft table (graft.`/abs/path` or a graft-catalog identifier)"))

    // attribute side attribution: resolved attrs by exprId membership,
    // unresolved ones by alias-qualified name parts (outputSet is only
    // defined once a plan is resolved)
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    val tgtIds =
      if (m.targetTable.resolved) m.targetTable.outputSet else AttributeSet.empty
    val srcIds =
      if (m.sourceTable.resolved) m.sourceTable.outputSet else AttributeSet.empty
    // `s`/`t` attribution of one bare attribute (for key extraction and
    // identity-assignment checks)
    sealed trait Side; case object T extends Side; case object S extends Side
    def sideName(e: Expression): Option[(Option[Side], String)] = e match {
      case Cast(child, _, _, _) => sideName(child)
      case ar: AttributeReference =>
        val side = if (tgtIds.contains(ar)) Some(T)
        else if (srcIds.contains(ar)) Some(S) else None
        Some((side, ar.name))
      case ua: UnresolvedAttribute =>
        val side = ua.nameParts.headOption.flatMap { h =>
          if (tAlias.exists(_.equalsIgnoreCase(h))) Some(T)
          else if (sAlias.exists(_.equalsIgnoreCase(h))) Some(S) else None
        }
        Some((side, ua.nameParts.last))
      case _ => None
    }

    // ---- the ON condition: key equi-conjuncts + residual predicates -------
    // A conjunct t.<k> = s.<k'> is a KEY PAIR (k' renames to k below);
    // anything else — a non-equality, a comparison with a literal, an
    // equality within one side — is a RESIDUAL that folds into the clause
    // conditions. Cross-named pairs NEED side attribution; an equality of
    // two differently-named unattributable columns is rejected (qualify
    // them), never guessed.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // top-level OR split: each disjunct is one KEY-TUPLE ADDRESSING
    // (multi-tuple batch addressing — see the OR handling below); a
    // single disjunct is the ordinary ON shape
    def disjunctsOf(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
        disjunctsOf(l) ++ disjunctsOf(r)
      case other => Seq(other)
    }
    // (target key name, source column name) pairs + residuals of ONE
    // conjunction
    def classifyOn(on: Expression): (Seq[(String, String)], Seq[Expression]) =
      conjuncts(on)
        .foldLeft((Seq.empty[(String, String)], Seq.empty[Expression])) {
          case ((ks, rs), eq @ EqualTo(l, r)) =>
            (sideName(l), sideName(r)) match {
              case (Some((Some(T), tn)), Some((Some(S), sn))) =>
                (ks :+ (tn -> sn), rs)
              case (Some((Some(S), sn)), Some((Some(T), tn))) =>
                (ks :+ (tn -> sn), rs)
              case (Some((_, ln)), Some((_, rn)))
                  if ln.equalsIgnoreCase(rn) &&
                    !(sideName(l).get._1 == sideName(r).get._1 &&
                      sideName(l).get._1.isDefined) =>
                // same name, at most one side attributed: the classic
                // t.k = s.k key shape (or its unqualified spelling)
                (ks :+ (ln -> ln), rs)
              case (Some((sl, ln)), Some((sr, rn)))
                  if sl.isDefined && sl == sr =>
                // both columns on ONE side: a predicate, not a key
                (ks, rs :+ eq)
              case (Some((_, ln)), Some((_, rn))) => unsupported(
                s"ON equality ${eq.sql} compares differently-named columns " +
                  "whose sides cannot be attributed — qualify both " +
                  "(t.<col> = s.<col>)")
              case _ => (ks, rs :+ eq) // literal / expression compare: residual
            }
          case ((ks, rs), other) => (ks, rs :+ other)
        }
    val onDisjuncts = disjunctsOf(m.mergeCondition)
    val multiTuple = onDisjuncts.size > 1
    val disjunctParts = onDisjuncts.map(classifyOn)
    if (multiTuple) {
      // OR-of-key-tuples — `ON (t.k = s.a) OR (t.k = s.b)`: one source
      // row ADDRESSES up to one target key per disjunct (update a record
      // by primary OR alias id in one statement). Semantics are the
      // standard-MERGE ones via source EXPLOSION below; three shapes are
      // rejected with their rewrite spelled out because no sound reading
      // exists in the key-unique model:
      disjunctParts.zipWithIndex.foreach { case ((ks, rs), i) =>
        if (rs.nonEmpty) unsupported(
          s"OR-of-key-tuples ON: disjunct ${i + 1} carries non-key " +
            s"predicates (${rs.map(_.sql).mkString(" AND ")}) — each " +
            "disjunct must be a pure key-tuple equality; move predicates " +
            "into WHEN clause conditions")
        if (ks.isEmpty) unsupported(
          s"OR-of-key-tuples ON: disjunct ${i + 1} has no t.<key> = " +
            "s.<col> equality")
      }
      val keySets = disjunctParts.map(
        _._1.map(_._1.toLowerCase(java.util.Locale.ROOT)).toSet)
      if (keySets.distinct.size > 1) unsupported(
        "OR-of-key-tuples ON: every disjunct must address the SAME " +
          s"target key set; got ${keySets.mkString(" vs ")}")
      if (m.notMatchedActions.nonEmpty) unsupported(
        "OR-of-key-tuples ON cannot carry WHEN NOT MATCHED inserts — a " +
          "never-matched source row offers several candidate key tuples " +
          "and no rule picks one; insert through a second single-tuple " +
          "MERGE (or INSERT INTO) choosing the address explicitly")
      if (m.notMatchedBySourceActions.nonEmpty) unsupported(
        "OR-of-key-tuples ON cannot carry WHEN NOT MATCHED BY SOURCE " +
          "clauses — a target row is 'not matched' only against ALL " +
          "addressings of all source rows, which the per-tuple explosion " +
          "does not quantify; run the NMBS sweep as its own MERGE")
    }
    // the single-tuple path's pairs (multi-tuple handles its own below)
    val (keyPairs, residualExprs) =
      if (multiTuple) (disjunctParts.head._1, Seq.empty[Expression])
      else disjunctParts.head
    val parsedKeys = keyPairs.map(_._1)
    require(parsedKeys.nonEmpty,
      "MERGE needs at least one t.<key> = s.<key> equality in ON")
    // cross-named keys: source column (lower-cased) → target key name.
    // Multi-tuple ON keeps this EMPTY — the rename is per-disjunct and
    // happens in the explosion; clause expressions there reference the
    // target key names (or payload columns), never a bare address column
    val srcRename: Map[String, String] =
      if (multiTuple) Map.empty
      else keyPairs.collect {
        case (tn, sn) if !tn.equalsIgnoreCase(sn) =>
          sn.toLowerCase(java.util.Locale.ROOT) -> tn
      }.toMap
    def mapSrc(n: String): String =
      srcRename.getOrElse(n.toLowerCase(java.util.Locale.ROOT), n)

    def rewrite(e: Expression): Expression = e.transformUp {
      case ua: UnresolvedAttribute if ua.nameParts.length >= 2 =>
        val head = ua.nameParts.head
        if (tAlias.exists(_.equalsIgnoreCase(head)))
          UnresolvedAttribute(Seq("t") ++ ua.nameParts.tail)
        else if (sAlias.exists(_.equalsIgnoreCase(head)))
          // the source-side key column is RENAMED to the target key name
          // in the merged frame — rewrite references with it
          UnresolvedAttribute(
            Seq("s", mapSrc(ua.nameParts.tail.head)) ++ ua.nameParts.tail.tail)
        else ua
      case ar: AttributeReference if tgtIds.contains(ar) =>
        UnresolvedAttribute(Seq("t", ar.name))
      case ar: AttributeReference if srcIds.contains(ar) =>
        UnresolvedAttribute(Seq("s", mapSrc(ar.name)))
    }
    def render(e: Expression): String = rewrite(e).sql
    def renderOpt(c: Option[Expression]): Option[String] = c.map(render)

    // the residual folds as `AND (...)` into every MATCHED clause
    // condition: in the key-unique table model "matched" stays KEY-scoped
    // and the residual gates which matched pairs ACT (see the class doc
    // for why strict SQL's duplicate-insert reading cannot exist here).
    // Inserts are NOT folded: a never-key-matched source row is unmatched
    // under any residual value, and standard MERGE inserts it.
    val residualSql: Option[String] =
      if (residualExprs.isEmpty) None
      else Some(residualExprs.map(r => s"(${render(r)})").mkString(" AND "))
    def withResidual(cond: Option[String]): Option[String] =
      residualSql match {
        case None => cond
        case Some(r) => Some(cond.map(c => s"($c) AND $r").getOrElse(r))
      }

    // dropping a same-column duplicate would silently collapse to one
    // writer — SQL rejects the statement
    def rejectDuplicates(what: String, cols: Seq[String]): Unit =
      cols.groupBy(_.toLowerCase(java.util.Locale.ROOT))
        .collectFirst { case (c, vs) if vs.size > 1 => c }
        .foreach(c => unsupported(s"duplicate $what assignment for column '$c'"))

    /** One UPDATE SET assignment list → the engine's expression map.
      * Alignment fillers (`t.c = t.c` — the analyzer pads a partial SET
      * with these) and identity KEY assignments (`t.k = s.k`, a no-op on
      * a matched pair) drop out; a non-identity key assignment rejects
      * (rekeying a row is a delete + insert). An UNQUALIFIED identity
      * (`c = c`) reads as `c = s.c` in a matched clause (both sides in
      * scope; the source side is what an update means) and as a keep-old
      * filler in an NMBS clause (no source row exists). */
    def updateSetOf(assignments: Seq[Assignment],
        nmbsCtx: Boolean): Map[String, String] = {
      rejectDuplicates("SET", assignments.map(a =>
        sideName(a.key).map(_._2).getOrElse(unsupported(
          s"UPDATE SET key must be a target column: ${a.key.sql}"))))
      val set = assignments.flatMap { a =>
        val colName = sideName(a.key).map(_._2).getOrElse(unsupported(
          s"UPDATE SET key must be a target column: ${a.key.sql}"))
        val isKey = parsedKeys.exists(_.equalsIgnoreCase(colName))
        sideName(a.value) match {
          // identity spans the rename: `t.id = s.customer_id` under
          // `ON t.id = s.customer_id` assigns the key its own match value
          case Some((side, vn)) if isKey && mapSrc(vn).equalsIgnoreCase(colName) =>
            // identity key assignment: a no-op on a matched pair — but in
            // an NMBS clause there IS no source row, so `k = s.k` would
            // mean "set the key to NULL": reject, don't silently keep-old
            if (nmbsCtx && side.contains(S)) unsupported(
              s"NOT MATCHED BY SOURCE SET must not reference the source " +
                s"side (no source row exists): ${a.sql}")
            None
          case _ if isKey => unsupported(
            s"UPDATE SET must not rekey merge key '$colName' — " +
              s"got: ${a.sql}")
          case Some((Some(T), vn)) if vn.equalsIgnoreCase(colName) =>
            None // alignment filler t.c = t.c: kept column
          case Some((None, vn)) if vn.equalsIgnoreCase(colName) =>
            if (nmbsCtx) None else Some(colName -> s"s.`$colName`")
          case _ => Some(colName -> render(a.value))
        }
      }.toMap
      if (set.isEmpty) unsupported(
        "UPDATE SET assigns nothing (only key/keep-old identities)")
      set
    }

    // ---- matched clauses, statement order (first-match-wins) -------------
    val matchedClauses: Seq[MergeTable.MergeClause] = m.matchedActions.map {
      case UpdateStarAction(cond) =>
        MergeTable.MergeClause(renderOpt(cond), MergeTable.UpdateSet(Map.empty))
      case UpdateAction(cond, assignments, fromStar) =>
        val set = if (fromStar || assignments.isEmpty) Map.empty[String, String]
          else updateSetOf(assignments, nmbsCtx = false)
        MergeTable.MergeClause(renderOpt(cond), MergeTable.UpdateSet(set))
      case DeleteAction(cond) =>
        MergeTable.MergeClause(renderOpt(cond), MergeTable.DeleteRow)
      case other => unsupported(s"matched clause ${other.getClass.getSimpleName}")
    }

    // ---- not-matched (insert) clauses, statement order --------------------
    val insertClauses: Seq[MergeTable.InsertClause] = m.notMatchedActions.map {
      case InsertStarAction(cond) =>
        MergeTable.InsertClause(renderOpt(cond), Map.empty)
      case InsertAction(cond, assignments) =>
        if (assignments.isEmpty)
          MergeTable.InsertClause(renderOpt(cond), Map.empty)
        else {
          val cols = assignments.map(a =>
            sideName(a.key).map(_._2).getOrElse(unsupported(
              s"INSERT column must be a target column: ${a.key.sql}")))
          rejectDuplicates("INSERT", cols)
          // value expressions may reference `s.` only (no matched table
          // row exists) — the engine validates resolution per side;
          // unlisted non-key columns insert as typed NULLs (SQL column-
          // list semantics), keys must be identity (engine-enforced)
          MergeTable.InsertClause(renderOpt(cond),
            cols.zip(assignments.map(a => render(a.value))).toMap)
        }
      case other => unsupported(s"not-matched clause ${other.getClass.getSimpleName}")
    }

    // ---- not-matched-by-source clauses, statement order --------------------
    val nmbsClauses: Seq[MergeTable.MergeClause] =
      m.notMatchedBySourceActions.map {
        case DeleteAction(cond) =>
          MergeTable.MergeClause(renderOpt(cond), MergeTable.DeleteRow)
        case UpdateAction(cond, assignments, _) =>
          val set = updateSetOf(assignments, nmbsCtx = true)
          MergeTable.MergeClause(renderOpt(cond), MergeTable.UpdateSet(set))
        case other => unsupported(
          s"not-matched-by-source clause ${other.getClass.getSimpleName}")
      }

    // first-match-wins makes any clause after an unconditional one of the
    // same group unreachable — SQL rejects the statement, so do we (checked
    // on the conditions AS WRITTEN, before the residual fold: the fold adds
    // the SAME conjunct to every clause, which changes nothing about
    // in-group reachability)
    def rejectDeadClauses(group: String, conds: Seq[Option[String]]): Unit =
      conds.dropRight(1).zipWithIndex.collectFirst {
        case (None, i) => i
      }.foreach(i => unsupported(
        s"$group clause ${i + 1} of ${conds.size} is unconditional but not " +
          "last — first-match-wins makes the following clauses of its " +
          "group unreachable dead code"))
    rejectDeadClauses("WHEN MATCHED", matchedClauses.map(_.condition))
    rejectDeadClauses("WHEN NOT MATCHED", insertClauses.map(_.condition))
    rejectDeadClauses("WHEN NOT MATCHED BY SOURCE",
      nmbsClauses.map(_.condition))

    // residual guard: the fold is sound for MATCHED clauses (both sides
    // in scope); the one shape it would silently re-read is rejected with
    // the rewrite spelled out
    if (residualSql.nonEmpty && nmbsClauses.nonEmpty) unsupported(
      "ON carries non-key predicates " +
        s"(${residualExprs.map(_.sql).mkString(" AND ")}) and the " +
        "statement has WHEN NOT MATCHED BY SOURCE clauses — in the " +
        "key-unique table model the residual gates clause ACTIONS while " +
        "NMBS stays key-scoped, which silently disagrees with strict " +
        "SQL's reading; move the predicate into explicit clause " +
        "conditions instead")
    val foldedMatched = matchedClauses.map(c =>
      c.copy(condition = withResidual(c.condition)))
    // inserts pass through UNfolded — never-key-matched source rows are
    // NOT MATCHED in standard SQL regardless of the residual's value
    val foldedInserts = insertClauses

    // ---- source frame + table-aligned keys ---------------------------------
    // cross-named keys: rename the source's key columns to the target key
    // names (clause expressions were rewritten with mapSrc above), so the
    // engine sees its one key namespace and the batch carries no extra
    // column that would additively evolve the table schema
    val source0 =
      org.apache.spark.sql.graftbridge.Bridge.ofRows(s, m.sourceTable)
    def actualSrcCol(snLower: String): String =
      source0.columns.find(
        _.toLowerCase(java.util.Locale.ROOT) == snLower).getOrElse(
        unsupported(s"ON references source column '$snLower' which the " +
          "source does not produce"))
    val source =
      if (multiTuple) {
        // EXPLOSION: one frame per disjunct, target keys assigned from
        // that disjunct's address columns (one select, so swapped
        // addressings like ON (t.a=s.b AND t.b=s.a) read the ORIGINAL
        // row), unioned and exact-deduplicated (the same row addressing
        // the same key through two disjuncts is one merge row, not a
        // key-uniqueness violation). Address-ONLY columns — source
        // columns used as addresses that are not table columns — are
        // DROPPED: carrying them would additively widen the table schema
        // with every alias column, and a clause referencing one is
        // ambiguous across disjuncts anyway (it fails clause validation
        // loudly; reference the target key instead). Two genuinely
        // distinct source rows addressing one key still collide in the
        // engine's key-uniqueness check — the standard MERGE cardinality
        // violation, surfaced with the same error. To keep that true for
        // two EXACT-duplicate source rows (which the dedup would
        // otherwise silently collapse into one merge row, while the
        // single-tuple door rejects them), every source row is tagged
        // with a physical row id BEFORE the explosion: the dedup then
        // collapses only the same-row-two-disjuncts case, and duplicate
        // rows reach the engine as two rows for one key. The tag needs a
        // stable row↔id assignment across the per-disjunct reads, so the
        // tagged frame is pinned (localCheckpoint) — which also stops
        // the explosion re-running the source pipeline once per
        // disjunct.
        val tableColsLower = MergeTable.latestManifest(path) match {
          case Some(h) => org.apache.spark.sql.types.DataType
            .fromJson(h.schemaJson)
            .asInstanceOf[org.apache.spark.sql.types.StructType]
            .fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
          case None => unsupported(
            "OR-of-key-tuples ON addresses an EXISTING table's keys " +
              s"(matched-only semantics); $path has no committed version")
        }
        val addressOnly: Set[String] = disjunctParts.flatMap(_._1).collect {
          case (tn, sn) if !sn.equalsIgnoreCase(tn) =>
            sn.toLowerCase(java.util.Locale.ROOT)
        }.toSet -- tableColsLower
        import org.apache.spark.sql.functions.{col, monotonically_increasing_id}
        val ridCol = Iterator.iterate("__graft_source_rid")(_ + "_")
          .find(n => !source0.columns.exists(_.equalsIgnoreCase(n))).get
        val tagged = source0
          .withColumn(ridCol, monotonically_increasing_id())
          .localCheckpoint()
        val frames = disjunctParts.zipWithIndex.map { case ((ks, _), di) =>
          val keyMap = ks.map { case (tn, sn) =>
            tn.toLowerCase(java.util.Locale.ROOT) ->
              actualSrcCol(sn.toLowerCase(java.util.Locale.ROOT))
          }.toMap
          val kept = tagged.columns.toSeq.flatMap { c =>
            val lc = c.toLowerCase(java.util.Locale.ROOT)
            if (addressOnly.contains(lc)) None
            else if (keyMap.contains(lc)) {
              val addr = keyMap(lc)
              // mirror the single-tuple door's clobber rejection: a
              // source PAYLOAD column named like the target key would be
              // silently overwritten by this disjunct's address value —
              // a clause's `s.<key>` would read the address, not the
              // source's own column
              if (!addr.equalsIgnoreCase(c)) unsupported(
                s"ON disjunct ${di + 1} maps source column '$addr' onto " +
                  s"target key '$c', but the source ALSO has a column " +
                  s"named '$c' — the rename would clobber it; alias it " +
                  "away in the source")
              Some(col(addr).as(c))
            }
            else Some(col(c))
          }
          val missing = ks.collect {
            case (tn, sn) if !tagged.columns.exists(_.equalsIgnoreCase(tn)) =>
              col(actualSrcCol(sn.toLowerCase(java.util.Locale.ROOT))).as(tn)
          }
          tagged.select(kept ++ missing: _*)
        }
        frames.reduce(_ unionByName _).distinct().drop(ridCol)
      } else srcRename.foldLeft(source0) { case (df, (srcLower, tgt)) =>
        val actual = actualSrcCol(srcLower)
        if (df.columns.exists(c => c.equalsIgnoreCase(tgt) &&
            !c.equalsIgnoreCase(actual)))
          unsupported(s"ON maps source column '$actual' onto target key " +
            s"'$tgt', but the source ALSO has a column named '$tgt' — the " +
            "rename would clobber it; alias it away in the source")
        df.withColumnRenamed(actual, tgt)
      }
    val (keys, clusterBy) = MergeTable.latestManifest(path) match {
      case Some(head) =>
        // the engine pins key ORDER per table; accept any ON order with
        // the same key SET
        val ks = head.keys
        require(ks.map(_.toLowerCase).toSet ==
          parsedKeys.map(_.toLowerCase).toSet,
          s"ON keys ${parsedKeys.mkString(",")} must equal the table's " +
            s"merge keys ${ks.mkString(",")}")
        (ks, head.clusterBy)
      case None => (parsedKeys, parsedKeys)
    }

    // statement order passes straight through — the engine's clause
    // lists are first-match-wins, and the canonical unguarded upsert
    // (unconditional UPDATE SET * + INSERT *, nothing else) takes its
    // non-conditional fast path (no full-outer join) by shape detection
    MergeTable.merge(s, path, source, keys, clusterBy,
      matched = foldedMatched, notMatched = foldedInserts,
      notMatchedBySource = nmbsClauses, txn = txn)
  }
}

/** The analyzed-plan door: swaps MERGE INTO / UPDATE / DELETE statements
  * over a graft target for runnable commands BEFORE Spark's
  * row-level-operation rewrite would reject them (the target does not
  * implement `SupportsRowLevelOperations`; its commit protocol is the
  * engine's CAS log). Installed as a post-hoc resolution rule by
  * [[graft.functions.GraftExtensions]]. */
case class GraftMergeRule(session: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if GraftSql.graftTargetPath(m.targetTable).nonEmpty =>
      GraftMergeCommand(m)
    case d: DeleteFromTable if GraftSql.graftTargetPath(d.table).nonEmpty =>
      GraftDeleteCommand(d)
    case u: UpdateTable if GraftSql.graftTargetPath(u.table).nonEmpty =>
      GraftUpdateCommand(u)
    // INSERT INTO / INSERT OVERWRITE: swap only once the analyzer has
    // ALIGNED the query to the table schema (outputResolved — by-name /
    // by-position resolution, casts, NULL-fill all applied), and before
    // TableCapabilityCheck would reject the write-capability-less table
    case a: AppendData if a.query.resolved && a.outputResolved &&
        GraftSql.graftTargetPath(a.table).nonEmpty =>
      GraftInsertCommand(GraftSql.graftTargetPath(a.table).get, a.query,
        overwrite = false)
    case o: OverwriteByExpression if o.query.resolved && o.outputResolved &&
        GraftSql.graftTargetPath(o.table).nonEmpty =>
      o.deleteExpr match {
        case org.apache.spark.sql.catalyst.expressions.Literal(true, _) => ()
        case other => throw new UnsupportedOperationException(
          "graft INSERT OVERWRITE supports only the full-table form " +
            s"(got overwrite condition: ${other.sql}) — a conditional " +
            "replace is a MERGE with a NOT MATCHED BY SOURCE clause")
      }
      GraftInsertCommand(GraftSql.graftTargetPath(o.table).get, o.query,
        overwrite = true)
    case _ => plan
  }
}

/** Leaf command: the ALIGNED insert query held as state (not a child), so
  * the analyzer treats the swapped plan as resolved; execution lands on
  * the transactional merge (upsert, or full sync for OVERWRITE). */
case class GraftInsertCommand(path: String, query: LogicalPlan,
    overwrite: Boolean) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    GraftSql.runInsert(sparkSession, path, query, overwrite)
    Seq.empty
  }
}

/** Leaf command wrapper: holds the analyzed MERGE AST as plain state (not
  * a child), so the analyzer treats it as resolved and execution lands in
  * the engine's transactional merge. */
case class GraftMergeCommand(merge: MergeIntoTable) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    GraftSql.runMerge(sparkSession, merge)
    Seq.empty
  }
}

case class GraftDeleteCommand(delete: DeleteFromTable) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    GraftSql.runDelete(sparkSession, delete)
    Seq.empty
  }
}

case class GraftUpdateCommand(update: UpdateTable) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    GraftSql.runUpdate(sparkSession, update)
    Seq.empty
  }
}
