package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** SQL front end for the MAINTENANCE commands — the `OPTIMIZE` /
  * `VACUUM` / `RESTORE`
  * DDL Spark's own grammar doesn't know, intercepted by a delegating
  * [[ParserInterface]] (the extension-parser pattern every lakehouse
  * format uses; installed by [[graft.functions.GraftExtensions]]):
  *
  * {{{
  *   OPTIMIZE graft.`/abs/path`                        -- compaction + DV debt
  *   OPTIMIZE graft.`/abs/path` ZORDER BY (a, b)       -- z re-layout
  *   OPTIMIZE graft.`/abs/path` SPLIT BY (a)           -- split re-layout
  *   OPTIMIZE graft.`/abs/path` LEDGERS                -- + ledger backfill
  *   OPTIMIZE graft.`/abs/path` BLOOMS                 -- in-place bloom backfill
  *   VACUUM graft.`/abs/path`                          -- default retention
  *   VACUUM graft.`/abs/path` RETAIN 5 VERSIONS
  *   VACUUM graft.`/abs/path` RETAIN 5 VERSIONS GRACE 0 MS
  *   VACUUM graft.`/abs/path` RETAIN 5 VERSIONS GRACE 0 MS DRY RUN
  *   RESTORE graft.`/abs/path` TO VERSION AS OF 3
  *   RESTORE graft.`/abs/path` TO TIMESTAMP AS OF '2026-08-16 12:00:00'
  * }}}
  *
  * Both return a one-row metrics frame (`rewritten_files` /
  * `deleted_files`) so `spark.sql(...).collect()` reports what the
  * command did. Everything that is NOT one of these two statements
  * delegates verbatim to Spark's parser — the wrapper adds grammar, it
  * never changes any.
  *
  * DELIBERATELY NOT HERE: `ALTER TABLE … ADD/DROP CONSTRAINT`. Spark
  * 4.1's own grammar parses it and routes through
  * [[graft.sources.GraftCatalog.alterTable]] (advertised via
  * `SUPPORT_TABLE_CONSTRAINT`), so the engine gets the native DDL, the
  * analyzer's checks, and `DESCRIBE`-level reporting for free — a regex
  * twin would only shadow it.
  */
object GraftMaintenanceSql {

  // strict anchored forms; the table is addressed exactly like every
  // other graft SQL statement (graft.`/abs/path`)
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+graft\s*\.\s*`([^`]+)`""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?""" +
      """(?:\s+SPLIT\s+BY\s*\(([^)]*)\))?""" +
      """(?:\s+(LEDGERS|BLOOMS))?\s*;?\s*""").r
  private val RestoreRe =
    ("""(?is)\s*RESTORE\s+graft\s*\.\s*`([^`]+)`""" +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val RestoreTsRe =
    ("""(?is)\s*RESTORE\s+graft\s*\.\s*`([^`]+)`""" +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""").r

  private val VacuumRe =
    ("""(?is)\s*VACUUM\s+graft\s*\.\s*`([^`]+)`""" +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?""" +
      """(?:\s+GRACE\s+(\d+)\s+MS)?""" +
      """(?:\s+(DRY\s+RUN))?\s*;?\s*""").r

  private def cols(group: String): Seq[String] =
    Option(group).toSeq.flatMap(_.split(",").toSeq)
      .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)

  /** The graft maintenance statements, or None → delegate. */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case OptimizeRe(path, z, sp, led) =>
      // an EMPTY column list must not silently degrade to plain
      // compaction — the user asked for a re-layout and named no axis
      require(z == null || cols(z).nonEmpty,
        "OPTIMIZE ... ZORDER BY () names no columns")
      require(sp == null || cols(sp).nonEmpty,
        "OPTIMIZE ... SPLIT BY () names no columns")
      val mode = Option(led).map(_.trim.toUpperCase(java.util.Locale.ROOT))
      if (mode.contains("BLOOMS")) {
        require(z == null && sp == null,
          "OPTIMIZE ... BLOOMS is an in-place index backfill — it does " +
            "not compose with a re-layout; run them as two statements")
        Some(GraftBloomBackfillCommand(path))
      } else
        Some(GraftOptimizeCommand(path, cols(z), cols(sp), mode.contains("LEDGERS")))
    case RestoreRe(path, v) =>
      Some(GraftRestoreCommand(path, Left(v.toLong)))
    case RestoreTsRe(path, instant) =>
      Some(GraftRestoreCommand(path, Right(instant)))
    case VacuumRe(path, retain, grace, dry) =>
      Some(GraftVacuumCommand(path,
        Option(retain).map(_.toInt),
        Option(grace).map(_.toLong),
        dryRun = dry != null))
    case _ => None
  }
}

/** Delegating parser: the two maintenance statements short-circuit, every
  * other string — plans, expressions, identifiers, schemas — is Spark's
  * parser verbatim. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMaintenanceSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** `OPTIMIZE graft.`p`` — compaction / re-layout / ledger backfill via
  * [[MergeTable.optimize]]; one metrics row back. */
case class GraftOptimizeCommand(path: String, zorderBy: Seq[String],
    splitBy: Seq[String], ledgerBackfill: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("rewritten_files", IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(MergeTable.optimize(sparkSession, path,
      zorderBy = zorderBy, splitBy = splitBy,
      ledgerBackfill = ledgerBackfill)))
}

/** `OPTIMIZE graft.`p` BLOOMS` — IN-PLACE bloom point-index backfill
  * via [[MergeTable.bloomBackfill]]: one read-only scan + a
  * metadata-only commit, zero data bytes rewritten. One metrics row
  * back: entries stamped. */
case class GraftBloomBackfillCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("stamped_files", IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(MergeTable.bloomBackfill(sparkSession, path)))
}

/** `RESTORE graft.`p` TO VERSION|TIMESTAMP AS OF …` — roll the head
  * FORWARD to an exact historical state via [[MergeTable.restore]]
  * (Delta-style: history is preserved, the bad interval stays auditable
  * and CDF-consumable); timestamps accept epoch millis or timestamp
  * strings like every other wall-clock door. One metrics row back: the
  * NEW head version the restore committed. */
case class GraftRestoreCommand(path: String,
    to: Either[Long, String]) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("restored_to_version",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val v = to match {
      case Left(version) => version
      case Right(instant) => MergeTable.versionAsOf(path,
        GraftInstants.parseMillis(instant, "RESTORE … TIMESTAMP AS OF",
          ceil = false))
    }
    Seq(Row(MergeTable.restore(path, v)))
  }
}

/** `VACUUM graft.`p`` — age-gated unreferenced-file collection via
  * [[MergeTable.vacuum]]; one metrics row back. */
case class GraftVacuumCommand(path: String, retainVersions: Option[Int],
    graceMs: Option[Long], dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference(
      if (dryRun) "would_delete_files" else "deleted_files",
      IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(MergeTable.vacuum(path,
      graceMs = graceMs.getOrElse(MergeTable.DefaultVacuumGraceMs),
      retainVersions =
        retainVersions.getOrElse(MergeTable.DefaultVacuumRetainVersions),
      dryRun = dryRun)))
}
