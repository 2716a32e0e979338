package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types._

/** SQL table functions over merge-table METADATA — the `DESCRIBE
  * HISTORY` / `DESCRIBE DETAIL` analogs, registered by
  * [[graft.functions.GraftExtensions]]:
  *
  * {{{
  *   SELECT * FROM graft_history('/abs/path')   -- one row per retained commit
  *   SELECT * FROM graft_detail('/abs/path')    -- one summary row for the head
  * }}}
  *
  * Both resolve to a [[LocalRelation]] built at analysis time from
  * bounded driver-side metadata: history is O(retained versions) light
  * record reads (externalized listings are never streamed — see
  * [[MergeTable.history]]), detail is one manifest resolution. Neither
  * touches a data file.
  */
object GraftTvf {

  private def pathArg(fn: String, children: Seq[Expression]): String =
    children match {
      case Seq(Literal(s, StringType)) if s != null => s.toString
      case _ => throw new IllegalArgumentException(
        s"$fn expects exactly one non-null string literal (the table " +
          s"path), got: ${children.map(_.sql).mkString(", ")}")
    }

  val historySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("num_adds", IntegerType, nullable = false),
    StructField("num_removes", IntegerType, nullable = false)))

  /** `graft_history(path)` — [[MergeTable.history]] as a relation. */
  def history(children: Seq[Expression]): LogicalPlan = {
    val path = pathArg("graft_history", children)
    val rows = MergeTable.history(path).map(c =>
      Row(c.version, c.timestampMs, c.kind, c.numAdds, c.numRemoves))
    LocalRelation.fromExternalRows(
      DataTypeUtils.toAttributes(historySchema), rows)
  }

  /** `graft_changes(path, fromVersion[, toVersion])` — the change data
    * feed as a composable SQL relation:
    *
    * {{{
    *   SELECT change_type, count(*) FROM graft_changes('/p', 2) GROUP BY 1
    * }}}
    *
    * Returns the SAME framing as the batch `readChangeFeed` option and
    * the streaming source ([[graft.sources.GraftChangeFeed]]): table
    * columns + `<c>_pre` preimages + `change_type`, `feed_type`,
    * `_commit_version`. Resolution is analysis-time PLAN construction
    * only (the per-version diffs are lazy DataFrames); no job runs and
    * no data file is read until the enclosing query executes. */
  def changes(children: Seq[Expression]): LogicalPlan = {
    def longArg(e: Expression, what: String): Long = {
      // accept any FOLDABLE deterministic integer expression (`1 + 1`,
      // a cast literal) — folded here, exactly what ConstantFolding
      // would do one phase later
      val folded =
        if (e.foldable && e.deterministic)
          scala.util.Try(Literal.create(e.eval(null), e.dataType)).getOrElse(e)
        else e
      folded match {
        case Literal(v, LongType) if v != null => v.asInstanceOf[Long]
        case Literal(v, IntegerType) if v != null => v.asInstanceOf[Int].toLong
        case other => throw new IllegalArgumentException(
          s"graft_changes: $what must be an integer literal, got ${other.sql}")
      }
    }
    val (path, from, toOpt) = children match {
      case Seq(Literal(p, StringType), f) if p != null =>
        (p.toString, longArg(f, "fromVersion"), None)
      case Seq(Literal(p, StringType), f, t) if p != null =>
        (p.toString, longArg(f, "fromVersion"),
          Some(longArg(t, "toVersion")))
      case _ => throw new IllegalArgumentException(
        "graft_changes expects (path, fromVersion[, toVersion]) literals, " +
          s"got: ${children.map(_.sql).mkString(", ")}")
    }
    val head = MergeTable.latestManifest(path).getOrElse(
      throw new IllegalArgumentException(
        s"graft_changes: no committed version under $path"))
    val to = toOpt.getOrElse(head.version)
    require(from >= 0 && from <= to,
      s"graft_changes: range [$from, $to] is empty or negative")
    require(to <= head.version,
      s"graft_changes: toVersion $to is beyond the head v${head.version}")
    val spark = org.apache.spark.sql.SparkSession.active
    val shape = graft.sources.GraftChangeFeed.shapeFor(
      path, head, "graft_changes")
    graft.sources.GraftChangeFeed.framesFor(spark, shape, from, to)
      .queryExecution.analyzed
  }

  /** `graft_changes_since(path, tsMillis[, tsMillisEnd])` — the change
    * data feed addressed by WALL-CLOCK instants: the range starts at the
    * earliest version committed at or after `tsMillis`
    * ([[MergeTable.versionSinceTimestamp]]) and ends at the newest
    * committed at or before `tsMillisEnd` ([[MergeTable.versionAsOf]];
    * default the head) — the SQL twin of the batch door's
    * `startingTimestamp`/`endingTimestamp` options, same framing, same
    * analysis-time lazy-plan construction. An instant past every
    * retained commit yields the loud empty-range error (a TVF has no
    * future-subscription reading — stream for that). */
  def changesSince(children: Seq[Expression]): LogicalPlan = {
    // `ceil` picks sub-millisecond rounding: a start bound (at-or-after)
    // rounds up, an end bound (at-or-before) rounds down — commit
    // instants are millis-grained, and rounding toward the bound would
    // silently widen the range.
    def tsArg(e: Expression, what: String, ceil: Boolean): Long = {
      val folded =
        if (e.foldable && e.deterministic)
          scala.util.Try(Literal.create(e.eval(null), e.dataType)).getOrElse(e)
        else e
      folded match {
        case Literal(v, LongType) if v != null => v.asInstanceOf[Long]
        case Literal(v, IntegerType) if v != null => v.asInstanceOf[Int].toLong
        // TIMESTAMP '…' — internal value is epoch micros
        case Literal(v, TimestampType) if v != null =>
          GraftInstants.microsToMillis(v.asInstanceOf[Long], ceil)
        // DATE '…' — internal value is epoch days, read as local
        // midnight in the session timezone (CAST(date AS TIMESTAMP))
        case Literal(v, DateType) if v != null =>
          val micros = org.apache.spark.sql.catalyst.util.DateTimeUtils
            .daysToMicros(v.asInstanceOf[Int], java.time.ZoneId.of(
              org.apache.spark.sql.internal.SQLConf.get
                .sessionLocalTimeZone))
          GraftInstants.microsToMillis(micros, ceil)
        // string literal — epoch-millis digits or Spark's
        // timestamp-string grammar in the session timezone
        case Literal(v, StringType) if v != null =>
          GraftInstants.parseMillis(v.toString, s"graft_changes_since: $what",
            ceil)
        case other => throw new IllegalArgumentException(
          s"graft_changes_since: $what must be an epoch-millis integer, " +
            s"TIMESTAMP/DATE, or timestamp-string literal, got ${other.sql}")
      }
    }
    val (path, fromTs, toTsOpt) = children match {
      case Seq(Literal(p, StringType), f) if p != null =>
        (p.toString, tsArg(f, "ts", ceil = true), None)
      case Seq(Literal(p, StringType), f, t) if p != null =>
        (p.toString, tsArg(f, "ts", ceil = true),
          Some(tsArg(t, "tsEnd", ceil = false)))
      case _ => throw new IllegalArgumentException(
        "graft_changes_since expects (path, ts[, tsEnd]) " +
          s"literals, got: ${children.map(_.sql).mkString(", ")}")
    }
    val head = MergeTable.latestManifest(path).getOrElse(
      throw new IllegalArgumentException(
        s"graft_changes_since: no committed version under $path"))
    val from = MergeTable.versionSinceTimestamp(path, fromTs).getOrElse(
      throw new IllegalArgumentException(
        s"graft_changes_since: no commit of $path at or after $fromTs — " +
          s"the head v${head.version} is older; stream with " +
          "startingTimestamp to subscribe to future commits"))
    val to = toTsOpt.map(MergeTable.versionAsOf(path, _))
      .getOrElse(head.version)
    require(from <= to,
      s"graft_changes_since: instants [$fromTs, ${toTsOpt.get}] resolve " +
        s"to the empty version range [$from, $to]")
    val spark = org.apache.spark.sql.SparkSession.active
    val shape = graft.sources.GraftChangeFeed.shapeFor(
      path, head, "graft_changes_since")
    graft.sources.GraftChangeFeed.framesFor(spark, shape, from, to)
      .queryExecution.analyzed
  }

  val detailSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("num_files", IntegerType, nullable = false),
    StructField("physical_rows", LongType, nullable = false),
    StructField("visible_rows", LongType, nullable = false),
    StructField("dv_files", IntegerType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("keys", StringType, nullable = false),
    StructField("cluster_by", StringType, nullable = false),
    StructField("columns", StringType, nullable = false),
    StructField("renamed_columns", IntegerType, nullable = false),
    StructField("retired_physical", IntegerType, nullable = false),
    // round-18 additions: the declared write-side contracts and the
    // bloom index footprint, so one SQL row answers "what does this
    // table enforce and skip on"
    StructField("constraints", StringType, nullable = false),
    StructField("properties", StringType, nullable = false),
    StructField("bloom_files", IntegerType, nullable = false)))

  /** `graft_detail(path)` — one summary row for the head manifest. */
  def detail(children: Seq[Expression]): LogicalPlan = {
    val path = pathArg("graft_detail", children)
    val m = MergeTable.latestManifest(path).getOrElse(
      throw new IllegalArgumentException(
        s"graft_detail: no committed version under $path"))
    val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
    val row = Row(
      m.version,
      m.files.size,
      m.files.map(_.numRows).sum,
      m.files.map(_.visibleRows).sum,
      m.files.count(_.dv.nonEmpty),
      m.files.map(_.bytes).sum,
      m.keys.mkString(","),
      m.clusterBy.mkString(","),
      schema.fieldNames.mkString(","),
      m.columnMap.size,
      m.retiredPhysical.size,
      m.constraints.toSeq.sortBy(_._1)
        .map { case (n, e) => s"$n CHECK ($e)" }.mkString("; "),
      m.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(","),
      m.files.count(_.bloom.nonEmpty))
    LocalRelation.fromExternalRows(
      DataTypeUtils.toAttributes(detailSchema), Seq(row))
  }
}
