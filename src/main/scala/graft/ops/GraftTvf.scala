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

  val detailSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("num_files", IntegerType, nullable = false),
    StructField("physical_rows", LongType, nullable = false),
    StructField("visible_rows", LongType, nullable = false),
    StructField("dv_files", IntegerType, nullable = false),
    StructField("keys", StringType, nullable = false),
    StructField("cluster_by", StringType, nullable = false),
    StructField("columns", StringType, nullable = false),
    StructField("renamed_columns", IntegerType, nullable = false),
    StructField("retired_physical", IntegerType, nullable = false)))

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
      m.keys.mkString(","),
      m.clusterBy.mkString(","),
      schema.fieldNames.mkString(","),
      m.columnMap.size,
      m.retiredPhysical.size)
    LocalRelation.fromExternalRows(
      DataTypeUtils.toAttributes(detailSchema), Seq(row))
  }
}
