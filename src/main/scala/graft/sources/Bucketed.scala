package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table source — the pre-shuffle co-location lever: lineitem and
  * orders written `bucketBy(8, orderkey)` join WITHOUT a shuffle exchange
  * (each bucket pair joins locally; the only exchange left in the query is
  * the final group-by). At 100 TB this is how a fact⋈fact join on a shared
  * key avoids re-shuffling petabytes on every run: pay the partitioned
  * write once, read co-located forever. The merge hint pins the sort-merge
  * path — for two co-bucketed fact tables that IS the scale-correct plan
  * (broadcast is off the table by size).
  *
  * Tables are managed (session catalog) under the graft warehouse dir in
  * java.io.tmpdir, one pair per input dir; a fresh session rebuilds them
  * (the in-memory catalog does not persist), clearing any stale dir a
  * previous JVM left behind.
  */
object Bucketed {

  private def warehousePath(table: String) = java.nio.file.Paths.get(
    System.getProperty("java.io.tmpdir", "/tmp"), "graft-warehouse", table)

  private def ensure(s: SparkSession, sfDir: String): (String, String) = {
    // suffix includes the APPLICATION id, not just the input-dir hash: two
    // JVMs sharing java.io.tmpdir (concurrent test + bench runs) would
    // otherwise race the exists-check/delete/saveAsTable sequence on one
    // directory — the per-JVM lock below cannot see the other process.
    val appTag = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "")
    val dirTag = java.util.UUID
      .nameUUIDFromBytes(sfDir.getBytes("UTF-8")).toString.take(8).replace("-", "")
    val li = s"li_bkt_${dirTag}_$appTag"
    val ord = s"ord_bkt_${dirTag}_$appTag"
    def build(table: String, df: => DataFrame, key: String): Unit =
      if (!s.catalog.tableExists(table)) {
        graft.ops.IndexStore.recordFixtureBuild(s"bucketed-$table")
        // belt-and-braces: an identically-named stale dir (appId collision
        // across reboots) blocks CREATE; best-effort clear, tolerating a
        // concurrent deletion
        val p = warehousePath(table)
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          try java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
          catch { case _: java.io.IOException => () }
        }
        df.write.mode("overwrite")
          .bucketBy(8, key).sortBy(key).saveAsTable(table)
      }
    Bucketed.synchronized {
      build(li, Tables.read(s, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
        "l_orderkey")
      build(ord, Tables.read(s, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")), "o_orderkey")
    }
    (li, ord)
  }

  /** Co-bucketed lineitem⋈orders → per-priority revenue. The join carries
    * NO shuffle exchange (pinned in PlanAuditSpec: the single exchange in
    * the plan is the group-by's); the oracle computes the same aggregate
    * from the ORIGINAL parquet, so bucket routing errors (wrong hash, row
    * loss at bucket boundaries) break the compare.
    */
  def bucketedJoinAgg(s: SparkSession, sfDir: String): DataFrame = {
    val (li, ord) = ensure(s, sfDir)
    s.table(li)
      .join(s.table(ord).hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val bucketedJoinAggSql: String =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}
