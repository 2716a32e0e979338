package graft

import org.apache.spark.sql.SparkSession

/** Single place to build a correctly-configured local session.
  *
  * Settings chosen for the driver's local[32] harness but written the way a
  * 1000-executor cluster deployment would be: AQE on (runtime re-plan, skew
  * join splitting, shuffle coalescing), shuffle partitions sized to the
  * parallelism actually available (NOT the 200 default), session timezone
  * pinned UTC so event-time semantics match the DuckDB oracle.
  */
object GraftSession {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val builder = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // SQL door to merge tables: SELECT ... FROM graft.`/abs/path`
      // (+ VERSION AS OF / TIMESTAMP AS OF) — see graft.sources.GraftCatalog
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      // events.ts is parquet TIMESTAMP(NANOS) — unreadable without this
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // keep managed tables (bucketing tests) out of the repo tree
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
    // deployment-parameterized settings: SPARK_GRAFT_CONF is a
    // semicolon-separated `key=value` list applied LAST, so a cluster
    // deployment (or an A/B experiment) can override any of the local
    // defaults above without a rebuild — the mechanism the optimization
    // guide's "configs are the last 10-30%" tier calls for, kept out of
    // the code so the bench's driver contract stays comparable by default
    val extra = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
    val withExtra = extra.split(";").map(_.trim).filter(_.contains("="))
      .foldLeft(builder) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k.trim, v.trim)
      }
    val spark = withExtra.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
