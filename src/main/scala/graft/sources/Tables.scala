package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit-schema parquet readers for the shared test tables.
  *
  * The reference declares every record shape up front with Pydantic and never
  * infers (`/root/reference/categorize-trail-conditions/src/models.py:12-18`,
  * `fetch-weather/src/api.py:8-16`); the Spark-native equivalent is an
  * explicit `StructType` per table so a scan never pays schema inference and
  * unknown columns are ignored by projection rather than by row-level code.
  *
  * Scale note: all readers return the raw scan — no caching, no collect.
  * Filters/projections composed on top of these reach the parquet reader via
  * Catalyst pushdown (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {

  // Schemas match the physical parquet types exactly (int32 vs int64 matters
  // for the vectorized reader).
  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  // events.ts is parquet TIMESTAMP(NANOS), which Spark cannot represent
  // (PARQUET_TYPE_ILLEGAL): sessions set
  // spark.sql.legacy.parquet.nanosAsLong=true, the scan reads raw int64
  // nanos, and [[read]] converts to TimestampType via integer microsecond
  // division (session tz pinned UTC).
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** Scan one table from a scale-factor directory with its declared schema. */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    // `ts div 1000` (integer division) — ns epochs exceed double's 2^53
    // mantissa, so a float division here would corrupt timestamps.
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
