package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{RuleBasedTrailClassifier, WeatherModel}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and returns a DataFrame whose column
  * names match its DuckDB oracle exactly; results are ordered on their key
  * columns so the hash compare is order-independent either way.
  */
object SparkEntry {

  /** Flagship: the reference's rule-based multi-label trail classification
    * (SURVEY §2.9) over the events-as-weather fact table.
    */
  def entry(spark: SparkSession): DataFrame =
    classifierQuery(spark, "/root/testdata/sf0.001")

  private def classifierQuery(spark: SparkSession, sfDir: String): DataFrame =
    RuleBasedTrailClassifier
      .classify(WeatherModel.weatherRecords(spark, sfDir), WeatherModel.Anchor)
      .orderBy("city_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.9 flagship: conditional window aggs + CASE-WHEN multi-label + K3 sink shape
    "q_classifier" -> ((s, dir) => classifierQuery(s, dir)),

    // TPC-H Q1 shape: wide-scan hash aggregate (A-family at relational scale)
    "q1_pricing_summary" -> { (s, dir) =>
      Tables.read(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })

  def oracleSql: Map[String, String] = Map(
    "q_classifier" -> RuleBasedTrailClassifier.oracleSql(WeatherModel.Anchor),
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
