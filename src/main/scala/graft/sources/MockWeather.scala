package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.WeatherModel

/** S7: deterministic synthetic weather generator — the reference's mock
  * source (`/root/reference/fetch-weather/src/api.py:144-177`: 48 hourly
  * rows, `temp = 18.0 + i*0.1`; fixture rain of 2.5 mm on even hours,
  * `tests/conftest.py:66-123`) as a `spark.range` source. Generators are
  * the zero-IO way to scale-test an operator: `spark.range(N)` parallelizes
  * perfectly and costs no storage.
  */
object MockWeather {

  def hourlyForecast(spark: SparkSession, anchor: String = WeatherModel.Anchor,
      hours: Int = 48): DataFrame =
    spark.range(hours).select(
      col("id").as("i"),
      date_format(
        expr(s"TIMESTAMP '$anchor' + make_interval(0, 0, 0, 0, cast(id as int), 0, 0)"),
        "yyyy-MM-dd'T'HH:mm:ss").as("ts_iso"),
      round(lit(18.0) + col("id") * 0.1, 4).as("temperature_deg_c"),
      // P2's rain default: struct present on even hours, coalesced to 0.0
      when(col("id") % 2 === 0, 2.5).otherwise(0.0).as("rain_fall_total_mm"),
      round(lit(4.1) - col("id") * 0.2, 4).as("wind_speed_mps"))
      .orderBy("i")

  def hourlyForecastSql(anchor: String = WeatherModel.Anchor, hours: Int = 48): String =
    s"""SELECT range::BIGINT AS i,
       |  strftime(TIMESTAMP '$anchor' + to_hours(range), '%Y-%m-%dT%H:%M:%S') AS ts_iso,
       |  round(18.0 + range * 0.1, 4) AS temperature_deg_c,
       |  CASE WHEN range % 2 = 0 THEN 2.5 ELSE 0.0 END AS rain_fall_total_mm,
       |  round(4.1 - range * 0.2, 4) AS wind_speed_mps
       |FROM range($hours) ORDER BY i""".stripMargin
}
