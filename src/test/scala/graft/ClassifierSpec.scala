package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{RuleBasedTrailClassifier, WeatherModel}

/** Truth-table tests for the rule-based classifier — each rule ×
  * boundary values (the reference ships no classifier unit tests at all;
  * `/root/reference/DESIGN.md:54` admits the gap).
  */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val anchor = "2024-01-20 00:00:00"

  /** (city, tsOffsetHours from anchor, temp, rain, source) → weather df. */
  private def weather(rows: Seq[(Long, Int, Double, Double, String)]): DataFrame =
    rows.toDF("city_id", "off_h", "temperature_deg_c", "rain_fall_total_mm", "data_source")
      .withColumn(
        "timestamp_utc",
        expr(s"TIMESTAMP '$anchor' + make_interval(0, 0, 0, 0, off_h, 0, 0)"))
      .drop("off_h")

  private def labelsOf(rows: Seq[(Long, Int, Double, Double, String)]): Map[Long, String] =
    RuleBasedTrailClassifier.classify(weather(rows), anchor)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  val H = WeatherModel.Historical
  val F = WeatherModel.Forecast

  test("mud: 2-day rain >= 5 with no warm day => TRAIL_MUD_WARNING") {
    val got = labelsOf(Seq(
      (1L, -10, 4.0, 3.0, H), (1L, -30, 5.0, 2.5, H), // rain2d = 5.5
      (1L, 2, 5.0, 6.0, F)))                          // fcst rain keeps dry rule off
    assert(got(1L) == "TRAIL_MUD_WARNING")
  }

  test("mud: warm day suppresses the warning") {
    val got = labelsOf(Seq(
      (1L, -10, 11.0, 3.0, H), (1L, -30, 5.0, 2.5, H),
      (1L, 2, 5.0, 6.0, F)))
    assert(!got(1L).contains("TRAIL_MUD_WARNING"))
  }

  test("dry: low past and forecast rain => TRAIL_DRY_EXCELLENT") {
    val got = labelsOf(Seq(
      (2L, -10, 4.0, 1.0, H), (2L, 2, 6.0, 1.0, F)))
    assert(got(2L) == "TRAIL_DRY_EXCELLENT,SNOWPACK_HEAVY_WET" ||
      got(2L).startsWith("TRAIL_DRY_EXCELLENT"))
  }

  test("boundary: 2-day rain exactly 5.0 is a mud warning, not dry") {
    val got = labelsOf(Seq(
      (3L, -10, 4.0, 5.0, H), (3L, 2, 4.0, 0.0, F)))
    assert(got(3L).startsWith("TRAIL_MUD_WARNING"))
  }

  test("old rain outside the 2-day window is ignored") {
    val got = labelsOf(Seq(
      (4L, -49, 4.0, 50.0, H),  // 49h ago: outside the 48h trailing window
      (4L, 2, 4.0, 0.0, F)))
    assert(got(4L).startsWith("TRAIL_DRY_EXCELLENT"))
  }

  test("heat: max forecast temp > 35 anywhere in 48h => HEAT_ADVISORY") {
    val got = labelsOf(Seq(
      (5L, -10, 4.0, 6.0, H),
      (5L, 40, 35.5, 6.0, F)))   // hour 40 < 48h horizon, outside first 24h
    assert(got(5L).contains("HEAT_ADVISORY"))
    // but not at exactly 35.0
    val not = labelsOf(Seq((5L, -10, 4.0, 6.0, H), (5L, 40, 35.0, 6.0, F)))
    assert(!not(5L).contains("HEAT_ADVISORY"))
  }

  test("snowpack icy: warm history then freezing first-24h forecast") {
    val got = labelsOf(Seq(
      (6L, -10, 2.0, 6.0, H),
      (6L, 3, -1.0, 0.0, F)))
    assert(got(6L).contains("SNOWPACK_ICY_CONDITIONS"))
  }

  test("snowpack heavy wet: >5C history and above-freezing forecast") {
    val got = labelsOf(Seq(
      (7L, -10, 6.0, 6.0, H),
      (7L, 3, 1.0, 0.0, F)))
    assert(got(7L).contains("SNOWPACK_HEAVY_WET"))
  }

  test("snowpack: empty forecast side => rule does not fire") {
    val got = labelsOf(Seq((8L, -10, 6.0, 6.0, H)))
    assert(!got(8L).contains("SNOWPACK"))
  }

  test("heavy precip: fcst rain >= 10 routes on avg temp sign") {
    val cold = labelsOf(Seq(
      (9L, 1, -2.0, 6.0, F), (9L, 2, -1.0, 5.0, F)))   // sum 11, avg -1.5
    assert(cold(9L).contains("HEAVY_SNOW_WARNING"))
    val warm = labelsOf(Seq(
      (9L, 1, 2.0, 6.0, F), (9L, 2, 1.0, 5.0, F)))
    assert(warm(9L).contains("TRAIL_CLOSED_HEAVY_RAIN"))
    val under = labelsOf(Seq(
      (9L, 1, 2.0, 6.0, F), (9L, 2, 1.0, 3.9, F)))     // sum 9.9 < 10
    assert(!under(9L).contains("TRAIL_CLOSED_HEAVY_RAIN"))
  }

  test("forecast rain after hour 24 does not count toward the 24h sums") {
    val got = labelsOf(Seq(
      (10L, 30, 2.0, 50.0, F),  // hour 30: inside 48h horizon, outside 24h
      (10L, 1, 2.0, 1.0, F)))
    assert(!got(10L).contains("TRAIL_CLOSED_HEAVY_RAIN"))
  }

  test("city with no relevant rows disappears (per-task semantics)") {
    val got = labelsOf(Seq((11L, 60, 2.0, 1.0, F)))    // beyond 48h horizon
    assert(!got.contains(11L))
  }

  test("multi-label output is comma-joined in rule order") {
    // mud warning + icy at once
    val got = labelsOf(Seq(
      (12L, -10, 2.0, 6.0, H),
      (12L, 3, -1.0, 0.0, F)))
    assert(got(12L) == "TRAIL_MUD_WARNING,SNOWPACK_ICY_CONDITIONS")
  }
}
