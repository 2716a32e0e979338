package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sinks, WeatherModel}
import graft.pipeline.Pipelines

/** End-to-end pipeline compositions (SURVEY §3) + sink semantics. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("scheduler stage: one task per city with a fresh task id") {
    val tasks = Pipelines.schedulerStage(spark, dir)
    assert(tasks.count() == 15)
    assert(tasks.select("task_id").distinct().count() == 15)
  }

  test("end-to-end: scheduler -> ingestion -> categorization produces labels") {
    val labels = Pipelines.endToEnd(spark, dir)
    assert(labels.count() > 0)
    assert(labels.columns.toSeq == Seq("city_id", "class_label"))
    // matches the flagship query on the same data
    val flagship = graft.ops.RuleBasedTrailClassifier
      .classify(WeatherModel.weatherRecords(spark, dir))
    assert(labels.except(flagship).count() == 0)
  }

  test("categorization stage skips already-processed cities (A9)") {
    val weather = WeatherModel.weatherRecords(spark, dir)
    val processed = Seq(0L, 1L, 2L).toDF("city_id")
    val out = Pipelines.categorizationStage(weather, processed).labels
    assert(out.where(col("city_id").isin(0, 1, 2)).count() == 0)
  }

  test("categorization surfaces unlabeled cities (empty class_label, not null)") {
    val weather = WeatherModel.weatherRecords(spark, dir)
    val stage = Pipelines.categorizationStage(weather, spark.emptyDataFrame
      .select(lit(0L).as("city_id")).limit(0))
    val unlabeled = stage.unlabeled.collect()
    // sf0.001 is known to contain a no-rule city (city 5)
    assert(unlabeled.nonEmpty)
    unlabeled.foreach(r => assert(r.getString(1) == ""))
    // and unlabeled ⊆ labels output (they are emitted, just flagged)
    assert(stage.labels.where(col("class_label") === "").count() == unlabeled.length)
  }

  test("A10: observe() counters report flushed rows without breaking the plan") {
    val obs = Pipelines.withCounters(Pipelines.schedulerStage(spark, dir))
    val n = obs.df.count()
    assert(obs.rows == n && n == 15)
  }

  test("S7: mock weather generator is deterministic and 48 rows") {
    val g1 = graft.sources.MockWeather.hourlyForecast(spark).collect()
    val g2 = graft.sources.MockWeather.hourlyForecast(spark).collect()
    assert(g1.length == 48 && g1.sameElements(g2))
    assert(g1.head.getDouble(2) == 18.0) // temp = 18.0 + i*0.1
  }

  test("upsertPartitioned: only touched partitions rewritten, replay idempotent") {
    val path = Files.createTempDirectory("graft_pupsert").toString + "/store"
    val day1 = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b")).toDF("k", "day", "v")
    val day2 = Seq((3L, "2024-01-02", "c")).toDF("k", "day", "v")
    Sinks.upsertPartitioned(day1, path, Seq("k"), "day")
    Sinks.upsertPartitioned(day2, path, Seq("k"), "day")
    // capture day1's physical files, then upsert into day2 only
    val d1dir = new java.io.File(s"$path/day=2024-01-01")
    val before = d1dir.listFiles().map(f => f.getName -> f.lastModified).toMap
    val day2v2 = Seq((3L, "2024-01-02", "c2"), (4L, "2024-01-02", "d")).toDF("k", "day", "v")
    Sinks.upsertPartitioned(day2v2, path, Seq("k"), "day")
    val after = d1dir.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(before == after, "untouched partition was rewritten")
    val m = spark.read.parquet(path).select("k", "v")
      .as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "a", 2L -> "b", 3L -> "c2", 4L -> "d"))
    // replay of the same batch converges
    Sinks.upsertPartitioned(day2v2, path, Seq("k"), "day")
    assert(spark.read.parquet(path).count() == 4)
  }

  test("upsertParquet: replay converges, new rows win on key collision") {
    val path = Files.createTempDirectory("graft_upsert").toString + "/store"
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.upsertParquet(v1, path, Seq("k"))
    assert(spark.read.parquet(path).count() == 2)
    // replay same batch → no dups
    Sinks.upsertParquet(v1, path, Seq("k"))
    assert(spark.read.parquet(path).count() == 2)
    // updated value wins
    val v2 = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    Sinks.upsertParquet(v2, path, Seq("k"))
    val m = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }
}
