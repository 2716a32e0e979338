package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.WeatherModel

/** The reference's streaming semantics (SURVEY §2.10) as Structured
  * Streaming. The batch engine treats streams as event-time tables (the
  * reference's own retrospective, `/root/reference/DESIGN.md:71-73`); this
  * module is the genuinely-streaming deployment of the same operators:
  *
  *  - S5 stream consume → `readStream` file source (micro-batch pull; at
  *    scale `maxFilesPerTrigger` bounds batch size = R8/R9's rate cap)
  *  - R1 at-least-once + K5 outbox → checkpointing + replayable source
  *    (exactly-once with an idempotent sink — strictly stronger)
  *  - R3 24 h expiry discard → `withWatermark("ts", "24 hours")`
  *  - A9 dedup cache → `dropDuplicatesWithinWatermark("event_id")`
  *    (bounded state, unlike the reference's unbounded Redis set —
  *    `DESIGN.md:38`'s cache + the 24 h expiry in one operator)
  *  - K6 DLQ → a `when()` split inside `foreachBatch` side-outputs
  *  - A11 roll-up → watermarked windowed aggregation
  *  - classifier state → `mapGroupsWithState` per-city running aggregates
  *
  * All state is keyed and watermark-bounded: at 100 TB/day the state store
  * holds ≤ (cities × window) rows, independent of history length.
  */
object StreamingPipeline {

  /** Streaming scan of an events parquet path with the declared schema.
    * (`nanosAsLong` session conf applies here too; ts arrives as int64
    * nanos and is normalized exactly like the batch reader.)
    */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(graft.sources.Tables.events)
      .parquet(path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Stateless stage: projection to weather shape + validity split flag.
    * Emits in append mode immediately (no state). The DLQ branch is the
    * `is_valid = false` side, split in the sink.
    */
  def projectWithValidity(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("user_id").as("city_id"),
      col("ts").as("timestamp_utc"),
      (col("value") / 4.0d - 12.0d).as("temperature_deg_c"),
      (col("value") / 25.0d).as("rain_fall_total_mm"),
      when(col("event_type").isin("click", "view", "purchase"),
        WeatherModel.Historical).otherwise(WeatherModel.Forecast)
        .as("data_source"),
      (col("value") <= 190.0 &&
        get_json_object(col("props"), "$.k").isNotNull).as("is_valid"))

  /** Watermarked dedup: the reference's Redis dedup cache (A9) with
    * expiry (R3) as one bounded-state operator.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "24 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked daily roll-up (A11 streaming form). Append mode emits a
    * (city, day) row once its window is past the watermark — late rows
    * beyond 24 h are discarded exactly like the reference's expired tasks.
    */
  def dailyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "24 hours")
      .groupBy(col("user_id"), window(col("ts"), "1 day").as("w"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        max(col("value")).as("max_value"))
      .select(
        col("user_id"), col("w.start").as("day_start"),
        col("n"), col("sum_value"), col("max_value"))

  /** Per-city running state via mapGroupsWithState: the streaming form of
    * the classifier's per-city aggregates (running counts + extrema),
    * updated incrementally per micro-batch. State is one small case class
    * per city — the swappable-classifier extension point for models that
    * need cross-batch memory.
    */
  final case class CityState(n: Long, maxTemp: Double, sumRain: Double)
  final case class CityUpdate(city_id: Long, n: Long, max_temp: Double, sum_rain: Double)

  def runningCityState(spark: SparkSession, weather: DataFrame): DataFrame = {
    import spark.implicits._
    weather
      .selectExpr(
        "city_id", "temperature_deg_c AS temp", "rain_fall_total_mm AS rain")
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (city: Long, rows: Iterator[(Long, Double, Double)], state: GroupState[CityState]) =>
          val prev = state.getOption.getOrElse(CityState(0L, Double.MinValue, 0.0))
          val next = rows.foldLeft(prev) { case (acc, (_, t, r)) =>
            CityState(acc.n + 1, math.max(acc.maxTemp, t), acc.sumRain + r)
          }
          state.update(next)
          CityUpdate(city, next.n, next.maxTemp, next.sumRain)
      }
      .toDF()
  }

  /** Idempotent upsert + DLQ split sink (K1/K2/K6/R2) for the projected
    * stream: every micro-batch MERGEs good rows by key into the store
    * (here: parquet keyed-overwrite, on a lakehouse: MERGE INTO) and
    * appends bad rows to the DLQ path.
    */
  def startUpsertSink(
      projected: DataFrame,
      storePath: String,
      dlqPath: String,
      checkpoint: String) = {
    projected.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val good = batch.where(col("is_valid")).drop("is_valid")
        val bad = batch.where(!col("is_valid"))
          .withColumn("exception_type", lit("VALIDATION_FAILED"))
        graft.ops.Sinks.upsertParquet(
          good, storePath, Seq("event_id"))
        if (!bad.isEmpty) bad.write.mode("append").parquet(dlqPath)
        ()
      }
      .start()
  }
}
