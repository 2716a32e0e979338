package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.ops.{RuleBasedTrailClassifier, WeatherModel}

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
    * The ts encoding (TIMESTAMP(NANOS)-as-long vs TIMESTAMP(MICROS)) is
    * probed from the footer of a file already staged in the directory,
    * exactly like the batch reader — a file-streaming source needs its
    * schema fixed up front, and both encodings have shipped in the test
    * data. (`nanosAsLong` session conf applies here too.)
    *
    * First-file-wins: the directory's encoding is fixed by whatever is
    * staged when the stream starts; one encoding per directory is the
    * contract (files arriving later with the other encoding belong in a
    * separate stream). An EMPTY staging directory is valid — the schema is
    * declared — and defaults to the nanos encoding, the generator's
    * historical default.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val staged = Option(new java.io.File(path).listFiles).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val nanos =
      if (staged.isEmpty) true
      else spark.read.parquet(staged.head.getPath).schema("ts").dataType ==
        org.apache.spark.sql.types.LongType
    val raw = spark.readStream
      .schema(graft.sources.Tables.events(tsIsNanos = nanos))
      .parquet(path)
    if (nanos) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)")) else raw
  }

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

  /** Stream-static enrichment join: each micro-batch broadcast-joins the
    * static city dimension (customer table as the city dim, the K3/J2
    * lookup in streaming form). The static side is planned per batch —
    * at scale Spark broadcasts it once per trigger; the stream side never
    * shuffles for the join.
    */
  def enrichWithCities(events: DataFrame, cities: DataFrame): DataFrame =
    events.join(
      broadcast(cities.select(
        col("c_custkey").as("city_key"), col("c_name").as("city_name"))),
      col("user_id") === col("city_key"), "left_outer")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value"), col("city_name"))

  /** Stream-stream LEFT OUTER interval join — click→purchase attribution
    * with abandonment: each click pairs with that user's purchases in the
    * following hour; a click with NO purchase emits once with null
    * purchase columns when the watermark closes its window (the engine
    * holds it in join state exactly until then). Both sides watermarked
    * 2 h → state is bounded by in-flight rows, independent of history;
    * the join shuffles both streams once on user. The inner-join rows are
    * emitted immediately per micro-batch; only the null-extension waits
    * for the watermark — the semantics a funnel/attribution pipeline
    * needs at any scale.
    */
  def clickPurchaseAttribution(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", "2 hours")
    clicks.join(
      purchases,
      expr("c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"),
      "left_outer")
  }

  /** Streaming sessionization via `session_window`: gap-based windows
    * (30 min of inactivity closes a session) maintained as merging state
    * by the engine — the streaming twin of the batch
    * [[graft.ops.TimeSeriesOps.sessionize]]. Watermark bounds the state:
    * a session closes (and emits, in append mode) once the watermark
    * passes its end. Per-key state is one open session struct — at
    * 100 TB state size tracks ACTIVE users only, not history.
    */
  def sessionRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

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

  // ---- streaming flagship: label CHANGES via flatMapGroupsWithState -------

  /** One weather observation in epoch seconds — the typed row the streaming
    * classifier folds into its per-city state.
    */
  final case class WeatherEvent(
      city_id: Long, epoch_s: Long, temp: Double, rain: Double, source: String)

  /** A label transition emitted by the streaming classifier. `change_seq`
    * counts transitions per city (1 = first label), so a consumer — or a
    * test — can always recover the latest label without relying on sink
    * ordering.
    */
  final case class LabelChange(city_id: Long, class_label: String, change_seq: Long)

  /** Incremental form of the flagship's per-city aggregates
    * (`RuleBasedTrailClassifier.classify`): every field is a running
    * sum/max/min/flag, so folding rows in ANY delivery order converges to
    * the batch aggregate. `hasHist`/`has24`/`has48` model the batch CASE's
    * null aggregates (empty side → rule doesn't fire).
    */
  final case class TrailState(
      rain2d: Double, warmDays: Boolean,
      fcstRain24: Double, sumTemp24: Double, n24: Long,
      maxHistTemp: Double, hasHist: Boolean,
      minFcstTemp24: Double, has24: Boolean,
      maxFcstTemp: Double, has48: Boolean,
      lastLabel: String, changeSeq: Long)

  private val emptyTrailState = TrailState(
    0.0, warmDays = false, 0.0, 0.0, 0L,
    Double.MinValue, hasHist = false,
    Double.MaxValue, has24 = false,
    Double.MinValue, has48 = false,
    lastLabel = null, changeSeq = 0L)

  /** Weather facts → typed epoch-second events (stream or batch frame). */
  def weatherEvents(spark: SparkSession, weather: DataFrame): Dataset[WeatherEvent] = {
    import spark.implicits._
    weather.select(
      col("city_id"),
      col("timestamp_utc").cast("long").as("epoch_s"),
      col("temperature_deg_c").as("temp"),
      col("rain_fall_total_mm").as("rain"),
      col("data_source").as("source")).as[WeatherEvent]
  }

  /** The reference's categorization worker as a STREAM: the rule-based
    * classifier over per-city running state, emitting a row only when a
    * city's label CHANGES (`categorize-trail-conditions/worker.py:29-40`
    * drives `src/classifier.py:79-94` per delivery; the worker's output is
    * exactly the label updates it pushes to the store). Same thresholds,
    * same window predicates, same null-guard semantics as the batch
    * flagship — StreamingSpec asserts the final labels are IDENTICAL to
    * `RuleBasedTrailClassifier.classify` on the same data.
    *
    * Scale: state is one ~100-byte case class per city (bounded by key
    * cardinality, not history); each micro-batch shuffles only its own rows
    * once on city_id.
    */
  def streamingClassifier(
      spark: SparkSession,
      weather: Dataset[WeatherEvent],
      anchor: String = WeatherModel.Anchor): Dataset[LabelChange] = {
    import spark.implicits._
    val anchorS = java.time.LocalDateTime
      .parse(anchor.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val hist = WeatherModel.Historical
    val day = 86400L

    def relevant(e: WeatherEvent): Boolean =
      (e.source == hist && e.epoch_s < anchorS) ||
        (e.source != hist && e.epoch_s >= anchorS && e.epoch_s < anchorS + 2 * day)

    def fold(st: TrailState, e: WeatherEvent): TrailState = {
      val hist2d = e.source == hist &&
        e.epoch_s >= anchorS - 2 * day && e.epoch_s < anchorS
      val fcst24 = e.source != hist &&
        e.epoch_s >= anchorS && e.epoch_s < anchorS + day
      val fcst48 = e.source != hist &&
        e.epoch_s >= anchorS && e.epoch_s < anchorS + 2 * day
      val isHist = e.source == hist
      st.copy(
        rain2d = if (hist2d) st.rain2d + e.rain else st.rain2d,
        warmDays = st.warmDays ||
          (hist2d && e.temp > RuleBasedTrailClassifier.WarmDayC),
        fcstRain24 = if (fcst24) st.fcstRain24 + e.rain else st.fcstRain24,
        sumTemp24 = if (fcst24) st.sumTemp24 + e.temp else st.sumTemp24,
        n24 = if (fcst24) st.n24 + 1 else st.n24,
        maxHistTemp = if (isHist) math.max(st.maxHistTemp, e.temp) else st.maxHistTemp,
        hasHist = st.hasHist || isHist,
        minFcstTemp24 = if (fcst24) math.min(st.minFcstTemp24, e.temp) else st.minFcstTemp24,
        has24 = st.has24 || fcst24,
        maxFcstTemp = if (fcst48) math.max(st.maxFcstTemp, e.temp) else st.maxFcstTemp,
        has48 = st.has48 || fcst48)
    }

    // Plain-Scala mirror of the batch CASE-WHEN tree (`classifier.py:85-91`
    // rule order; null aggregates = has* guards).
    def label(st: TrailState): String = {
      import RuleBasedTrailClassifier._
      val avgTemp24 = if (st.n24 > 0) st.sumTemp24 / st.n24 else 0.0
      val mud =
        if (st.rain2d >= RainThresholdMm && !st.warmDays) Some("TRAIL_MUD_WARNING")
        else if (st.rain2d < RainThresholdMm && st.fcstRain24 < RainThresholdMm)
          Some("TRAIL_DRY_EXCELLENT")
        else None
      val heat =
        if (st.has48 && st.maxFcstTemp > HeatAdvisoryC) Some("HEAT_ADVISORY") else None
      val snowpack =
        if (st.hasHist && st.has24 &&
          st.maxHistTemp > FreezingPointC && st.minFcstTemp24 < FreezingPointC)
          Some("SNOWPACK_ICY_CONDITIONS")
        else if (st.hasHist && st.has24 &&
          st.maxHistTemp > SnowmeltWarmC && st.minFcstTemp24 > FreezingPointC)
          Some("SNOWPACK_HEAVY_WET")
        else None
      val heavy =
        if (st.fcstRain24 >= HeavyRainThresholdMm)
          Some(if (avgTemp24 < FreezingPointC) "HEAVY_SNOW_WARNING"
          else "TRAIL_CLOSED_HEAVY_RAIN")
        else None
      Seq(mud, heat, snowpack, heavy).flatten.mkString(",")
    }

    weather
      .filter(relevant _)
      .groupByKey(_.city_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (city: Long, rows: Iterator[WeatherEvent], state: GroupState[TrailState]) =>
          val prev = state.getOption.getOrElse(emptyTrailState)
          val next = rows.foldLeft(prev)(fold)
          val newLabel = label(next)
          if (prev.lastLabel == newLabel) {
            state.update(next.copy(lastLabel = newLabel))
            Iterator.empty
          } else {
            val updated = next.copy(lastLabel = newLabel, changeSeq = prev.changeSeq + 1)
            state.update(updated)
            Iterator(LabelChange(city, newLabel, updated.changeSeq))
          }
      }
  }

  // ---- streaming SCD2: closed validity runs as they happen ----------------

  /** One keyed attribute observation (micros event time). */
  final case class AttrEvent(user_id: Long, event_id: Long, ts_us: Long, event_type: String)

  /** A CLOSED type-2 run: [from_us, to_us) during which the key held
    * `event_type`. `run_seq` numbers runs per key from 1.
    */
  final case class Scd2Run(
      user_id: Long, event_type: String, from_us: Long, to_us: Long,
      n_events: Long, run_seq: Long)

  final case class Scd2State(
      curType: String, fromUs: Long, n: Long, runSeq: Long)

  /** Streaming form of [[graft.ops.ChangeCapture.scd2History]]: per-key
    * state carries only the OPEN run; an attribute change emits the closed
    * run immediately (append mode — history rows are immutable once
    * closed, so no retraction is ever needed). The batch query's
    * `is_current` rows are exactly the states still open here.
    *
    * Delivery contract: rows are sorted (ts, event_id) within each
    * micro-batch; across batches the source must deliver each key's events
    * with non-decreasing event time (the per-key-ordered log contract,
    * e.g. a Kafka partition per key) — the same assumption any streaming
    * CDC/SCD consumer makes. State is ~50 bytes per key, independent of
    * history length.
    */
  def streamingScd2(spark: SparkSession, events: Dataset[AttrEvent]): Dataset[Scd2Run] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[Scd2State]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(Scd2State(null, 0L, 0L, 0L))
          val closed = scala.collection.mutable.ArrayBuffer.empty[Scd2Run]
          sorted.foreach { e =>
            if (st.curType == null)
              st = Scd2State(e.event_type, e.ts_us, 1L, 1L)
            else if (st.curType == e.event_type)
              st = st.copy(n = st.n + 1)
            else {
              closed += Scd2Run(uid, st.curType, st.fromUs, e.ts_us, st.n, st.runSeq)
              st = Scd2State(e.event_type, e.ts_us, 1L, st.runSeq + 1)
            }
          }
          state.update(st)
          closed.iterator
      }
  }

  /** R5 streaming form: each micro-batch of FAILED rows (each carrying its
    * queue `delivery_count`) splits at the ceiling — below: re-enqueued on
    * the retry path; at-or-above: dead-lettered with the exception tag.
    */
  def startRetrySink(
      failures: DataFrame,
      retryPath: String,
      dlqPath: String,
      checkpoint: String) =
    failures.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persist: the two isEmpty probes and two writes would otherwise
        // each re-evaluate the batch plan (4x work per trigger)
        batch.persist()
        try {
          val (retry, dead) = graft.ops.Sinks.deliveryCeilingSplit(batch)
          if (!retry.isEmpty) retry.write.mode("append").parquet(retryPath)
          if (!dead.isEmpty) dead.write.mode("append").parquet(dlqPath)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** K1/K2 at 100 TB, streaming form: the PARTITION-SCOPED merge sink.
    * Each micro-batch upserts by key into ONLY the day-partitions it
    * touches ([[graft.ops.Sinks.upsertPartitioned]]: dynamic partition
    * overwrite — the parquet-level equivalent of a lakehouse `MERGE INTO`'s
    * file pruning; on Delta/Iceberg this body becomes a real MERGE and the
    * shape is unchanged). Cost per trigger is O(touched partitions), not
    * O(store) — the full-store rewrite of [[startUpsertSink]]'s
    * `upsertParquet` is the small-store form only. Replay converges:
    * new-rows-win dedup per key inside the touched partitions
    * (StreamingSpec pins replay idempotence AND that untouched partitions
    * are never rewritten).
    */
  def startPartitionedUpsertSink(
      projected: DataFrame,
      storePath: String,
      checkpoint: String) =
    projected.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val withDay = batch.withColumn("day", to_date(col("timestamp_utc")))
        graft.ops.Sinks.upsertPartitioned(
          withDay, storePath, Seq("event_id"), "day")
        ()
      }
      .start()

  /** K1/K2 at 100 TB, TRANSACTIONAL form: every micro-batch is one
    * `MERGE INTO` against the commit-log table
    * ([[graft.ops.MergeTable]]) — file-pruned by the batch's key range,
    * committed atomically, and EXACTLY-ONCE under replay: the commit
    * carries (writerId = this sink's checkpoint location, version =
    * micro-batch id), and a replayed batch id at or below the table's
    * recorded watermark is a no-op — the Delta `txnAppId`/`txnVersion`
    * idiom. This strengthens [[startPartitionedUpsertSink]]'s
    * convergent-replay (idempotent rewrite) to true no-reapply, and the
    * commit protocol additionally tolerates CONCURRENT writers (version
    * CAS + merge replay), which dynamic partition overwrite does not.
    */
  def startMergeSink(
      projected: DataFrame,
      tablePath: String,
      checkpoint: String,
      keys: Seq[String] = Seq("event_id"),
      clusterBy: Seq[String] = Seq("event_id")): StreamingQuery =
    projected.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.MergeTable.mergeUpsert(
          batch.sparkSession, tablePath, batch, keys, clusterBy,
          txn = Some((checkpoint, batchId)))
        ()
      }
      .start()

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
