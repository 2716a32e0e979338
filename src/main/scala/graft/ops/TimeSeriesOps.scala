package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-series operators beyond the reference's surface — the ops its
  * weather/event domain grows into (as-of lookups, sessionization, pivoted
  * activity matrices, distinct sketches). All windowed forms partition by
  * the stream key, so at 100 TB each is one shuffle and per-key state
  * never leaves an executor.
  */
object TimeSeriesOps {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "events")

  /** As-of join (composed form, SURVEY guide's canonical "operator Spark
    * lacks"): each signup event picks up the most recent STRICTLY PRIOR
    * click value of the same user. Expressed as one ordered window with
    * `last(..., ignoreNulls)` over the unioned stream — no join at all, so
    * no shuffle beyond the window's keyed exchange. (A custom
    * LogicalPlan/SparkPlan as-of join is only warranted when the two sides
    * have different grains; here composition wins.)
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, dir)
      .withColumn(
        "last_click_value",
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true)
          .over(w))
      .where(col("event_type") === "signup")
      .select(
        col("event_id"), col("user_id"),
        round(coalesce(col("last_click_value"), lit(-1.0)), 2)
          .as("last_click_value"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """SELECT event_id, user_id, last_click_value FROM (
      |  SELECT event_id, user_id, event_type,
      |    round(coalesce(last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
      |      OVER (PARTITION BY user_id
      |            ORDER BY date_trunc('microseconds', ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1.0), 2)
      |      AS last_click_value
      |  FROM events)
      |WHERE event_type = 'signup'
      |ORDER BY event_id""".stripMargin

  /** Sessionization: a 30-minute inactivity gap opens a new session.
    * lag → gap flag → running sum = session id; outputs integer-only
    * per-user session stats (no float drift vs the oracle).
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTime))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
          .otherwise(0L))
      .withColumn(
        "session_id",
        sum(col("new_session")).over(
          byTime.rowsBetween(Window.unboundedPreceding, 0)))
    sessions
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("session_id")).as("n_sessions"),
        max(col("n_events")).as("longest_session_events"))
      .orderBy("user_id")
  }

  val sessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('microseconds', ts), event_id)),
      |sess AS (
      |  SELECT user_id,
      |    sum(new_session) OVER (PARTITION BY user_id
      |      ORDER BY date_trunc('microseconds', ts), event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked),
      |per_session AS (
      |  SELECT user_id, session_id, count(*) AS n_events
      |  FROM sess GROUP BY user_id, session_id)
      |SELECT user_id, count(DISTINCT session_id) AS n_sessions,
      |  max(n_events) AS longest_session_events
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Pivoted activity matrix: per-user counts per event type with an
    * explicit value list (no extra distinct-values job — at scale the
    * values ARE the schema). Oracle uses the equivalent CASE sums.
    */
  def pivotActivity(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy("user_id")
  }

  val pivotActivitySql: String =
    """SELECT user_id,
      |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
      |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
      |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
      |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
      |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** HLL distinct sketch vs exact (no SQL oracle — sketch internals are
    * engine-specific, so the driver records a rows-only check): per
    * event_type, approx vs exact distinct users and the relative error.
    * The sketch is THE 100 TB pattern for distinct counts: mergeable,
    * fixed-size state, one shuffle.
    */
  /** HLL sketch values are engine-specific, so the ORACLED shape is
    * exact-vs-sketch: exact distinct (computable in DuckDB) plus
    * `within_bound` = observed relative error ≤ [[HllErrorPctBound]]
    * (rsd=0.02; 2% measured at sf0.001/0.01, see TimeSeriesCorpusSpec).
    * The oracle asserts `true`, so the error contract is checked per run.
    */
  val HllErrorPctBound = 2.0

  def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    // SEPARATE aggregates, joined on the group key (round-18
    // optimization): mixing count(DISTINCT) with approx_count_distinct
    // in ONE aggregate triggers Catalyst's distinct-expansion, which
    // carries the 2%-rsd HLL buffer (411 long slots, ~3 KB) PER
    // (event_type, user_id) GROUP through the first aggregate and its
    // exchange — the sketch's fixed-size-state promise inverted into a
    // per-distinct-value buffer shuffle (plan diff in
    // plans/r18/q_hll_distinct_{before,after}.txt). Split, the exact
    // side shuffles bare (event_type, user_id) pairs and the sketch
    // side shuffles ONE buffer per event_type; the rejoin is a
    // |event_type|-row broadcast. Same aggregates, same rsd, identical
    // output.
    val ev = events(s, dir)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val approx = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"))
    exact.join(approx, Seq("event_type"))
      .withColumn(
        "rel_error_pct",
        round(abs(col("approx_users") - col("exact_users")) * 100.0 /
          col("exact_users"), 2))
      .select(
        col("event_type"), col("exact_users"),
        (col("rel_error_pct") <= HllErrorPctBound).as("within_bound"))
      .orderBy("event_type")
  }

  val hllDistinctSql: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS exact_users,
      |  true AS within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Pure interval (range) join — NO equi key: every event lands in each
    * 84-hour analysis window it falls inside (windows overlap, start every
    * 60 h from the stream's min event time). This is the logical shape
    * vanilla Spark can only plan as BroadcastNestedLoopJoin, O(events ×
    * windows); [[graft.plans.RangeJoinStrategy]] intercepts it and plans
    * [[graft.plans.RangeJoinExec]] — the broadcast window side indexed by
    * an interval tree, O(log windows + matches) per event (plan pinned in
    * PlanAuditSpec). Users write a plain `join(wins, point >= lo && point
    * < hi)`; the strategy supplies the physical operator.
    */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val t0 = ev.agg(min(col("ts")).as("t0"))
    val wins = t0
      .select(explode(sequence(lit(0), lit(9))).as("w_id"), col("t0"))
      .select(
        col("w_id"),
        expr("timestampadd(HOUR, w_id * 60, t0)").as("w_lo"),
        expr("timestampadd(HOUR, w_id * 60 + 84, t0)").as("w_hi"))
    ev.join(wins, col("ts") >= col("w_lo") && col("ts") < col("w_hi"))
      .groupBy(col("w_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy("w_id")
  }

  val intervalJoinSql: String =
    """WITH t0 AS (SELECT min(date_trunc('microseconds', ts)) AS t0 FROM events),
      |wins AS (
      |  SELECT w_id, t0 + to_hours(w_id * 60) AS w_lo,
      |         t0 + to_hours(w_id * 60 + 84) AS w_hi
      |  FROM t0, (SELECT unnest(range(0, 10)) AS w_id)),
      |j AS (
      |  SELECT w_id, value FROM events e JOIN wins w
      |    ON date_trunc('microseconds', e.ts) >= w.w_lo
      |   AND date_trunc('microseconds', e.ts) < w.w_hi)
      |SELECT w_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM j GROUP BY w_id ORDER BY w_id""".stripMargin
}
