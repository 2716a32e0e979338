package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Snapshot differencing (CDC between table versions): given two keyed
  * snapshots, emit INSERT / DELETE / UPDATE rows — the feed that keeps a
  * downstream copy (search index, feature store, serving cache) in sync
  * without a full rewrite. The reference's scheduler re-materializes
  * whole outputs each run (schedule-jobs/worker_scheduler.py:10-36); at
  * 100 TB the diff IS the product.
  *
  * Scale shape: ONE shuffle per side on the key; rows compare by a pair
  * of xxhash64 row-hashes computed map-side, so the join carries (key,
  * 16-byte hash). A NARROW payload (≤ `spark.graft.cdf.fuseWidthBytes`,
  * default 64, of schema-estimated width) additionally rides through the
  * diff join and is projected directly — fewer total bytes than the
  * rejoin it replaces, and half the stages. A WIDE payload never crosses
  * the diff exchange: only emitted changes rejoin it.
  */
object ChangeCapture {

  /** Generic diff: `key` must be unique per snapshot; `cols` are the
    * compared payload columns. Output: key, change_type, and the NEW
    * payload (null for DELETE).
    */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame, key: String, cols: Seq[String]): DataFrame =
    snapshotDiffKeys(oldDf, newDf, Seq(key), cols)

  /** Composite-key form: the diff joins on ALL `keys` columns (each key
    * TUPLE unique per snapshot; key values must be non-null — standard
    * key hygiene, since SQL equality never matches nulls). Presence is
    * tracked with explicit flags, not key-null checks, so the
    * classification is key-type-agnostic. Output: keys, change_type, and
    * the NEW payload (null for DELETE); with `preimages` also the OLD
    * payload as `<col>_pre` (null for INSERT) — the retraction half an
    * incremental consumer needs to subtract an UPDATE/DELETE's previous
    * contribution without re-reading version v−1 itself. Cost on the
    * wide-payload path: one more SCAN of the old side (which
    * [[MergeTable.changesBetween]] has already restricted to the changed
    * files) plus a key join of its payload projection; on the fused
    * narrow-payload path the preimage rides the diff join like the new
    * payload does. Either way the CONSUMER never re-reads v−1, which is
    * the O(table) read this option exists to avoid.
    */
  def snapshotDiffKeys(
      oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      cols: Seq[String], preimages: Boolean = false): DataFrame = {
    def hashed(df: DataFrame, side: String, payload: Seq[Column]) = {
      // NULL is encoded POSITIONALLY as \u0002: xxhash64 SKIPS null
      // arguments (a null leaves the running hash untouched), so without
      // the sentinel (NULL,'a') and ('a',NULL) would hash identically and
      // the UPDATE between them be missed. Each column is a SEPARATE hash
      // argument (the fold mixes a per-argument boundary), so adjacent
      // values cannot alias ("ab","c" vs "a","bc") with no separator or
      // concat buffer needed.
      val sentineled = cols.map(c => coalesce(col(c).cast("string"), lit("\u0002")))
      // TWO independent 64-bit draws (the second chain salted by a
      // constant leading argument) ≈ the 128-bit discrimination the
      // previous md5 form had — but carried as two longs, not a 32-char
      // hex string: the diff shuffle moves 16 bytes of row-hash instead
      // of ~64, and the per-row cost drops from concat_ws allocation +
      // MD5 digest + hex encode to two allocation-free codegen'd hash
      // folds (guide §2.3: shuffle fewer bytes, narrower types).
      df.select(
        keys.zipWithIndex.map { case (k, i) => col(k).as(s"${side}_k$i") } ++
          payload ++ Seq(
          xxhash64(sentineled: _*).as(s"${side}_h0"),
          xxhash64(lit("\u0003") +: sentineled: _*).as(s"${side}_h1"),
          lit(true).as(s"${side}_present")): _*)
    }
    // FUSED vs REJOIN (guide §2.3/§2.4): the rejoin shape shuffles
    // hash-only rows and lets only emitted changes rejoin their payload --
    // right for WIDE payloads, where unchanged rows (the overwhelming
    // majority at scale) must not drag their bytes through the diff
    // exchange. But the rejoin is itself one more scan + join of the new
    // side (two, with preimages), and its join cannot broadcast the small
    // diff side (LeftOuter builds right), so at scale it re-shuffles the
    // new side's payload anyway. For a payload no wider than a few
    // hash-widths, carrying it THROUGH the full-outer join and projecting
    // it directly moves fewer total bytes and halves the stage count.
    // Classification stays the same hash pair either way, so the output
    // is bit-identical; the gate is a deterministic schema-width estimate
    // (defaultSize per payload column), tunable per deployment.
    val fuse = cols.map(c => newDf.schema(c).dataType.defaultSize).sum <=
      oldDf.sparkSession.conf.get("spark.graft.cdf.fuseWidthBytes", "64").toInt
    val o = hashed(oldDf, "o",
      if (fuse && preimages)
        cols.zipWithIndex.map { case (c, i) => col(c).as(s"o_p$i") }
      else Nil)
    val n = hashed(newDf, "n",
      if (fuse) cols.zipWithIndex.map { case (c, i) => col(c).as(s"n_p$i") }
      else Nil)
    val cond = keys.indices
      .map(i => col(s"o_k$i") === col(s"n_k$i")).reduce(_ && _)
    val classified = o.join(n, cond, "full_outer")
      .withColumn("change_type",
        when(col("o_present").isNull, "INSERT")
          .when(col("n_present").isNull, "DELETE")
          .when(col("o_h0") =!= col("n_h0") || col("o_h1") =!= col("n_h1"),
            "UPDATE"))
      .where(col("change_type").isNotNull)
    val keyCols = keys.zipWithIndex.map { case (k, i) =>
      coalesce(col(s"n_k$i"), col(s"o_k$i")).as(k)
    }
    if (fuse) {
      // payload came through the join: new-side values (null for DELETE,
      // exactly like the rejoin's left_outer against a key absent from
      // newDf), old-side values as <col>_pre (null for INSERT) when
      // preimages are on
      classified.select(keyCols ++ Seq(col("change_type")) ++
        cols.zipWithIndex.map { case (c, i) => col(s"n_p$i").as(c) } ++
        (if (preimages)
          cols.zipWithIndex.map { case (c, i) => col(s"o_p$i").as(s"${c}_pre") }
        else Nil): _*)
    } else {
      val diff = classified.select(keyCols :+ col("change_type"): _*)
      // only the changed keys rejoin their (new-side) payload
      val withNew =
        diff.join(newDf.select((keys ++ cols).map(col): _*), keys, "left_outer")
      if (!preimages) withNew
      else withNew.join(
        oldDf.select(keys.map(col) ++
          cols.map(c => col(c).as(s"${c}_pre")): _*), keys, "left_outer")
    }
  }

  /** q_snapshot_diff: two deterministic snapshots derived from `events`
    * (old = hash band 0–79, new = band 10–89 with values rewritten in
    * band 70–89), so the diff contains all three change types and both
    * engines can rebuild the identical snapshots from the parquet.
    */
  def eventsSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.read(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    def band(c: Column): Column = pmod(TextOps.hash60(c.cast("string")), lit(100L))
    val old = ev.where(band(col("event_id")) < 80)
    val neu = ev.where(band(col("event_id")) >= 10 && band(col("event_id")) < 90)
      .withColumn("value",
        when(band(col("event_id")) >= 70, round(col("value") * 2.0, 2))
          .otherwise(col("value")))
    snapshotDiff(old, neu, "event_id", Seq("event_type", "value"))
      .orderBy("event_id")
  }

  /** SCD type-2 history build: collapse each key's event stream into
    * maximal runs of a constant attribute with [effective_from,
    * effective_to) validity and an is_current flag — the standard type-2
    * dimension a warehouse keeps for every mutable entity, derived here
    * from the events table (key = user_id, tracked attribute =
    * event_type).
    *
    * Gaps-and-islands via a running change-flag sum; deterministic order
    * (ts, event_id). Scale: ONE shuffle on user_id — both windows and the
    * run aggregation share that partitioning, so Catalyst reuses the
    * exchange; state per key ∝ runs, never events.
    */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.read(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(w))
    val hist = runs.groupBy(col("user_id"), col("run_id"))
      .agg(
        min(col("event_type")).as("event_type"), // constant within a run
        min(col("ts")).as("effective_from"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    hist
      .withColumn("effective_to", lead(col("effective_from"), 1).over(w2))
      .withColumn("is_current", col("effective_to").isNull)
      .select(
        col("user_id"), col("event_type"), col("effective_from"),
        col("effective_to"), col("is_current"), col("n_events"))
      .orderBy("user_id", "effective_from")
  }

  val scd2HistorySql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, event_type
      |  FROM events),
      |r AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |                   OR lag(event_type) OVER w <> event_type
      |            THEN 1 ELSE 0 END AS chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |runs AS (
      |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM r),
      |hist AS (
      |  SELECT user_id, run_id, min(event_type) AS event_type,
      |    min(ts) AS effective_from, count(*) AS n_events
      |  FROM runs GROUP BY user_id, run_id)
      |SELECT user_id, event_type, effective_from,
      |  lead(effective_from) OVER w2 AS effective_to,
      |  lead(effective_from) OVER w2 IS NULL AS is_current,
      |  n_events
      |FROM hist WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
      |ORDER BY user_id, effective_from""".stripMargin

  val eventsSnapshotDiffSql: String = {
    val b = s"(${TextOps.hash60Sql("event_id::VARCHAR")}) % 100"
    s"""WITH ev AS (SELECT event_id, event_type, value FROM events),
       |old AS (SELECT * FROM ev WHERE $b < 80),
       |neu AS (
       |  SELECT event_id, event_type,
       |    CASE WHEN $b >= 70 THEN round(value * 2.0, 2) ELSE value END AS value
       |  FROM ev WHERE $b >= 10 AND $b < 90),
       |oh AS (SELECT event_id AS o_key,
       |  md5(concat_ws(chr(1), coalesce(event_type::VARCHAR, chr(2)),
       |    coalesce(value::VARCHAR, chr(2)))) AS o_hash FROM old),
       |nh AS (SELECT event_id AS n_key,
       |  md5(concat_ws(chr(1), coalesce(event_type::VARCHAR, chr(2)),
       |    coalesce(value::VARCHAR, chr(2)))) AS n_hash FROM neu),
       |d AS (
       |  SELECT coalesce(n_key, o_key) AS event_id,
       |    CASE WHEN o_key IS NULL THEN 'INSERT'
       |         WHEN n_key IS NULL THEN 'DELETE'
       |         WHEN o_hash <> n_hash THEN 'UPDATE' END AS change_type
       |  FROM oh FULL OUTER JOIN nh ON o_key = n_key)
       |SELECT d.event_id, d.change_type, neu.event_type, neu.value
       |FROM d LEFT JOIN neu ON d.event_id = neu.event_id
       |WHERE change_type IS NOT NULL
       |ORDER BY d.event_id""".stripMargin
  }
}
