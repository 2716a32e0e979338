package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

/** Semantic invariants per operator family (SURVEY §2) on sf0.001. */
class EventOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("S1/A8: dedup yields unique keys and loses no key") {
    val out = EventOps.s1DimDedup(spark, dir)
    assert(out.count() == out.select("city_id").distinct().count())
    val raw = graft.sources.Tables.read(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    assert(out.count() == raw)
  }

  test("set ops: intersect/except partition the click-user set; semi/anti plan") {
    val out = EventOps.setOpsUsers(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver-side reference on raw sets
    val ev = graft.sources.Tables.read(spark, dir, "events")
    def users(t: String) = ev.where(col("event_type") === t)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val c = users("click"); val p = users("purchase")
    assert(out.getOrElse("click_and_buy", 0L) == (c & p).size.toLong)
    assert(out.getOrElse("click_only", 0L) == (c -- p).size.toLong)
    // INTERSECT/EXCEPT must plan as semi/anti joins, not anything quadratic
    val plan = EventOps.setOpsUsers(spark, dir)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.{LeftSemi, LeftAnti}
    val types = plan.collect { case j: Join => j.joinType }
    assert(types.contains(LeftSemi) && types.contains(LeftAnti), types.mkString(","))
  }

  test("P1: JSON projection defaults missing keys to 0 and keeps all rows") {
    val out = EventOps.p1JsonProjection(spark, dir)
    assert(out.count() == 1000)
    assert(out.where(col("k_value").isNull).count() == 0)
  }

  test("P5: route split partitions all rows across exactly the 3 routes") {
    val out = EventOps.p5RouteSplit(spark, dir).collect()
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("forecast", "historical", "invalid"))
    assert(out.map(_.getLong(1)).sum == 1000)
  }

  test("P7+K6: success filter and DLQ split are complementary") {
    val ok = EventOps.p7SuccessFilter(spark, dir)
      .agg(sum("n_success")).first().getLong(0)
    val dlq = EventOps.k6DlqSplit(spark, dir).count()
    assert(ok + dlq == 1000)
  }

  test("A9: anti-join result is disjoint from the processed set") {
    val processed = graft.sources.Tables.read(spark, dir, "events")
      .where(col("event_type") === "error" &&
        col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
      .select(col("user_id")).distinct()
    val out = EventOps.a9AntiJoinDedup(spark, dir)
    assert(out.join(processed, out("city_id") === processed("user_id")).count() == 0)
  }

  test("A11: daily rollup counts re-sum to the table size") {
    val out = EventOps.a11DailyRollup(spark, dir)
    assert(out.agg(sum("n")).first().getLong(0) == 1000)
  }

  test("W1: first-24 slice never exceeds 24 rows per key") {
    val out = EventOps.w1First24(spark, dir)
    assert(out.agg(max("n_first24")).first().getLong(0) <= 24)
  }

  test("R8: rate cap keeps exactly min(n, 500) rows") {
    assert(EventOps.r8RateCap(spark, dir).count() == 500)
  }

  test("R3: expiry filter keeps only the trailing 24h") {
    import graft.sources.Tables
    val ev = Tables.read(spark, dir, "events")
    val maxTs = ev.agg(max("ts")).first().getTimestamp(0)
    val fresh = EventOps.r3ExpiryFilter(spark, dir)
      .agg(sum("n_fresh")).first().getLong(0)
    val expect = ev.where(
      col("ts") >= lit(maxTs) - expr("INTERVAL 24 HOURS")).count()
    assert(fresh == expect)
  }

  test("J1: range join window spans at most 48h per key") {
    val out = EventOps.j1RangeJoin(spark, dir)
    assert(out.count() > 0)
    // every key's window count <= its total count
    val totals = graft.sources.Tables.read(spark, dir, "events")
      .groupBy("user_id").count()
    val joined = out.join(totals, "user_id")
      .where(col("n_window") > col("count"))
    assert(joined.count() == 0)
  }

  test("J3: cogroup join returns only keys present on both sides") {
    val out = EventOps.j3CogroupJoin(spark, dir)
    assert(out.where(col("max_hist_temp").isNull || col("min_fcst_temp").isNull).count() == 0)
  }

  // ---- P1/P6 policy pair: PERMISSIVE defaults vs FAILFAST raise -----------

  test("P1 FAILFAST: strict projection raises on a missing mandatory field") {
    import spark.implicits._
    val bad = Seq(
      (1L, """{"k": 7}""", "2024-01-01 00:00:00"),
      (2L, """{"other": 1}""", "2024-01-01 00:00:00"))
      .toDF("event_id", "props", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val e = intercept[Exception] {
      EventOps.strictKProjection(bad).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(chain.contains("FAILFAST"), chain)
  }

  test("P1 FAILFAST: strict projection passes every validated row through") {
    val strict = EventOps.p1StrictProjection(spark, dir)
    val expect = graft.sources.Tables.read(spark, dir, "events")
      .where(get_json_object(col("props"), "$.k").isNotNull).count()
    assert(strict.count() == expect && expect > 0)
    assert(strict.where(col("k_value").isNull).count() == 0)
  }

  // ---- R5: bounded-retry ceiling ------------------------------------------

  test("R5: ceiling diverts exactly the delivery_count >= 6 rows, covering all failures") {
    val out = EventOps.r5RetryCeiling(spark, dir).collect()
    val failures = EventOps.k6DlqSplit(spark, dir).count()
    assert(out.length == failures)
    assert(out.forall(r =>
      (r.getLong(1) >= EventOps.MaxDeliveryCount) == (r.getString(2) == "DEAD_LETTER")))
    assert(out.exists(_.getString(2) == "DEAD_LETTER"))
    assert(out.exists(_.getString(2) == "RETRY"))
  }

  test("snapshot diff: change classes match an independent driver-side diff") {
    import graft.ops.ChangeCapture
    val dir = "/root/testdata/sf0.001"
    val out = ChangeCapture.eventsSnapshotDiff(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent reconstruction of both snapshots in plain Scala
    def h60(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    val ev = graft.sources.Tables.read(spark, dir, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def band(id: Long) = h60(id.toString) % 100
    val old = ev.filter(e => band(e._1) < 80).map(e => e._1 -> ((e._2, e._3))).toMap
    val neu = ev.filter(e => band(e._1) >= 10 && band(e._1) < 90)
      .map(e => e._1 -> ((e._2,
        if (band(e._1) >= 70) math.rint(e._3 * 2.0 * 100) / 100 else e._3))).toMap
    val expected =
      (neu.keySet -- old.keySet).map(_ -> "INSERT") ++
        (old.keySet -- neu.keySet).map(_ -> "DELETE") ++
        (old.keySet & neu.keySet).filter(k => old(k) != neu(k)).map(_ -> "UPDATE")
    assert(out == expected.toMap)
    assert(Set("INSERT", "DELETE", "UPDATE").subsetOf(out.values.toSet))
  }

  test("SCD2 history: contiguous validity, maximal runs, one current row per key") {
    import graft.ops.ChangeCapture
    val hist = ChangeCapture.scd2History(spark, dir).collect()
    val events = graft.sources.Tables.read(spark, dir, "events")
    // completeness: every event is inside exactly one run
    assert(hist.map(_.getLong(5)).sum == events.count())
    val byUser = hist.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      // exactly one open (current) row per key, and it is the last one
      assert(rows.count(_.getBoolean(4)) == 1, s"user $u current-count")
      assert(rows.last.getBoolean(4), s"user $u current not last")
      rows.sliding(2).foreach {
        case Array(a, b) =>
          // contiguity: each run's effective_to = successor's effective_from
          assert(a.getTimestamp(3) == b.getTimestamp(2), s"user $u gap")
          // maximality: adjacent runs differ in the tracked attribute
          assert(a.getString(1) != b.getString(1), s"user $u non-maximal run")
        case _ => ()
      }
    }
  }

  test("ORC roundtrip: read-back digest equals the same digest on the parquet side") {
    import graft.sources.{Orc, Tables}
    val viaOrc = Orc.roundtripAgg(spark, dir).collect().map(_.toSeq).toSeq
    val direct = Tables.read(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(pmod(graft.ops.TextOps.hash60(col("text")), lit(1L << 40)))
          .as("text_digest"))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(viaOrc == direct)
  }

  test("snapshot diff: NULLs are positional — (NULL,'a') vs ('a',NULL) is an UPDATE") {
    import graft.ops.ChangeCapture
    import spark.implicits._
    // concat_ws skips NULLs, so without positional NULL encoding these two
    // rows hash identically and the UPDATE is silently missed
    val old = Seq((1L, Option.empty[String], Option("a")), (2L, Option("x"), Option("y")))
      .toDF("k", "c1", "c2")
    val neu = Seq((1L, Option("a"), Option.empty[String]), (2L, Option("x"), Option("y")))
      .toDF("k", "c1", "c2")
    val out = ChangeCapture.snapshotDiff(old, neu, "k", Seq("c1", "c2"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "UPDATE")) // row 2 unchanged → absent
  }

  test("snapshot diff: fused (narrow) and rejoin (wide-gate) forms are identical, incl. preimages") {
    import graft.ops.ChangeCapture
    import spark.implicits._
    // all three change types + null payloads + an unchanged row
    val old = Seq(
      (1L, Option("a"), Option(1.5)),  // UPDATE (value changes)
      (2L, Option("x"), Option(2.0)),  // unchanged
      (3L, Option.empty[String], Option(3.0)), // DELETE
      (5L, Option("n"), Option.empty[Double])  // UPDATE (null -> value)
    ).toDF("k", "c1", "c2")
    val neu = Seq(
      (1L, Option("a"), Option(9.5)),
      (2L, Option("x"), Option(2.0)),
      (4L, Option("i"), Option.empty[Double]), // INSERT
      (5L, Option("n"), Option(5.5))
    ).toDF("k", "c1", "c2")
    def run(preimages: Boolean) = {
      val fused = ChangeCapture.snapshotDiffKeys(
        old, neu, Seq("k"), Seq("c1", "c2"), preimages)
      spark.conf.set("spark.graft.cdf.fuseWidthBytes", "0") // force rejoin
      val rejoin =
        try ChangeCapture.snapshotDiffKeys(
          old, neu, Seq("k"), Seq("c1", "c2"), preimages)
        finally spark.conf.unset("spark.graft.cdf.fuseWidthBytes")
      // same column names/types in the same order, same rows
      assert(fused.schema.map(f => (f.name, f.dataType)) ==
        rejoin.schema.map(f => (f.name, f.dataType)))
      val key = (df: org.apache.spark.sql.DataFrame) =>
        df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      assert(key(fused).toSeq == key(rejoin).toSeq)
      fused.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val expected = Map(1L -> "UPDATE", 3L -> "DELETE", 4L -> "INSERT", 5L -> "UPDATE")
    assert(run(preimages = false) == expected)
    assert(run(preimages = true) == expected)
  }
}
