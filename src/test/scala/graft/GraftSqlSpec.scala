package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraftSql, MergeTable}

/** The `MERGE INTO` SQL front end: statement semantics must be
  * bit-identical to the equivalent Scala-API merge — including ORDERED
  * clause evaluation (SQL first-clause-wins vs the engine's
  * delete-before-update physical shape), the no-clause defaults (no
  * matched clause → matched rows untouched; no insert clause → nothing
  * inserts), and loud rejection of clause shapes the engine cannot
  * honor. Both doors are covered: [[GraftSql.mergeInto]] (parse +
  * execute) and `spark.sql` (analyzer interception via GraftMergeRule).
  */
class GraftSqlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-sql-$tag")
    Files.delete(p)
    p.toString
  }

  /** seed: ids 1..20, type error on %4==0, value = id. */
  private def seedTable(tag: String): String = {
    val t = fresh(tag)
    val seed = (1L to 20L).map(i =>
      (i, if (i % 4 == 0) "error" else "ok", i * 1.0))
      .toDF("event_id", "event_type", "value")
    MergeTable.mergeUpsert(spark, t, seed, Seq("event_id"), Seq("event_id"))
    t
  }

  private def state(t: String): Map[Long, (String, Double)] =
    MergeTable.read(spark, t)
      .select("event_id", "event_type", "value")
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  // batch: ids 15..25, type new, value = id*10
  private def mkBatch(): Unit =
    (15L to 25L).map(i => (i, "new", i * 10.0))
      .toDF("event_id", "event_type", "value")
      .createOrReplaceTempView("gsql_batch")

  test("plain upsert via spark.sql equals the Scala API merge") {
    mkBatch()
    val (ts, ta) = (seedTable("up1"), seedTable("up2"))
    spark.sql(
      s"""MERGE INTO graft.`$ts` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    MergeTable.mergeUpsert(spark, ta,
      spark.table("gsql_batch"), Seq("event_id"), Seq("event_id"))
    assert(state(ts) == state(ta))
    assert(state(ts).size == 25)
    assert(state(ts)(16L) == (("new", 160.0)))
  }

  test("UPDATE listed before DELETE: a row passing both guards takes the " +
    "update (statement order), not the engine's physical delete-first") {
    mkBatch()
    val t = seedTable("order1")
    GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED AND s.value > t.value THEN UPDATE SET value = s.value
         |WHEN MATCHED AND t.event_type = 'error' THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = state(t)
    // 16 and 20 are matched 'error' rows, but s.value > t.value also
    // holds → the FIRST clause (update) wins; partial update keeps type
    assert(out(16L) == (("error", 160.0)))
    assert(out(20L) == (("error", 200.0)))
    // matched non-error rows update too
    assert(out(15L) == (("ok", 150.0)))
    // inserts landed
    assert(out(21L) == (("new", 210.0)) && out.contains(25L))
    assert(out.size == 25)
  }

  test("DELETE listed before UPDATE: delete wins on a both-guards row") {
    mkBatch()
    val t = seedTable("order2")
    GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED AND t.event_type = 'error' THEN DELETE
         |WHEN MATCHED AND s.value > t.value THEN UPDATE SET value = s.value
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = state(t)
    assert(!out.contains(16L) && !out.contains(20L), "delete-first wins")
    assert(out(15L) == (("ok", 150.0)))
    assert(out.size == 23)
  }

  test("no matched clause: matched rows stay untouched; no insert " +
    "clause: nothing inserts") {
    mkBatch()
    val t1 = seedTable("noclause1")
    spark.sql(
      s"""MERGE INTO graft.`$t1` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out1 = state(t1)
    assert(out1(16L) == (("error", 16.0)), "matched row must stay untouched")
    assert(out1.size == 25 && out1(25L) == (("new", 250.0)))

    val t2 = seedTable("noclause2")
    spark.sql(
      s"""MERGE INTO graft.`$t2` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val out2 = state(t2)
    assert(out2.size == 20, "no insert clause: unmatched batch rows ignored")
    assert(out2(15L) == (("new", 150.0)))
  }

  test("NOT MATCHED BY SOURCE delete + guarded update map through") {
    mkBatch()
    val (ts, ta) = (seedTable("nmbs1"), seedTable("nmbs2"))
    val sql =
      s"""MERGE INTO graft.`%s` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.event_type = 'error' THEN DELETE""".stripMargin
    spark.sql(sql.format(ts))
    MergeTable.mergeUpsert(spark, ta, spark.table("gsql_batch"),
      Seq("event_id"), Seq("event_id"),
      matchedCondition = Some("true"), insertCondition = Some("true"),
      notMatchedBySourceDeleteCondition = Some("t.event_type = 'error'"))
    assert(state(ts) == state(ta))
    assert(!state(ts).contains(4L) && !state(ts).contains(8L))
    assert(state(ts).contains(1L))
  }

  test("NMBS UPDATE SET: unmatched table rows rewrite under the guard") {
    mkBatch()
    val t = seedTable("nmbsset")
    spark.sql(
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN NOT MATCHED BY SOURCE AND t.event_type = 'ok'
         |  THEN UPDATE SET value = t.value + 1000.0""".stripMargin)
    val out = state(t)
    assert(out(1L) == (("ok", 1001.0)))
    assert(out(4L) == (("error", 4.0)), "guard must hold the error rows")
    assert(out(15L) == (("ok", 15.0)), "matched rows are not NMBS rows")
    assert(out.size == 20)
  }

  test("the two doors land identical state (parse-and-run vs spark.sql)") {
    mkBatch()
    val (t1, t2) = (seedTable("door1"), seedTable("door2"))
    val stmt =
      s"""MERGE INTO graft.`%s` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED AND s.value > 180.0 THEN UPDATE SET value = s.value
         |WHEN NOT MATCHED AND s.value <= 240.0 THEN INSERT *""".stripMargin
    GraftSql.mergeInto(spark, stmt.format(t1))
    spark.sql(stmt.format(t2))
    assert(state(t1) == state(t2))
    assert(state(t1)(19L) == (("ok", 190.0)))
    assert(state(t1)(15L) == (("ok", 15.0)), "guard holds")
    assert(state(t1).contains(24L) && !state(t1).contains(25L))
  }

  test("txn watermark makes a replayed SQL merge a no-op") {
    mkBatch()
    val t = seedTable("txn")
    val stmt =
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    assert(GraftSql.mergeInto(spark, stmt, txn = Some(("w", 7L))))
    val v = MergeTable.latestManifest(t).get.version
    assert(!GraftSql.mergeInto(spark, stmt, txn = Some(("w", 7L))))
    assert(MergeTable.latestManifest(t).get.version == v)
  }

  test("unsupported statement shapes fail loudly, not silently") {
    mkBatch()
    val t = seedTable("reject")
    def bad(sql: String): Unit =
      intercept[UnsupportedOperationException](GraftSql.mergeInto(spark, sql))
    // ON with no key equality at all (a lone non-equi predicate is a
    // residual, and a MERGE still needs at least one key conjunct)
    intercept[IllegalArgumentException](GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id < s.event_id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    // cross-named ON key whose rename would clobber an existing source
    // column (the source has BOTH `value` and `event_id`)
    bad(s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
           |ON t.event_id = s.value
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    // differently-named equality with unattributable sides
    bad(s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
           |ON event_id = value
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    // unconditional clause followed by more clauses of its group: the
    // later clauses are unreachable dead code under first-match-wins.
    // Spark's parser rejects the SQL spelling itself (ParseException);
    // the translator's own guard covers the programmatic
    // runMerge(MergeIntoTable) door — both must throw, neither silently
    // drop the dead clause
    intercept[Exception](GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN MATCHED AND t.event_type = 'error' THEN DELETE""".stripMargin))
    // ON residual + NOT MATCHED BY SOURCE: the key-unique fold would
    // silently change which rows count as NMBS
    bad(s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
           |ON t.event_id = s.event_id AND s.value > 100.0
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    // rekeying UPDATE
    bad(s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
           |ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET event_id = s.event_id + 1000""".stripMargin)
    // duplicate SET column in one clause
    bad(s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
           |ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET value = s.value, value = t.value""".stripMargin)
    // non-identity merge-key INSERT assignment (key uniqueness would break)
    intercept[Exception](GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN NOT MATCHED THEN INSERT (event_id, value)
         |  VALUES (s.event_id + 1000, s.value)""".stripMargin))
    // non-graft target
    intercept[Exception](GraftSql.mergeInto(spark,
      s"""MERGE INTO some_table AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    // state unchanged by all of the above
    assert(state(t).size == 20)
  }

  test("arbitrary UPDATE SET expressions evaluate over the joined (t, s) " +
    "row — SET t.value = t.value + s.value accumulates") {
    mkBatch()
    val t = seedTable("exprset")
    val stmt =
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET
         |  value = t.value + s.value,
         |  event_type = concat(t.event_type, '+', s.event_type)
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    spark.sql(stmt)
    val out = state(t)
    assert(out(15L) == (("ok+new", 165.0)), "t.value + s.value must accumulate")
    assert(out(16L) == (("error+new", 176.0)))
    assert(out(1L) == (("ok", 1.0)), "unmatched table rows untouched")
    assert(out(21L) == (("new", 210.0)) && out.size == 25)
  }

  test("multiple conditional UPDATE clauses: first-match-wins in " +
    "statement order, both doors identical") {
    mkBatch()
    val (t1, t2) = (seedTable("multi1"), seedTable("multi2"))
    val stmt =
      s"""MERGE INTO graft.`%s` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN MATCHED AND t.event_type = 'error' THEN UPDATE SET value = t.value * 1000.0
         |WHEN MATCHED AND s.value > 170.0 THEN UPDATE SET value = s.value
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED AND s.value < 230.0 THEN INSERT *""".stripMargin
    GraftSql.mergeInto(spark, stmt.format(t1))
    spark.sql(stmt.format(t2))
    assert(state(t1) == state(t2))
    val out = state(t1)
    // 16, 20 are error rows: FIRST clause wins even though s.value > 170
    // also holds for 20
    assert(out(16L) == (("error", 16000.0)))
    assert(out(20L) == (("error", 20000.0)))
    // 18, 19 pass only the second clause
    assert(out(18L) == (("ok", 180.0)) && out(19L) == (("ok", 190.0)))
    // 15, 17 match neither guard → third clause deletes them
    assert(!out.contains(15L) && !out.contains(17L))
    // guarded insert: 21..22 in, 23..25 out
    assert(out.contains(21L) && out.contains(22L) && !out.contains(23L))
    assert(out.size == 20)
  }

  test("INSERT (cols) VALUES (exprs): expressions evaluate over s, " +
    "unlisted non-key columns insert as NULL") {
    mkBatch()
    val t = seedTable("inslist")
    GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN NOT MATCHED THEN INSERT (event_id, value)
         |  VALUES (s.event_id, s.value * 2.0 + 1.0)""".stripMargin)
    val raw = MergeTable.read(spark, t)
      .select("event_id", "event_type", "value")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getDouble(2)))).toMap
    assert(raw(21L) == ((None, 421.0)), "unlisted event_type must be NULL")
    assert(raw(25L) == ((None, 501.0)))
    assert(raw(16L) == ((Some("error"), 16.0)), "matched rows untouched")
    assert(raw.size == 25)
  }

  test("multiple INSERT clauses: first-match-wins picks the clause's " +
    "column list per row") {
    mkBatch()
    val t = seedTable("multins")
    spark.sql(
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN NOT MATCHED AND s.value >= 240.0 THEN INSERT (event_id, event_type, value)
         |  VALUES (s.event_id, 'big', s.value)
         |WHEN NOT MATCHED AND s.value >= 220.0 THEN INSERT (event_id, event_type, value)
         |  VALUES (s.event_id, 'mid', s.value)
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = state(t)
    assert(out(24L) == (("big", 240.0)) && out(25L) == (("big", 250.0)))
    assert(out(22L) == (("mid", 220.0)) && out(23L) == (("mid", 230.0)))
    assert(out(21L) == (("new", 210.0)), "fallback INSERT * for the rest")
    assert(out.size == 25)
  }

  test("the direct-parse door CREATES a table on first MERGE (keys from " +
    "the ON condition); the spark.sql door needs an existing table") {
    mkBatch()
    val t = fresh("create")
    GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val m = MergeTable.latestManifest(t).get
    assert(m.keys == Seq("event_id") && m.version == 0L)
    assert(state(t).size == 11 && state(t)(25L) == (("new", 250.0)))
    // the catalog door resolves the target at analysis: missing → loud
    val miss = fresh("create-miss")
    intercept[Exception](spark.sql(
      s"""MERGE INTO graft.`$miss` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
  }

  test("ON key order may differ from the table's pinned key order") {
    val t = fresh("keys2")
    val seed = Seq((1L, 10L, 1.0), (2L, 20L, 2.0))
      .toDF("k1", "k2", "value")
    MergeTable.mergeUpsert(spark, t, seed, Seq("k1", "k2"), Seq("k1", "k2"))
    Seq((2L, 20L, 99.0), (3L, 30L, 3.0)).toDF("k1", "k2", "value")
      .createOrReplaceTempView("gsql_twokey")
    // ON lists k2 first — the table's key order (k1, k2) must still apply
    spark.sql(
      s"""MERGE INTO graft.`$t` AS t USING gsql_twokey AS s
         |ON t.k2 = s.k2 AND t.k1 = s.k1
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = MergeTable.read(spark, t).select("k1", "value")
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 1.0, 2L -> 99.0, 3L -> 3.0))
  }

  test("property: random generalized-ON statements (cross-named keys, " +
    "residual conjuncts, clause lists) through BOTH SQL doors equal an " +
    "independent row-by-row interpreter") {
    type St = Map[Long, (String, Double)] // key -> (tag, value)

    // pools pair each SQL fragment with its exact Scala meaning, so the
    // reference evaluates the same predicate from a second implementation
    case class MCond(sql: String, holds: ((String, Double), Double) => Boolean)
    val matchedConds = Seq(
      MCond("s.value > t.value", (t, sv) => sv > t._2),
      MCond("t.tag = 'a'", (t, _) => t._1 == "a"))
    case class ICond(sql: String, holds: Double => Boolean)
    val insertConds = Seq(ICond("s.value >= 4.0", _ >= 4.0))
    // residuals gate MATCHED actions only (inserts are residual-blind —
    // standard MERGE classifies a never-key-matched source row as
    // NOT MATCHED under any residual value); both sides legal with any
    // clause mix except NMBS (rejected shape, not generated here)
    case class Resid(sql: String,
        holds: (Option[(String, Double)], Double) => Boolean,
        refsTarget: Boolean)
    val residuals = Seq(
      Resid("s.value >= 3.0", (_, sv) => sv >= 3.0, refsTarget = false),
      Resid("t.tag = 'a' ", (t, _) => t.exists(_._1 == "a"),
        refsTarget = true))

    sealed trait MAct; case object MDel extends MAct
    case object MStar extends MAct; case object MAcc extends MAct
    def mSql(a: MAct): String = a match {
      case MDel => "DELETE"
      case MStar => "UPDATE SET *"
      case MAcc => "UPDATE SET value = t.value + s.value"
    }
    def mApply(a: MAct, t: (String, Double), sTag: String, sv: Double)
        : Option[(String, Double)] = a match {
      case MDel => None
      case MStar => Some((sTag, sv))
      case MAcc => Some((t._1, t._2 + sv))
    }
    sealed trait IAct; case object IStar extends IAct
    case object IDouble extends IAct
    def iSql(a: IAct, srcKey: String): String = a match {
      case IStar => "INSERT *"
      case IDouble =>
        s"INSERT (event_id, value) VALUES (s.$srcKey, s.value * 2.0)"
    }

    import org.scalacheck.Gen
    // in-group reachability: only the LAST clause may drop its condition
    val mClauses = for {
      conds <- Gen.listOfN(2, Gen.oneOf(matchedConds)).map(_.distinct)
      n <- Gen.choose(0, conds.size)
      act <- Gen.listOfN(3, Gen.oneOf(MDel: MAct, MStar, MAcc))
      uncond <- Gen.oneOf(true, false)
    } yield conds.take(n).zip(act).map { case (c, a) => (Some(c), a) } ++
      (if (uncond) Seq((Option.empty[MCond], act(2))) else Nil)
    val iClauses = for {
      n <- Gen.choose(0, 1)
      act <- Gen.listOfN(2, Gen.oneOf(IStar: IAct, IDouble))
      uncond <- Gen.oneOf(true, false)
    } yield insertConds.take(n).map(c => (Some(c), act.head)) ++
      (if (uncond) Seq((Option.empty[ICond], act(1))) else Nil)
    val stmtGen = for {
      cross <- Gen.oneOf(true, false)
      ms <- mClauses
      is <- iClauses
      resid <- Gen.oneOf(None, Some(residuals.head), Some(residuals(1)))
      keys <- Gen.nonEmptyListOf(Gen.choose(0L, 25L)).map(_.distinct)
      v <- Gen.choose(0.0, 10.0).map(x => math.rint(x * 4) / 4)
      sqlDoor <- Gen.oneOf(true, false)
    } yield (cross, ms, is, resid, keys, v, sqlDoor)

    val seed = (0L until 14L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", (i % 7).toDouble))
    (1 to 2).foreach { round =>
      val t = fresh(s"onprop$round")
      MergeTable.mergeUpsert(spark, t, seed.toDF("event_id", "tag", "value"),
        Seq("event_id"), Seq("event_id"))
      var ref: St = seed.map(r => r._1 -> ((r._2, r._3))).toMap
      val rnd = new scala.util.Random(4000 + round)
      val stmts = Iterator.continually(
        stmtGen.apply(Gen.Parameters.default.withSize(8),
          org.scalacheck.rng.Seed(rnd.nextLong()))).flatten.take(8).toSeq
      stmts.foreach { case (cross, ms, is, resid, keys, v, sqlDoor0) =>
        val srcKey = if (cross) "sid" else "event_id"
        // star actions + a cross-named key cannot take the spark.sql door:
        // Spark's OWN analyzer expands SET * / INSERT * by NAME against
        // the source before any rule of ours runs, and the source has no
        // `event_id` — it fails loudly there (AnalysisException; pinned
        // below). The parse door renames first, so stars work through it.
        val sqlDoor = sqlDoor0 && !(cross &&
          (ms.exists(_._2 == MStar) || is.exists(_._2 == IStar)))
        val batchRows = keys.map(k => (k, "s", v + (k % 3) * 0.25))
        batchRows.toDF(srcKey, "tag", "value")
          .createOrReplaceTempView("gsql_onprop")
        val onSql = s"t.event_id = s.$srcKey" +
          resid.map(r => s" AND ${r.sql}").getOrElse("")
        val clauses =
          ms.map { case (c, a) =>
            s"WHEN MATCHED${c.map(x => s" AND ${x.sql}").getOrElse("")} " +
              s"THEN ${mSql(a)}" } ++
          is.map { case (c, a) =>
            s"WHEN NOT MATCHED${c.map(x => s" AND ${x.sql}").getOrElse("")} " +
              s"THEN ${iSql(a, srcKey)}" }
        if (clauses.nonEmpty) {
          val stmt =
            s"""MERGE INTO graft.`$t` AS t USING gsql_onprop AS s
               |ON $onSql
               |${clauses.mkString("\n")}""".stripMargin
          if (sqlDoor) spark.sql(stmt) else GraftSql.mergeInto(spark, stmt)
          // ---- the independent reference interpreter ------------------
          val bMap = batchRows.map(r => r._1 -> ((r._2, r._3))).toMap
          val next = scala.collection.mutable.Map.empty[Long, (String, Double)]
          ref.foreach { case (k, trow) =>
            bMap.get(k) match {
              case Some((sTag, sv)) =>
                val rOk = resid.forall(_.holds(Some(trow), sv))
                ms.find { case (c, _) =>
                  rOk && c.forall(_.holds(trow, sv)) } match {
                  case Some((_, act)) =>
                    mApply(act, trow, sTag, sv).foreach(next(k) = _)
                  case None => next(k) = trow
                }
              case None => next(k) = trow // no NMBS clauses generated
            }
          }
          bMap.foreach { case (k, (sTag, sv)) =>
            if (!ref.contains(k)) {
              // inserts are residual-blind: a key matching no target row
              // is NOT MATCHED no matter what the residual evaluates to
              is.find { case (c, _) => c.forall(_.holds(sv)) }
                .foreach {
                  case (_, IStar) => next(k) = (sTag, sv)
                  case (_, IDouble) => next(k) = (null, sv * 2.0)
                }
            }
          }
          ref = next.toMap
          val got = state0(t)
          assert(got == ref,
            s"generalized-ON merge diverged from the interpreter\n$stmt\n" +
              s"keys=$keys v=$v door=${if (sqlDoor) "spark.sql" else "parse"}\n" +
              s"engine=${got.toSeq.sortBy(_._1)}\nref=${ref.toSeq.sortBy(_._1)}")
        }
      }
    }
  }

  /** The property table's state: (event_id, tag, value), null-tag
    * tolerant (column-list inserts leave tag NULL). */
  private def state0(t: String): Map[Long, (String, Double)] =
    MergeTable.read(spark, t)
      .select("event_id", "tag", "value")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("cross-named ON key (t.event_id = s.customer_id) is bit-identical " +
    "to the renamed-source engine merge, s.customer_id references " +
    "rewrite, and the key stays identity-insertable") {
    val (ts, ta) = (seedTable("xn1"), seedTable("xn2"))
    val batch = (15L to 25L).map(i => (i, "new", i * 10.0))
      .toDF("customer_id", "event_type", "value")
    batch.createOrReplaceTempView("gsql_xnamed")
    // the analyzed door: attributes arrive RESOLVED, side attribution by
    // exprId — the hard case for the rename rewrite
    spark.sql(
      s"""MERGE INTO graft.`$ts` AS t USING gsql_xnamed AS s
         |ON t.event_id = s.customer_id
         |WHEN MATCHED AND s.value > t.value + 100.0
         |  THEN UPDATE SET value = s.value + t.value
         |WHEN NOT MATCHED THEN INSERT (event_id, event_type, value)
         |  VALUES (s.customer_id, upper(s.event_type), s.value)""".stripMargin)
    MergeTable.merge(spark, ta,
      batch.withColumnRenamed("customer_id", "event_id"),
      Seq("event_id"), Seq("event_id"),
      matched = Seq(MergeTable.MergeClause(Some("s.value > t.value + 100.0"),
        MergeTable.UpdateSet(Map("value" -> "s.value + t.value")))),
      notMatched = Seq(MergeTable.InsertClause(None,
        Map("event_id" -> "s.event_id",
          "event_type" -> "upper(s.event_type)", "value" -> "s.value"))))
    assert(state(ts) == state(ta))
    // matched 15..20: 10i > i + 100 holds for all → accumulate to 11i,
    // type kept; inserts 21..25 take the upper-cased label
    assert(state(ts)(15L) == (("ok", 165.0)))
    assert(state(ts)(16L) == (("error", 176.0)))
    assert(state(ts)(23L) == (("NEW", 230.0)))
    assert(state(ts).size == 25)
    // star actions via spark.sql + cross-named key: Spark's OWN analyzer
    // expands SET * by name before any graft rule runs — fails loudly
    // there (use explicit lists, or the parse door which renames first)
    intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      s"""MERGE INTO graft.`$ts` AS t USING gsql_xnamed AS s
         |ON t.event_id = s.customer_id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    // …while the SAME statement through the parse door works
    GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$ts` AS t USING gsql_xnamed AS s
         |ON t.event_id = s.customer_id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(state(ts)(15L) == (("new", 150.0)), "star update landed")
  }

  test("cross-named keys on a TWO-key table: both source columns rename, " +
    "any ON order, clause references rewrite per key") {
    val t = fresh("xn2key")
    MergeTable.mergeUpsert(spark, t,
      Seq((1L, 10L, 1.0), (2L, 20L, 2.0), (3L, 30L, 3.0))
        .toDF("k1", "k2", "value"),
      Seq("k1", "k2"), Seq("k1", "k2"))
    Seq((2L, 20L, 99.0), (4L, 40L, 4.0)).toDF("a", "b", "value")
      .createOrReplaceTempView("gsql_xn2")
    // reversed equality order on the second key, both cross-named
    spark.sql(
      s"""MERGE INTO graft.`$t` AS t USING gsql_xn2 AS s
         |ON t.k1 = s.a AND s.b = t.k2
         |WHEN MATCHED THEN UPDATE SET value = s.value + t.value
         |WHEN NOT MATCHED THEN INSERT (k1, k2, value)
         |  VALUES (s.a, s.b, s.value)""".stripMargin)
    val out = MergeTable.read(spark, t).select("k1", "k2", "value")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map((1L, 10L) -> 1.0, (2L, 20L) -> 101.0,
      (3L, 30L) -> 3.0, (4L, 40L) -> 4.0))
  }

  test("ON residual conjunct folds into MATCHED clause conditions only: " +
    "a key-matched pair failing it takes no action, while a key-absent " +
    "row is NOT MATCHED under any residual value and inserts — standard " +
    "MERGE semantics") {
    mkBatch()
    val t = seedTable("resid")
    GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id AND s.value >= 220.0
         |WHEN MATCHED THEN UPDATE SET value = s.value
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = state(t)
    // matched 15..20 redeliver value 10i, all < 220 → every one untouched
    assert((15L to 20L).forall(i => out(i)._2 == i * 1.0))
    // key-absent 21..25 ALL insert: no target row satisfies the full ON
    // for them no matter the residual, so strict SQL classifies each
    // not-matched (21's value 210 < 220 included — dropping it was the
    // pre-round-15 divergence)
    assert((21L to 25L).forall(i => out(i) == (("new", i * 10.0))))
    assert(out.size == 25)
  }

  test("target-side ON residual composes with NOT MATCHED inserts: the " +
    "residual gates matched actions, inserts are residual-blind") {
    mkBatch()
    val t = seedTable("tresins")
    spark.sql(
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id AND t.event_type = 'error'
         |WHEN MATCHED THEN UPDATE SET value = s.value
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = state(t)
    // of the key-matched 15..20, only the 'error' rows (16, 20) update
    assert(out(16L) == (("error", 160.0)) && out(20L) == (("error", 200.0)))
    assert(out(15L) == (("ok", 15.0)) && out(18L) == (("ok", 18.0)))
    // key-absent 21..25 insert — no target row exists, so the target-side
    // residual can never hold for them and they are NOT MATCHED
    assert((21L to 25L).forall(i => out(i) == (("new", i * 10.0))))
    assert(out.size == 25)
  }

  test("target-side ON residual gates matched clauses — match stays " +
    "key-scoped, the residual decides which matched pairs act") {
    mkBatch()
    val t = seedTable("tresid")
    GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_batch AS s
         |ON t.event_id = s.event_id AND t.event_type = 'error'
         |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin)
    val out = state(t)
    // of the matched 15..20, only the 'error' rows (16, 20) update
    assert(out(16L) == (("error", 160.0)) && out(20L) == (("error", 200.0)))
    assert(out(15L) == (("ok", 15.0)) && out(18L) == (("ok", 18.0)))
    assert(out.size == 20) // no insert clause → nothing inserts
  }

  private def mkOrBatch(): Unit =
    Seq(
      (3L, 300L, 7.7),   // primary addresses id 3 ('ok'): update
      (400L, 8L, 5.5),   // alias addresses id 8 ('error'): delete
      (500L, 600L, 1.1), // neither address matches: NO action, NO insert
      (9L, 9L, 2.2))     // both disjuncts address id 9: dedup, one update
      .toDF("primary_id", "alias_id", "value")
      .createOrReplaceTempView("gsql_or_batch")

  test("OR-of-key-tuples ON: a row addresses a target by primary OR " +
    "alias id — matched-only semantics, both doors bit-identical, " +
    "duplicate addressings of one key collapse") {
    mkOrBatch()
    val stmt = (t: String) =>
      s"""MERGE INTO graft.`$t` AS t USING gsql_or_batch AS s
         |ON (t.event_id = s.primary_id) OR (t.event_id = s.alias_id)
         |WHEN MATCHED AND t.event_type = 'error' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin
    val (t1, t2) = (seedTable("ortuple1"), seedTable("ortuple2"))
    GraftSql.mergeInto(spark, stmt(t1))
    spark.sql(stmt(t2))
    Seq(t1, t2).foreach { t =>
      val out = state(t)
      assert(out(3L) == (("ok", 7.7)), "primary addressing updates")
      assert(!out.contains(8L), "alias addressing reaches the delete clause")
      assert(out(9L) == (("ok", 2.2)),
        "both-disjuncts-same-key addressings dedup to one update")
      assert(!out.contains(500L) && !out.contains(600L),
        "a never-matched row must NOT insert (matched-only semantics)")
      assert(out.size == 19)
      // the alias column must NOT have widened the table schema
      assert(!MergeTable.read(spark, t).columns.exists(
        c => c.equalsIgnoreCase("primary_id") || c.equalsIgnoreCase("alias_id")))
    }
  }

  test("OR-of-key-tuples ON: cardinality violation — two source rows " +
    "addressing ONE target key through different disjuncts reject as " +
    "key-duplication, the standard MERGE multi-match error") {
    Seq((5L, 900L, 1.0), (901L, 5L, 2.0))
      .toDF("primary_id", "alias_id", "value")
      .createOrReplaceTempView("gsql_or_dup")
    val t = seedTable("ordup")
    val e = intercept[Exception](GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_or_dup AS s
         |ON (t.event_id = s.primary_id) OR (t.event_id = s.alias_id)
         |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin))
    assert(e.getMessage.contains("key-unique"), e.getMessage)
  }

  test("OR-of-key-tuples ON: two EXACT-duplicate source rows addressing " +
    "one key are a cardinality violation, same as the single-tuple door " +
    "— the explosion's dedup must not silently collapse them") {
    Seq((5L, 900L, 1.0), (5L, 900L, 1.0))
      .toDF("primary_id", "alias_id", "value")
      .createOrReplaceTempView("gsql_or_exactdup")
    val t = seedTable("orexactdup")
    val e = intercept[Exception](GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_or_exactdup AS s
         |ON (t.event_id = s.primary_id) OR (t.event_id = s.alias_id)
         |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin))
    assert(e.getMessage.contains("key-unique"), e.getMessage)
    assert(state(t).size == 20, "nothing committed")
  }

  test("OR-of-key-tuples ON: a source payload column named like the " +
    "target key rejects loudly when a disjunct's address would clobber " +
    "it — mirroring the single-tuple door") {
    Seq((7L, 70L, 3.3))
      .toDF("event_id", "alias_id", "value") // event_id IS the target key
      .createOrReplaceTempView("gsql_or_clobber")
    val t = seedTable("orclobber")
    val e = intercept[Exception](GraftSql.mergeInto(spark,
      s"""MERGE INTO graft.`$t` AS t USING gsql_or_clobber AS s
         |ON (t.event_id = s.event_id) OR (t.event_id = s.alias_id)
         |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin))
    assert(e.getMessage.contains("clobber"), e.getMessage)
    assert(state(t).size == 20, "nothing committed")
  }

  test("OR-of-key-tuples ON: unsupported shapes reject with the rewrite " +
    "spelled out — inserts, NMBS, in-disjunct residuals, and clauses " +
    "referencing a dropped address column") {
    mkOrBatch()
    val t = seedTable("orreject")
    def run(sql: String): Exception =
      intercept[Exception](GraftSql.mergeInto(spark, sql))
    val on = s"ON (t.event_id = s.primary_id) OR (t.event_id = s.alias_id)"
    // inserts: which candidate key would a never-matched row take?
    assert(run(
      s"""MERGE INTO graft.`$t` AS t USING gsql_or_batch AS s $on
         |WHEN MATCHED THEN UPDATE SET value = s.value
         |WHEN NOT MATCHED THEN INSERT (event_id, value)
         |  VALUES (s.primary_id, s.value)""".stripMargin)
      .getMessage.contains("WHEN NOT MATCHED"))
    // NMBS quantifies over all addressings
    assert(run(
      s"""MERGE INTO graft.`$t` AS t USING gsql_or_batch AS s $on
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      .getMessage.contains("NOT MATCHED BY SOURCE"))
    // a residual inside a disjunct
    assert(run(
      s"""MERGE INTO graft.`$t` AS t USING gsql_or_batch AS s
         |ON (t.event_id = s.primary_id AND s.value > 0)
         |  OR (t.event_id = s.alias_id)
         |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin)
      .getMessage.contains("pure key-tuple"))
    // a clause referencing the dropped address column fails loudly at
    // clause validation (reference the target key instead)
    assert(run(
      s"""MERGE INTO graft.`$t` AS t USING gsql_or_batch AS s $on
         |WHEN MATCHED THEN UPDATE SET value = s.alias_id + 0.0""".stripMargin)
      .getMessage.toLowerCase.contains("resolve"))
    // nothing committed by any rejected statement
    assert(state(t).size == 20)
  }
}
