package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeTable

/** CHECK constraints — declarative write-side invariants, the engine's
  * twin of the reference's construction-time row validation
  * (`categorize-trail-conditions/src/client.py:41-55`). The matrix: a
  * violating batch is rejected ATOMICALLY (nothing published, version
  * unchanged), a passing batch commits, adding validates existing data,
  * NULL passes (the SQL standard), constraints survive unrelated
  * renames and RESTORE, renames/drops of referenced columns are
  * blocked, drop-constraint re-opens the gate, and the SQL DDL face
  * (Spark's native ALTER TABLE … ADD/DROP CONSTRAINT through the graft
  * catalog) drives the same machinery.
  */
class ConstraintSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_check_$tag")
      .resolve("t").toString

  private def seed(t: String): Unit =
    MergeTable.mergeUpsert(spark, t,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "tag", "value"),
      Seq("id"), Seq("id"), txn = Some(("w", 0L)))

  test("add validates existing data: clean table accepts, dirty table " +
    "rejects with the violation count; the constraint lands as " +
    "versioned metadata") {
    val t = fresh("add")
    seed(t)
    val v = MergeTable.addConstraint(spark, t, "positive_value", "value > 0")
    val head = MergeTable.latestManifest(t).get
    assert(head.version == v &&
      head.constraints == Map("positive_value" -> "value > 0"))
    // a second constraint over a column with a violation is rejected
    val e = intercept[IllegalArgumentException] {
      MergeTable.addConstraint(spark, t, "small", "value < 25")
    }
    assert(e.getMessage.contains("1 existing row(s)"), e.getMessage)
    assert(MergeTable.latestManifest(t).get.constraints.size == 1,
      "a rejected add must not commit")
    // unknown columns fail analysis loudly
    intercept[Exception] {
      MergeTable.addConstraint(spark, t, "ghost", "no_such_col > 0")
    }
    // non-deterministic predicates are rejected
    val nd = intercept[IllegalArgumentException] {
      MergeTable.addConstraint(spark, t, "flaky", "rand() > 0.5")
    }
    assert(nd.getMessage.contains("non-deterministic"))
  }

  test("a violating batch is rejected ATOMICALLY — named constraint, " +
    "counted rows, version and data unchanged; a passing batch commits") {
    val t = fresh("gate")
    seed(t)
    MergeTable.addConstraint(spark, t, "positive_value", "value > 0")
    val before = MergeTable.latestManifest(t).get.version
    val bad = Seq((4L, "d", -5.0), (5L, "e", 50.0), (6L, "f", -1.0))
      .toDF("id", "tag", "value")
    val e = intercept[IllegalStateException] {
      MergeTable.mergeUpsert(spark, t, bad, Seq("id"), Seq("id"),
        txn = Some(("w", 1L)))
    }
    assert(e.getMessage.contains("positive_value") &&
      e.getMessage.contains("2 staged row(s)"), e.getMessage)
    val head = MergeTable.latestManifest(t).get
    assert(head.version == before, "a rejected batch must not commit")
    assert(MergeTable.read(spark, t).count() == 3)
    // the passing subset commits normally
    MergeTable.mergeUpsert(spark, t,
      Seq((5L, "e", 50.0)).toDF("id", "tag", "value"),
      Seq("id"), Seq("id"), txn = Some(("w", 2L)))
    assert(MergeTable.read(spark, t).count() == 4)
  }

  test("an UPDATE driving a row into violation is rejected; NULL passes " +
    "(SQL standard); replaceAll and the write door enforce too") {
    val t = fresh("paths")
    seed(t)
    MergeTable.addConstraint(spark, t, "positive_value", "value > 0")
    // SQL UPDATE violating → merge-staged write rejects
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$t` SET value = -1.0 WHERE id = 2")
    }
    assert(e.getMessage.contains("positive_value"))
    assert(MergeTable.read(spark, t).where(col("value") < 0).count() == 0)
    // NULL is not a violation: CHECK passes on UNKNOWN
    MergeTable.mergeUpsert(spark, t,
      Seq((7L, "g", Option.empty[Double])).toDF("id", "tag", "value"),
      Seq("id"), Seq("id"), txn = Some(("w", 3L)))
    assert(MergeTable.read(spark, t)
      .where(col("id") === 7L && col("value").isNull).count() == 1)
    // replaceAll (INSERT OVERWRITE) enforces the same gate
    val eo = intercept[IllegalStateException] {
      MergeTable.replaceAll(spark, t,
        Seq((1L, "a", -9.0)).toDF("id", "tag", "value"),
        Seq("id"), Seq("id"), txn = Some(("w", 4L)))
    }
    assert(eo.getMessage.contains("positive_value"))
  }

  test("constraints are versioned state: unrelated rename carries them, " +
    "referenced rename/drop is blocked, RESTORE restores the target's " +
    "set, and dropping the constraint re-opens the gate") {
    val t = fresh("life")
    seed(t) // v0
    MergeTable.addConstraint(spark, t, "positive_value", "value > 0") // v1
    // unrelated rename: constraint carries
    MergeTable.renameColumn(t, "tag", "label") // v2
    assert(MergeTable.latestManifest(t).get.constraints.nonEmpty)
    intercept[IllegalStateException] {
      MergeTable.mergeUpsert(spark, t,
        Seq((8L, "h", -1.0)).toDF("id", "label", "value"),
        Seq("id"), Seq("id"), txn = Some(("w", 5L)))
    }
    // referenced rename / drop: blocked until the constraint goes
    val er = intercept[IllegalArgumentException] {
      MergeTable.renameColumn(t, "value", "amount")
    }
    assert(er.getMessage.contains("positive_value"))
    val ed = intercept[IllegalArgumentException] {
      MergeTable.dropColumn(t, "value")
    }
    assert(ed.getMessage.contains("positive_value"))
    // dropping an UNREFERENCED column stays allowed
    MergeTable.dropColumn(t, "label")
    assert(MergeTable.latestManifest(t).get.constraints.nonEmpty)
  }

  test("RESTORE re-arms the gate without re-validating history") {
    val t = fresh("restore")
    seed(t) // v0
    MergeTable.addConstraint(spark, t, "positive_value", "value > 0") // v1
    MergeTable.restore(t, 0L) // v2: no constraints
    MergeTable.mergeUpsert(spark, t,
      Seq((9L, "i", -2.0)).toDF("id", "tag", "value"),
      Seq("id"), Seq("id"), txn = Some(("w", 1L))) // v3: gate off, lands
    MergeTable.restore(t, 1L) // v4: v1's listing AND its constraint set
    val head = MergeTable.latestManifest(t).get
    assert(head.constraints == Map("positive_value" -> "value > 0"))
    assert(MergeTable.read(spark, t).where(col("value") < 0).count() == 0,
      "v1's restored listing predates the negative row")
    intercept[IllegalStateException] {
      MergeTable.mergeUpsert(spark, t,
        Seq((10L, "j", -3.0)).toDF("id", "tag", "value"),
        Seq("id"), Seq("id"), txn = Some(("w", 2L)))
    }
    // drop re-opens
    MergeTable.dropConstraint(t, "positive_value")
    MergeTable.mergeUpsert(spark, t,
      Seq((10L, "j", -3.0)).toDF("id", "tag", "value"),
      Seq("id"), Seq("id"), txn = Some(("w", 3L)))
    assert(MergeTable.read(spark, t).where(col("value") < 0).count() == 1)
    // unknown drop: loud unless IF EXISTS
    intercept[Exception] { MergeTable.dropConstraint(t, "ghost") }
    assert(MergeTable.dropConstraint(t, "ghost", ifExists = true) ==
      MergeTable.latestManifest(t).get.version)
  }

  test("a constraint added BETWEEN a merge's stage and its commit forces " +
    "re-validation — the raced batch cannot slip past the new gate") {
    val t = fresh("race")
    seed(t)
    // the hook fires after the merge staged its (pre-constraint) files
    // and immediately before its CAS: an interloping ADD CONSTRAINT wins
    // the version race, so the merge must NOT fast-path its already-
    // staged files (they were validated under the EMPTY set) — the full
    // replay re-stages through the gate and rejects the violating batch
    var fired = false
    MergeTable.testPrecommitHook = () => if (!fired) {
      fired = true
      MergeTable.addConstraint(spark, t, "positive_value", "value > 0")
    }
    val e = try intercept[IllegalStateException] {
      MergeTable.mergeUpsert(spark, t,
        Seq((9L, "z", -1.0)).toDF("id", "tag", "value"),
        Seq("id"), Seq("id"), txn = Some(("w", 9L)))
    } finally MergeTable.testPrecommitHook = () => ()
    assert(fired && e.getMessage.contains("positive_value"), e.getMessage)
    assert(MergeTable.read(spark, t).where(col("value") < 0).count() == 0,
      "the raced violating batch must never publish")
  }

  test("replaceAll cannot reuse files staged under a superseded " +
    "constraint set") {
    val t = fresh("racereplace")
    seed(t)
    var fired = false
    MergeTable.testPrecommitHook = () => if (!fired) {
      fired = true
      MergeTable.addConstraint(spark, t, "positive_value", "value > 0")
    }
    val e = try intercept[IllegalStateException] {
      MergeTable.replaceAll(spark, t,
        Seq((1L, "a", -5.0)).toDF("id", "tag", "value"),
        Seq("id"), Seq("id"), txn = Some(("ow", 1L)))
    } finally MergeTable.testPrecommitHook = () => ()
    assert(fired && e.getMessage.contains("positive_value"), e.getMessage)
    assert(MergeTable.read(spark, t).where(col("value") < 0).count() == 0)
  }

  test("SQL DDL face: Spark-native ALTER TABLE ADD/DROP CONSTRAINT " +
    "drives the engine through the graft catalog; DESCRIBE-level " +
    "constraints() reports them") {
    val t = fresh("sql")
    seed(t)
    spark.sql(
      s"ALTER TABLE graft.`$t` ADD CONSTRAINT positive_value " +
        "CHECK (value > 0)")
    val head = MergeTable.latestManifest(t).get
    assert(head.constraints.keySet == Set("positive_value"))
    // the V2 table reports it (DESCRIBE surface)
    val tbl = graft.sources.GraftTable.resolve(t, None, None)
    val cs = tbl.constraints()
    assert(cs.length == 1 && cs.head.name() == "positive_value" &&
      cs.head.enforced())
    // enforced end-to-end through SQL INSERT
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$t` VALUES (11, 'k', -4.0)")
    }
    assert(e.getMessage.contains("positive_value") ||
      Option(e.getCause).exists(_.getMessage.contains("positive_value")),
      s"INSERT must hit the gate: ${e.getMessage}")
    spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT positive_value")
    assert(MergeTable.latestManifest(t).get.constraints.isEmpty)
    spark.sql(s"INSERT INTO graft.`$t` VALUES (11, 'k', -4.0)")
    assert(MergeTable.read(spark, t).where(col("value") < 0).count() == 1)
  }
}
