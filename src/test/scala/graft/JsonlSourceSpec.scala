package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jsonl

/** JSONL source: schema-on-read fidelity + both malformed-row policies. */
class JsonlSourceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def mixedFile(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-jsonl-spec")
    val lines = Seq(
      """{"event_id":"e1","user_id":1,"event_type":"click","ts_us":1000000,"value":1.5,"props":"{\"k\":\"v\"}"}""",
      """{"event_id":"e2","user_id":2,"event_type":"view","ts_us":2000000,"value":2.5,"props":null}""",
      """not json at all""",
      """{"event_id":"e3","user_id":"BOOM","event_type":"view","ts_us":3000000,"value":3.5,"props":null}""")
    java.nio.file.Files.write(d.resolve("part-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    d.toString
  }

  test("PERMISSIVE: malformed lines land in _corrupt, clean rows parse fully") {
    val df = Jsonl.readEvents(spark, mixedFile()).cache()
    assert(df.count() == 4)
    val corrupt = df.where(col("_corrupt").isNotNull)
    assert(corrupt.count() == 2) // the non-JSON line and the type-mismatch line
    val clean = df.where(col("_corrupt").isNull)
    assert(clean.count() == 2)
    // nested JSON payload survives the escape/unescape round trip
    assert(clean.where(col("event_id") === "e1")
      .select(get_json_object(col("props"), "$.k")).first().getString(0) == "v")
    df.unpersist()
  }

  test("FAILFAST: the same file fails the scan (strict P6 policy)") {
    val e = intercept[org.apache.spark.SparkException] {
      Jsonl.readEventsStrict(spark, mixedFile()).collect()
    }
    assert(e.getMessage.contains("FAILFAST") ||
      Option(e.getCause).exists(_.getMessage.contains("FAILFAST")))
  }

  test("roundtrip agg: JSONL-sourced aggregate equals the parquet-sourced aggregate") {
    val viaJsonl = Jsonl.roundtripAgg(spark, dir).collect()
    val direct = graft.sources.Tables.read(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        max(col("ts")).as("max_ts"),
        countDistinct(col("props")).as("n_props"))
      .orderBy("event_type").collect()
    assert(viaJsonl.toSeq == direct.toSeq)
  }
}
