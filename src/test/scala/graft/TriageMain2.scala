package graft

/** Dev-only: time the q_merge_upsert digest against four prebuilt
  * fixture tables (two written by the pre-87ef0e7 binary, two by the
  * post one) from one JVM — separates written-layout effects from
  * window drift. */
object TriageMain2 {
  def main(args: Array[String]): Unit = {
    import graft.ops._
    import org.apache.spark.sql.functions._
    val s = GraftSession.local(32, "triage2")
    def digest(t: String) =
      MergeTable.readVersion(s, t, 2L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 2).as("value_sum"))
        .orderBy("event_type")
    for (round <- 1 to 4; t <- args) {
      val t0 = System.nanoTime
      digest(t).write.mode("overwrite").format("noop").save()
      println(f"[triage2] r$round ${t.takeRight(12)} ${(System.nanoTime - t0) / 1e9}%6.3f")
    }
    s.stop()
  }
}
