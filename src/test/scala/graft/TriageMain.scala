package graft

/** Dev-only triage harness (round-17 bench attribution): profiles the
  * pieces behind q_merge_upsert / q_optimize_split / q_snapshot_diff in
  * one fresh JVM. Not part of the driver contract; run with
  *   sbt "Test/runMain graft.TriageMain"
  */
object TriageMain {
  def main(args: Array[String]): Unit = {
    import graft.ops._
    val s = GraftSession.local(32, "triage")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime
      val r = f
      println(f"[triage] $tag%-34s ${(System.nanoTime - t0) / 1e9}%7.3f  $r")
    }
    time("first build+read q_merge_upsert") {
      MergeTable.mergeUpsertDigest(s, sf)
        .write.mode("overwrite").format("noop").save(); ""
    }
    for (i <- 1 to 5) time(s"q_merge_upsert rep$i") {
      MergeTable.mergeUpsertDigest(s, sf)
        .write.mode("overwrite").format("noop").save(); ""
    }
    val m = MergeTable.getClass.getDeclaredMethods
      .find(_.getName == "buildMergedEvents").get
    m.setAccessible(true)
    val tbl = m.invoke(MergeTable, s, sf).asInstanceOf[String]
    for (v <- 0L to 4L) {
      val mf = MergeTable.manifestAt(tbl, v).get
      println(s"[triage] v$v files=${mf.files.size} " +
        s"rows=${mf.files.map(_.visibleRows).sum} " +
        s"dvs=${mf.files.count(_.dv.nonEmpty)}")
    }
    for (i <- 1 to 3) time(s"manifestAt(v2) #$i") {
      MergeTable.manifestAt(tbl, 2L).get.files.size
    }
    for (i <- 1 to 3) time(s"readVersion(v2).count #$i") {
      MergeTable.readVersion(s, tbl, 2L).count()
    }
    for (i <- 1 to 3) time(s"readVersion(v2)+agg noop #$i") {
      MergeTable.readVersion(s, tbl, 2L)
        .groupBy("event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))
        .write.mode("overwrite").format("noop").save(); ""
    }
    // the other two movers
    for (i <- 1 to 4) time(s"q_optimize_split rep$i") {
      MergeTable.optimizeSplitDigest(s, sf)
        .write.mode("overwrite").format("noop").save(); ""
    }
    for (i <- 1 to 4) time(s"q_snapshot_diff rep$i") {
      ChangeCapture.eventsSnapshotDiff(s, sf)
        .write.mode("overwrite").format("noop").save(); ""
    }
    s.stop()
  }
}
