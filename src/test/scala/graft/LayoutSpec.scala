package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout
import graft.sources.Tables

/** Z-order layout: interleave correctness and the data-skipping effect
  * (per-file bounding boxes) it exists to produce.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("zvalue matches a reference bit-interleave on the driver") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until Layout.ZBits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1999L, 99L),
      (65535L, 65535L), (1234L, 4321L), (2L, 3L))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zvalue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"zvalue($x, $y)")
    }
    // z-order locality: adjacent cells differ in few bits of z
    assert(ref(3, 3) == 15 && ref(2, 2) == 12 && ref(0, 3) == 10)
  }

  test("z-ordered files have far tighter (part, supp) boxes than a 1-D sort") {
    val li = Tables.read(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val base = Files.createTempDirectory("graft-layout-").toString
    val zPath = s"$base/zorder"
    val naivePath = s"$base/naive"
    val nFiles = 16

    Layout.zorderWrite(li, "l_partkey", "l_suppkey", zPath, nFiles)
    // the layout every ingest produces by default: clustered on ONE key
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(naivePath)

    def boxes(path: String) =
      Layout.fileBoxes(spark.read.parquet(path), "l_partkey", "l_suppkey")
        .collect()
    val zBoxes = boxes(zPath)
    val nBoxes = boxes(naivePath)

    // same rows in both layouts
    assert(zBoxes.map(_.getAs[Long]("n_rows")).sum ==
      nBoxes.map(_.getAs[Long]("n_rows")).sum)

    val zArea = zBoxes.map(_.getAs[Long]("box_area")).sum
    val nArea = nBoxes.map(_.getAs[Long]("box_area")).sum
    // 1-D-sorted files each span nearly the full (part, supp) plane; the
    // z-ordered files partition it into tight boxes. Demand at least 4× —
    // measured ratio is far larger, but file-boundary raggedness at this
    // tiny SF deserves slack.
    assert(zArea * 4 < nArea, s"zArea=$zArea naiveArea=$nArea")

    // and a 2-D predicate touches only a minority of z-ordered files
    val hit = zBoxes.count { r =>
      val (loP, hiP) = (500L, 700L)
      val (loS, hiS) = (20L, 40L)
      r.getAs[Long]("min_x") <= hiP && r.getAs[Long]("max_x") >= loP &&
        r.getAs[Long]("min_y") <= hiS && r.getAs[Long]("max_y") >= loS
    }
    assert(hit <= zBoxes.length / 2,
      s"2-D predicate still hits $hit of ${zBoxes.length} z-ordered files")
  }

  test("hashPreimages routes rows to EXACTLY their target partitions " +
    "through a REAL repartition exchange (the runtime contract, not the " +
    "probe's own arithmetic)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    val n = 37
    val pre = Layout.hashPreimages(n)
    assert(pre.distinct.length == n)
    val rows = (0 until n).flatMap(i => Seq.fill(3)((i, pre(i))))
      .toDF("target", "pre")
      .repartition(n, col("pre"))
      .withColumn("pid", spark_partition_id())
      .collect()
    assert(rows.length == 3 * n)
    assert(rows.forall(r => r.getInt(0) == r.getInt(2)),
      rows.filter(r => r.getInt(0) != r.getInt(2)).take(3).mkString(", "))
  }

  test("scaleToBits is clamped to the bit budget: a full-long domain's " +
    "extremes land in cell 0 and the TOP cell, never wrap past it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vs = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    val out = vs.toDF("v")
      .select(Layout.scaleToBits(col("v"), Long.MinValue, Long.MaxValue, 16)
        .as("z"))
      .as[Long].collect()
    assert(out.forall(z => z >= 0L && z <= 65535L), out.toSeq.toString)
    assert(out.head == 0L, "domain minimum must map to cell 0")
    assert(out.last == 65535L, "domain maximum must map to the top cell")
    // degenerate domain: everything in cell 0
    val one = vs.toDF("v")
      .select(Layout.scaleToBits(col("v"), 7L, 7L, 16).as("z"))
      .as[Long].collect()
    assert(one.forall(_ == 0L))
  }
}
