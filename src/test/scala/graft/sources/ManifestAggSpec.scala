package graft.sources

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeTable
import graft.ops.MergeTable.{ColStat, DataFileEntry, TableManifest}

/** Driver-side unit coverage of [[ManifestAgg]]'s edge semantics that no
  * Spark-written fixture can reach: Spark's UnsafeWriter normalizes -0.0
  * to +0.0 before any file lands, but a manifest written by another tool
  * (or a future writer change) can carry "-0.0" stat strings, and the
  * grouped answer must mirror Spark's GROUP BY (which folds signed zeros
  * into ONE group), never key on the rendered string verbatim. */
class ManifestAggSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("g", DoubleType)))

  private def entry(path: String, rows: Long, gStat: String): DataFileEntry =
    DataFileEntry(path, rows,
      stats = Map("g" -> ColStat("double", gStat, gStat)),
      nullCounts = Map("g" -> 0L, "id" -> 0L), bytes = 1L)

  private def manifest(files: Seq[DataFileEntry]): TableManifest =
    TableManifest(0L, schema.json, Seq("id"), Seq("id"), files, Map.empty)

  private val groupByG = new Aggregation(
    Array(new CountStar()), Array(Expressions.column("g")))

  test("grouped answer folds -0.0 and 0.0 point files into ONE group " +
    "keyed +0.0 — Spark's GROUP BY normalization, not the stat string") {
    val m = manifest(Seq(
      entry("f1", 10L, "-0.0"), entry("f2", 7L, "0.0")))
    val Some((out, rows)) = ManifestAgg.answer(m, schema, groupByG)
    assert(out.fieldNames.toSeq == Seq("g", "count(*)"))
    assert(rows.size == 1, s"signed zeros must share one group, got $rows")
    assert(rows.head == Seq(0.0, 17L))
    assert(java.lang.Double.doubleToRawLongBits(
      rows.head.head.asInstanceOf[Double]) == 0L,
      "the group key must be +0.0, the canonical form Spark groups under")
  }

  test("distinct non-zero double points still answer distinct groups") {
    val m = manifest(Seq(
      entry("f1", 3L, "1.5"), entry("f2", 4L, "-1.5"), entry("f3", 5L, "1.5")))
    val Some((_, rows)) = ManifestAgg.answer(m, schema, groupByG)
    assert(rows.map(r => (r.head, r(1))).toSet ==
      Set((-1.5, 4L), (1.5, 8L)))
  }

  test("a wide-box file refuses the grouped answer entirely") {
    val wide = DataFileEntry("fw", 5L,
      stats = Map("g" -> ColStat("double", "-0.0", "2.0")),
      nullCounts = Map("g" -> 0L), bytes = 1L)
    val m = manifest(Seq(entry("f1", 10L, "0.0"), wide))
    assert(ManifestAgg.answer(m, schema, groupByG).isEmpty)
  }

  test("SUM answers from exact per-file sums; the FOLD is overflow-" +
    "checked (a total beyond Long range refuses); a legacy entry " +
    "without sums refuses; an all-null file contributes nothing") {
    import org.apache.spark.sql.connector.expressions.aggregate.{Avg, Sum}
    def sumAgg = new Aggregation(
      Array(new Sum(Expressions.column("id"), false)), Array.empty)
    def withSums(path: String, rows: Long, nulls: Long,
        sum: Option[String]): DataFileEntry =
      DataFileEntry(path, rows, stats = Map.empty,
        nullCounts = Map("id" -> nulls),
        sums = sum.map(s => Map("id" -> s)).getOrElse(Map.empty))
    // clean fold: 100 + 23 (+ an all-null file that contributes nothing)
    val ok = manifest(Seq(withSums("f1", 10L, 0L, Some("100")),
      withSums("f2", 5L, 1L, Some("23")),
      withSums("f3", 4L, 4L, None)))
    val Some((outS, rowsS)) = ManifestAgg.answer(ok, schema, sumAgg)
    assert(outS.fields.head.dataType == org.apache.spark.sql.types.LongType)
    assert(rowsS == Seq(Seq(123L)))
    // avg from the same entries: exact sum / non-null count
    val avgAgg = new Aggregation(
      Array(new Avg(Expressions.column("id"), false)), Array.empty)
    val Some((outA, rowsA)) = ManifestAgg.answer(ok, schema, avgAgg)
    assert(outA.fields.head.dataType == org.apache.spark.sql.types.DoubleType)
    assert(rowsA == Seq(Seq(123.0 / 14.0)))
    // two near-Long.Max per-file sums: the fold overflows Long → refuse
    val big = Long.MaxValue - 10L
    val over = manifest(Seq(withSums("f1", 10L, 0L, Some(big.toString)),
      withSums("f2", 10L, 0L, Some(big.toString))))
    assert(ManifestAgg.answer(over, schema, sumAgg).isEmpty,
      "a Long-overflowing fold must refuse, not wrap")
    // a legacy entry (non-null rows, no sums map) refuses the answer
    val legacy = manifest(Seq(withSums("f1", 10L, 0L, Some("100")),
      withSums("f2", 5L, 0L, None)))
    assert(ManifestAgg.answer(legacy, schema, sumAgg).isEmpty)
    // only all-null files: SUM answers NULL (metadata-only), not refusal
    val allNull = manifest(Seq(withSums("f1", 4L, 4L, None)))
    val Some((_, rowsN)) = ManifestAgg.answer(allNull, schema, sumAgg)
    assert(rowsN == Seq(Seq(null)))
    // a double column's sum never answers — order-dependent by domain
    val gSum = new Aggregation(
      Array(new Sum(Expressions.column("g"), false)), Array.empty)
    assert(ManifestAgg.answer(manifest(Seq(
      entry("f1", 3L, "1.5"))), schema, gSum).isEmpty)
  }

  test("grouped answers under DVs: a masked point file keeps its group " +
    "(the delta proves zero visible nulls), a FULLY-masked file's group " +
    "drops — Spark emits no row for an empty group — and an unrecorded " +
    "delta refuses") {
    val live = entry("f1", 10L, "1.5")
    val partly = entry("f2", 6L, "2.5").copy(dv = Some("dv/x"), dvRows = 2L,
      dvNulls = Map("g" -> 0L, "id" -> 0L))
    val gone = entry("f3", 4L, "3.5").copy(dv = Some("dv/y"), dvRows = 4L,
      dvNulls = Map("g" -> 0L, "id" -> 0L))
    val m = manifest(Seq(live, partly, gone))
    val Some((_, rows)) = ManifestAgg.answer(m, schema, groupByG)
    assert(rows.map(r => (r.head, r(1))).toSet ==
      Set((1.5, 10L), (2.5, 4L)),
      s"partly-masked keeps its group at visible count, fully-masked " +
        s"drops: $rows")
    // a DV'd point file WITHOUT a recorded null delta cannot prove zero
    // visible nulls — the whole grouped answer refuses
    val legacy = entry("f4", 5L, "4.5").copy(dv = Some("dv/z"), dvRows = 1L)
    assert(ManifestAgg.answer(manifest(Seq(live, legacy)),
      schema, groupByG).isEmpty)
  }

  test("deletion-vector'd entries answer SUM/COUNT only through the " +
    "recorded masked-row deltas; a legacy DV (no deltas) refuses") {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, Sum}
    def sumAgg = new Aggregation(
      Array(new Sum(Expressions.column("id"), false)), Array.empty)
    def cntAgg = new Aggregation(
      Array(new Count(Expressions.column("id"), false)), Array.empty)
    val plain = DataFileEntry("f1", 10L, stats = Map.empty,
      nullCounts = Map("id" -> 0L), sums = Map("id" -> "100"))
    // 8 physical rows (1 null), 3 masked (1 of them the null): visible
    // non-null = (8-3) - (1-1) = 5, visible sum = 60 - 20 = 40
    val dvd = DataFileEntry("f2", 8L, stats = Map.empty,
      dv = Some("dv/x"), dvRows = 3L,
      nullCounts = Map("id" -> 1L), sums = Map("id" -> "60"),
      dvNulls = Map("id" -> 1L), dvSums = Map("id" -> "20"))
    val m = manifest(Seq(plain, dvd))
    val Some((_, sRows)) = ManifestAgg.answer(m, schema, sumAgg)
    assert(sRows == Seq(Seq(140L)))
    val Some((_, cRows)) = ManifestAgg.answer(m, schema, cntAgg)
    assert(cRows == Seq(Seq(15L)))
    // a legacy DV'd entry carries no deltas: sum AND count refuse
    val legacy = dvd.copy(dvNulls = Map.empty, dvSums = Map.empty)
    assert(ManifestAgg.answer(manifest(Seq(plain, legacy)),
      schema, sumAgg).isEmpty)
    assert(ManifestAgg.answer(manifest(Seq(plain, legacy)),
      schema, cntAgg).isEmpty)
    // count(*) stays exact regardless (visibleRows needs no deltas)
    val Some((_, starRows)) = ManifestAgg.answer(
      manifest(Seq(plain, legacy)), schema,
      new Aggregation(Array(new CountStar()), Array.empty))
    assert(starRows == Seq(Seq(15L)))
  }

  test("min/max LEDGER calculus: saturating boundary-tie subtraction, " +
    "beyond-boundary completeness, unknown masked history, and the " +
    "whole-column-ledger empty case — exact or refuse, never wrong") {
    import org.apache.spark.sql.connector.expressions.aggregate.{Max, Min}
    def minAgg = new Aggregation(
      Array(new Min(Expressions.column("id"))), Array.empty)
    def maxAgg = new Aggregation(
      Array(new Max(Expressions.column("id"))), Array.empty)
    def led(rows: Long, dvRows: Long, bot: Seq[String], dBot: Seq[String],
        top: Seq[String], dTop: Seq[String]): DataFileEntry =
      DataFileEntry("f1", rows,
        stats = Map("id" -> ColStat("long", "1", "9")),
        nullCounts = Map("id" -> 0L, "g" -> 0L), bytes = 1L,
        dv = Some("dv/x"), dvRows = dvRows,
        dvNulls = Map("id" -> 0L, "g" -> 0L),
        bottomK = Map("id" -> bot), topK = Map("id" -> top),
        dvBottom = Map("id" -> dBot), dvTop = Map("id" -> dTop))
    def ans(e: DataFileEntry, a: Aggregation): Option[Any] =
      ManifestAgg.answer(manifest(Seq(e)), schema, a).map(_._2.head.head)
    // file {1,2,2,…}: masking ONE of the tied 2s keeps min = 1; the
    // subtraction saturates by value, never removes two for one
    assert(ans(led(10L, 1L, Seq("1", "2", "2"), Seq("2"),
      Seq("9", "8", "7"), Seq("2")), minAgg) == Some(1L))
    // masking the extreme row repairs to the next survivor (the one
    // masked row's value appears in BOTH prefixes, as recorded)
    assert(ans(led(10L, 1L, Seq("1", "2", "2"), Seq("1"),
      Seq("9", "8", "7"), Seq("1")), minAgg) == Some(2L))
    assert(ans(led(10L, 1L, Seq("1", "2", "2"), Seq("9"),
      Seq("9", "8", "7"), Seq("9")), maxAgg) == Some(8L))
    // ARM 2 completeness: 5 masked rows, only 3 recorded — but the 3rd
    // recorded (6) is already beyond the ledger boundary (2), so every
    // unrecorded one is too: the bottom ledger is untouched, min = 1
    assert(ans(led(20L, 5L, Seq("1", "2", "2"), Seq("4", "5", "6"),
      Seq("9", "9", "9"), Seq("9", "9", "6")), minAgg) == Some(1L))
    // incomplete prefix INSIDE the range refuses: 5 masked, 3 recorded,
    // 3rd recorded (2) not beyond the boundary (2) — the 4th could be a
    // 2 too, the visible multiset is unknowable
    assert(ans(led(20L, 5L, Seq("1", "2", "2"), Seq("1", "2", "2"),
      Seq("9", "9", "9"), Seq("9", "9", "2")), minAgg).isEmpty)
    // unknown masked history (DV'd, prefix entry ABSENT, masked rows
    // hold values) refuses
    val unknown = led(10L, 2L, Seq("1", "2", "2"), Seq.empty,
      Seq("9", "8", "7"), Seq.empty)
      .copy(dvBottom = Map.empty, dvTop = Map.empty)
    assert(ans(unknown, minAgg).isEmpty)
    // …but an absent prefix with ZERO masked non-null rows is complete
    val allNullMasked = unknown.copy(dvNulls = Map("id" -> 2L, "g" -> 2L),
      nullCounts = Map("id" -> 2L, "g" -> 2L))
    assert(ans(allNullMasked, minAgg) == Some(1L))
    // a ledger that held the WHOLE column (3 non-null rows, k ≥ 3) and
    // is fully masked contributes nothing — the other file answers
    val whole = led(3L, 3L, Seq("1", "2", "2"), Seq("1", "2", "2"),
      Seq("2", "2", "1"), Seq("2", "2", "1"))
    val live = DataFileEntry("f2", 5L,
      stats = Map("id" -> ColStat("long", "5", "9")),
      nullCounts = Map("id" -> 0L, "g" -> 0L), bytes = 1L)
    val Some((_, r)) = ManifestAgg.answer(
      manifest(Seq(whole, live)), schema, minAgg)
    assert(r == Seq(Seq(5L)))
    // …and alone it exhausts without the whole-column proof → refuse
    val exhausted = led(10L, 3L, Seq("1", "2", "2"), Seq("1", "2", "2"),
      Seq("9", "8", "7"), Seq("9", "8", "7"))
    assert(ans(exhausted, minAgg).isEmpty)
  }

  test("GROUPED min/max under DVs repair through the ledgers too — the " +
    "per-group file subset reuses the same calculus; a group whose " +
    "file lacks a ledger refuses the whole grouped answer") {
    import org.apache.spark.sql.connector.expressions.aggregate.Min
    val minByG = new Aggregation(
      Array(new Min(Expressions.column("id"))),
      Array(Expressions.column("g")))
    def pointFile(path: String, g: String, rows: Long): DataFileEntry =
      DataFileEntry(path, rows,
        stats = Map("g" -> ColStat("double", g, g),
          "id" -> ColStat("long", "1", "9")),
        nullCounts = Map("g" -> 0L, "id" -> 0L), bytes = 1L)
    val live = pointFile("f1", "1.5", 10L)
    // group 2.5's file is DV'd with a ledger: min repairs 1 → 2
    val dvd = pointFile("f2", "2.5", 10L).copy(
      dv = Some("dv/x"), dvRows = 1L,
      dvNulls = Map("g" -> 0L, "id" -> 0L),
      bottomK = Map("id" -> Seq("1", "2", "2"),
        "g" -> Seq("2.5", "2.5", "2.5")),
      topK = Map("id" -> Seq("9", "8", "7"),
        "g" -> Seq("2.5", "2.5", "2.5")),
      dvBottom = Map("id" -> Seq("1"), "g" -> Seq("2.5")),
      dvTop = Map("id" -> Seq("1"), "g" -> Seq("2.5")))
    val Some((_, rows)) = ManifestAgg.answer(
      manifest(Seq(live, dvd)), schema, minByG)
    assert(rows.map(r => (r.head, r(1))).toSet ==
      Set((1.5, 1L), (2.5, 2L)),
      s"the DV'd group must answer its ledger-repaired min: $rows")
    // the same entry WITHOUT a ledger refuses the grouped answer
    val bare = dvd.copy(bottomK = Map.empty, topK = Map.empty,
      dvBottom = Map.empty, dvTop = Map.empty)
    assert(ManifestAgg.answer(manifest(Seq(live, bare)),
      schema, minByG).isEmpty)
  }

  test("the point-column probe walks the manifest ONLY for columns the " +
    "received filters reference — planning cost is O(referenced), not " +
    "O(schema width)") {
    import org.apache.spark.sql.sources.{EqualTo, IsNotNull}
    // a wide schema where an all-columns probe would be visible
    val wide = StructType((0 until 24).map(i =>
      StructField(s"c$i", LongType)) :+ StructField("g", DoubleType))
    val files = Seq(DataFileEntry("f1", 10L,
      stats = Map("g" -> ColStat("double", "1.5", "1.5"),
        "c0" -> ColStat("long", "1", "9")),
      nullCounts = Map("g" -> 0L, "c0" -> 0L), bytes = 1L))
    val m = TableManifest(0L, wide.json, Seq("c0"), Seq("c0"), files, Map.empty)
    val sb = new GraftScanBuilder("probe-bound", m, wide)
    sb.pushFilters(Array(EqualTo("g", 1.5), IsNotNull("g")))
    assert(sb.probedPointCols == Set("g"),
      s"probe must stay on referenced columns, walked ${sb.probedPointCols}")
    // a second filter set extends the memo by exactly its new reference
    sb.pushFilters(Array(EqualTo("c0", 5L)))
    assert(sb.probedPointCols == Set("g", "c0"))
  }
}
