package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multidimensional data layout: Morton (Z-order) clustering for
  * data-skipping scans.
  *
  * Why this exists at 100 TB: parquet readers prune ROW GROUPS from the
  * min/max statistics in each file footer. A table laid out by insertion
  * order (or sorted on a single column) has every file spanning the full
  * range of every OTHER column, so a predicate on (x, y) prunes nothing.
  * Interleaving the bits of x and y into one z-value and range-partitioning
  * + sorting on it gives every file a tight bounding BOX in (x, y) space —
  * a predicate on either or both dimensions skips most files' row groups
  * entirely. This is the layout trick behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`, expressed here with nothing but public Spark API:
  * the z-value is pure integer Column arithmetic (codegen'd, no UDF), and
  * `repartitionByRange` SAMPLES the z key, so file boundaries stay balanced
  * at any scale without a driver-side histogram.
  *
  * LayoutSpec measures the effect directly: per-file bounding-box areas of
  * a z-ordered write vs a single-column-sorted write of the same rows.
  */
object Layout {

  /** Bits taken from each dimension; 16+16 → z fits comfortably in a long. */
  val ZBits = 16

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * integral columns — x on even bit positions, y on odd. A sum of
    * shift/mask terms, so whole-stage codegen sees plain long arithmetic.
    */
  def zvalue(x: Column, y: Column, bits: Int = ZBits): Column =
    zvalueN(Seq(x, y), bits)

  /** N-ary Morton interleave (2–4 dimensions): bit `i` of column `j`
    * lands at position `i·n + j` — the round-robin generalization of the
    * two-column form (to which it is bit-identical at n = 2: positions
    * 2i and 2i+1). Disjoint bit positions make the sum exact in a long
    * regardless of term order. Callers cap `bits` so `bits·n ≤ 62`
    * ([[zBitsFor]]). */
  def zvalueN(cols: Seq[Column], bits: Int = ZBits): Column = {
    val n = cols.size
    require(n >= 2 && n <= 4, s"z-order interleaves 2–4 columns, got $n")
    require(bits * n <= 62, s"$bits bits × $n columns overflows a long")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
      }
    }.reduce(_ + _)
  }

  /** Per-dimension bit budget for an n-column interleave. */
  def zBitsFor(n: Int): Int = math.min(ZBits, 62 / n)

  /** Can this column type feed the interleave (via [[monotoneLong]])? */
  def zorderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType |
           TimestampType | DateType | StringType => true
      case _ => false
    }
  }

  /** Map one column to a LONG whose ordering matches the column's — the
    * domain normalization in front of the interleave. Timestamps map to
    * epoch micros and dates to epoch days (exactly monotone); strings to
    * a 7-character base-256 prefix code ([[stringPrefixLong]]). */
  def monotoneLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
      case TimestampType => unix_micros(c)
      case DateType => unix_date(c).cast(LongType)
      case StringType => stringPrefixLong(c)
      case other => throw new IllegalArgumentException(
        s"z-order supports integral, timestamp, date, and string columns; " +
          s"got $other")
    }
  }

  /** First 7 characters folded base-256 (code points capped at 255): an
    * order-preserving 56-bit prefix code for ASCII strings, approximately
    * order-preserving beyond. LAYOUT ONLY — pruning reads the rewritten
    * files' real column statistics, so a non-monotone corner (multi-byte
    * code points capping at 255) costs clustering tightness, never
    * correctness. */
  def stringPrefixLong(c: Column): Column =
    (1 to 7).map(i =>
      least(coalesce(ascii(substring(c, i, 1)), lit(0)), lit(255))
        .cast("long") * lit(1L << ((7 - i) * 8))
    ).reduce(_ + _)

  /** EXACT global rank of a column's distinct values, scale-safe: range-
    * repartition the distinct set, pin it (so the sampled range
    * boundaries, the per-partition counts, and the local ranks all see
    * the same partitioning), rank locally per partition, and add driver-
    * prefix-summed partition offsets — one count row per partition
    * collected, never a value (the TeraSort prefix shape the token-
    * budget selector uses; a global single-partition window would be the
    * scale bug). Returns (`__dict_value`, `__dict_rank` ∈ [0, n)) and
    * the total distinct count. Caller must unpersist the returned
    * frame's checkpoint via the Bridge after the consuming job. */
  def rankDictionary(distinct: DataFrame, c: String): (DataFrame, Long) = {
    val parts = 32
    val pinned = distinct
      .repartitionByRange(parts, col(c).asc)
      .withColumn("__dict_pid", spark_partition_id())
      .localCheckpoint() // pid must be materialized BEFORE the window's
    // hash-by-pid shuffle, or it would re-evaluate post-shuffle
    val counts = pinned.groupBy(col("__dict_pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1) // ≤ parts rows
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = (pid, acc); acc += n; o }
    val offCol = offsets.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__dict_pid") === pid, lit(off)).otherwise(e) }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__dict_pid").orderBy(col(c).asc)
    val dict = pinned
      .withColumn("__dict_rank", row_number().over(w) - 1 + offCol)
      .select(col(c).as("__dict_value"), col("__dict_rank"))
    (dict, acc)
  }

  /** Scale a monotone long onto [0, 2^bits − 1]: rank-preserving min/max
    * normalization so the interleave sees each dimension's FULL bit
    * budget. Without it, a domain wider than `bits` bits (epoch micros,
    * hashes) would contribute only its LOW — effectively random — bits
    * and the layout would degenerate to a shuffle. Double arithmetic is
    * monotone non-decreasing here (division by a positive constant);
    * ties introduced by rounding only coarsen the grid. The result is
    * CLAMPED to the budget: for domains wider than 2^53 the double
    * division can round a hair above 1.0, and an unclamped floor would
    * yield 2^bits — whose low `bits` bits are 0, wrapping the extreme
    * rows to z≈0 instead of the top cell. */
  def scaleToBits(c: Column, mn: Long, mx: Long, bits: Int): Column =
    if (mx <= mn) lit(0L)
    else {
      val hi = (1L << bits) - 1
      val span = mx.toDouble - mn.toDouble
      least(
        floor((c.cast("double") - lit(mn.toDouble)) / lit(span) * lit(hi.toDouble))
          .cast("long"),
        lit(hi))
    }

  /** For each partition index i in [0, n), a long x_i whose Spark HASH
    * PARTITION is exactly i — found by probing Spark's OWN partition-id
    * arithmetic (`Pmod(Murmur3Hash(x, seed=42), n)`, the
    * `HashPartitioning.partitionIdExpression` contract), so
    * `df.repartition(n, col_carrying(x_i))` lands x_i's rows in
    * partition i and nowhere else. This turns the sampling-free hash
    * exchange into an EXACT router: callers compute a target partition
    * per row, join the preimage for it, and repartition on the preimage
    * — fully declarative, whole-stage-codegen'd, no RDD partitioner.
    * Expected n·(ln n) driver-side Catalyst literal evals (microseconds
    * each); the probe uses the same expression class the exchange
    * evaluates at runtime, so the two cannot drift. */
  def hashPreimages(n: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    require(n >= 1, s"need at least one partition, got $n")
    val out = new Array[Long](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var x = 0L
    // coupon-collector expectation is n·ln n probes; the bound is ~1000×
    // that — unreachable for a well-distributed hash, and a LOUD stop
    // instead of an infinite driver loop if the hash ever degenerates
    val maxProbes = 4096L * n + (1L << 20)
    while (remaining > 0) {
      require(x < maxProbes,
        s"hash preimage search for $n partitions did not converge in " +
          s"$maxProbes probes — the partition hash is degenerate")
      val h = Murmur3Hash(Seq(Literal(x)), 42).eval(null).asInstanceOf[Int]
      val i = java.lang.Math.floorMod(h, n)
      if (!found(i)) { found(i) = true; out(i) = x; remaining -= 1 }
      x += 1
    }
    out
  }

  /** DuckDB mirror of [[zvalue]] — same fold, element-exact. */
  def zvalueSql(x: String, y: String, bits: Int = ZBits): String =
    s"""list_sum(list_transform(range(0, $bits),
       |  i -> (($x >> i) & 1) * (1::BIGINT << (2*i))
       |     + (($y >> i) & 1) * (1::BIGINT << (2*i + 1))))::BIGINT""".stripMargin

  /** Write `df` clustered by the z-value of (x, y) into `numFiles` range
    * partitions, each internally z-sorted — the layout a 100 TB table
    * maintenance job would produce. The helper column never reaches disk.
    */
  def zorderWrite(
      df: DataFrame, x: String, y: String,
      path: String, numFiles: Int): Unit =
    df.withColumn("_z", zvalue(col(x), col(y)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Oracled z-order query: bucket lineitem by the high bits of
    * zvalue(l_partkey, l_suppkey) and report each bucket's row count and
    * (part, supp) bounding box — the per-bucket boxes the layout would
    * hand the row-group pruner. Hash-matching this against DuckDB pins the
    * full interleave arithmetic for every row. One shuffle (the bucket
    * aggregate); the z-value itself is map-side codegen'd long math.
    */
  val BucketShift = 16

  def zorderStats(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.Tables.read(s, dir, "lineitem")
      .withColumn("zkey", zvalue(col("l_partkey"), col("l_suppkey")))
      .groupBy(shiftright(col("zkey"), BucketShift).as("z_bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
      .orderBy("z_bucket")

  val zorderStatsSql: String =
    s"""SELECT (zkey >> $BucketShift) AS z_bucket, count(*) AS n_rows,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM (SELECT l_partkey, l_suppkey,
       |        ${zvalueSql("l_partkey", "l_suppkey")} AS zkey
       |      FROM lineitem)
       |GROUP BY z_bucket ORDER BY z_bucket""".stripMargin

  /** Per-file bounding boxes of (x, y) for a written table — exactly what
    * the parquet footer min/max stats expose to the reader's row-group
    * pruner, computed here as a scan-side aggregate for assertion.
    */
  def fileBoxes(df: DataFrame, x: String, y: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(x)).as("min_x"), max(col(x)).as("max_x"),
        min(col(y)).as("min_y"), max(col(y)).as("max_y"))
      .withColumn("box_area",
        (col("max_x") - col("min_x") + 1) * (col("max_y") - col("min_y") + 1))
}
