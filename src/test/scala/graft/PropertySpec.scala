package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, RuleBasedTrailClassifier, WeatherModel}

/** ScalaCheck properties (SURVEY §5 engine test plan): the invariants that
  * must hold for ANY input, not just fixtures — label sets invariant under
  * row order, dedup idempotent, jaccard bounded.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sample a generator N times (scalatest+scalacheck bridge is not in the
    * offline cache; direct sampling gives the same coverage with seeds
    * drawn per run).
    */
  private def forAllSampled[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit = {
    var executed = 0
    (0 until n).foreach { _ =>
      // Gen.sample can return None; retry a few times so a filtered
      // generator cannot silently turn the property into a no-op
      val sample = Iterator.continually(gen.sample).take(10).flatten.nextOption()
      sample.foreach { a => body(a); executed += 1 }
    }
    assert(executed > 0, "property body never executed — generator produced no samples")
  }

  private val anchor = WeatherModel.Anchor

  private val rowGen = for {
    city <- Gen.choose(0L, 4L)
    offH <- Gen.choose(-72, 72)
    temp <- Gen.choose(-20.0, 45.0)
    rain <- Gen.choose(0.0, 12.0)
    src <- Gen.oneOf(WeatherModel.Historical, WeatherModel.Forecast)
  } yield (city, offH, temp, rain, src)

  private def toWeather(rows: List[(Long, Int, Double, Double, String)]) =
    rows.toDF("city_id", "off_h", "temperature_deg_c", "rain_fall_total_mm", "data_source")
      .withColumn(
        "timestamp_utc",
        expr(s"TIMESTAMP '$anchor' + make_interval(0, 0, 0, 0, off_h, 0, 0)"))
      .drop("off_h")

  test("classifier output is invariant under input row permutation") {
    forAllSampled(Gen.listOfN(30, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val a = RuleBasedTrailClassifier.classify(toWeather(rows), anchor)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        val b = RuleBasedTrailClassifier.classify(
          toWeather(scala.util.Random.shuffle(rows)), anchor)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        assert(a == b)
      }
    }
  }

  test("classifier is deterministic: duplicate input rows double aggregates but labels stay a function of the data") {
    forAllSampled(Gen.listOfN(20, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val once = RuleBasedTrailClassifier.classify(toWeather(rows), anchor).collect()
        val again = RuleBasedTrailClassifier.classify(toWeather(rows), anchor).collect()
        assert(once.sortBy(_.getLong(0)).sameElements(again.sortBy(_.getLong(0))))
      }
    }
  }

  test("dropDuplicates is idempotent (A8)") {
    forAllSampled(Gen.listOfN(50, Gen.choose(0L, 9L))) { ids =>
      if (ids.nonEmpty) {
        val df = ids.toDF("id")
        val once = df.dropDuplicates("id")
        val twice = once.dropDuplicates("id")
        assert(once.count() == twice.count())
        assert(once.count() == ids.distinct.size)
      }
    }
  }

  test("labels only come from the known vocabulary") {
    val known = Set(
      "TRAIL_MUD_WARNING", "TRAIL_DRY_EXCELLENT", "HEAT_ADVISORY",
      "SNOWPACK_ICY_CONDITIONS", "SNOWPACK_HEAVY_WET",
      "HEAVY_SNOW_WARNING", "TRAIL_CLOSED_HEAVY_RAIN")
    forAllSampled(Gen.listOfN(30, rowGen)) { rows =>
      if (rows.nonEmpty) {
        RuleBasedTrailClassifier.classify(toWeather(rows), anchor)
          .collect().foreach { r =>
            val labels = r.getString(1).split(",").filter(_.nonEmpty)
            assert(labels.forall(known.contains), labels.mkString(","))
            // rule order is fixed → labels appear in rule order, no dups
            assert(labels.distinct.sameElements(labels))
          }
      }
    }
  }

  test("TopKAggregator: merge is order/partition invariant and matches a plain sort") {
    val g = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (g.nextInt(50).toDouble, i.toLong))
    val expected = rows.sortBy { case (sc, id) => (-sc, id) }.take(5)
    val agg = new graft.functions.TopKAggregator(5)
    // single-pass reduce
    val direct = rows.foldLeft(agg.zero)(agg.reduce)
    assert(direct == expected)
    // arbitrary partition splits + merges must give the identical buffer
    Seq(1, 3, 7, 50).foreach { parts =>
      val partials = rows.grouped(math.max(rows.size / parts, 1))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      assert(merged == expected, s"parts=$parts")
    }
    // and the Spark query equals the ranked-window oracle shape
    val viaAgg = graft.ops.RelationalOps
      .topOrdersAggregator(spark, "/root/testdata/sf0.001").collect().toSeq
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "orders")
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rank").collect().toSeq
    }
    assert(viaAgg == viaWindow)
  }

  test("minhash affine family stays within the prime field") {
    forAllSampled(Gen.choose(0L, Long.MaxValue / 2), n = 20) { h =>
      (0 until DedupOps.MinhashK).foreach { j =>
        val sig = (DedupOps.minhashA(j) * (h % DedupOps.MinhashP) +
          DedupOps.minhashB(j)) % DedupOps.MinhashP
        assert(sig >= 0 && sig < DedupOps.MinhashP)
      }
    }
  }

  test("range join: primitive (long) and boxed (double) paths agree on any input") {
    // the same random point/interval sets joined once with integral types
    // (primitive long[] probe path) and once cast to double (interpreted
    // Ordering path) must produce identical pair sets — both also equal a
    // driver-side nested-loop reference
    val caseGen = for {
      nPts <- Gen.choose(1, 120)
      nIvs <- Gen.choose(1, 60)
      pts <- Gen.listOfN(nPts, Gen.choose(-50L, 50L))
      los <- Gen.listOfN(nIvs, Gen.choose(-60L, 40L))
      widths <- Gen.listOfN(nIvs, Gen.choose(0L, 30L))
    } yield (pts, los.zip(widths))
    forAllSampled(caseGen, n = 5) { case (ps, ivsRaw) =>
      val pts = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("id", "p")
      val ivs = ivsRaw.zipWithIndex.map { case ((lo, w), i) => (i.toLong, lo, lo + w) }
        .toDF("w", "lo", "hi")
      def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        df.select("id", "w").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val prim = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi")
      assert(prim.queryExecution.executedPlan.toString.contains("RangeJoin"))
      val boxed = pts.select($"id", $"p".cast("double").as("p"))
        .join(
          ivs.select($"w", $"lo".cast("double").as("lo"), $"hi".cast("double").as("hi")),
          $"p" >= $"lo" && $"p" < $"hi")
      val reference = (for {
        (id, p) <- ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        ((lo, w), wi) <- ivsRaw.zipWithIndex
        if p >= lo && p < lo + w
      } yield (id, wi.toLong)).sorted
      assert(pairs(prim) == reference)
      assert(pairs(boxed) == reference)
    }
  }

  test("packed-vote simhash equals a naive driver-side recount at every width") {
    // pins the 20-bit-field / 3-per-long packing math (DedupOps
    // packedVoteAggs): for random corpora and widths including the
    // non-multiple-of-3 ones, the packed aggregate must reproduce the
    // naive majority vote bit-for-bit
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val wordGen = Gen.oneOf("ridge", "creek", "mud", "snow", "dry", "wash", "rock")
    val docGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    forAllSampled(Gen.zip(Gen.listOfN(8, docGen), Gen.oneOf(7, 32, 60)), n = 3) {
      case (texts, bits) =>
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, "src", t) }
          .toDF("doc_id", "source", "text")
        val got = graft.ops.DedupOps.simhashesOfDocs(docs, bits)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        texts.zipWithIndex.foreach { case (t, i) =>
          val toks = t.split(" ")
          val shingles =
            (if (toks.length < 2) Seq(toks.head)
             else toks.sliding(2).map(_.mkString(" ")).toSeq).distinct
          val hs = shingles.map(hash60)
          val fp = (0 until bits).map { b =>
            val ones = hs.count(h => ((h >> b) & 1L) == 1L)
            if (2 * ones > hs.size) 1L << b else 0L
          }.sum
          val nSet = java.lang.Long.bitCount(fp).toLong
          assert(got(i.toLong) == (fp, nSet), s"doc $i bits=$bits")
        }
    }
  }

  test("chunking equals a naive sliding window for any doc/window/stride") {
    val wordGen = Gen.oneOf("a", "bb", "ccc", "dd", "e")
    val docGen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val caseGen = Gen.zip(
      Gen.listOfN(6, docGen), Gen.choose(1, 12), Gen.choose(1, 12))
    forAllSampled(caseGen, n = 5) { case (texts, window, stride) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ops.CorpusOps.chunkDocs(docs, window, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val expected = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.split(" ", -1)
        val c = math.max(math.ceil((toks.length - window).toDouble / stride).toLong + 1, 1L)
        (1L to c).map { cid =>
          val start = ((cid - 1) * stride).toInt
          val chunk = toks.slice(start, start + window)
          (i.toLong, cid, chunk.length.toLong, chunk.mkString(" "))
        }
      }
      assert(got.sorted.toSeq == expected.sorted.toSeq,
        s"window=$window stride=$stride")
    }
  }

  test("apportion: quotas are budget-exact for any positive weights") {
    val mixGen = for {
      n <- Gen.choose(1, 8)
      ws <- Gen.listOfN(n, Gen.choose(1e-3, 10.0))
      budget <- Gen.choose(0, 1000)
    } yield (ws.zipWithIndex.map { case (w, i) => (s"s$i", w) }, budget)
    forAllSampled(mixGen, n = 20) { case (mixture, budget) =>
      val quota = graft.ops.CorpusOps.apportion(mixture, budget)
      assert(quota.map(_._2).sum == budget, s"$mixture budget=$budget → $quota")
      // each quota is the floor or ceiling of its normalized exact share
      val total = mixture.map(_._2).sum
      quota.zip(mixture).foreach { case ((src, k), (_, w)) =>
        val exact = budget * w / total
        assert(k == math.floor(exact).toLong || k == math.ceil(exact).toLong,
          s"$src k=$k exact=$exact")
      }
      // deterministic: same spec → same quotas
      assert(quota == graft.ops.CorpusOps.apportion(mixture, budget))
    }
    // the motivating case: three equal shares of 20 sum to 20, not 21
    val thirds = graft.ops.CorpusOps.apportion(
      Seq("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3), 20)
    assert(thirds.map(_._2).sum == 20 && thirds.map(_._2).toSet == Set(7L, 6L), thirds)
    // DefaultMixture over 20 is unchanged by the apportionment swap
    assert(graft.ops.CorpusOps.apportion(graft.ops.CorpusOps.DefaultMixture, 20) ==
      Seq("src0" -> 8L, "src1" -> 6L, "src2" -> 4L, "src3" -> 2L))
  }

  test("mixtureTemperature: sum(quota) == budget for adversarial source counts") {
    // Floor must see the UNROUNDED exact quota: a 9dp pre-round turns
    // k-5e-10 into k, sum(floor) overshoots, n_left goes negative and the
    // quotas underfill the budget. Drive distributions that make exact
    // quotas land arbitrarily close to integers (equal counts, near-integer
    // splits, single source, long tails).
    val cases = Seq(
      Seq(3, 3, 3)            -> 999,   // equal thirds of a divisible budget
      Seq(1, 1, 1)            -> 1000,  // equal thirds, non-divisible
      Seq(7)                  -> 123,   // single source: quota == budget exactly
      Seq(100, 1)             -> 10,    // extreme head/tail under alpha
      Seq(2, 2, 2, 2, 2, 2)   -> 6,     // quota exactly 1 per source
      Seq(5, 5, 5, 5)         -> 2,     // budget below source count
      Seq(9, 3, 1, 1, 1, 1, 1, 1) -> 97)
    cases.foreach { case (counts, budget) =>
      val rows = counts.zipWithIndex.flatMap { case (n, i) =>
        (0 until n).map(j => (i.toLong * 1000 + j, "w " * 3, "en", s"s$i", 5L))
      }
      val d = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = graft.ops.CorpusOps.mixtureTemperatureOf(spark, d, budget, 0.5)
        .collect().map(r => (r.getString(0), r.getLong(3)))
      assert(out.map(_._2).sum == budget,
        s"counts=$counts budget=$budget → ${out.mkString(",")}")
      assert(out.forall(_._2 >= 0), out.mkString(","))
    }
  }

  test("GraftInstants: integer strings round-trip exactly; ISO instants " +
    "parse to their epoch millis; sub-millisecond rounding is monotone " +
    "and conservative (ceil >= floor, both within 1ms of micros/1000)") {
    import graft.ops.GraftInstants
    forAllSampled(Gen.choose(-4102444800000L, 4102444800000L), 40) { ms =>
      assert(GraftInstants.parseMillis(ms.toString, "t", ceil = true) == ms)
      assert(GraftInstants.parseMillis(s"  $ms ", "t", ceil = false) == ms)
    }
    forAllSampled(Gen.choose(0L, 4102444800000L), 40) { ms =>
      val iso = java.time.Instant.ofEpochMilli(ms).toString
      assert(GraftInstants.parseMillis(iso, "t", ceil = true) == ms)
      assert(GraftInstants.parseMillis(iso, "t", ceil = false) == ms)
    }
    forAllSampled(Gen.choose(Long.MinValue / 2000, Long.MaxValue / 2000), 60) { micros =>
      val lo = GraftInstants.microsToMillis(micros, ceil = false)
      val hi = GraftInstants.microsToMillis(micros, ceil = true)
      assert(lo <= hi && hi - lo <= 1,
        s"rounding must differ by at most the sub-ms digit: $micros")
      assert(lo * 1000 <= micros && micros <= hi * 1000,
        s"the true instant must sit inside [floor, ceil]: $micros")
      if (micros % 1000 == 0) assert(lo == hi, s"exact millis never split")
    }
  }

  test("maintenance parser: arbitrary non-maintenance SQL is NEVER " +
    "intercepted, and random whitespace/case variants of the two " +
    "statements always are") {
    import graft.ops.GraftMaintenanceSql
    val sqlGen = Gen.oneOf(
      "SELECT 1", "SELECT * FROM t WHERE optimize = 1",
      "select vacuum from optimize_results",
      "CREATE TABLE optimize (vacuum INT)",
      "-- OPTIMIZE graft.`/x`\nSELECT 2",
      "WITH vacuum AS (SELECT 1 AS optimize) SELECT * FROM vacuum",
      "INSERT INTO t VALUES ('OPTIMIZE graft.`/x`')",
      "OPTIMIZE delta.`/x`", "VACUUM '/x'", "OPTIMIZE t1", "VACUUM t2",
      "MERGE INTO graft.`/x` t USING s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET *")
    forAllSampled(sqlGen, 24) { sql =>
      assert(GraftMaintenanceSql.parse(sql).isEmpty,
        s"must delegate verbatim: $sql")
    }
    val wsGen = for {
      kw <- Gen.oneOf("OPTIMIZE", "optimize", "Optimize", "oPtImIzE")
      pad <- Gen.oneOf(" ", "  ", "\t", "\n ")
      semi <- Gen.oneOf("", ";", " ;")
    } yield s"$pad$kw${pad}graft.`/some/path`$semi"
    forAllSampled(wsGen, 16) { sql =>
      val parsed = GraftMaintenanceSql.parse(sql)
      assert(parsed.exists(_.isInstanceOf[graft.ops.GraftOptimizeCommand]),
        s"must intercept: <$sql>")
      assert(parsed.get.asInstanceOf[graft.ops.GraftOptimizeCommand]
        .path == "/some/path")
    }
    val vacGen = for {
      kw <- Gen.oneOf("VACUUM", "vacuum", "Vacuum")
      retain <- Gen.option(Gen.choose(1, 9))
      dry <- Gen.oneOf("", " DRY RUN", " dry  run")
    } yield (retain, dry,
      s"$kw graft.`/p`${retain.map(n => s" RETAIN $n VERSIONS").getOrElse("")}$dry")
    forAllSampled(vacGen, 16) { case (retain, dry, sql) =>
      val cmd = GraftMaintenanceSql.parse(sql)
        .get.asInstanceOf[graft.ops.GraftVacuumCommand]
      assert(cmd.retainVersions == retain, s"<$sql>")
      assert(cmd.dryRun == dry.trim.nonEmpty, s"<$sql>")
    }
  }
}
