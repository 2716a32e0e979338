package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusOps, SimilarityOps, TimeSeriesOps}
import graft.sources.Tables

/** Invariants for the time-series and corpus operator families on sf0.001. */
class TimeSeriesCorpusSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("as-of join: one row per signup, -1 sentinel only when no prior click exists") {
    val out = TimeSeriesOps.asofJoin(spark, dir)
    val nSignups = Tables.read(spark, dir, "events")
      .where(col("event_type") === "signup").count()
    assert(out.count() == nSignups)
    // a user whose first event is a signup must get the sentinel
    val firstEvents = Tables.read(spark, dir, "events")
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)"))
      .where(col("rn") === 1 && col("event_type") === "signup")
      .select(col("event_id"))
    val sentinels = out.join(firstEvents, "event_id")
    assert(sentinels.where(col("last_click_value") =!= -1.0).count() == 0)
  }

  test("sessionize: session counts bounded by event counts, all users present") {
    val out = TimeSeriesOps.sessionize(spark, dir)
    assert(out.count() == 15)
    val joined = out.join(
      Tables.read(spark, dir, "events").groupBy("user_id").count(), "user_id")
    assert(joined.where(col("n_sessions") > col("count")).count() == 0)
    assert(joined.where(col("longest_session_events") > col("count")).count() == 0)
  }

  test("pivot: row sums equal per-user event counts") {
    val out = TimeSeriesOps.pivotActivity(spark, dir)
      .withColumn("total",
        col("click") + col("view") + col("purchase") + col("signup") + col("error"))
    val joined = out.join(
      Tables.read(spark, dir, "events").groupBy("user_id").count(), "user_id")
    assert(joined.where(col("total") =!= col("count")).count() == 0)
  }

  test("percentiles: p50 <= p90 <= p99 per type") {
    CorpusOps.valuePercentiles(spark, dir).collect().foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("approx percentiles stay within the size-scaled error bound") {
    // the oracle hash-checks within_bound = true at sf0.01; this spec pins
    // the same guarantee at both SFs (bound = max(1%, 1000/n %) — the
    // definition gap between interpolating-exact and value-returning-sketch
    // shrinks as 1/n)
    Seq(dir, "/root/testdata/sf0.01").foreach { d =>
      val out = CorpusOps.approxPercentiles(spark, d).collect()
      assert(out.nonEmpty)
      assert(out.forall(_.getBoolean(2)), s"$d: a group exceeded the sketch bound")
    }
  }

  test("weighted sample: deterministic, biased toward heavy docs, group-limited plan") {
    val out = CorpusOps.weightedSample(spark, dir).collect()
    val again = CorpusOps.weightedSample(spark, dir).collect()
    assert(out.sameElements(again)) // replay-stable
    assert(out.length == 25) // 5 langs x k=5
    // weight = n_chars: the sampled mean length must exceed the corpus
    // mean (E-S bias E[w^2]/E[w] > E[w]); deterministic, so not flaky
    val docs = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampledMean = out.map(r => docs(r.getLong(2)).toDouble).sum / out.length
    val corpusMean = docs.values.map(_.toDouble).sum / docs.size
    assert(sampledMean > corpusMean,
      s"sampled mean $sampledMean <= corpus mean $corpusMean")
    // scale shape: per-group top-k must be group-limited before the shuffle
    val p = CorpusOps.weightedSample(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("mixture sample: per-source counts hit the quota, deterministic, group-limited plan") {
    val df = CorpusOps.mixtureSample(spark, dir) // 0.4/0.3/0.2/0.1 over budget 20
    val out = df.collect()
    val again = CorpusOps.mixtureSample(spark, dir).collect()
    assert(out.sameElements(again)) // replay-stable
    // each source contributes exactly round(budget*fraction) (25 available >= quota)
    val bySource = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySource == Map("src0" -> 8, "src1" -> 6, "src2" -> 4, "src3" -> 2), bySource)
    // sources outside the mixture spec are excluded
    assert(out.forall(r => Set("src0", "src1", "src2", "src3")(r.getString(0))))
    // ranks are 1..target_k per source — the quota is the ES-ranked prefix
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
    }
    // scale shape: the constant max-quota bound must group-limit the window
    // BEFORE the shuffle, and the quota spec joins as a broadcast
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("token budget select: equals the naive global-window prefix, parallel plan") {
    val budget = 18000L
    val df = CorpusOps.tokenBudgetSelect(spark, dir, budget)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // independent driver-side greedy: sort all docs by (score desc, doc_id),
    // cumulative-sum tokens, keep the maximal prefix within budget
    val stats = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "text").collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        (r.getLong(0), toks.length.toLong,
          toks.distinct.length.toDouble / toks.length)
      }
    val ordered = stats.sortBy { case (id, _, score) => (-score, id) }
    var acc = 0L
    val expect = ordered.map { case (id, n, _) => acc += n; (id, n, acc) }
      .takeWhile(_._3 <= budget)
    assert(out.sortBy(_._3).toSeq == expect.toSeq)
    assert(out.map(_._3).max <= budget)
    // maximality: the next doc in order would blow the budget
    if (expect.length < ordered.length)
      assert(expect.last._3 + ordered(expect.length)._2 > budget)
    // scale shape: the running sum must NOT be a single-partition window —
    // range partitions + broadcast offsets keep every stage parallel
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("mixture temperature: budget-exact quotas, flattens the head, matches apportion") {
    val budget = 1000
    val out = CorpusOps.mixtureTemperature(spark, dir, budget).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._4).sum == budget, out.mkString(","))
    // equals driver-side apportion over share^alpha weights
    val n = out.map(_._2).sum.toDouble
    val weights = out.map { case (src, c, _, _) =>
      src -> BigDecimal(math.pow(c / n, 0.5))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble }
    val expect = CorpusOps.apportion(weights.toSeq, budget).toMap
    out.foreach { case (src, _, _, q) => assert(q == expect(src), s"$src: $q vs ${expect(src)}") }
    // temperature < 1 upsamples the tail relative to proportional share
    val byCount = out.sortBy(_._2)
    val (tail, head) = (byCount.head, byCount.last)
    if (tail._2 < head._2)
      assert(tail._4.toDouble / tail._2 > head._4.toDouble / head._2,
        s"tail $tail not upsampled vs head $head")
  }

  test("sequence packing: covers the corpus, budget contract holds per pack") {
    val budget = 512
    val out = CorpusOps.packSequences(spark, dir, budget).collect()
    // every document lands in exactly one pack
    val total = out.map(_.getLong(2)).sum
    assert(total == 500, s"packed $total docs")
    // streaming-pack contract: every non-final pack reaches the budget
    // only via its LAST doc (pack_tokens - last doc's tokens < budget), and
    // packs never start beyond it: preceding-cum < budget * (pack_id + 1)
    out.groupBy(_.getString(0)).foreach { case (_, packs) =>
      val sorted = packs.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (p, i) =>
        assert(p.getLong(1) == i, s"pack ids not dense: $p")
      }
      // all but the last pack hold at least one doc that crossed the line
      sorted.init.foreach { p =>
        assert(p.getLong(3) > 0 && p.getLong(2) > 0)
      }
    }
    // deterministic
    val again = CorpusOps.packSequences(spark, dir, budget).collect()
    assert(out.sameElements(again))
  }

  test("stratified sample: deterministic and a strict subset") {
    val a = CorpusOps.stratifiedSample(spark, dir).collect()
    val b = CorpusOps.stratifiedSample(spark, dir).collect()
    assert(a.sameElements(b))
    assert(a.length > 0 && a.length < 500)
  }

  test("vocab: doc_freq <= coll_freq and doc_freq <= corpus size") {
    CorpusOps.vocabTopK(spark, dir).collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getLong(1) <= 500)
    }
  }

  test("tf-idf: top terms match a driver-side recompute on a sample of docs") {
    val out = CorpusOps.tfIdfTopTerms(spark, dir).cache()
    assert(out.count() == 1500) // 500 docs x top-3
    // WindowGroupLimit must prune below the rank shuffle
    val plan = CorpusOps.tfIdfTopTerms(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    val texts = Tables.read(spark, dir, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val nDocs = texts.length.toDouble
    val dfMap = texts.flatMap { case (_, t) => t.split(" ", -1).distinct }
      .groupBy(identity).map { case (k, v) => k -> v.length }
    val got = out.where(col("doc_id") < 10).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> (r.getString(1), r.getDouble(2))).toMap
    texts.filter(_._1 < 10).foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val top = toks.groupBy(identity).map { case (w, g) =>
        w -> g.size.toDouble / toks.size * math.log(nDocs / dfMap(w))
      }.toSeq.sortBy { case (w, s) => (-s, w) }.take(3)
      top.zipWithIndex.foreach { case ((w, s), i) =>
        val (gw, gs) = got((id, i + 1L))
        assert(gw == w && math.abs(gs - s) < 1e-3,
          s"doc $id rank ${i + 1}: got ($gw,$gs), expected ($w,$s)")
      }
    }
    out.unpersist()
  }

  test("kmeans: members total the corpus, cosine within [-1,1]") {
    val out = SimilarityOps.kmeans(spark, dir).collect()
    assert(out.map(_.getLong(1)).sum == 500)
    out.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
  }

  test("semDedup: one row per vector, keep ⟺ no earlier cluster member within τ") {
    val out = SimilarityOps.semDedup(spark, dir).collect()
    assert(out.length == 500)
    // keep must agree with the reported max_prior_cos under the threshold
    out.foreach { r =>
      val maxPrior = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val keep = r.getBoolean(3)
      assert(keep == maxPrior.forall(_ < SimilarityOps.EmbDupThreshold),
        s"vec ${r.getLong(0)}: keep=$keep but max_prior_cos=$maxPrior")
    }
    // every cluster's first (lowest-id) member has a null prior and is kept
    val firstPerCluster = out.groupBy(_.getLong(1)).values.map(_.minBy(_.getLong(0)))
    firstPerCluster.foreach(r => assert(r.isNullAt(2) && r.getBoolean(3)))
  }

  test("HLL distinct stays within the configured 2% error bound (sf0.01)") {
    // the oracle hash-checks within_bound = true; this spec pins the same
    // guarantee at both SFs the driver doesn't run
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val out = TimeSeriesOps.hllDistinct(spark, d).collect()
      assert(out.nonEmpty)
      assert(out.forall(_.getBoolean(2)), s"$d: a group exceeded the HLL bound")
    }
  }

  test("PII scrub redacts emails, phones, and digit runs with matching counts") {
    import spark.implicits._
    val df = Seq(
      "contact john.doe+spam@example.co.uk or 555-867-5309 ref 42",
      "no pii here",
      "+123 456 7890 and a@b.io").toDF("props")
    val out = df.select(
      CorpusOps.scrubPii(col("props")).as("s"),
      CorpusOps.piiRedactionCount(col("props")).as("n")).collect()
    assert(out(0).getString(0) == "contact <EMAIL> or <PHONE> ref <NUM>")
    assert(out(0).getLong(1) == 3L)
    assert(out(1).getString(0) == "no pii here" && out(1).getLong(1) == 0L)
    assert(out(2).getString(0) == "<PHONE> and <EMAIL>")
    assert(out(2).getLong(1) == 2L)
  }
}
