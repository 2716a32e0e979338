package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, MultimodalOps, SimilarityOps, TextOps}

/** Semantic invariants for the LLM-data-pipeline operators on sf0.001. */
class LlmOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("text stats: ratios bounded, token counts positive") {
    val out = TextOps.textStats(spark, dir)
    assert(out.count() == 500)
    assert(out.where(
      col("type_token_ratio") > 1.0 || col("type_token_ratio") <= 0.0 ||
        col("stopword_ratio") > 1.0 || col("stopword_ratio") < 0.0 ||
        col("n_tokens") <= 0 || col("n_bpe_est") < col("n_tokens")).count() == 0)
  }

  test("text stats: native one-pass form is bit-parity with the composed form") {
    import spark.implicits._
    // real corpus + degenerate corners: 1-token, all-same, all-stopword,
    // empty string (split('') = ['']), multibyte chars (numChars not
    // bytes), a null token (BPE sum must go null), and a null text
    val corners = Seq(
      (9001L, Option("word")),
      (9002L, Option("the the the the")),
      (9003L, Option("a the a the a")),
      (9004L, Option("")),
      (9005L, Option("héllo wörld ünïcode tökens")),
      (9007L, Option.empty[String])
    ).toDF("doc_id", "text")
    val base = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "text").union(corners)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(canon(TextOps.textStatsOf(base)) ==
      canon(TextOps.textStatsComposedOf(base)))
    // the null-token corner exercised directly on the array form
    val arr = Seq(Tuple1(Seq(Option("ab"), Option.empty[String], Option("cdefg"))))
      .toDF("toks")
      .select(graft.functions.TextStatsRowExpressions
        .text_stats_row(col("toks"), Seq("the", "a")).as("st"))
      .select("st.n", "st.uniq", "st.stop_c", "st.bpe").collect()(0)
    assert(arr.getLong(0) == 3 && arr.getLong(1) == 3 &&
      arr.getLong(2) == 0 && arr.isNullAt(3))
  }

  test("quality repetition: fractions match a driver-side recount on a sample") {
    val out = TextOps.qualityRepetition(spark, dir)
    assert(out.count() == 500)
    // independent recount in plain Scala for the first 20 docs
    val texts = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "text").where(col("doc_id") < 20)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = out.where(col("doc_id") < 20).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // Spark's round() is HALF_UP (0.78125 -> 0.7813), not rint's half-even
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    texts.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val uni = toks.groupBy(identity).map(_._2.size)
      val bis = toks.sliding(2).map(_.mkString(" ")).toSeq
      val bi = bis.groupBy(identity).map(_._2.size)
      val exp = (
        round4(uni.max.toDouble / toks.size),
        round4(uni.filter(_ > 1).sum.toDouble / toks.size),
        round4(bi.max.toDouble / bis.size))
      assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
    }
  }

  test("quality filter: keep is the conjunction of the rules and splits the corpus") {
    val out = TextOps.qualityFilter(spark, dir).cache()
    assert(out.count() == 500)
    assert(out.where(col("keep") =!= (col("len_ok") && col("diversity_ok") &&
      col("top_token_ok") && col("dup_token_ok"))).count() == 0)
    val kept = out.where(col("keep")).count()
    assert(kept > 0 && kept < 500, s"degenerate split: kept=$kept")
    out.unpersist()
  }

  test("LM score: perplexity = exp(-mean_logp), mean_logp negative, sane range") {
    val out = TextOps.lmScore(spark, dir).cache()
    assert(out.count() == 500)
    assert(out.where(col("mean_logp") >= 0).count() == 0)
    // recompute exp(-mean) and compare at 3dp tolerance; perplexity must
    // exceed 1 and stay below 1/p_min (rare-token docs exceed |vocab|)
    val bad = out.where(
      abs(exp(-col("mean_logp")) - col("perplexity")) > 0.002 ||
        col("perplexity") <= 1.0 || col("perplexity") > 100.0).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("decontamination: flagged docs truly share a 5-gram with the eval slice") {
    val flagged = TextOps.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recomputation in plain Scala
    val all = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(t: String): Set[String] =
      t.split(" ", -1).toSeq.sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSet
    val evalGrams = all.filter(d => Set("src0", "src1").contains(d._2))
      .flatMap(d => grams(d._3)).toSet
    val expected = all.filter(d => !Set("src0", "src1").contains(d._2))
      .map(d => d._1 -> grams(d._3).count(evalGrams.contains).toLong)
      .filter(_._2 > 0).toMap
    assert(flagged == expected, s"got ${flagged.size}, expected ${expected.size}")
  }

  test("lang id: every doc gets a prediction from the known set") {
    val out = TextOps.langId(spark, dir)
    assert(out.where(!col("predicted_lang").isin("en", "fr", "es", "de", "zh")).count() == 0)
    assert(out.count() == 500)
  }

  test("fingerprint: deterministic across runs") {
    val a = TextOps.docFingerprint(spark, dir).collect()
    val b = TextOps.docFingerprint(spark, dir).collect()
    assert(a.sameElements(b))
  }

  test("fingerprint: native expression is bit-parity with the declarative fold") {
    // the retired explode + groupBy form, verbatim — the native
    // FingerprintRowFp must reproduce it hash-for-hash (incl. short docs)
    val declarative = graft.sources.Tables.read(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(toks) - 4, 1)), i -> concat_ws(' ', slice(toks, i, 5)))"))
        .as("sh"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(sh), 1, 15), 16, 10) as long)").as("h"))
      .groupBy("doc_id")
      .agg(min(col("h")).as("fingerprint"), countDistinct(col("h")).as("n_shingles"))
      .orderBy("doc_id")
      .collect()
    val native = TextOps.docFingerprint(spark, dir).collect()
    assert(native.sameElements(declarative))
    // SQL registration works and agrees
    val viaSql = spark.sql(
      s"SELECT doc_id, fingerprint_row(split(text, ' '), 5).fingerprint AS fingerprint " +
        s"FROM parquet.`$dir/documents.parquet` ORDER BY doc_id").collect()
    assert(viaSql.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      native.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("chunking: every token covered, windows exact, short docs get one chunk") {
    val window = 64; val stride = 48
    val nToks = graft.sources.Tables.read(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = graft.ops.CorpusOps.chunkDocuments(spark, dir, window, stride)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(chunks.map(_._1).toSet == nToks.keySet) // every doc chunked
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = nToks(id)
      val c = cs.map(_._2).max
      assert(cs.map(_._2).sorted.toSeq == (1L to c), s"doc $id chunk ids dense")
      assert(c == math.max(math.ceil((n - window).toDouble / stride).toLong + 1, 1L))
      // all but the last chunk are full windows; the last reaches token n
      cs.filter(_._2 < c).foreach(ch => assert(ch._3 == window, s"doc $id"))
      assert((c - 1) * stride + cs.find(_._2 == c).get._3 == math.max(n, (c - 1) * stride + 1))
    }
  }

  test("cross-corpus dedup: flags only incoming docs, refs only reference docs") {
    val srcOf = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = DedupOps.crossCorpusDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out.foreach { case (id, kind, nRefs, firstRef) =>
      assert(!DedupOps.CrossRefSources.contains(srcOf(id)), s"$id flagged but is reference")
      assert(DedupOps.CrossRefSources.contains(srcOf(firstRef)), s"$firstRef not reference")
      assert(Set("exact", "near").contains(kind) && nRefs >= 1)
    }
    // exact rows really are text-identical to their first_ref
    val texts = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(_._2 == "exact").foreach { case (id, _, _, ref) =>
      assert(texts(id) == texts(ref), s"exact flag $id vs $ref")
    }
    // every exact duplicate is also a near duplicate (Hamming 0)
    val byKind = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byKind.getOrElse("exact", Set()).subsetOf(byKind.getOrElse("near", Set())))
  }

  test("duplicate-span stats: planted exact pair saturates, fractions consistent") {
    val out = DedupOps.duplicateSpanStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 500)
    out.foreach { case (_, nGrams, nDup, frac) =>
      assert(nDup >= 0 && nDup <= nGrams)
      assert(math.abs(frac - BigDecimal(nDup.toDouble / nGrams)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // docs with an exact twin (from exactDedup: n_copies >= 2) have dup_frac 1.0
    val twins = DedupOps.exactDedup(spark, dir).where(col("n_copies") >= 2)
      .select("doc_id_kept").collect().map(_.getLong(0)).toSet
    val fracOf = out.map(t => t._1 -> t._4).toMap
    twins.foreach(id => assert(fracOf(id) == 1.0, s"twin $id should be fully duplicated"))
  }

  test("duplicate-span scrub: removal consistent with span stats, twins fully scrubbed") {
    val out = DedupOps.duplicateSpanScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == 500)
    val texts = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, nTok, nRem, clean) =>
      val orig = texts(id).split(" ", -1)
      assert(nTok == orig.length)
      assert(nRem >= 0 && nRem <= nTok)
      val cleanToks = if (clean.isEmpty) Array.empty[String] else clean.split(" ", -1)
      assert(cleanToks.length == nTok - nRem, s"doc $id token accounting")
      // surviving tokens are a subsequence of the originals
      var i = 0
      cleanToks.foreach { t =>
        while (i < orig.length && orig(i) != t) i += 1
        assert(i < orig.length, s"doc $id: '$t' not in order in original")
        i += 1
      }
    }
    // docs with dup_frac 1.0 (every window duplicated) lose every token;
    // docs with dup_frac 0.0 are untouched
    val fracOf = DedupOps.duplicateSpanStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    out.foreach { case (id, nTok, nRem, clean) =>
      if (fracOf(id) == 1.0) assert(nRem == nTok && clean.isEmpty, s"twin $id not fully scrubbed")
      if (fracOf(id) == 0.0) assert(nRem == 0 && clean == texts(id), s"clean doc $id modified")
    }
  }

  test("duplicate-span scrub: planted synthetic duplicates (data-independent corners)") {
    // the driver-generated corpus may carry no exact twins (round-7 data
    // has none at this SF), which would leave the full-scrub corner
    // unexercised — plant them explicitly
    import spark.implicits._
    val shared = (1 to 12).map(i => s"w$i").mkString(" ")  // 12 tokens ≥ gram=10
    val uniqA = (1 to 15).map(i => s"a$i").mkString(" ")
    val uniqB = (1 to 15).map(i => s"b$i").mkString(" ")
    val rows = Seq(
      (0L, shared, "s0"),                       // exact twin of 1 → fully scrubbed
      (1L, shared, "s0"),
      (2L, s"$uniqA $shared", "s1"),            // shared suffix cut, prefix survives
      (3L, uniqB, "s1"))                        // untouched
    val d = rows.toDF("doc_id", "text", "source")
    val out = graft.ops.DedupOps.duplicateSpanScrubOf(d, 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((12L, 12L, "")) && out(1L) == ((12L, 12L, "")))
    assert(out(3L) == ((15L, 15L - 15L, uniqB)))
    // doc 2: every 10-gram window fully inside `shared` is duplicated; the
    // windows straddling uniqA are unique, so exactly the tokens covered by
    // shared-only windows are cut. shared-only windows in doc2 start at
    // position 16 (tokens 16..27) → covered = 16..27 (12 tokens cut)
    val (n2, rem2, clean2) = out(2L)
    assert(n2 == 27L && rem2 == 12L && clean2 == uniqA, s"doc2: $rem2 '$clean2'")
  }

  test("span scrub: native expression is row-identical to the composed rewrite") {
    // the round-18 native span_scrub expression replaced the interpreted
    // three-lambda rewrite; pin bit-parity over the real corpus AND the
    // planted corners (full scrub, prefix survival, untouched, overlap)
    import spark.implicits._
    val shared = (1 to 12).map(i => s"w$i").mkString(" ")
    val uniqA = (1 to 15).map(i => s"a$i").mkString(" ")
    val synth = Seq(
      (9000L, shared, "s0"), (9001L, shared, "s0"),
      (9002L, s"$uniqA $shared", "s1"),
      (9003L, s"$shared $uniqA $shared", "s1")) // overlapping covered runs
      .toDF("doc_id", "text", "source")
    val corpus = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "text", "source").unionByName(synth)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    // drive both rewrites from the SAME dupStarts frame
    val grams = Seq(10, 3)
    grams.foreach { g =>
      val native = graft.ops.DedupOps.duplicateSpanScrubOf(corpus, g)
        .collect().map(key).sortBy(_._1)
      val composedStarts = {
        // recompute dupStarts exactly as duplicateSpanScrubOf does, then
        // route through the retired composed rewrite
        val d = corpus
        val out = graft.ops.DedupOps.applySpanScrubComposed(
          d, graft.ops.DedupOps.dupStartsOf(d, g), g).orderBy("doc_id")
        out.collect().map(key).sortBy(_._1)
      }
      assert(native.sameElements(composedStarts), s"gram=$g parity broke")
    }
  }

  test("cluster sample: dense ranks, non-increasing cosine, every kmeans cell covered, group-limited plan") {
    val df = SimilarityOps.clusterSample(spark, dir)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byCell = out.groupBy(_._1)
    byCell.foreach { case (cell, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rows.length), s"cell $cell ranks not dense")
      assert(rows.length <= 3, s"cell $cell over quota")
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._4 >= p(1)._4),
        s"cell $cell cosine not non-increasing")
    }
    // every populated kmeans cell contributes min(3, n_members) rows
    val cells = SimilarityOps.kmeans(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCell.keySet == cells.keySet)
    byCell.foreach { case (cell, rows) =>
      assert(rows.length == math.min(3L, cells(cell)), s"cell $cell quota mismatch")
    }
    // scale shape: constant rank bound group-limits before the shuffle
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("bm25: ranks dense, scores non-increasing, top score matches driver recompute") {
    val out = graft.ops.CorpusOps.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == (1L to out.length))
    assert(out.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3))
    assert(out.forall(_._3 > 0))
    // independent driver-side BM25 for the winner
    val all = graft.sources.Tables.read(spark, dir, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val terms = graft.ops.CorpusOps.Bm25Query.split(" ").distinct
    val n = all.length.toDouble
    val dls = all.map { case (id, t) => id -> t.split(" ", -1).length.toDouble }.toMap
    val avgdl = dls.values.sum / n
    val dfs = terms.map(t =>
      t -> all.count(_._2.split(" ", -1).contains(t)).toDouble).toMap
    def score(id: Long, text: String): Double = {
      val toks = text.split(" ", -1)
      terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5)) *
          tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls(id) / avgdl))
      }.sum
    }
    val (_, topDoc, topScore) = out.head
    val expected = BigDecimal(score(topDoc, all.find(_._1 == topDoc).get._2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(topScore - expected) <= 1e-4, s"got $topScore want $expected")
    // and the winner really is argmax over the whole corpus
    val best = all.map { case (id, t) => (score(id, t), id) }.max
    assert(best._2 == topDoc || math.abs(best._1 - score(topDoc, all.find(_._1 == topDoc).get._2)) < 1e-12)
  }

  test("hard negatives: extremes verified against a driver-side argmax/argmin") {
    val out = SimilarityOps.hardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(out.length == SimilarityOps.HnAnchors)
    val all = graft.sources.Tables.read(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = all.map(t => t._1 -> t).toMap
    out.foreach { case (aid, negId, negCos, posId, posCos) =>
      val (_, aLabel, aVec) = byId(aid)
      assert(byId(negId)._2 != aLabel); assert(byId(posId)._2 == aLabel)
      val negs = all.filter(t => t._1 != aid && t._2 != aLabel)
        .map(t => (cos(t._3, aVec), t._1))
      val poss = all.filter(t => t._1 != aid && t._2 == aLabel)
        .map(t => (cos(t._3, aVec), t._1))
      // (max cos, then min id) for negatives; (min cos, then min id) for positives
      val bestNeg = negs.maxBy(t => (t._1, -t._2))
      val bestPos = poss.minBy(t => (t._1, t._2))
      assert((negCos, negId) == bestNeg, s"anchor $aid neg")
      assert((posCos, posId) == bestPos, s"anchor $aid pos")
    }
  }

  test("hard negatives: degenerate label distributions match the oracle's neg-driven select") {
    import spark.implicits._
    // single-label corpus: no anchor has a negative → NO rows (the oracle
    // drives from the neg side, so emitting null-neg rows would diverge)
    val mono = Seq.tabulate(6)(i => (i.toLong, 0, Array(1.0 + i, 2.0, 3.0)))
      .toDF("vec_id", "label", "vec")
    assert(SimilarityOps.hardNegativesFrom(mono).count() == 0)
    // two labels, one vector each: both anchors emit — neg present, pos
    // null (the oracle LEFT JOINs pos, keeping the row)
    val duo = Seq((0L, 0, Array(1.0, 0.0)), (1L, 1, Array(0.0, 1.0)))
      .toDF("vec_id", "label", "vec")
    val rows = SimilarityOps.hardNegativesFrom(duo).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(rows.forall(r => !r.isNullAt(1) && r.isNullAt(3)), rows.mkString(","))
  }

  test("clean-corpus cascade: verdicts agree with each component tier") {
    val out = graft.ops.CorpusOps.cleanCorpus(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    assert(out.length == 500)
    out.foreach { case (_, src, q, d, c, ref, keep) =>
      assert(keep == (q && d && c && !ref))
      assert(ref == DedupOps.CrossRefSources.contains(src))
    }
    // spot-check each flag against its source-of-truth op
    val qOk = TextOps.qualityFilter(spark, dir).select("doc_id", "keep")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val dOk = DedupOps.dedupKeepDrop(spark, dir).select("doc_id", "keep")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val contaminated = TextOps.decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    out.foreach { case (id, _, q, d, c, _, _) =>
      assert(q == qOk(id) && d == dOk(id) && c == !contaminated.contains(id), s"doc $id")
    }
    // the cascade must actually discriminate on this corpus
    assert(out.exists(_._7) && out.exists(!_._7))
  }

  test("frame dedup: planted cross-video replays land in the anchor's group") {
    val ids = MultimodalOps.framesetTable(spark, dir)
      .select("media_id").distinct().collect().map(_.getLong(0)).sorted
    val out = MultimodalOps.frameDupGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.forall(_._3 >= 2))
    // frame 2 of every doc replays its anchor's frame 0 (identical PNG
    // bytes), so each 5-doc block MUST contribute a duplicate group whose
    // first member is the anchor's frame 0 — unless a mod-256 collision
    // merged it into an earlier group, in which case the anchor appears as
    // a non-first member; assert membership via group sizes instead:
    // every (id, 2) shares a hash with ((id - id%5)*3, 0), so the number
    // of frames covered by groups is at least ids.size (all frame-2s) +
    // number of anchors
    val anchors = ids.map(i => i - i % 5).distinct
    val covered = out.map(_._3).sum
    assert(covered >= ids.size + anchors.size,
      s"covered $covered < ${ids.size} frame-2 replicas + ${anchors.size} anchors")
    // and group firsts are genuine minima: strictly increasing pair keys
    val keys = out.map(t => t._1 * 3 + t._2)
    assert(keys.sorted.sameElements(keys) && keys.distinct.length == keys.length)
  }

  test("audio dedup: planted replays are byte-identical and fully covered") {
    val payloads = MultimodalOps.audiosetTable(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val ids = payloads.keySet
    // every 4th doc replays its anchor byte-for-byte
    ids.filter(id => id % 4 == 3 && ids.contains(id - 3)).foreach { id =>
      assert(payloads(id).sameElements(payloads(id - 3)), s"replay $id != anchor")
    }
    val out = MultimodalOps.audioDupGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.forall(_._2 >= 2))
    // identical payloads share a fingerprint, so every planted doc sits in
    // some group: covered members >= 2 * #planted pairs
    val planted = ids.count(id => id % 4 == 3 && ids.contains(id - 3))
    assert(out.map(_._2).sum >= 2L * planted,
      s"covered ${out.map(_._2).sum} < ${2 * planted}")
  }

  test("kmeans assignment: aggregate argmax equals the retired window form") {
    // kmeansAssign replaced a row_number window (which shuffled the whole
    // k-way crossJoin) with a struct-extreme aggregate; this pins the two
    // forms equal on (vec_id, cid) over the full corpus so the rewrite can
    // never drift from the documented (cos desc, cid asc) tie-break.
    import org.apache.spark.sql.expressions.Window
    val e = graft.sources.Tables.read(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val cents = SimilarityOps.kmeansCentroids(spark, dir)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
    val windowForm = e.crossJoin(broadcast(cents))
      .withColumn("cos", SimilarityOps.cosine(col("vec"), col("c_vec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aggForm = SimilarityOps.coarseCells(spark, dir)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aggForm.size == windowForm.size)
    assert(aggForm == windowForm)
  }

  test("knn graph: neighbor is the in-cell argmax, cells consistent") {
    val out = SimilarityOps.knnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.length == 500)
    val cellOf = out.map(t => t._1 -> t._2).toMap
    out.foreach { case (id, cid, nnId, nnCos) =>
      nnId.foreach { n =>
        assert(n != id && cellOf(n) == cid, s"vec $id neighbor $n cell mismatch")
        assert(nnCos.isDefined)
      }
    }
    // driver-side argmax recompute for the first 10 vectors
    val vecs = graft.sources.Tables.read(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.take(10).foreach { case (id, cid, nnId, nnCos) =>
      val mates = out.filter(t => t._2 == cid && t._1 != id).map(_._1)
      if (mates.nonEmpty) {
        val best = mates.map(m => (cos(vecs(id), vecs(m)), -m)).max
        assert(nnId.contains(-best._2) && nnCos.contains(best._1), s"vec $id")
      } else assert(nnId.isEmpty)
    }
  }

  test("gram hashes: native expression is bit-parity with the declarative fold") {
    val docs = graft.sources.Tables.read(spark, dir, "documents")
    for (g <- Seq(5, 10)) {
      val declarative = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), expr(
          s"transform(sequence(1, greatest(size(toks) - ${g - 1}, 1)), " +
            s"i -> cast(conv(substring(md5(concat_ws(' ', slice(toks, i, $g))), 1, 15), 16, 10) as long))")
          .as("hs"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
      val native = docs
        .select(col("doc_id"), graft.functions.SimhashExpressions
          .gram_hash60s(split(col("text"), " "), g).as("hs"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
      assert(native.sameElements(declarative), s"gram=$g")
    }
    // SQL registration works and agrees with the Column API
    val viaSql = spark.sql(
      s"SELECT doc_id, gram_hash60s(split(text, ' '), 5) AS hs " +
        s"FROM parquet.`$dir/documents.parquet` ORDER BY doc_id LIMIT 5")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
    val viaApi = graft.sources.Tables.read(spark, dir, "documents")
      .select(col("doc_id"), graft.functions.SimhashExpressions
        .gram_hash60s(split(col("text"), " "), 5).as("hs"))
      .orderBy("doc_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
    assert(viaSql.sameElements(viaApi))
  }

  test("exact dedup: keeps one canonical id per distinct text") {
    val out = DedupOps.exactDedup(spark, dir)
    val nTexts = graft.sources.Tables.read(spark, dir, "documents")
      .select("text").distinct().count()
    assert(out.count() == nTexts)
    assert(out.agg(sum("n_copies")).first().getLong(0) == 500)
  }

  test("jaccard pairs: symmetric bound doc_a < doc_b and jaccard in (0,1]") {
    val out = DedupOps.ngramJaccardDedup(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0)
    }
  }

  test("minhash LSH emits only pairs whose true bigram jaccard passes the threshold") {
    // recompute jaccard independently in Scala from the raw text and check
    // every LSH-verified pair against it; also: same-source LSH pairs must
    // be a subset of the exact per-source query's pairs
    import graft.sources.Tables
    val docsRaw = Tables.read(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    def shingles(text: String): Set[String] =
      text.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val exact = DedupOps.ngramJaccardDedup(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLshDedup(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    lsh.foreach { case (a, b) =>
      val (srcA, txtA) = docsRaw(a)
      val (srcB, txtB) = docsRaw(b)
      val sa = shingles(txtA)
      val sb = shingles(txtB)
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j >= 0.3, s"LSH pair ($a,$b) has true jaccard $j < 0.3")
      if (srcA == srcB)
        assert(exact.contains((a, b)), s"same-source LSH pair ($a,$b) missing from exact query")
    }
    assert(lsh.nonEmpty || exact.isEmpty)
  }

  test("near-dup clusters: every pair lands in one cluster, canonical is the min member") {
    val pairs = DedupOps.minhashLshDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = DedupOps.nearDupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid == members.keys.min, s"canonical of $cid is not the min member")
    }
  }

  test("simhash: near-identical docs get near-identical fingerprints") {
    import spark.implicits._
    val fps = DedupOps.simhashFingerprint(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // strongest planted near-dup pair at this sf (from the jaccard query)
    val pairs = DedupOps.ngramJaccardDedup(spark, dir, 0.5)
      .select("doc_a", "doc_b").collect()
    pairs.foreach { r =>
      val d = java.lang.Long.bitCount(fps(r.getLong(0)) ^ fps(r.getLong(1)))
      assert(d <= 8, s"hamming $d too large for near-dup pair $r")
    }
  }

  test("simhash near-pairs: band join is lossless vs driver-side all-pairs at hamming<=3") {
    val fps = DedupOps.simhashFingerprint(spark, dir)
      .select("doc_id", "simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (a, sa) <- fps; (b, sb) <- fps
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
    val got = DedupOps.simhashNearPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
  }

  test("simhash wide (60-bit/4x15): hamming bound holds, pairs a subset of the narrow query's") {
    val got = DedupOps.simhashNearPairsWide(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got.forall(_._3 <= 3))
    // guaranteed subset: per-bit votes are identical, so the 32-bit
    // fingerprint IS the low 32 bits of the 60-bit one — 32-bit hamming
    // never exceeds 60-bit hamming, hence wide(H<=3) => narrow(H<=3)
    val narrow = DedupOps.simhashNearPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val widePairs = got.map(t => (t._1, t._2))
    assert(widePairs.subsetOf(narrow),
      s"wide pairs not a subset: ${(widePairs -- narrow).take(5)}")
  }

  test("simhash 128 (2x60 lanes / 4x30 bands): lossless vs all-pairs, lane0 extends wide") {
    val lanes = DedupOps.simhashLanes128(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pigeonhole losslessness at the 120-bit scale parameterization: the
    // 4x30 band join must find EXACTLY the all-pairs Hamming<=3 set
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Long =
      (java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)).toLong
    val expected = (for {
      a <- lanes; b <- lanes
      if a._1 < b._1 && ham(a, b) <= 3
    } yield (a._1, b._1, ham(a, b))).toSet
    val got = DedupOps.simhashNearPairsWide128(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    // 120-bit hamming >= lane-0 (60-bit) hamming, so every 128-wide pair is
    // a wide-60 pair — the strictness ordering narrow ⊇ wide ⊇ wide128
    val wide60 = DedupOps.simhashNearPairsWide(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(t => (t._1, t._2)).subsetOf(wide60))
  }

  test("keep/drop: covers the corpus, one kept canonical per cluster, drops point at it") {
    val out = TextOps // force imports
    val kd = DedupOps.dedupKeepDrop(spark, dir).cache()
    assert(kd.count() == 500)
    // exactly one kept member per cluster, and every row's canonical is kept
    val perCluster = kd.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_kept"))
    assert(perCluster.where(col("n_kept") =!= 1).count() == 0)
    val keptIds = kd.where(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kd.collect().forall(r => keptIds.contains(r.getLong(3))))
    // dropped rows exist (the corpus has planted near-dups)
    assert(kd.where(!col("keep")).count() > 0)
    kd.unpersist()
  }

  test("soft-dedup weights: each cluster's mass totals 1, singletons weigh 1") {
    val w = DedupOps.dedupWeights(spark, dir).cache()
    assert(w.count() == 500)
    // per-cluster weight mass = cluster_size · (1/cluster_size) = 1
    val mass = w.groupBy("cluster_id").agg(sum(col("weight")).as("mass"))
      .collect().map(_.getDouble(1))
    assert(mass.forall(m => math.abs(m - 1.0) < 1e-4))
    // unclustered docs keep full weight; clustered docs are downweighted
    assert(w.where(col("cluster_size") === 1 && col("weight") =!= 1.0).count() == 0)
    assert(w.where(col("cluster_size") > 1).count() > 0)
    w.unpersist()
  }

  test("int8 quantization: reconstruction error bounded by scale/2, codes in range") {
    val q = graft.ops.SimilarityOps.quantizeInt8(spark, dir).cache()
    assert(q.count() == 500L * 64)
    assert(q.where(col("qcode") > 127 || col("qcode") < -127).count() == 0)
    // x_hat = qcode * scale must be within scale/2 (+ eps for the 9dp
    // rounding of the reported scale) of the original component
    val e = graft.sources.Tables.read(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("d"), col("x").cast("double").as("x"))
    val bad = q.join(e, Seq("vec_id", "d"))
      .where(abs(col("qcode") * col("scale") - col("x")) > col("scale") / 2 + lit(1e-6))
      .count()
    assert(bad == 0)
    q.unpersist()
  }

  test("ANN brute force: exactly k neighbors per query, cosine in [-1,1]") {
    val out = SimilarityOps.annBruteForce(spark, dir).collect()
    assert(out.length == SimilarityOps.NQueries * SimilarityOps.TopK)
    out.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0001))
    // ranks are descending in cosine per query
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cs = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN: neighbors are a subset of each query's bucket, scores match brute force") {
    val brute = SimilarityOps.annBruteForce(spark, dir)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SimilarityOps.annLshBucketed(spark, dir)
      .select("query_id", "neighbor_id", "cosine").collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-9))
    }
  }

  test("ANN recall: both approximate indexes recover >= 0.8 of brute-force top-3") {
    val out = SimilarityOps.annRecall(spark, dir).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getDouble(3) >= 0.8,
        s"${r.getString(0)} recall ${r.getDouble(3)} below 0.8")
      assert(r.getLong(2) == SimilarityOps.NQueries * 3)
    }
  }

  test("embedding near-dup: pairs ordered, above threshold, recall >= 0.8 vs exact all-pairs") {
    val out = SimilarityOps.embeddingNearDup(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= SimilarityOps.EmbDupThreshold - 1e-9)
    }
    // independent exact ground truth, computed driver-side in plain Scala
    val vecs = graft.sources.Tables.read(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truePairs = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && cos(va, vb) >= SimilarityOps.EmbDupThreshold
    } yield (ia, ib)).toSet
    val found = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truePairs), "reported pair below threshold")
    assert(truePairs.isEmpty ||
      found.size.toDouble / truePairs.size >= 0.8,
      s"embedding near-dup recall ${found.size}/${truePairs.size} below 0.8")
  }

  test("PQ-ADC and IVFxPQ: recall@3 vs brute-force ground truth >= 0.9 after re-rank") {
    Seq(dir, "/root/testdata/sf0.01").foreach { d =>
      val truth = SimilarityOps.annBruteForce(spark, d)
        .where(col("rank") <= 3).select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
        truth.map { case (q, t) =>
          got.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size
        }.sum / truth.size
      }
      val pq = recallOf(SimilarityOps.annPqAdc(spark, d))
      assert(pq >= 0.9, s"$d: PQ recall@3 $pq < 0.9")
      val ivfpq = recallOf(SimilarityOps.annIvfPq(spark, d))
      assert(ivfpq >= 0.9, s"$d: IVFxPQ recall@3 $ivfpq < 0.9")
    }
  }

  test("centroid assignment: every vector assigned, labels from the label set") {
    val out = SimilarityOps.centroidAssign(spark, dir)
    assert(out.count() == 500)
    assert(out.where(col("assigned_label") < 0 || col("assigned_label") > 9).count() == 0)
    // self-consistency: assignment beats random (10 labels → >10% match)
    val acc = out.where(col("is_match")).count().toDouble / 500
    assert(acc > 0.1, s"accuracy $acc")
  }

  test("multimodal: decode stub emits one feature row per media row, schema typed") {
    val feats = MultimodalOps.decodeFeatures(spark, dir)
    assert(feats.count() == 500)
    val row = feats.filter(_.kind == "video").head()
    assert(row.n_frames == (row.n_bytes % 24).toInt)
    val img = feats.filter(_.kind != "video").head()
    assert(img.n_frames == 1)
  }

  test("multimodal: metadata projection agrees with the decode stage") {
    import spark.implicits._
    val meta = MultimodalOps.mediaMeta(spark, dir)
      .select("media_id", "n_bytes", "width")
      .as[(Long, Long, Long)].collect().toMap2
    val decoded = MultimodalOps.decodeFeatures(spark, dir).collect()
    decoded.foreach { f =>
      val (nb, w) = meta(f.media_id)
      assert(nb == f.n_bytes && w == f.width)
    }
  }

  test("multimodal: real PNGs round-trip through ImageIO with exact dims and pixels") {
    // payloads are genuine PNGs (magic header), not fakes
    MultimodalOps.pngTable(spark, dir).limit(3).collect().foreach { r =>
      val b = r.getAs[Array[Byte]]("payload")
      assert(b.length > 8)
      assert((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
    }
    // decoded width/height/top-left pixel match the synthesis arithmetic —
    // values only a real pixel decode (lossless PNG) can reproduce
    val out = MultimodalOps.decodePng(spark, dir).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 13 + 4).toInt, s"width of $id")
      assert(r.getInt(2) == (id % 7 + 3).toInt, s"height of $id")
      assert(r.getInt(3) == (id % 256).toInt, s"r0 of $id")
      assert(r.getInt(4) == (id * 7 % 256).toInt, s"g0 of $id")
      assert(r.getInt(5) == (id * 13 % 256).toInt, s"b0 of $id")
    }
  }

  test("matryoshka energy: kept fraction in (0,1], monotone in k, full norm matches driver") {
    val k16 = SimilarityOps.matryoshkaEnergy(spark, dir, 16).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val k32 = SimilarityOps.matryoshkaEnergy(spark, dir, 32).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(k16.nonEmpty)
    k16.foreach { case (id, (sub, full, kept)) =>
      assert(kept > 0.0 && kept <= 1.0, s"vec $id kept=$kept")
      assert(math.abs(kept - sub / full) < 1e-5)
      assert(k32(id) >= kept - 1e-6, s"vec $id: energy not monotone in k")
    }
  }

  test("adaptive quality filter: per-lang P25 cut keeps <=75%, every kept score above its cut") {
    val out = TextOps.adaptiveQualityFilter(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(2) > r.getDouble(3), r.toString))
    // per language: strictly-above-P25 keeps at most 75% and at least half
    val perLang = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val langSizes = graft.sources.Tables.read(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, kept) =>
      val total = langSizes(lang).toDouble
      assert(kept <= total * 0.75 + 1, s"$lang kept $kept of $total")
      assert(kept >= total * 0.5, s"$lang kept only $kept of $total")
    }
  }

  test("bloom decontamination: output identical to exact, prefilter actually prunes") {
    val exact = TextOps.decontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = TextOps.decontaminateBloom(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom == exact, s"bloom ${bloom.size} rows vs exact ${exact.size}")
    // the prefilter must pass every true hit (no false negatives — implied
    // by output equality above) while pruning the corpus gram stream hard:
    // fill ~7% with 2 probes -> FP rate well under 5%
    val corpusGrams = TextOps.bloomCandidates(spark, dir, logM = 16)
    val nCandidates = corpusGrams.count()
    val nAllGrams = graft.sources.Tables.read(spark, dir, "documents")
      .where(!col("source").isin("src0", "src1"))
      .select(explode(TextOps.tokens).as("t")).count() // upper bound on grams
    assert(nCandidates < nAllGrams / 20,
      s"prefilter too weak: $nCandidates candidates of ~$nAllGrams grams")
  }

  test("multimodal: real WAVs round-trip through AudioSystem with exact format and PCM") {
    // payloads are genuine RIFF/WAVE files (magic header), not fakes
    MultimodalOps.wavTable(spark, dir).limit(3).collect().foreach { r =>
      val b = r.getAs[Array[Byte]]("payload")
      assert(b.length > 44) // RIFF header + fmt + data chunks
      assert(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      assert(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
    }
    // the hand-rolled RIFF writer (round-18 optimization) is BYTE-IDENTICAL
    // to the JDK WaveFileWriter it replaced — every rate/channel/frame
    // combination the synthesis rule can produce (id mod 5 × mod 2 × mod 50
    // cycles within 0..99, plus a large id for 64-bit arithmetic)
    (0L to 99L) :+ 123456789L foreach { id =>
      assert(java.util.Arrays.equals(
        MultimodalOps.encodeWav(id),
        MultimodalOps.encodeWavViaAudioSystem(id)),
        s"hand-rolled WAV bytes differ from AudioSystem.write for id $id")
    }
    // decoded rate/channels/frames/first-sample match the synthesis
    // arithmetic — values only a real WAV parse (lossless PCM) reproduces
    val out = MultimodalOps.decodeWav(spark, dir).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (8000 + (id % 5) * 2000).toInt, s"rate of $id")
      assert(r.getInt(2) == (id % 2 + 1).toInt, s"channels of $id")
      assert(r.getLong(3) == id % 50 + 20, s"frames of $id")
      assert(r.getInt(4) == ((id * 31) % 65536 - 32768).toInt, s"sample of $id")
    }
  }

  test("cluster and keep/drop tables are memoized per (session, dir)") {
    // q_dedup_clusters / q_dedup_keepdrop / q_dedup_stats all sit on the
    // label-propagation output; without the memo each call re-ran the 5
    // eager checkpoint rounds (round-5: q_dedup_stats 9× its parent)
    assert(DedupOps.nearDupClusters(spark, dir) eq
      DedupOps.nearDupClusters(spark, dir))
    assert(DedupOps.dedupKeepDrop(spark, dir) eq
      DedupOps.dedupKeepDrop(spark, dir))
  }

  test("dedup stats: per-source rows cover the corpus, drops match keep/drop") {
    val stats = DedupOps.dedupStats(spark, dir).collect()
    assert(stats.map(_.getLong(1)).sum == 500) // n_docs covers the corpus
    val kd = DedupOps.dedupKeepDrop(spark, dir).collect()
    val dropped = kd.count(!_.getBoolean(2))
    assert(stats.map(_.getLong(2)).sum == dropped.toLong)
    stats.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1)) // clusters <= docs per source...
    }
  }

  test("multimodal: video container parses, sampled frames decode, thumbnails resize") {
    // container framing is real: 4-byte count + per-frame length-prefixed PNGs
    MultimodalOps.videoTable(spark, dir).limit(2).collect().foreach { r =>
      val b = r.getAs[Array[Byte]]("payload")
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
      val n = in.readInt()
      assert(n >= 2 && n <= 6)
      val len = in.readInt()
      val png = new Array[Byte](len); in.readFully(png)
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P') // a genuine PNG frame
    }
    // every-2nd-frame sampling: only even frame indices appear, dims real
    val frames = MultimodalOps.decodeVideoFrames(spark, dir).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) % 2 == 0, s"unsampled frame emitted: $r")
      assert(r.getInt(2) == (id % 5 + 2).toInt)
      assert(r.getInt(3) == (id % 13 + 4).toInt && r.getInt(4) == (id % 7 + 3).toInt)
      assert(r.getInt(5) == ((id * 1000 + r.getInt(1)) % 256).toInt)
    }
    // nearest-neighbor thumbnail digest matches a driver-side recompute
    val thumbs = MultimodalOps.thumbnailDigest(spark, dir).collect()
    assert(thumbs.length == 500)
    thumbs.take(50).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 13 + 4).toInt, (id % 7 + 3).toInt)
      val expect = (for { y <- 0 until 3; x <- 0 until 4 }
        yield (id + 31L * (x * w / 4) + 17L * (y * h / 3)) % 256).sum
      assert(r.getLong(3) == expect, s"thumb digest of $id")
    }
  }

  implicit class TupleOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
