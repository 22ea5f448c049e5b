package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Persistable FROZEN BASE STATE for the incremental curation path — the
  * artifacts a deployment carries between ingest batches, so screening a
  * new crawl re-derives NOTHING base-sided (x31's cold path recomputes
  * all of this per run; the warm path loads it):
  *
  *   - the char-trigram LM model: 27³ trigram counts (`n3`; the 27²
  *     prefix sums `n2` are re-derived on load — they are a projection of
  *     `n3`, persisting them would just be a second copy to keep
  *     consistent) and the scorable-document count — x30's "what a 100-TB
  *     deployment serializes": corpus-size-INDEPENDENT, ~154 KB;
  *   - the frozen rank-cut threshold tuple (score, doc_id), stored as raw
  *     IEEE-754 bits so the reload compares bit-identically;
  *   - the base survivors' content-hash set (`hashes/`, one md5 string
  *     per distinct kept text) — the exact-dedup anti-join side;
  *   - the base exact keepers (`exact/`: doc_id, text) — the corpus the
  *     d10 screen verifies against (and what serving would re-embed);
  *   - the keepers' shingle relation (`shingles/`: doc_id, sh) and
  *     MinHash band-bucket relation (`buckets/`: doc_id, bucket) — the
  *     two base-sided inputs of `IncrementalDedup.screenPrepared`, so the
  *     warm screen is: scan buckets, cap, equi-join the delta's probes.
  *
  * Layout and durability follow the IvfIndex sidecar discipline: scalars
  * in a `_state.json` sidecar (underscore → ignored by parquet listings),
  * relations as parquet subdirectories, everything staged into a `.tmp-`
  * sibling and RENAMED in (move live aside → rename tmp → drop old), so a
  * reader never observes a half-written state and a crash mid-save leaves
  * the previous state live. [[load]] sweeps crash leftovers first.
  *
  * At 100 TB the relations here are a few percent of the corpus (keepers'
  * text dominates; shingles/buckets are id+hash rows) and every consumer
  * reads them as ordinary pruned parquet scans — no driver materialization
  * anywhere on the load path; only the 19 684 scalar longs ride the JSON
  * sidecar.
  */
object IncrementalState {

  /** A reopened state: model arrays driver-side, relations lazy scans. */
  final case class Loaded(
      n3: Array[Long], n2: Array[Long], nScorable: Long,
      threshold: Option[(Double, Long)],
      baseHashes: DataFrame,  // (bh string)
      baseExact: DataFrame,   // (doc_id long, text string)
      baseSh: DataFrame,      // (doc_id long, sh array<string>)
      baseBuckets: DataFrame) // (doc_id long, bucket string)

  private val Sidecar = "_state.json"

  def save(spark: SparkSession, path: String,
           n3: Array[Long], nScorable: Long,
           threshold: Option[(Double, Long)],
           baseHashes: DataFrame, baseExact: DataFrame,
           baseSh: DataFrame, baseBuckets: DataFrame): Unit = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(live.getParent, s".tmp-${live.getName}")
    fs.delete(tmp, true) // stale crash leftover from an earlier save
    baseHashes.select("bh").write.parquet(new Path(tmp, "hashes").toString)
    baseExact.select("doc_id", "text").write.parquet(new Path(tmp, "exact").toString)
    baseSh.select("doc_id", "sh").write.parquet(new Path(tmp, "shingles").toString)
    baseBuckets.select("doc_id", "bucket").write.parquet(new Path(tmp, "buckets").toString)
    val thrJson = threshold.fold("") { case (ts, ti) =>
      s""","tsBits":${java.lang.Double.doubleToLongBits(ts)},"ts":$ts,"ti":$ti""" }
    val json =
      s"""{"version":1,"nScorable":$nScorable$thrJson,"n3":[${n3.mkString(",")}]}"""
    val out = fs.create(new Path(tmp, Sidecar), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // atomic publish: live (if any) aside, tmp in, old dropped
    val old = new Path(live.getParent, s".old-${live.getName}")
    fs.delete(old, true)
    val hadLive = fs.exists(live)
    if (hadLive && !fs.rename(live, old))
      throw new java.io.IOException(s"rename $live -> $old failed")
    if (!fs.rename(tmp, live)) {
      if (hadLive) fs.rename(old, live) // restore before failing
      throw new java.io.IOException(s"rename $tmp -> $live failed; previous state restored")
    }
    fs.delete(old, true)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, Sidecar)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def load(spark: SparkSession, path: String): Loaded = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    sweep(fs, live)
    val raw = {
      val in = fs.open(new Path(live, Sidecar))
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
    // strict parse of the flat object written above (no nesting beyond n3)
    def longField(name: String): Option[Long] =
      s""""$name":(-?\\d+)""".r.findFirstMatchIn(raw).map(_.group(1).toLong)
    val nScorable = longField("nScorable").getOrElse(
      throw new java.io.IOException(s"corrupt $Sidecar: no nScorable in $path"))
    val threshold = for { bits <- longField("tsBits"); ti <- longField("ti") }
      yield (java.lang.Double.longBitsToDouble(bits), ti)
    val n3 = """"n3":\[([^\]]*)\]""".r.findFirstMatchIn(raw)
      .map(_.group(1).split(",").map(_.trim.toLong))
      .getOrElse(throw new java.io.IOException(s"corrupt $Sidecar: no n3 in $path"))
    val n2 = new Array[Long](27 * 27)
    var i = 0
    while (i < n3.length) { n2(i / 27) += n3(i); i += 1 }
    Loaded(n3, n2, nScorable, threshold,
      spark.read.parquet(new Path(live, "hashes").toString),
      spark.read.parquet(new Path(live, "exact").toString),
      spark.read.parquet(new Path(live, "shingles").toString),
      spark.read.parquet(new Path(live, "buckets").toString))
  }

  /** ADVANCE the state by one accepted batch — the between-batches step
    * that closes the ingest loop: the documents a batch's screen let
    * through become part of the BASE the next batch screens against
    * (without it, two arriving batches could each be "novel" against the
    * settled corpus while duplicating each other across batches).
    * `accepted` is the batch's surviving (doc_id, text); its hash /
    * keeper / shingle / band-bucket rows are APPENDED to the four
    * relations as new parquet files (the IvfIndex.appendStream
    * discipline), so advance IO is **O(batch)** — never a rewrite of the
    * corpus-sized relations, which would hand back exactly the
    * O(corpus)-per-ingest cost this operator exists to avoid. The LM
    * model, threshold and scorable count stay FROZEN by design — quality
    * refit is an offline decision (`Pipeline.buildState` again), not a
    * per-batch side effect, or each batch would move its own bar; the
    * sidecar is never touched here.
    *
    * Durability contract (the appendStream trade): single writer,
    * advance BETWEEN batches — a screen racing an in-flight advance can
    * observe the batch partially folded (hash landed, buckets not yet)
    * and miss a near-dup of a just-accepted doc for that one read.
    * Replaying an advance after a crash is at-least-once-safe: the hash
    * anti-join is existence-only and candidate pairs are deduped before
    * verification, so duplicate rows cost bytes, not correctness — the
    * one observable effect is that re-counted bucket rows can push a hot
    * bucket over `bucketCap` sooner, degrading it to its representative
    * (the d3 cap semantics, stated, not a wrong answer). [[compact]]
    * reclaims the bytes and the replay duplicates. */
  def advance(spark: SparkSession, path: String,
              accepted: DataFrame, idCol: String, textCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, md5}
    val live = new Path(path)
    sweep(live.getFileSystem(spark.sessionState.newHadoopConf()), live)
    val batch = accepted.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text")).persist()
    try {
      val newSh = graft.dedup.IncrementalDedup
        .shingled(batch, "doc_id", "text").persist()
      try {
        batch.select(md5(col("text")).as("bh"))
          .write.mode("append").parquet(new Path(live, "hashes").toString)
        batch.write.mode("append").parquet(new Path(live, "exact").toString)
        newSh.write.mode("append").parquet(new Path(live, "shingles").toString)
        graft.dedup.IncrementalDedup.bucketsOf(newSh)
          .write.mode("append").parquet(new Path(live, "buckets").toString)
      } finally { newSh.unpersist(); () }
    } finally { batch.unpersist(); () }
  }

  /** COMPACT the state — the maintenance half of the append/compact
    * pair, like the serving index's: many [[advance]]s fragment the
    * relations into one small file set per batch (probe latency and
    * footer parses grow with file count), and a replayed advance leaves
    * duplicate rows. Rewrite each relation deduped (hashes by value,
    * keepers/shingles by doc_id, buckets by (doc_id, bucket)) through
    * [[save]]'s staged swap — the live state stays readable for the
    * whole rewrite and is replaced atomically; the frozen model rides
    * along unchanged. Unlike [[Pipeline.buildState]], nothing is
    * re-derived from the corpus: compaction IO is one read + one write
    * of the relations. */
  def compact(spark: SparkSession, path: String): Unit = {
    val st = load(spark, path)
    save(spark, path, st.n3, st.nScorable, st.threshold,
      st.baseHashes.distinct(),
      st.baseExact.dropDuplicates("doc_id"),
      st.baseSh.dropDuplicates("doc_id"),
      st.baseBuckets.dropDuplicates("doc_id", "bucket"))
  }

  /** Crash recovery (the IvfIndex.recover contract): a `.old-` sibling
    * means a save died after moving the live state aside — restore it if
    * nothing took its place; a `.tmp-` sibling is an unpublished stage —
    * drop it. */
  private def sweep(fs: FileSystem, live: Path): Unit = {
    val old = new Path(live.getParent, s".old-${live.getName}")
    if (fs.exists(old)) {
      if (!fs.exists(live)) fs.rename(old, live)
      else fs.delete(old, true)
    }
    fs.delete(new Path(live.getParent, s".tmp-${live.getName}"), true)
  }
}
