package graft

import graft.dedup.IncrementalDedup
import graft.incremental.IncrementalState
import graft.serve.IvfIndex
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The production INGEST LOOP, composed end-to-end from the parts the
  * incremental block proves separately: arriving micro-batches pass the
  * st5 streaming curation gate (quality + exact dedup with cross-batch
  * state), the gate's novel survivors are screened against the SETTLED
  * base via the d10 incremental near-dup screen running WARM off
  * persisted IncrementalState, and the screen's novel docs are appended
  * to the live IVF serving index (IvfIndex.appendStream) where a probed
  * query finds them — while every rejected document (gate-fail, exact
  * dup, near-dup-of-base) provably never reaches the index. */
class IngestLoopSpec extends SparkSpec {
  import spark.implicits._

  private val baseA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val baseB = "one two three four five six seven eight nine ten eleven"
  private val novel1 = "quantum chromatic lattice verse mountain ember topaz river echo harbor"
  private val novel2 = "silver canyon whisper orbit maple thunder quartz meadow saffron gale"

  /** Deterministic unit vector per text — stands in for the embedder so
    * the streamed vector and the later query vector provably agree. */
  private def vec(text: String, dim: Int = 8): Seq[Double] = {
    val rnd = new scala.util.Random(text.hashCode.toLong & 0x7fffffffL)
    val raw = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  test("ingest loop: stream gate → warm incremental screen → index append → probed serving") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext

    // ---- settled state: base corpus, persisted screen state, live index
    val base = Seq((10L, baseA), (11L, baseB)).toDF("doc_id", "text")
    val stateDir = java.nio.file.Files
      .createTempDirectory("ingest-state").resolve("state").toString
    val bsh = IncrementalDedup.shingled(base, "doc_id", "text")
    IncrementalState.save(spark, stateDir, new Array[Long](27 * 27 * 27), 0L,
      None, Seq.empty[String].toDF("bh"), base, bsh,
      IncrementalDedup.bucketsOf(bsh), Seq.empty[String].toDF("g"))
    val idxPath = java.nio.file.Files.createTempDirectory("ingest-idx").toString
    val h = IvfIndex.write(
      Seq((10L, vec(baseA)), (11L, vec(baseB))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", idxPath, nCentroids = 2, iters = 2)

    // ---- two arriving micro-batches through the st5 gate ----
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.curationGate(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", minTokens = 5, alphaMin = 0.5)
      .writeStream.format("memory").queryName("ingest_gate")
      .outputMode("append").start()
    mem.addData((100L, novel1), (101L, "too short"),
      (102L, baseA + " lambda mu"), (103L, novel1))
    q.processAllAvailable()
    mem.addData((104L, novel1), (105L, novel2)) // 104: cross-batch exact dup
    q.processAllAvailable()
    q.stop()
    val gate = spark.table("ingest_gate").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(!gate.contains(101L), "gate-fail doc must never reach the stateful step")
    assert(gate(103L) == ((false, 100L)), "within-batch exact dup maps to its keeper")
    assert(gate(104L) == ((false, 100L)), "cross-batch exact dup must hit batch-1 state")
    val survivors = gate.collect { case (id, (true, _)) => id }.toSeq.sorted
    assert(survivors == Seq(100L, 102L, 105L), s"gate survivors: $survivors")

    // ---- d10 screen of the survivors, WARM off the persisted state ----
    val st = IncrementalState.load(spark, stateDir)
    val deltaTexts = Map(100L -> novel1, 102L -> (baseA + " lambda mu"), 105L -> novel2)
    val screened = IncrementalDedup.screenPrepared(st.baseSh, st.baseBuckets,
        survivors.map(id => (id, deltaTexts(id))).toDF("doc_id", "text"),
        "doc_id", "text", tau = 0.8)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(screened(102L) == ((false, 10L)),
      "near-verbatim copy of a base doc must map to the base keeper")
    val novelIds = screened.collect { case (id, (true, -1L)) => id }.toSeq.sorted
    assert(novelIds == Seq(100L, 105L), s"novel after screen: $novelIds")

    // ---- append the novel docs' vectors to the live index, serve them ----
    val vmem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("ingest-ckpt").toString
    val vq = IvfIndex.appendStream(vmem.toDF().toDF("vec_id", "embedding"),
      "embedding", "vec_id", h, ckpt).start()
    vmem.addData(novelIds.map(id => (id, vec(deltaTexts(id)))): _*)
    vq.processAllAvailable()
    vq.stop()
    val served = spark.read.parquet(h.path)
    assert(served.count() == 4, "index must hold exactly base 2 + novel 2 rows")
    assert(served.filter(col("id").isin(101L, 102L, 103L, 104L)).count() == 0,
      "no rejected document may reach the serving index")
    val top1 = IvfIndex.probedTopK(spark, h, vec(novel1).toArray, nProbe = 2, k = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top1.head == ((100L, 1.0)),
      s"a just-ingested novel doc must be its own probed top hit: ${top1.toSeq}")
    val topBase = IvfIndex.probedTopK(spark, h, vec(baseA).toArray, nProbe = 2, k = 1)
      .collect().map(_.getLong(0))
    assert(topBase.head == 10L, "the settled base must still serve after the append")

    // ---- close the loop: ADVANCE the state by the accepted batch, so
    // the NEXT batch's near-dups of batch-1 survivors are caught ----
    IncrementalState.advance(spark, stateDir,
      novelIds.map(id => (id, deltaTexts(id))).toDF("doc_id", "text"),
      "doc_id", "text")
    val st2 = IncrementalState.load(spark, stateDir)
    // verbatim copies: identical shingle sets band identically, so the
    // catch is deterministic (a 0.83-Jaccard near-dup is caught only with
    // the banding probability — d10's stated LSH semantics)
    val batch2 = Seq((200L, novel1), (201L, baseB)).toDF("doc_id", "text")
    val screened2 = IncrementalDedup.screenPrepared(st2.baseSh, st2.baseBuckets,
        batch2, "doc_id", "text", tau = 0.8)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(screened2(200L) == ((false, 100L)),
      "a copy of a batch-1 SURVIVOR must be caught by the advanced state")
    assert(screened2(201L) == ((false, 11L)),
      "a copy of the original base must still be caught after the advance")

    // ---- TAKE-DOWN: the loop's subtraction half — remove doc 100 from
    // the curation state AND the serving index in one maintenance pass;
    // its copies must re-screen novel and its vector must stop serving,
    // while every other keeper keeps shielding and serving
    IncrementalState.remove(spark, stateDir, Seq(100L))
    IvfIndex.delete(spark, h, Seq(100L))
    val st3 = IncrementalState.load(spark, stateDir)
    val screened3 = IncrementalDedup.screenPrepared(st3.baseSh, st3.baseBuckets,
        Seq((300L, novel1), (301L, novel2)).toDF("doc_id", "text"),
        "doc_id", "text", tau = 0.8)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(screened3(300L) == ((true, -1L)),
      "a copy of the taken-down doc must screen NOVEL again")
    assert(screened3(301L) == ((false, 105L)),
      "the other accepted keeper must still shield its copies")
    val topAfter = IvfIndex.probedTopK(spark, h, vec(novel1).toArray, nProbe = 2, k = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(!topAfter.contains(100L),
      s"the taken-down doc's vector must not serve: $topAfter")
    assert(IvfIndex.probedTopK(spark, h, vec(novel2).toArray, nProbe = 2, k = 1)
      .collect().head.getLong(0) == 105L,
      "the surviving accepted doc must still be its own top hit")
    spark.catalog.clearCache()
  }

  test("warmScreenAccepted survives the advance it precedes (lineage truncation regression)") {
    // The accepted frame's PLAN reads the state relations (hash anti-join,
    // screen). advance() appends files under those paths, and Spark's
    // recacheByPath then RECOMPUTES path-dependent cache entries — a
    // merely-persisted result would re-evaluate against the advanced
    // state and anti-join its own rows away (measured in IngestLoopBench:
    // replays and downstream writes went empty). warmScreenAccepted
    // returns an eager localCheckpoint, so the decided rows stay decided.
    val stateDir = java.nio.file.Files
      .createTempDirectory("ingest-acc").resolve("state").toString
    val base = Seq((10L, baseA)).toDF("doc_id", "text")
    val bsh = IncrementalDedup.shingled(base, "doc_id", "text")
    IncrementalState.save(spark, stateDir, new Array[Long](27 * 27 * 27), 0L,
      None, base.select(org.apache.spark.sql.functions.md5(col("text")).as("bh")),
      base, bsh, IncrementalDedup.bucketsOf(bsh), Seq.empty[String].toDF("g"))
    // two gate-passing novel docs (≥12 tokens, alpha ≥ 0.8)
    val t1 = "quantum chromatic lattice verse mountain ember topaz river echo harbor silver canyon"
    val t2 = "violet summit crater onyx meadow harbor lantern spruce velvet marble cobalt prairie"
    val batch = Seq((100L, "s", t1), (101L, "s", t2)).toDF("doc_id", "source", "text")
    val acc = graft.queries.Pipeline.warmScreenAccepted(spark, stateDir, batch)
    val before = acc.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(before.map(_._1) == Seq(100L, 101L), s"both novel docs must be accepted: $before")
    IncrementalState.advance(spark, stateDir, acc, "doc_id", "text")
    val after = acc.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(after == before,
      "the accepted rows must not re-evaluate against the advanced state " +
        "(recacheByPath would anti-join them away without lineage truncation)")
    // and the advance actually folded them in: their replay screens as dups
    val st = IncrementalState.load(spark, stateDir)
    val rescreen = IncrementalDedup.screenPrepared(st.baseSh, st.baseBuckets,
        Seq((200L, t1)).toDF("doc_id", "text"), "doc_id", "text", 0.8)
      .collect().map(r => (r.getBoolean(1), r.getLong(2))).toSeq
    assert(rescreen == Seq((false, 100L)),
      s"the advanced state must catch a copy of the accepted doc: $rescreen")
    spark.catalog.clearCache()
  }
}
