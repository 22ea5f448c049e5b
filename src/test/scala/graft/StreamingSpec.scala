package graft

import graft.encode._
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming pipelines driven through MemoryStream: incremental encode
  * appends vectors identical to the batch encoder; windowed aggregation
  * respects event-time windows; stateful per-user aggregates accumulate
  * across micro-batches.
  */
class StreamingSpec extends SparkSpec {

  private val params = EncoderParams(numHarmonics = 4)

  test("incremental encode: streamed fused vectors == batch encoder output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val layout = VectorLayout(Seq(DenseBlock("price", 0.0, 100.0, params)))

    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("id", "price")
    val q = Streaming.incrementalEncode(stream, layout)
      .select("id", "fused_vec")
      .writeStream.format("memory").queryName("enc_out").outputMode("append")
      .start()
    mem.addData((1L, 10.0), (2L, 55.0), (3L, 99.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("enc_out").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val batch = ProductEncoder.encode(
        Seq((1L, 10.0), (2L, 55.0), (3L, 99.0)).toDF("id", "price"), layout)
      .select("id", "fused_vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(streamed.keySet == Set(1L, 2L, 3L))
    streamed.foreach { case (id, v) =>
      v.zip(batch(id)).foreach { case (a, b) => assert(a == b, s"id=$id") }
    }
  }

  test("incremental encode: image blocks stream - media payloads encode on ingest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // dedup-on-ingest's sibling: media arriving on a stream is encoded
    // into the fused index vector incrementally, same narrow projection
    val layout = VectorLayout(Seq(graft.encode.ImageBlock("img", 2, 2)))
    val imgs = Seq(1L -> png(8, 8)((x, _) => x * 30),
      2L -> png(8, 8)((_, y) => y * 30),
      3L -> (null: Array[Byte]))
    val mem = MemoryStream[(Long, Array[Byte])]
    val stream = mem.toDF().toDF("id", "img")
    val q = Streaming.incrementalEncode(stream, layout)
      .select("id", "fused_vec")
      .writeStream.format("memory").queryName("img_enc_out").outputMode("append")
      .start()
    mem.addData(imgs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("img_enc_out").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val batch = ProductEncoder.encode(imgs.toDF("id", "img"), layout)
      .select("id", "fused_vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(streamed == batch)
    assert(streamed(3L) == Seq(0.0, 0.0, 0.0, 0.0, -1.0)) // missing payload indicator
  }

  test("session windows: streamed sessionization matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val data = Seq(
      (ts(10, 0), 1L, 1.0), (ts(10, 10), 1L, 2.0), // user 1, one session
      (ts(11, 0), 1L, 4.0),                        // gap 50m ≥ 30m → new session
      (ts(10, 5), 2L, 8.0))                        // user 2
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val q = Streaming.sessionize(
        mem.toDF().toDF("ts", "user_id", "value"), "30 minutes",
        watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_out")
      .select("user_id", "session_start", "session_end", "n", "sum_value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) ->
        ((r.getTimestamp(2), r.getLong(3), r.getDouble(4)))).toMap
    val batch = Streaming.sessionize(data.toDF("ts", "user_id", "value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) ->
        ((r.getTimestamp(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.keySet == Set((1L, ts(10, 0)), (1L, ts(11, 0)), (2L, ts(10, 5))))
    // session end = last event + gap (Spark session_window semantics)
    assert(streamed((1L, ts(10, 0)))._1 == ts(10, 40))
    assert(streamed((1L, ts(10, 0)))._2 == 2L)
  }

  test("hourly windowed aggregation with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.hourlyEventCounts(stream)
      .writeStream.format("memory").queryName("win_out").outputMode("update")
      .start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    mem.addData((ts(10, 5), "click", 1.0), (ts(10, 40), "click", 2.0),
      (ts(11, 10), "click", 4.0), (ts(10, 50), "view", 8.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out")
      .select(date_format(col("hour"), "HH").as("h"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows(("10", "click")) == (2L, 3.0))
    assert(rows(("11", "click")) == (1L, 4.0))
    assert(rows(("10", "view")) == (1L, 8.0))
  }

  test("incremental index end-to-end: streamed items become searchable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val layout = VectorLayout(Seq(DenseBlock("price", 0.0, 100.0, params)))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString

    val mem = MemoryStream[(Long, Double)]
    val q = Streaming.writeIndex(
      Streaming.incrementalEncode(mem.toDF().toDF("id", "price"), layout)
        .select("id", "price", "fused_vec"),
      s"$dir/index", s"$dir/ckpt").start()
    mem.addData((1L, 20.0), (2L, 50.0))
    q.processAllAvailable()
    mem.addData((3L, 52.0)) // arrives in a later micro-batch
    q.processAllAvailable()
    q.stop()

    // a search over the durable index sees ALL streamed items; the row
    // whose price matches the query centroid wins
    val idx = spark.read.parquet(s"$dir/index")
    assert(idx.count() == 3)
    val qv = graft.query.QueryEncoder.encode(layout,
      Map("price" -> graft.query.DensePointFilter("price", 51.0)))
    val top = graft.search.Search.fusedTopK(idx, "fused_vec", "id", qv, 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(top.head == 3L || top.head == 2L, s"top=$top") // 52 and 50 bracket 51
    assert(top.last == 1L, s"top=$top")                   // 20 is farthest
  }

  test("stateful running user aggregates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("user_id", "value")
    val q = Streaming.runningUserAggregates(stream)
      .writeStream.format("memory").queryName("user_out").outputMode("update")
      .start()
    mem.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
    q.processAllAvailable()
    mem.addData((1L, 5.0))
    q.processAllAvailable()
    q.stop()
    // last update per user wins
    val latest = spark.table("user_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
    assert(latest(1L) == (1L, 3L, 10.0)) // 2+3+5 over two batches
    assert(latest(2L) == (2L, 1L, 10.0))
  }

  test("streaming near-dup filter: first-seen wins, duplicates detected across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val dim = 8
    val base = Array(0.3, -0.7, 0.5, 0.9, -0.2, 0.4, -0.6, 0.1)
    val near = base.clone(); near(0) += 0.001 // cosine ≈ 1 AND same signature
    val far = Array(-0.3, 0.7, -0.5, -0.9, 0.2, -0.4, 0.6, -0.1) // antipode
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = Streaming.nearDupFilter(
        mem.toDF().toDF("id", "vec"), "vec", "id", dim, nBits = 4, tau = 0.9)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append")
      .start()
    mem.addData((1L, base.toSeq), (2L, base.toSeq)) // 2 = exact dup of 1
    q.processAllAvailable()
    mem.addData((3L, near.toSeq), (4L, far.toSeq))  // state persists: 3 dups 1
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out(1L) == ((true, -1L)), s"out=$out")
    assert(out(2L) == ((false, 1L)), s"out=$out")
    assert(out(3L) == ((false, 1L)), "cross-batch near-dup must hit batch-1 state")
    assert(out(4L)._1, "antipodal vector must be novel")
  }

  test("reconciliation: streaming near-dup recall vs the batch d7 pair set") {
    // The documented story (Streaming.nearDupFilter scaladoc): single-table
    // LSH dedup-on-ingest trades recall for one shuffle; run the batch
    // multi-table pair join (d7) offline to reconcile what single-probe
    // missed. This QUANTIFIES that trade on the real sf0.01 corpus: of the
    // docs the batch pair set proves have an earlier near-duplicate, how
    // many did the streaming filter drop?
    import graft.search.Search
    implicit val s = spark
    val dim = 64
    val tau = 0.40 // d7's threshold
    val base = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // the sf0.01 embeddings carry NO near-verbatim vector pairs (cos ≥ 0.9
    // count is zero — synthetic vectors, not text-derived), so the
    // must-catch tier below would be vacuous on the raw table: append
    // verbatim CLONES of every 97th vector under fresh (later) ids —
    // identical vectors agree on every hyperplane sign by construction
    val maxId = base.agg(max(col("vec_id"))).head().getLong(0)
    val e = base.unionByName(base.filter(col("vec_id") % 97 === 0)
      .select((col("vec_id") + maxId + 1).as("vec_id"), col("embedding")))
    // batch truth: the exact d7 shape — multi-table LSH candidates,
    // skew-capped join, exact cosine on candidates only
    val b = Search.lshBuckets(e, "embedding", dim, nBits = 4, nTables = 8)
      .select(col("vec_id"), col("bucket")).persist()
    try {
      val cand = Search.cappedBandPairs(b, "vec_id", "bucket")
        .select(Search.packPair(col("a_id"), col("b_id")).as("pair")).distinct()
        .select(Search.unpackPair(col("pair")): _*)
      val en = e.withColumn("__d", Search.asDouble(col("embedding")))
        .withColumn("__n", Search.l2Norm(col("__d")))
      val pairs = cand
        .join(en.select(col("vec_id").as("a_id"), col("__d").as("a_emb"),
          col("__n").as("a_n")), "a_id")
        .join(en.select(col("vec_id").as("b_id"), col("__d").as("b_emb"),
          col("__n").as("b_n")), "b_id")
        .withColumn("cosine",
          round(Search.dot(col("a_emb"), col("b_emb")) / (col("a_n") * col("b_n")), 5) + 0.0)
        .filter(col("cosine") >= tau)
        .select(col("a_id"), col("b_id"), col("cosine"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(pairs.nonEmpty, "sf0.01 corpus has no batch near-dup pairs at tau")
      // pair emission guarantees a_id < b_id, so the b side is the LATER doc
      // — the one ascending-id streaming ingest should have dropped
      val shouldDrop = pairs.map(_._2).toSet
      val strongDrop = pairs.filter(_._3 >= 0.9).map(_._2).toSet
      def recallsAt(probeHamming: Int): (Double, Double) = {
        val dec = Streaming.nearDupFilter(e, "embedding", "vec_id",
            dim, nBits = 3, tau = tau, maxPerBucket = 256,
            probeHamming = probeHamming)
          .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
        def recallOf(ids: Set[Long]): Double =
          if (ids.isEmpty) 1.0 else ids.count(id => !dec(id)).toDouble / ids.size
        (recallOf(shouldDrop), recallOf(strongDrop))
      }
      val (recall, strongRecall) = recallsAt(0)
      val (recallMp, strongMp) = recallsAt(1)
      info(s"batch pairs=${pairs.size}, docs-with-earlier-dup=${shouldDrop.size} " +
        s"(strong cos>=0.9: ${strongDrop.size}), single-probe recall=$recall " +
        s"strong=$strongRecall; Hamming-1 multi-probe recall=$recallMp strong=$strongMp")
      assert(strongDrop.nonEmpty, "strong tier must not be vacuous")
      // Floors pinned from the measured run: borderline cos≈τ pairs mostly
      // land in different single-table buckets — exactly the documented
      // trade batch d7 reconciles offline — while near-verbatim duplicates
      // agree on every hyperplane sign and MUST all be caught. A drop below
      // either floor means bucketing/state/greedy-matching regressed, not
      // data drift (inputs are pinned).
      assert(recall >= 0.30, s"streaming-vs-batch recall $recall below floor")
      assert(strongRecall >= 0.99,
        s"strong-pair (near-verbatim) recall $strongRecall below floor")
      // Hamming-1 probing (r9 ask #5) must recover most of what single-probe
      // misses: P(signature within 1 bit) vs P(identical) at nBits=3
      assert(recallMp >= 0.70,
        s"multi-probe recall $recallMp below floor (single-probe was $recall)")
      assert(strongMp >= 0.99, s"multi-probe strong recall $strongMp")
      assert(recallMp > recall,
        s"multi-probe ($recallMp) must beat single-probe ($recall)")
      // finally: a failed assert must not leak the persisted bucket
      // relation into the rest of the shared-session suite
    } finally spark.catalog.clearCache()
  }

  test("multi-probe near-dup runs as a STREAM (update mode), state persists across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val dim = 8
    val base = Array(0.3, -0.7, 0.5, 0.9, -0.2, 0.4, -0.6, 0.1)
    val near = base.clone(); near(0) += 0.001
    val far = base.map(-_)
    val mem = MemoryStream[(Long, Seq[Double])]
    // the per-doc probe merge is a streaming aggregation → Update mode
    val q = Streaming.nearDupFilter(
        mem.toDF().toDF("id", "vec"), "vec", "id", dim, nBits = 4, tau = 0.9,
        probeHamming = 1)
      .writeStream.format("memory").queryName("mp_out").outputMode("update")
      .start()
    mem.addData((1L, base.toSeq), (2L, base.toSeq))
    q.processAllAvailable()
    mem.addData((3L, near.toSeq), (4L, far.toSeq))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("mp_out").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out(1L) == ((true, -1L)), s"out=$out")
    assert(out(2L) == ((false, 1L)), s"out=$out")
    assert(out(3L) == ((false, 1L)), "cross-batch dup must hit batch-1 state")
    assert(out(4L)._1, "antipodal vector must be novel")
    // each doc emits exactly once (probe verdicts merged, no re-emission)
    assert(spark.table("mp_out").count() == 4)
  }

  test("multi-probe static == multi-probe streamed; catches a one-bit-away near-dup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val dim = 16
    val rnd = new scala.util.Random(7)
    val docs = (1L to 40L).scanLeft((0L, Seq.fill(dim)(0.0))) { case ((_, prev), i) =>
      if (i % 4 == 0) (i, prev.map(_ + rnd.nextDouble() * 0.01)) // near-dup of prev
      else (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    }.tail
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = Streaming.nearDupFilter(
        mem.toDF().toDF("id", "vec"), "vec", "id", dim, nBits = 6, tau = 0.95,
        probeHamming = 1)
      .writeStream.format("memory").queryName("mp_parity").outputMode("update")
      .start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("mp_parity").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    val batch = Streaming.nearDupFilter(
        docs.toDF("id", "vec"), "vec", "id", dim, nBits = 6, tau = 0.95,
        probeHamming = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    // multi-probe must be a superset of single-probe's catches on same rows
    val single = Streaming.nearDupFilter(
        docs.toDF("id", "vec"), "vec", "id", dim, nBits = 6, tau = 0.95)
      .collect().filter(!_.getBoolean(1)).map(_.getLong(0)).toSet
    val multi = batch.filter(!_._2).map(_._1)
    assert(single.subsetOf(multi),
      s"multi-probe lost single-probe catches: ${single -- multi}")
  }

  test("streaming near-dup filter == static batch run on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val dim = 16
    val rnd = new scala.util.Random(3)
    // 30 random docs, every third an exact duplicate of the previous
    val docs = (1L to 30L).scanLeft((0L, Seq.fill(dim)(0.0))) { case ((_, prev), i) =>
      if (i % 3 == 0) (i, prev) else (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    }.tail
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = Streaming.nearDupFilter(
        mem.toDF().toDF("id", "vec"), "vec", "id", dim, nBits = 6, tau = 0.95)
      .writeStream.format("memory").queryName("dedup_parity").outputMode("append")
      .start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dedup_parity").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    val batch = Streaming.nearDupFilter(
        docs.toDF("id", "vec"), "vec", "id", dim, nBits = 6, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    // every third doc duplicates its predecessor: same vector → same
    // signature → must be flagged
    docs.filter(_._1 % 3 == 0).foreach { case (i, _) =>
      assert(streamed.contains((i, false, i - 1)), s"doc $i not flagged as dup of ${i - 1}")
    }
  }

  // -- streaming curation gate (st5's operator) --------------------------

  /** Fixture texts: `good*` pass the gate (all-lowercase-alpha, ≥ 12
    * tokens); `junk` fails the alpha-ratio gate (digits), `short` fails
    * the token floor. good2 is a verbatim copy of good1. */
  private val good1 = "the quick brown fox jumps over the lazy dog again and again"
  private val good2 = good1
  private val good3 = "pack my box with five dozen fine brown quality liquor jugs today"
  private val junk = "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890 1234 5678"
  private val short = "too short to pass"

  test("curation gate: quality rejects never reach the output or the state") {
    implicit val s = spark
    import spark.implicits._
    val out = Streaming.curationGate(
        Seq((1L, good1), (2L, junk), (3L, short)).toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    assert(out == Set((1L, true, -1L)),
      s"gate must pass only the quality doc, got $out")
  }

  test("curation gate: null and empty texts are gate rejects, never crashes") {
    implicit val s = spark
    import spark.implicits._
    val out = Streaming.curationGate(
        Seq((1L, good1), (2L, null.asInstanceOf[String]), (3L, ""), (4L, "  "))
          .toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), s"degenerate texts must be rejected by the gate, got $out")
  }

  test("curation gate: cross-batch exact dedup — a later batch's copy maps to the first batch's keeper") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.curationGate(mem.toDF().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream.format("memory").queryName("curation_out").outputMode("append")
      .start()
    mem.addData((1L, good1), (2L, good2)) // 2 = in-batch copy of 1
    q.processAllAvailable()
    mem.addData((3L, good1), (4L, good3), (5L, junk)) // 3 = cross-batch copy
    q.processAllAvailable()
    q.stop()
    val out = spark.table("curation_out").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out(1L) == ((true, -1L)), s"out=$out")
    assert(out(2L) == ((false, 1L)), "in-batch duplicate must map to the batch keeper")
    assert(out(3L) == ((false, 1L)), "cross-batch duplicate must hit batch-1 state")
    assert(out(4L) == ((true, -1L)), "distinct content is novel")
    assert(!out.contains(5L), "gate reject must not be emitted")
  }

  test("curation gate: streamed decisions == static batch run on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // tokens ≥ 5 chars keep alpha_ratio (letters / letters+spaces) above
    // the 0.8 gate — the point here is dedup parity, not gate rejection
    def sentence(): String =
      Seq.fill(15)("abcdefghijklmnop".charAt(rnd.nextInt(16)).toString * (5 + rnd.nextInt(5))).mkString(" ")
    // 24 docs, every fourth a verbatim copy of its predecessor
    val docs = (1L to 24L).scanLeft((0L, "")) { case ((_, prev), i) =>
      if (i % 4 == 0) (i, prev) else (i, sentence())
    }.tail
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.curationGate(mem.toDF().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream.format("memory").queryName("curation_parity").outputMode("append")
      .start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curation_parity").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    val batch = Streaming.curationGate(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    docs.filter(_._1 % 4 == 0).foreach { case (i, _) =>
      assert(streamed.contains((i, false, i - 1)), s"doc $i not flagged as dup of ${i - 1}")
    }
  }

  test("curation gate min-fold mode: flag-off bit-identical, flag-on folds arrival order without the sort") {
    implicit val s = spark
    import spark.implicits._
    // ids deliberately DESCENDING in arrival order: the id-ordered default
    // must pick the min id as keeper regardless, the incremental mode the
    // first ARRIVAL — the one stated semantic difference between the modes
    val docs = Seq((9L, good1), (5L, good1), (2L, good1), (7L, good3))
      .toDF("doc_id", "text").coalesce(1)
    def run(flag: Boolean) = Streaming.curationGate(
        docs, "text", "doc_id", idOrderedBatches = flag)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    // flag OFF (explicit) is bit-identical to the default signature — the
    // st5-oracle-hashed path is untouched by the flag's existence
    val default = Streaming.curationGate(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    assert(run(flag = true) == default)
    assert(default == Set((2L, true, -1L), (5L, false, 2L), (9L, false, 2L), (7L, true, -1L)),
      s"id-ordered mode must keep the min id: $default")
    // flag ON: keeper is the first-arrived copy (9 arrived first); the
    // group is folded one row at a time — rows.map, no toSeq/sort — so a
    // degenerate batch never buffers its copies to pick the keeper
    assert(run(flag = false) ==
      Set((9L, true, -1L), (5L, false, 9L), (2L, false, 9L), (7L, true, -1L)))
    // degenerate batch: 50k copies of ONE text in a single batch — the
    // incremental fold must process it and emit exactly one keeper
    val big = (1L to 50000L).map(i => (i, good1)).toDF("doc_id", "text").coalesce(1)
    val dec = Streaming.curationGate(big, "text", "doc_id", idOrderedBatches = false)
      .groupBy(col("novel")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(dec == Map(true -> 1L, false -> 49999L),
      s"one keeper, everyone else its duplicate: $dec")
  }
}
