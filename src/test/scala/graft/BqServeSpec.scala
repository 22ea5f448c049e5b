package graft

import graft.search.Search
import graft.serve.IvfIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** IVF+binary serving: the 64×-compressed tier. Same two-axis pruning
  * contract as IVF+PQ/SQ8 (directories via the cid filter, columns via
  * the (id, sig) projection — ⌈dim/64⌉ longs instead of dim doubles),
  * with Hamming shortlist + mandatory exact refine; at full probe and a
  * corpus-sized shortlist the refined top-k must equal the exact index's.
  */
class BqServeSpec extends SparkSpec {

  private val nCents = 8
  private val dim = 64

  private lazy val built: IvfIndex.BqHandle = {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val path = java.nio.file.Files.createTempDirectory("graft-ivfbq").toString
    IvfIndex.writeBq(emb, "embedding", "vec_id", path,
      nCentroids = nCents, iters = 3, dim = dim)
  }

  private lazy val q0: Array[Double] = Tables.embeddings(spark, sf("sf0.001"))
    .filter(col("vec_id") === 7L).select("embedding")
    .head().getSeq[Float](0).map(_.toDouble).toArray

  test("sidecars round-trip: centroids AND thresholds, no scan") {
    val h = built
    val reopened = IvfIndex.openBq(spark, h.path)
    assert(reopened.dim == dim)
    assert(reopened.thresholds.toSeq == h.thresholds.toSeq)
    (reopened.centroids, h.centroids).zipped.foreach { (a, b) =>
      assert(a.toSeq == b.toSeq) }
  }

  test("shortlist scan prunes directories AND columns: sig words read, vectors not") {
    val h = built
    // drive the shortlist phase alone (the first job inside probedTopKBq):
    // project (id, sig), Hamming, limit — and inspect its executed scan
    val cells = IvfIndex.probeCells(
      IvfIndex.Handle(h.path, h.centroids), q0, 2)
    val qSig = q0.indices.grouped(64).map { idxs =>
      idxs.foldLeft(0L) { (w, i) =>
        if (q0(i) > h.thresholds(i)) w | (1L << (i % 64)) else w
      }
    }.toSeq
    val df = IvfIndex.prunedScan(spark, IvfIndex.Handle(h.path, h.centroids), cells)
      .select(col("id"), col("sig"))
      .withColumn("hamming", Search.hammingDistance(col("sig"), typedLit(qSig)))
      .orderBy(col("hamming"), col("id")).limit(40)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val schema = scans.map(_.requiredSchema.fieldNames.toSeq).head
    assert(schema.contains("sig") && schema.contains("id"),
      s"shortlist scan must read id+sig: $schema")
    assert(!schema.contains("v") && !schema.contains("vn"),
      s"shortlist scan must NOT read the exact vectors: $schema")
    // directory pruning: only the probed cells' files
    val probedFiles = cells.map { c =>
      new java.io.File(s"${h.path}/cid=$c").listFiles()
        .count(_.getName.endsWith(".parquet"))
    }.sum
    assert(scans.map(_.metrics("numFiles").value).sum == probedFiles)
  }

  test("full probe + corpus-wide shortlist == the exact index's top-k") {
    val h = built
    val n = Tables.embeddings(spark, sf("sf0.001")).count().toInt
    val refined = IvfIndex.probedTopKBq(spark, h, q0, nProbe = nCents,
        k = 10, shortlist = n)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // exact tier on the same layout (writeBq keeps v/vn like write does)
    val exact = IvfIndex.probedTopK(spark,
        IvfIndex.Handle(h.path, h.centroids), q0, nProbe = nCents, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(refined == exact,
      "corpus-wide-shortlist binary serving must equal exact serving")
  }

  test("batched binary serving == P sequential calls, bit-identical") {
    val h = built
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = Seq(3L, 7L, 11L, 13L).map { id =>
      emb.filter(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray
    }
    val batch = IvfIndex.probedTopKBqBatch(spark, h, queries, nProbe = 3,
      k = 5, shortlist = 30)
    val seq = queries.map { q =>
      IvfIndex.probedTopKBq(spark, h, q, nProbe = 3, k = 5, shortlist = 30)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    (batch, seq).zipped.foreach { (b, s) =>
      assert(b == s, s"batched $b != sequential $s")
    }
  }

  test("calibrateShortlistBq: minimal shortlist meeting the target, monotone curve") {
    val h = built
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val n = emb.count().toInt
    val sample = Seq(3L, 7L, 11L).map { id =>
      emb.filter(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray
    }
    val target = 0.6
    val (chosen, curve) = IvfIndex.calibrateShortlistBq(spark, h, sample,
      nProbe = nCents, k = 5, target = target, maxShortlist = n)
    info(s"chosen shortlist=$chosen; curve=${curve.map { case (s, r) => f"$s:$r%.2f" }.mkString(", ")}")
    val m = curve.toMap
    assert(m(chosen) >= target)
    // minimality among the measured levels below the chosen one
    curve.filter(_._1 < chosen).foreach { case (s, r) =>
      assert(r < target, s"shortlist $s already met the target but $chosen chosen")
    }
    // monotone within measurement (identical candidate-set growth)
    curve.sliding(2).foreach {
      case Seq((s1, r1), (s2, r2)) =>
        assert(r2 >= r1 - 1e-9, s"recall dropped $s1:$r1 -> $s2:$r2")
      case _ =>
    }
  }

  test("calibrateShortlistBq: an infeasible target THROWS instead of silently returning maxShortlist") {
    val h = built
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val sample = Seq(3L, 7L, 11L).map { id =>
      emb.filter(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray
    }
    // shortlist capped at k on the 64×-lossy binary tier: perfect recall is
    // unreachable, and the old code returned (maxShortlist, curve) exactly
    // like a success — a caller would deploy believing target met
    val e = intercept[IllegalStateException] {
      IvfIndex.calibrateShortlistBq(spark, h, sample,
        nProbe = nCents, k = 5, target = 1.0, maxShortlist = 5)
    }
    assert(e.getMessage.contains("infeasible"))
  }

  test("probed binary serving: sane recall at a 40-candidate shortlist") {
    val h = built
    val got = IvfIndex.probedTopKBq(spark, h, q0, nProbe = nCents,
        k = 10, shortlist = 40)
      .collect().map(_.getLong(0)).toSet
    assert(got.size == 10)
    val exact = IvfIndex.probedTopK(spark,
        IvfIndex.Handle(h.path, h.centroids), q0, nProbe = nCents, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    info(s"binary(shortlist=40) recall@10 vs exact: $recall")
    // the 64×-compression trade on the adversarial random corpus: must
    // beat chance (40/~600) clearly; real corpora with cluster structure
    // do far better (PqSpec's clustered-corpus precedent)
    assert(recall >= 0.2, s"below floor: $recall")
  }
}
