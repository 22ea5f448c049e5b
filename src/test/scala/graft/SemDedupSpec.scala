package graft

import graft.search.Search
import org.apache.spark.sql.functions._

/** Semantic dedup (d9): SemDeDup-style cluster-then-dedup-within-cell.
  * The oracle row hash-proves fit + assignment + pair policy on the
  * fixture; this spec pins the semantic invariants on corpora the fixture
  * can't express — exact-duplicate groups collapse to their min id, the
  * dominance policy's structural facts, and threshold monotonicity.
  */
class SemDedupSpec extends SparkSpec {

  private val dim = 16

  test("exact-duplicate groups collapse to the min id, dup_of = group min") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // 10 distinct prototypes, each duplicated 4× (ids interleaved so
    // group members are NOT id-adjacent), plus 10 unique singletons
    val protos = Array.fill(10, dim)(rnd.nextGaussian())
    val dups = for (g <- 0 until 10; r <- 0 until 4)
      yield ((r * 10 + g).toLong, protos(g).toSeq)
    val singles = (0 until 10).map(i =>
      ((100 + i).toLong, Array.fill(dim)(rnd.nextGaussian()).toSeq))
    val df = (dups ++ singles).toDF("vec_id", "embedding")
    val out = Search.semanticDedup(df, "embedding", "vec_id",
        nCentroids = 4, iters = 3, tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3)))
    val byId = out.map(t => t._1 -> t).toMap
    // identical vectors always share a cell, so every group collapses
    for (g <- 0 until 10) {
      val ids = (0 until 4).map(r => (r * 10 + g).toLong)
      val minId = ids.min
      assert(byId(minId)._2, s"group $g: min id $minId must be kept")
      ids.filter(_ != minId).foreach { id =>
        assert(!byId(id)._2 && byId(id)._3 == minId,
          s"group $g: $id should be dup_of $minId, got ${byId(id)}")
      }
    }
    // singletons survive (random 16-dim gaussians never hit cos ≥ 0.999)
    (100 until 110).foreach(i => assert(byId(i.toLong)._2, s"singleton $i dropped"))
  }

  test("structural invariants: dup_of < vec_id, −1 iff kept, same cell") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding"))
    val out = Search.semanticDedup(emb, "embedding", "vec_id",
        nCentroids = 8, iters = 3, tau = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(out.nonEmpty)
    val cidOf = out.map(t => t._1 -> t._2).toMap
    out.foreach { case (id, cid, kept, dupOf) =>
      assert(kept == (dupOf == -1L), s"$id: kept/dup_of disagree")
      if (!kept) {
        assert(dupOf < id, s"$id: dup_of $dupOf not lower")
        assert(cidOf(dupOf) == cid, s"$id: dup_of $dupOf in another cell")
      }
    }
    // the corpus keeps its distinct mass: at this tau most rows survive
    val keptN = out.count(_._3)
    info(s"kept $keptN of ${out.length} at tau=0.35")
    assert(keptN > out.length / 2)
  }

  test("threshold monotonicity: higher tau keeps weakly more rows") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding"))
    def keptAt(tau: Double): Long =
      Search.semanticDedup(emb, "embedding", "vec_id",
        nCentroids = 8, iters = 3, tau = tau)
        .filter(col("kept")).count()
    val k35 = keptAt(0.35); val k45 = keptAt(0.45); val k99 = keptAt(0.99)
    info(s"kept at tau 0.35/0.45/0.99: $k35/$k45/$k99")
    assert(k35 <= k45 && k45 <= k99)
    assert(k99 == emb.count(), "no near-identical pairs on this corpus at 0.99")
  }
}
