package graft

import graft.search.Search
import org.apache.spark.sql.functions._

/** The fused PqFit aggregate must reproduce the per-subspace k-means
  * trajectory BIT FOR BIT: same assignment arithmetic, same exact-decimal
  * sums, same means, same empty-cell retention — on real embeddings and
  * on an adversarial corpus with duplicate rows and tie-prone geometry.
  * The sim4/sim5/sim8 oracle hashes witness the same equality
  * cross-engine; this spec witnesses it against the ivfCentroids path the
  * fused form replaced.
  */
class PqFitSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  /** The pre-fusion pqCodebooks, verbatim: one ivfCentroids per slice. */
  private def perSubspace(df: org.apache.spark.sql.DataFrame, m: Int,
                          ksub: Int, iters: Int,
                          exact: Boolean): Array[Array[Array[Double]]] = {
    val dsub = dim / m
    (0 until m).map { j =>
      val sub = df.select(col("vec_id"),
        slice(col("embedding").cast("array<double>"), j * dsub + 1, dsub)
          .as("__sub"))
      Search.ivfCentroids(sub, "__sub", "vec_id", ksub, iters, exact)
    }.toArray
  }

  private def assertSame(a: Array[Array[Array[Double]]],
                         b: Array[Array[Array[Double]]]): Unit = {
    assert(a.length == b.length)
    for (j <- a.indices; c <- a(j).indices) {
      assert(java.util.Arrays.equals(a(j)(c), b(j)(c)),
        s"codebook cell ($j, $c) diverges:\n  per-subspace ${a(j)(c).mkString(",")}" +
          s"\n  fused        ${b(j)(c).mkString(",")}")
    }
  }

  test("fused fit == per-subspace fit, exact means, real embeddings") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val fused = Search.pqCodebooks(e, "embedding", "vec_id", dim,
      m = 8, ksub = 16, iters = 3, exactMeans = true)
    assertSame(perSubspace(e, 8, 16, 3, exact = true), fused)
  }

  test("fused fit == per-subspace fit at a different geometry (m=4, ksub=8)") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val fused = Search.pqCodebooks(e, "embedding", "vec_id", dim,
      m = 4, ksub = 8, iters = 2, exactMeans = true)
    assertSame(perSubspace(e, 4, 8, 2, exact = true), fused)
  }

  test("adversarial: duplicates, ties and empty cells keep parity") {
    // 12 rows over 3 distinct vectors — most cells stay EMPTY (retention
    // path) and assignments tie (strict-< lowest-cid tiebreak path)
    val rows = (0L until 12L).map { i =>
      (i, Array.tabulate(dim)(d => ((i % 3) + d % 2).toDouble))
    }
    val df = rows.toDF("vec_id", "embedding")
    val fused = Search.pqCodebooks(df, "embedding", "vec_id", dim,
      m = 8, ksub = 16, iters = 3, exactMeans = true)
    assertSame(perSubspace(df, 8, 16, 3, exact = true), fused)
  }

  test("codebooks are partitioning-invariant (exact mode)") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val a = Search.pqCodebooks(e.repartition(7), "embedding", "vec_id", dim,
      m = 8, ksub = 16, iters = 2, exactMeans = true)
    val b = Search.pqCodebooks(e.repartition(1), "embedding", "vec_id", dim,
      m = 8, ksub = 16, iters = 2, exactMeans = true)
    assertSame(a, b)
  }
}
