package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.KMinValues
import org.apache.spark.sql.graft.KMinValues._

/** KMV distinct-count sketch: exact below k, estimator accuracy above k,
  * merge/partitioning invariance (the mergeability claim), and the
  * deterministic closed form the DuckDB twin reproduces. */
class KMinValuesSpec extends SparkSpec {

  private def estimate(n: Int, k: Int, parts: Int): Double = {
    import spark.implicits._
    val df = spark.sparkContext
      .parallelize((1 to n).map(i => s"value-$i"), parts).toDF("v")
    df.agg(kmvDistinct(hash52(col("v")), k)).head().getDouble(0)
  }

  test("below k the sketch holds the whole set: exact count") {
    assert(estimate(n = 100, k = 256, parts = 4) == 100.0)
    assert(estimate(n = 0, k = 16, parts = 1) == 0.0)
  }

  test("above k the (k-1)/h_k estimate lands within 15% on 20k distincts") {
    val est = estimate(n = 20000, k = 512, parts = 8)
    assert(est > 20000 * 0.85 && est < 20000 * 1.15, s"estimate $est")
  }

  test("estimate is identical across partitionings (mergeable state)") {
    val a = estimate(n = 5000, k = 128, parts = 1)
    val b = estimate(n = 5000, k = 128, parts = 16)
    assert(a == b, s"$a vs $b")
    assert(a != 5000.0) // really the estimator branch, not exact
  }

  test("duplicates don't move the estimate (distinct semantics)") {
    import spark.implicits._
    val once = (1 to 3000).map(i => s"v$i")
    val tripled = once ++ once ++ once
    val e1 = once.toDF("v").agg(kmvDistinct(hash52(col("v")), 64)).head().getDouble(0)
    val e3 = tripled.toDF("v").repartition(7)
      .agg(kmvDistinct(hash52(col("v")), 64)).head().getDouble(0)
    assert(e1 == e3)
  }

  test("closed form matches a driver-side recomputation (the oracle's math)") {
    import spark.implicits._
    val vals = (1 to 1000).map(i => s"doc $i")
    val k = 32
    val spark2 = spark
    val est = vals.toDF("v").agg(kmvDistinct(hash52(col("v")), k)).head().getDouble(0)
    // driver twin: k-th smallest 52-bit md5-prefix hash, (k-1)/h_k
    val hashes = vals.map { v =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(v.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, HexDigits), 16)
    }.distinct.sorted
    val hk = hashes(k - 1).toDouble / HashSpace
    assert(est == (k - 1).toDouble / hk)
  }

  test("hash52 stays in [0, 2^52) and nulls are skipped") {
    import spark.implicits._
    val hs = (1 to 500).map(_.toString).toDF("v")
      .select(hash52(col("v")).as("h")).collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0 && h < HashSpace.toLong))
    val withNulls = Seq(Some("a"), None, Some("b"), None)
      .toDF("v").agg(kmvDistinct(hash52(col("v")), 16)).head().getDouble(0)
    assert(withNulls == 2.0)
  }
}
