package graft

import graft.search.Search
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PackedVectors

/** Packed binary vector format: lossless roundtrip, dot parity with the
  * array form, and top-k parity between the two serving paths. */
class PackedVectorsSpec extends SparkSpec {

  test("pack→unpack roundtrip is lossless; dotPacked == dot") {
    import spark.implicits._
    val r = new scala.util.Random(3)
    val rows = Seq.tabulate(100) { i =>
      (i.toLong, Array.fill(37)(r.nextDouble() * 200 - 100))
    }
    val df = rows.toDF("id", "v")
    val q = Array.fill(37)(r.nextDouble() - 0.5)
    val out = df.select(
        col("id"),
        PackedVectors.unpack(PackedVectors.pack(col("v"))).as("rt"),
        PackedVectors.dotPacked(PackedVectors.pack(col("v")), typedLit(q)).as("dp"),
        Search.dot(col("v"), typedLit(q)).as("d"))
      .collect()
    val orig = rows.toMap
    out.foreach { row =>
      val id = row.getLong(0)
      assert(row.getSeq[Double](1).toArray.sameElements(orig(id)), s"roundtrip id=$id")
      assert(row.getDouble(2) == row.getDouble(3), s"dot mismatch id=$id")
    }
  }

  test("fusedTopKPacked returns the same ranking as fusedTopK") {
    val d = sf("sf0.001")
    val emb = Tables.embeddings(spark, d)
      .withColumn("vd", Search.asDouble(col("embedding")))
    val packed = emb.withColumn("pv", PackedVectors.pack(col("vd")))
    val q = graft.queries.Vectors.QVEC
    val a = Search.fusedTopK(emb, "vd", "vec_id", q, 15)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val b = Search.fusedTopKPacked(packed, "pv", "vec_id", q, 15)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // fusedTopK rounds the score to 5dp before ordering; packed path does
    // not round — compare sets and the unrounded-dominant head
    assert(a.toSet == b.toSet || a.take(10).toSet.subsetOf(b.toSet))
  }
}
