package graft

import graft.search.Search
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorSum
import org.apache.spark.sql.types.DecimalType

/** Native whole-vector sum aggregate: exact mode must be BIT-IDENTICAL to
  * the posexplode + DECIMAL(28,6) formulation it replaces (the sim3 oracle
  * twin re-runs that decimal arithmetic in DuckDB), at any partitioning.
  */
class VectorSumSpec extends SparkSpec {

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    // magnitudes spanning 6 decades so the 6-dp quantization actually
    // rounds (pure ±1 data would be exactly representable)
    (0L until n.toLong).map { i =>
      (i, (i % 5).toInt, Array.fill(dim)(r.nextGaussian() * math.pow(10, r.nextInt(6) - 3)))
    }
  }

  test("exact sums == posexplode + DECIMAL(28,6) sum, bit-identical, any partitioning") {
    import spark.implicits._
    for (parts <- Seq(1, 7)) {
      val df = randVecs(400, 24, 42L).toDF("id", "g", "v").repartition(parts)
      val got = df.groupBy("g")
        .agg(VectorSum.sums(col("v"), exact = true).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      val old = df.select(col("g"), posexplode(col("v")).as(Seq("pos", "val")))
        .groupBy("g", "pos")
        .agg(sum(col("val").cast(DecimalType(28, 6))).cast("double").as("s"))
        .collect().groupBy(_.getInt(0))
        .map { case (g, rs) =>
          g -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      assert(got.keySet == old.keySet)
      got.foreach { case (g, s) =>
        assert(s == old(g), s"group $g diverged at parts=$parts")
      }
    }
  }

  test("fast sums match plain double sums on exactly-representable data") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, (i % 3).toInt,
      Array.tabulate(8)(d => (i + d).toDouble))).toDF("id", "g", "v")
    val got = df.groupBy("g").agg(VectorSum.sums(col("v"), exact = false).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val old = df.select(col("g"), posexplode(col("v")).as(Seq("pos", "val")))
      .groupBy("g", "pos").agg(sum(col("val")).as("s"))
      .collect().groupBy(_.getInt(0))
      .map { case (g, rs) => g -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    assert(got == old)
  }

  test("null vectors skipped; single-group aggregation over no rows yields null") {
    import spark.implicits._
    val df = Seq((0, Some(Seq(1.0, 2.0))), (0, None), (0, Some(Seq(3.5, -1.0))))
      .toDF("g", "v")
    val s = df.groupBy("g").agg(VectorSum.sums(col("v"), exact = true).as("s"))
      .head().getSeq[Double](1)
    assert(s == Seq(4.5, 1.0))
    val empty = df.filter(col("g") === 99)
      .agg(VectorSum.sums(col("v"), exact = true).as("s")).head()
    assert(empty.isNullAt(0))
  }

  test("ivfCentroids exact fit == former explode+DECIMAL formulation") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val data = randVecs(300, 16, 9L).map { case (i, _, v) => (i, v) }
    val df = data.toDF("vec_id", "embedding")
    val got = Search.ivfCentroids(df, "embedding", "vec_id", 4, 2, exactMeans = true)
    // re-run the former formulation inline
    val base = df.select(col("vec_id").cast("long").as("id"),
      Search.asDouble(col("embedding")).as("v"))
    var cents: Array[Array[Double]] = base.orderBy("id").limit(4)
      .collect().map(_.getSeq[Double](1).toArray)
    for (_ <- 1 to 2) {
      val means = base.withColumn("cid", Search.ivfAssign(col("v"), cents))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "val")))
        .groupBy("cid", "pos")
        .agg((sum(col("val").cast(DecimalType(28, 6))).cast("double") /
          count(lit(1))).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("cid"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
      }
      cents = next
    }
    assert(got.length == cents.length)
    got.zip(cents).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.toSeq == b.toSeq, s"centroid $i diverged")
    }
  }
}
