package graft

import graft.query._
import graft.rerank.Rerank
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Re-rank pipeline vs a pandas-computed golden replicating the reference's
  * encode_result exactly (average-tie rank, sentinels, NaN placement,
  * descending-binary quirk; reference src/encode.py:191-267).
  */
class RerankSpec extends SparkSpec {

  private def resultDf = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("relevance", DoubleType),
      StructField("price", DoubleType),
      StructField("city", StringType),
      StructField("booked", StringType)))
    val rows = Seq(
      Row(0L, 0.9, 10.0, "agra", "Yes"),
      Row(1L, 0.8, 55.0, "pune", "No"),
      Row(2L, 0.7, 100.0, "agra", null),
      Row(3L, 0.6, null, null, "Yes"),
      Row(4L, 0.5, 70.0, "goa", "No"),
      Row(5L, 0.4, 55.0, "agra", "Yes"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("R1+R2+R4+R5 pipeline matches pandas golden") {
    val filters = Seq[Filter](
      DensePointFilter("price", 60.0, weight = 1.0),           // centroid (not min/max)
      DenseIntervalFilter("price", 40.0, 80.0, weight = 0.5),  // interval
      BinaryFilter("booked", "Yes", weight = 1.0),             // binary desc quirk
      SparseFilter("city", Seq("agra", "goa"), weight = 2.0))  // sparse
    val out = Rerank.rerank(resultDf, filters,
        minMax = Map("price" -> (10.0, 100.0)))
      .select("id", "relevance")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val golden = Map(0L -> 1.6, 1L -> -0.9, 2L -> 0.8, 3L -> -1.5, 4L -> 1.0, 5L -> 2.9)
    golden.foreach { case (id, g) =>
      assert(math.abs(out(id) - g) < 1e-9, s"id=$id got ${out(id)} want $g")
    }
  }

  test("R1 highest/lowest shortcuts rank raw values") {
    // v == colMax → ascending raw rank; v == colMin → descending
    val rows = Rerank.rerank(resultDf, Seq(DensePointFilter("price", 100.0)),
        Map("price" -> (10.0, 100.0)))
      .select("id", "relevance").collect()
    val hi = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    // ascending on price among non-nulls: 10→1, 55→2.5(avg), 70→4, 100→5;
    // null price → NaN relevance (pandas rank keep; reference has no fillna
    // in the highest/lowest branch). norm: 2*(r-1)/5-1.
    assert(math.abs(hi(0L) - (0.9 + (2.0 * (1 - 1) / 5 - 1))) < 1e-9)
    assert(math.abs(hi(2L) - (0.7 + (2.0 * (5 - 1) / 5 - 1))) < 1e-9)
    assert(hi(3L).isNaN)
  }

  test("R3 geolocation rerank matches pandas golden (farthest-in-result-set)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("relevance", DoubleType),
      StructField("lon", DoubleType),
      StructField("lat", DoubleType)))
    val pts = Seq((10.0, 50.0), (-120.0, -30.0), (77.0, 20.0),
      (0.0, 0.0), (10.5, 49.0), (100.0, 60.0))
    val rel0 = Seq(0.6, 0.5, 0.4, 0.3, 0.2, 0.1)
    val rows = pts.zip(rel0).zipWithIndex.map { case (((lon, lat), r), i) =>
      Row(i.toLong, r, lon, lat)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Rerank.rerank(df,
        Seq(GeoFilter("loc", 11.0, 49.5, weight = 1.5)),
        minMax = Map.empty, geoCols = Map("loc" -> ("lon", "lat")))
      .select("id", "relevance").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val golden = Map(0L -> 1.5, 1L -> -1.0, 2L -> -0.5, 3L -> 0.0, 4L -> 1.7, 5L -> 0.4)
    golden.foreach { case (id, g) =>
      assert(math.abs(out(id) - g) < 1e-9, s"id=$id got ${out(id)} want $g")
    }
  }

  test("R3 null location: farthest collapses to zero cartesian (reference argmax-NaN)") {
    // Reference src/encode.py:235-236 uses plain np.argmax: a NaN distance
    // (null location) wins, making the farthest point the null point → zero
    // cartesian → dot(q, far) = 0 → scale = 2, shift = 1 − 2·|q|² = −1.
    // The null row itself keys like a dot=0 row (coalesced zero cartesian).
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("relevance", DoubleType),
      StructField("lon", DoubleType),
      StructField("lat", DoubleType)))
    val rows = Seq(
      Row(0L, 0.0, 11.0, 49.5),   // = query point → dot 1 → key 2·1−1 = 1
      Row(1L, 0.0, null, null),   // null → key = shift = −1
      Row(2L, 0.0, -169.0, -49.5) // antipode → dot −1 → key −3
    )
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Rerank.rerank(df,
        Seq(GeoFilter("loc", 11.0, 49.5, weight = 1.0)),
        minMax = Map.empty, geoCols = Map("loc" -> ("lon", "lat")))
      .select("id", "relevance").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // ascending keys (−3, −1, 1) → ranks (1, 2, 3) → norms (−1, 0, +1).
    // Without the argmax-NaN replication, farthest = the antipode row and
    // scale = 2/(1−(−1)) = 1 — ranks are unchanged (monotone map) but the
    // query must not degenerate (old max_by path never picks null rows,
    // which breaks scale when far == q, dot = 1).
    assert(math.abs(out(0L) - 1.0) < 1e-9, s"got ${out(0L)}")
    assert(math.abs(out(1L) - 0.0) < 1e-9, s"got ${out(1L)}")
    assert(math.abs(out(2L) - (-1.0)) < 1e-9, s"got ${out(2L)}")
  }

  test("R5 sparse modality skipped when no selected value present") {
    val out = Rerank.rerank(resultDf, Seq(SparseFilter("city", Seq("nowhere"))),
        Map.empty)
      .select("id", "relevance").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(0L) - 0.9) < 1e-12)
    assert(math.abs(out(4L) - 0.5) < 1e-12)
  }
}
