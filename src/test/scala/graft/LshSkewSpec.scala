package graft

import graft.search.Search
import org.apache.spark.sql.functions._

/** Band-skew guard (Search.cappedBandPairs): a near-constant corpus
  * collapses all rows into one LSH/band bucket, which would make the
  * bucket self-join O(m²) on a single straggler task. Oversized buckets
  * fall back to star pairs against the bucket-min representative —
  * linear work, connected components preserved.
  */
class LshSkewSpec extends SparkSpec {

  test("adversarial constant corpus: capped band join stays linear") {
    import spark.implicits._
    // 20,000 ids in ONE bucket — uncapped all-pairs would be ~2·10⁸ rows
    val b = (0L until 20000L).map(i => (i, "deadbeef")).toDF("id", "bucket")
    val pairs = Search.cappedBandPairs(b, "id", "bucket", cap = 100).persist()
    assert(pairs.count() == 19999) // star: every member links to the rep
    val mm = pairs.agg(min("a_id"), max("a_id")).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 0L, "rep must be bucket min")
    pairs.unpersist()
  }

  test("mixed buckets: sub-cap all-pairs exact, oversized star, a_id < b_id") {
    import spark.implicits._
    // "s3": size 3 (≤ cap 10) → exact 3 pairs; "big": size 51 → 50 star pairs
    val rows = Seq(1L, 2L, 3L).map((_, "s3")) ++ (10L to 60L).map((_, "big"))
    val pairs = Search.cappedBandPairs(rows.toDF("id", "bucket"), "id", "bucket",
        cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall(p => p._1 < p._2))
    val (s3, big) = pairs.partition(_._2 < 10L)
    assert(s3.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(big.length == 50 && big.forall(_._1 == 10L))
  }

  test("below the cap the guard is invisible: identical to plain self-join") {
    import spark.implicits._
    val r = new scala.util.Random(3)
    val rows = (0L until 300L).map(i => (i, s"b${r.nextInt(40)}"))
    val df = rows.toDF("id", "bucket")
    val guarded = Search.cappedBandPairs(df, "id", "bucket")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val plain = df.as("a").join(df.as("b"), col("a.bucket") === col("b.bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(guarded == plain)
  }
}
