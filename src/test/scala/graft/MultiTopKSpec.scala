package graft

import graft.eval.Eval
import graft.profile.Profiler
import graft.query._
import graft.search.Search
import org.apache.spark.sql.functions._

/** Batched multi-query top-k (`Search.multiTopK`) parity with the
  * per-query paths it replaces in the sweep harness: `Search.fusedTopK`
  * (rounded scores) and `Eval.hardFilterTopK` (raw scores + eligibility
  * predicates). One scan must answer every query with the exact rows, the
  * exact scores, and the exact tie-break order of the per-query jobs.
  */
class MultiTopKSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)
  private def randVec(d: Int): Array[Double] = Array.fill(d)(rnd.nextDouble() * 2 - 1)

  test("multiTopK == per-query fusedTopK on the embeddings table (incl. duplicate queries)") {
    val emb = sf("sf0.001") match { case d => spark.read.parquet(s"$d/embeddings.parquet") }
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val q0 = randVec(dim); val q1 = randVec(dim)
    val queries = Seq(q0, q1, q0.clone()) // third duplicates the first
    val batched = Search.multiTopK(emb, "embedding", "vec_id", queries, k = 12)
    assert(batched.size == 3)
    queries.zipWithIndex.foreach { case (q, i) =>
      val single = Search.fusedTopK(emb, "embedding", "vec_id", q, 12)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batched(i) == single, s"query $i diverged from fusedTopK")
    }
    assert(batched(0) == batched(2), "duplicate queries must agree")
  }

  test("multiTopK with eligibility predicates == hardFilterTopK per point") {
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)
    val items = graft.encode.Embedders.precomputed(docs, emb, "doc_id", "vec_id", "embedding")
    val profs = Profiler.profile(items, Seq("lang", "n_chars"))
    val filterSets: Seq[Seq[Filter]] = Seq(
      Seq(SparseFilter("lang", Seq("en"))),
      Seq(DenseIntervalFilter("n_chars", profs("n_chars").min, 300.0)),
      Seq(SparseFilter("lang", Seq("de")), DenseIntervalFilter("n_chars", profs("n_chars").min, 400.0)),
      Seq.empty) // no filter → whole table eligible
    val qText = randVec(64)
    val batched = Eval.hardFilterTopKBatch(items, "doc_id", "embedding", qText, filterSets, k = 10)
    filterSets.zipWithIndex.foreach { case (fs, i) =>
      val single = Eval.hardFilterTopK(items, "doc_id", "embedding", qText, fs, k = 10)
      assert(batched(i) == single, s"point $i diverged from hardFilterTopK")
    }
  }

  test("tie-break on ascending id; null vectors skipped; empty eligibility → empty result") {
    import spark.implicits._
    // rows 1..6 share the same vector (identical scores → id tiebreak);
    // row 7 has a null vector
    val vecs = Seq(
      (1L, Some(Seq(1.0, 0.0))), (2L, Some(Seq(1.0, 0.0))), (3L, Some(Seq(1.0, 0.0))),
      (4L, Some(Seq(1.0, 0.0))), (5L, Some(Seq(1.0, 0.0))), (6L, Some(Seq(1.0, 0.0))),
      (7L, None)
    ).toDF("id", "vec")
    val q = Array(1.0, 1.0)
    val res = Search.multiTopK(vecs, "vec", "id", Seq(q), k = 4)
    assert(res(0).map(_._1) == Seq(1L, 2L, 3L, 4L), s"tie-break broken: ${res(0)}")
    assert(res(0).forall(_._2 == 1.0))
    // only ids > 5 eligible: the null-vector row must not surface
    val masked = Search.multiTopK(vecs, "vec", "id", Seq(q, q), k = 4,
      eligible = Seq(col("id") > 5, lit(false)))
    assert(masked(0).map(_._1) == Seq(6L))
    assert(masked(1).isEmpty, "all-ineligible query must return no rows")
  }

  test("non-finite scores rank like the per-query desc sort (NaN first)") {
    // row 3 carries a NaN element (NaN dot), row 5 an overflow-to-∞ pair;
    // Spark's desc sort puts NaN above +∞ above finite — the heap must
    // agree, with raw AND rounded scores, instead of never admitting NaN
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.5, 0.5)),
      (3L, Seq(Double.NaN, 1.0)), (4L, Seq(0.9, 0.1)),
      (5L, Seq(Double.MaxValue, Double.MaxValue)),
      (6L, Seq(0.2, 0.2)), (7L, Seq(0.8, 0.0))
    ).toDF("id", "vec")
    val q = Array(Double.MaxValue, 1.0) // MaxValue*MaxValue overflows to ∞
    for (round <- Seq(true, false)) {
      val batched = Search.multiTopK(vecs, "vec", "id", Seq(q), k = 3,
        roundScores = round)
      val single =
        if (round) Search.fusedTopK(vecs, "vec", "id", q, 3)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        else vecs.select(col("id"),
            Search.dot(Search.asDouble(col("vec")), typedLit(q)).as("score"))
          .orderBy(col("score").desc, col("id")).limit(3)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // == on NaN is false — compare ids and bit patterns
      assert(batched(0).map(_._1) == single.map(_._1),
        s"round=$round ids: ${batched(0)} vs $single")
      assert(batched(0).map(t => java.lang.Double.doubleToLongBits(t._2)) ==
        single.map(t => java.lang.Double.doubleToLongBits(t._2)),
        s"round=$round scores: ${batched(0)} vs $single")
    }
  }

  test("batchSamples == per-seed orderBy(md5).limit(1) sample") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val cands = Seq("lang", "n_chars")
    val seeds = Seq(10, 11, 20, 21)
    val batched = Eval.batchSamples(docs, "doc_id", cands, seeds)
    seeds.foreach { s =>
      val row = docs
        .withColumn("__h", md5(concat_ws(":", col("doc_id"), lit(s))))
        .orderBy("__h").limit(1).select(cands.map(col): _*).head()
      val expected = cands.zipWithIndex.map { case (c, i) => c -> row.get(i) }.toMap
      assert(batched(s) == expected, s"seed $s sample diverged")
    }
  }

  test("oracle parity when null vectors coexist with fewer than k matches") {
    // 3 embedded rows + 2 null-vector rows; the filter admits rows 1,2,4
    // (one of them null-vector) and k exceeds the scoreable matches — both
    // oracle paths must return exactly the scoreable rows, never nulls as
    // back-fill
    import spark.implicits._
    val items = Seq(
      (1L, "a", Seq(1.0, 0.0)),
      (2L, "a", Seq(0.5, 0.5)),
      (3L, "b", Seq(0.0, 1.0)),
      (4L, "a", null.asInstanceOf[Seq[Double]]),
      (5L, "b", null.asInstanceOf[Seq[Double]]))
      .toDF("id", "grp", "vec")
    val q = Array(1.0, 1.0)
    val filters = Seq(SparseFilter("grp", Seq("a")))
    val single = Eval.hardFilterTopK(items, "id", "vec", q, filters, k = 5)
    val batched = Eval.hardFilterTopKBatch(items, "id", "vec", q,
      Seq(filters), k = 5).head
    assert(single == Seq(1L, 2L), s"per-point oracle: $single")
    assert(batched == single, s"batched $batched vs per-point $single")
  }
}
