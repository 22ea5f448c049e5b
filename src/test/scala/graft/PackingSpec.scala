package graft

import graft.pack.Packing
import org.apache.spark.sql.functions._

/** Distributed prefix-sum sequence packing: exactness vs a driver-side
  * cumulative sum, invariance to the partition count (the base-offset
  * pass must stitch partitions seamlessly), bin arithmetic at budget
  * boundaries, and the loud negative-count guard. */
class PackingSpec extends SparkSpec {

  private def golden(rows: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long, Long, Long)] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, n) =>
      val start = cum
      cum += n
      (id, n, start, start / budget, start % budget)
    }
  }

  private def run(rows: Seq[(Long, Long)], budget: Long, parts: Int) = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "n_tok").repartition(5) // scrambled input
    try Packing.packByBudget(df, "doc_id", "n_tok", budget, numParts = parts)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    finally spark.catalog.clearCache() // the persisted ranged relation
  }

  test("matches the driver-side cumulative sum, any partition count") {
    val rnd = new scala.util.Random(19)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(700).toLong))
    val g = golden(rows, budget = 1000L)
    for (parts <- Seq(1, 3, 8, 64)) { // incl. more partitions than needed
      assert(run(rows, 1000L, parts) == g, s"diverged at numParts=$parts")
    }
  }

  test("bin boundaries: a doc straddling the budget keeps its start bin") {
    // budget 10: docs of 4+4+4 — third doc STARTS at 8 (bin 0, offset 8)
    // even though it runs past the boundary; fourth starts cleanly in bin 1
    val out = run(Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L)), 10L, 2)
    assert(out == Seq(
      (1L, 4L, 0L, 0L, 0L), (2L, 4L, 4L, 0L, 4L),
      (3L, 4L, 8L, 0L, 8L), (4L, 4L, 12L, 1L, 2L)))
  }

  test("zero-token docs advance nothing; sparse ids are fine") {
    val out = run(Seq((10L, 0L), (20L, 5L), (300L, 0L), (4000L, 5L)), 4L, 3)
    assert(out == Seq(
      (10L, 0L, 0L, 0L, 0L), (20L, 5L, 0L, 0L, 0L),
      (300L, 0L, 5L, 1L, 1L), (4000L, 5L, 5L, 1L, 1L)))
  }

  test("negative token counts fail loudly") {
    val ex = intercept[Exception] {
      run(Seq((1L, 3L), (2L, -1L)), 10L, 2)
    }
    assert(ex.getMessage.contains("negative token count") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative token count")))
  }

  test("x12 on real sf0.001 documents matches an independent cumsum") {
    import graft.queries.TextDedup // ensure registration
    val out = SparkEntry.queries("x12_token_pack")(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    try {
      assert(out.nonEmpty)
      // independent golden from the raw table, driver-side
      val raw = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(out.toSeq == golden(raw, 2048L))
      // prefix sums are strictly ordered by construction
      assert(out.map(_._3).toSeq == out.map(_._3).sorted.toSeq)
    } finally spark.catalog.clearCache()
  }
}
