package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Degenerate-corpus skew stress (VERDICT r8 ask #7): an ALL-IDENTICAL
  * corpus at sf0.1 scale (5000 copies of one document / one embedding)
  * collapses every MinHash band and LSH bucket into a single bucket —
  * the exact shape that turns an uncapped bucket self-join into one
  * O(n²) straggler task. `Search.cappedBandPairs`' star fallback must
  * keep d3/d7/d8/x15 LINEAR here, and the outputs must satisfy the
  * capped path's invariants exactly:
  *
  *  - d3/d7: the pair set is the STAR (min-id, other) — n−1 pairs, all
  *    anchored at the representative, never the n(n−1)/2 full clique;
  *  - d8: one connected component containing every document;
  *  - x15: every span of every document is a duplicate (dup_frac 1.0).
  *
  * Wall-times are printed per query; the measured medians are recorded
  * in BASELINE.md's degenerate-corpus row.
  */
class SkewStressSpec extends SparkSpec {

  private val N = 5000L
  private val D8Cap = 3000L // d8's pinned cohort (doc_id < 3000)

  /** One fixed 120-token text / one fixed 64-dim vector, repeated N×. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-degenerate").toString
    val text = (0 until 120).map(i => s"w${i % 97}x$i").mkString(" ")
    val vec = Array.tabulate(64)(i => (((i * 13) % 17) - 8) / 10.0f)
    spark.range(N).select(col("id").as("doc_id"), lit(text).as("text"),
        lit("en").as("lang"), lit("syn").as("source"),
        lit(text.length.toLong).as("n_chars"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    spark.range(N).select(col("id").as("vec_id"),
        typedLit(vec.toSeq).as("embedding"), lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(name: String) = {
    val q = Registry.all.find(_.name == name).getOrElse(fail(s"no query $name"))
    val t0 = System.nanoTime()
    val rows = q.fn(spark, dir).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"$name on all-identical n=$N: ${rows.length} rows in $secs%.1f s")
    println(f"[skew] $name ${rows.length} rows $secs%.2f s")
    spark.catalog.clearCache() // d3/d7/d8 persist intermediates (harness accounting)
    rows
  }

  test("d3: star pairs only — n-1 rows anchored at the min doc_id") {
    val rows = run("d3_minhash_lsh_pairs")
    assert(rows.length == (N - 1).toInt, s"expected ${N - 1} star pairs")
    assert(rows.forall(_.getLong(0) == 0L), "every pair must anchor at rep 0")
    assert(rows.map(_.getLong(1)).toSet == (1L until N).toSet)
  }

  test("d7: star pairs at cosine 1.0 — n-1 rows, never the clique") {
    val rows = run("d7_lsh_neardup_pairs")
    assert(rows.length == (N - 1).toInt, s"expected ${N - 1} star pairs")
    assert(rows.forall(r => r.getLong(0) == 0L && r.getDouble(2) == 1.0))
  }

  test("d8: one giant component spanning the whole cohort") {
    val rows = run("d8_dedup_components")
    assert(rows.length == D8Cap.toInt)
    assert(rows.forall(_.getLong(1) == 0L), "all docs must join component 0")
    assert(rows.forall(_.getLong(2) == D8Cap), s"comp_size must be $D8Cap")
  }

  test("x15: every span of every document is a duplicate") {
    val rows = run("x15_span_neardup")
    assert(rows.length == N.toInt)
    val fracIdx = 3 // doc_id, n_spans, n_dup_spans, dup_frac
    assert(rows.forall(_.getDouble(fracIdx) == 1.0), "dup_frac must be 1.0 everywhere")
    assert(rows.forall(r => r.getLong(1) == 6L), "120 tokens / span 20 = 6 spans")
  }
}
