package graft

import graft.queries.TextDedup
import org.apache.spark.sql.DataFrame

/** Span-level near-dup (x15): a document containing a verbatim copied
  * paragraph is flagged on exactly that span, unique documents are not,
  * within-doc repetition is ignored, and the tail-folding span count is
  * pinned. Spans are 20 tokens here (the x15 grain).
  */
class SpanDedupSpec extends SparkSpec {

  private val Span = 20

  /** n pseudo-unique tokens seeded by `tag` — no cross-doc collisions. */
  private def para(tag: String, n: Int = Span): String =
    (0 until n).map(i => s"${tag}w$i").mkString(" ")

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    val df: DataFrame = docs.toDF("doc_id", "text").repartition(3)
    try TextDedup.spanNearDup(df, Span).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    finally spark.catalog.clearCache() // the persisted bucket relation
  }

  test("a verbatim copied paragraph flags that span on both documents; unique docs stay clean") {
    val shared = para("shared")
    val out = run(Seq(
      1L -> (para("a1") + " " + shared),          // spans: [a1..], [shared]
      2L -> (shared + " " + para("b1")),          // spans: [shared], [b1..]
      3L -> (para("c1") + " " + para("c2"))))     // fully unique
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("within-doc repetition is not contamination") {
    val p = para("self")
    val out = run(Seq(
      1L -> (p + " " + p),                        // doc repeats its own paragraph
      2L -> (para("other") + " " + para("other2"))))
    assert(out(1L) == ((2L, 0L, 0.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
  }

  test("tail folds into the last span; every doc has at least one span") {
    val out = run(Seq(
      1L -> para("t", 50),   // 50 tokens -> 2 spans (20 + 30), not 3
      2L -> para("u", 7),    // < one span -> 1 span
      3L -> para("v", 40)))  // exact multiple -> 2 spans
    assert(out(1L)._1 == 2L)
    assert(out(2L)._1 == 1L)
    assert(out(3L)._1 == 2L)
  }

  test("a fully copied short document is flagged whole") {
    val p = para("dup", 12)
    val out = run(Seq(1L -> p, 2L -> p, 3L -> para("uniq", 12)))
    assert(out(1L) == ((1L, 1L, 1.0)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  private def runExcise(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    val df: DataFrame = docs.toDF("doc_id", "text").repartition(3)
    try TextDedup.spanExcise(df, Span).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    finally spark.catalog.clearCache()
  }

  test("excision: the copied paragraph is removed from the LATER doc only") {
    val shared = para("shared")
    val a1 = para("a1"); val b1 = para("b1"); val c = para("c1")
    val out = runExcise(Seq(
      1L -> (a1 + " " + shared),   // first occurrence: keeps everything
      2L -> (shared + " " + b1),   // later copy: shared span excised
      3L -> c))                    // unique: byte-identical rewrite
    assert(out(1L) == ((2L, 2L, md5hex(a1 + " " + shared))))
    assert(out(2L) == ((2L, 1L, md5hex(b1))))
    assert(out(3L) == ((1L, 1L, md5hex(c))))
  }

  test("excision: a full later duplicate collapses to the empty document") {
    val p = para("dup", 30)
    val out = runExcise(Seq(1L -> p, 2L -> p))
    assert(out(1L) == ((1L, 1L, md5hex(p))))
    assert(out(2L) == ((1L, 0L, md5hex(""))))
  }

  test("excision: whitespace normalizes to single spaces but token content is exact") {
    val out = runExcise(Seq(1L -> "alpha\tbeta   gamma"))
    // 3 tokens, 1 span, kept whole — reconstructed with single spaces
    assert(out(1L) == ((1L, 1L, md5hex("alpha beta gamma"))))
  }
}
