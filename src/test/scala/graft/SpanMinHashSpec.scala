package graft

import org.apache.spark.sql.graft.SpanMinHash
import org.apache.spark.sql.functions._

/** The native span-minhash kernel must be bit-identical to the
  * declarative construction it replaces: posexplode(split(trim, \s+)) →
  * span_idx = least(pos/span, k−1) → groupBy(span).agg(min(md5("j:"+tok))).
  * Property-tested over adversarial whitespace/unicode strings, plus
  * pinned edge cases (the split-contract boundary empties).
  */
class SpanMinHashSpec extends SparkSpec {

  /** Golden: the exact DataFrame pipeline x15 originally ran. */
  private def golden(texts: Seq[String], span: Int): Seq[(Long, Long, Seq[String])] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("__toks", split(trim(col("text")), "\\s+"))
      .select(col("doc_id"),
        greatest(lit(1L), floor(size(col("__toks")) / lit(span))).as("__k"),
        posexplode_outer(col("__toks")))
      .select(col("doc_id"),
        least(floor(col("pos") / lit(span)), col("__k") - 1).as("span_idx"),
        col("col").as("tok"))
      .groupBy(col("doc_id"), col("span_idx"))
      .agg(min(md5(concat(lit("0:"), col("tok")))).as("h0"),
        (1 until 8).map(j =>
          min(md5(concat(lit(s"$j:"), col("tok")))).as(s"h$j")): _*)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), (2 until 10).map(r.getString)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  private def native(texts: Seq[String], span: Int): Seq[(Long, Long, Seq[String])] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(SpanMinHash.spanMinHash(col("text"), span)).as("sg"))
      .select(col("doc_id") +: col("sg.span_idx").as("span_idx") +:
        (0 until 8).map(j => col(s"sg.h$j")): _*)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), (2 until 10).map(r.getString)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("edge cases: boundary empties, pure whitespace, short docs, tail folding") {
    val texts = Seq(
      "",                       // one empty token, one span
      "   ",                    // trim strips to "" -> one empty token
      "\ta b\n",                // trim keeps \t/\n -> boundary empty tokens
      "a",
      "a  b\u000b c\r\nd",      // mixed separator runs incl. vertical tab
      (1 to 7).map("w" + _).mkString(" "),    // < span -> 1 span
      (1 to 40).map("w" + _).mkString(" "),   // exact multiple -> 2 spans
      (1 to 50).map("w" + _).mkString(" "),   // tail folds -> 2 spans
      "émile 日本語 naïve " * 9) // multi-byte UTF-8 never aliases a separator
    assert(native(texts, 20) == golden(texts, 20))
    assert(native(texts, 3) == golden(texts, 3))
  }

  test("property: native == declarative on random whitespace-heavy strings") {
    val rnd = new scala.util.Random(43)
    val pieces = Seq(" ", "\t", "\n", "\u000b", "\f", "\r",
      "a", "xy", "é", "界", "ß", "🚀", " ", "w1")
    def doc() = (0 until rnd.nextInt(60))
      .map(_ => pieces(rnd.nextInt(pieces.size))).mkString
    for (_ <- 1 to 20) {
      val texts = (1 to 8).map(_ => doc())
      assert(native(texts, 4) == golden(texts, 4), texts.toString)
    }
  }
}
