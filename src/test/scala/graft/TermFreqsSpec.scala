package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TermFreqs
import org.apache.spark.unsafe.types.UTF8String

/** The native term-frequency expression must be indistinguishable from
  * `explode(split(trim(s), "\\s+"))` → `groupBy(term).count()` on every
  * edge the regex path has — same tokenization contract as TokenCount. */
class TermFreqsSpec extends SparkSpec {

  /** `split(trim(s), "\s+")` counts, with Spark's trim mirrored as a
    * literal space strip — NOT `replaceAll(" +$", "")`: Java regex `$`
    * also matches before a final LINE TERMINATOR (U+2028/U+2029 included),
    * which would delete an INTERIOR space when the string ends in one of
    * those — a bug this spec's first draft actually had. */
  private def refCounts(s: String): Map[String, Long] = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
      .split("\\s+", -1).groupBy(identity).view.mapValues(_.length.toLong).toMap
  }

  test("property: equals explode+groupBy counts on adversarial strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val pieces = Seq(" ", "\t", "\n", "", "\f", "\r", " ", " ",
      "a", "é", "記", "🚀", "bc", "a", " ", " ")
    val strs = Seq("", " ", "   ", "\t", "\t \t", "a", " a ", "\t a\nb ",
      " ", "a b a", "a a a") ++
      (1 to 400).map(_ =>
        (0 until rnd.nextInt(14)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString)
    val rows = strs.toDF("s")
      .select(col("s"), TermFreqs.termFreqs(col("s")).as("tf"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      val got = r.getSeq[org.apache.spark.sql.Row](1)
        .map(t => t.getString(0) -> t.getLong(1)).toMap
      assert(got === refCounts(s),
        s"mismatch on ${s.map(c => f"\\u$c%04x").mkString}")
    }
  }

  test("sum of tf equals TokenCount; terms are first-occurrence ordered") {
    import spark.implicits._
    val rows = Seq("b a b c a b", " x ", "", "\tz").toDF("s")
      .select(TermFreqs.termFreqs(col("s")).as("tf"),
        org.apache.spark.sql.graft.TokenCount.tokenCount(col("s")).as("tc"))
      .collect()
    rows.foreach { r =>
      val tf = r.getSeq[org.apache.spark.sql.Row](0)
      assert(tf.map(_.getLong(1)).sum == r.getInt(1).toLong)
    }
    val first = rows.head.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    assert(first === Seq("b", "a", "c"))
  }

  test("interpreted helper agrees with the codegen'd column path") {
    val ad = TermFreqs.freqs(UTF8String.fromString(" b a b "))
    val got = (0 until ad.numElements()).map { i =>
      val r = ad.getStruct(i, 2)
      r.getUTF8String(0).toString -> r.getLong(1)
    }
    assert(got === Seq("b" -> 2L, "a" -> 1L))
  }

  test("null input yields null") {
    import spark.implicits._
    val out = Seq(Some("a b"), None).toDF("s")
      .select(TermFreqs.termFreqs(col("s"))).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }
}
