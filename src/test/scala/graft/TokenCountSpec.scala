package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TokenCount
import org.apache.spark.unsafe.types.UTF8String

/** The native token-count expression must be indistinguishable from
  * `size(split(trim(s), "\\s+"))` — the shared token-count definition
  * every text operator uses — on every edge the regex path has. */
class TokenCountSpec extends SparkSpec {

  test("property: equals size(split(trim(s), \\s+)) on adversarial strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // pieces chosen to hit every boundary: each ASCII \s char, multi-byte
    // codepoints (é/記/🚀), and NBSP/LINE SEPARATOR — which java \s does
    // NOT match by default and whose UTF-8 bytes must never alias the
    // ASCII whitespace range in the byte scan
    val pieces = Seq(" ", "\t", "\n", "", "", "\r",
      "a", "é", "記", "🚀", "bc", " ", " ")
    val strs = Seq("", " ", "   ", "\t", "\t \t", "a", " a ", "\t a\nb ",
      " ", "a b") ++
      (1 to 400).map(_ =>
        (0 until rnd.nextInt(14)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString)
    val rows = strs.toDF("s")
      .select(col("s"), TokenCount.tokenCount(col("s")).as("tc"),
        size(split(trim(col("s")), "\\s+")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"mismatch on ${r.getString(0).map(c => f"\\u$c%04x").mkString}")
    }
    // interpreted helper agrees with the codegen'd column path
    strs.take(50).zip(rows.take(50)).foreach { case (s, r) =>
      assert(TokenCount.count(UTF8String.fromString(s)) == r.getInt(1))
    }
  }

  test("null input yields null, not a crash or a zero") {
    import spark.implicits._
    val out = Seq(Some("a b"), None).toDF("s")
      .select(TokenCount.tokenCount(col("s"))).collect()
    assert(out(0).getInt(0) == 2)
    assert(out(1).isNullAt(0))
  }
}
