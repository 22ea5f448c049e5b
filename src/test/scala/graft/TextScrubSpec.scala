package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TextScrub, WsTokens}

/** Differential pins for the round-17 text-scrub kernels: each native
  * expression must match the exact built-in formulation it replaces, on
  * adversarial inputs — every ASCII whitespace kind, boundary runs,
  * empties, non-ASCII (accents, multi-byte, uppercase with non-trivial
  * lowercase), and a seeded random fuzz over a whitespace-heavy
  * alphabet. */
class TextScrubSpec extends SparkSpec {

  private val fixed: Seq[String] = Seq(
    "the quick brown fox",
    "",
    " ",
    "   leading and trailing   ",
    "\tstarts with tab",
    "ends with tab\t",
    "\t\n\f\r mixed ws runs \r\n\t",
    "one",
    "a  b   c\td\ne",
    "UPPER lower MiXeD",
    "àéîõü ÀÉÎÕÜ çñß",
    "Ünïcødé ascii tail",
    "世界 hello 世界",
    "num8ers and punct!?;:",
    "ab",
    "\r\r\r",
    "K KELVIN K sign", // U+212A lowercases to 'k'
    "İ dotted I")      // U+0130 lowercases to multi-char

  private def fuzz(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab z\t\n\f\rXY ÀéZ "
    (1 to n).map { _ =>
      val len = rnd.nextInt(30)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  private def df = {
    import spark.implicits._
    (fixed ++ fuzz(300)).toDF("t")
  }

  test("WsTokens == split(trim(s), \\s+), token for token") {
    val rows = df.select(
      WsTokens.wsTokens(col("t")).as("native"),
      split(trim(col("t")), "\\s+").as("builtin"),
      col("t")).collect()
    rows.foreach { r =>
      val n = r.getSeq[String](0)
      val b = r.getSeq[String](1)
      assert(n == b, s"tokens differ for ${r.getString(2).replace("\n", "\\n")}:" +
        s"\n  native=$n\n  builtin=$b")
    }
  }

  test("AlphaCount == length(regexp_replace(s, [^a-z], ''))") {
    val rows = df.select(
      TextScrub.alphaCountCol(col("t")).as("native"),
      length(regexp_replace(col("t"), "[^a-z]", "")).as("builtin"),
      col("t")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"alpha count differs for ${r.getString(2)}")
    }
  }

  test("LmNormalize == regexp_replace(lower(s), [^a-z ], '')") {
    val rows = df.select(
      TextScrub.lmNormalizeCol(col("t")).as("native"),
      regexp_replace(lower(col("t")), "[^a-z ]", "").as("builtin"),
      col("t")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"lm-normalized text differs for '${r.getString(2)}': " +
          s"native='${r.getString(0)}' builtin='${r.getString(1)}'")
    }
  }

  test("null propagation matches the built-ins") {
    import spark.implicits._
    val d = Seq[Option[String]](None, Some("a b")).toDF("t")
    val r = d.select(
      WsTokens.wsTokens(col("t")),
      TextScrub.alphaCountCol(col("t")),
      TextScrub.lmNormalizeCol(col("t"))).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1) && r(0).isNullAt(2))
    assert(r(1).getSeq[String](0) == Seq("a", "b"))
  }
}
