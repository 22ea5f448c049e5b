package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MinHashBands

/** Value parity of the native MinHashBands kernel against the
  * higher-order-function banding it replaces (d3/d7/d8/x26's candidate
  * generation): same band-bucket strings element for element on real
  * corpora AND the degenerate shapes — empty sets, empty-string tokens,
  * null elements, unicode, single element. The DuckDB oracle twins hash
  * these values, so parity here is what keeps the dedup family's hashes
  * engine-independent.
  */
class MinHashBandsSpec extends SparkSpec {
  import spark.implicits._

  /** The HOF form verbatim (TextDedup.bandedSigsOf / Pipeline's sigs). */
  private def hofBands(arr: org.apache.spark.sql.Column, nSeeds: Int,
                       bandSize: Int): org.apache.spark.sql.Column = {
    val hs = (0 until nSeeds).map(j =>
      array_min(transform(arr, t => md5(concat(lit(s"$j:"), t)))))
    val bands = (0 until nSeeds / bandSize).map { b =>
      concat(lit(s"$b:"), md5(concat(hs.slice(b * bandSize, (b + 1) * bandSize): _*)))
    }
    array(bands: _*)
  }

  private def assertParity(df: org.apache.spark.sql.DataFrame,
                           arrCol: String): Unit = {
    val both = df.select(
      MinHashBands.bands(col(arrCol), 8, 4).as("k"),
      hofBands(col(arrCol), 8, 4).as("h"))
    val bad = both.filter(!(col("k") <=> col("h"))).count()
    assert(bad == 0, s"kernel diverges from HOF form on $bad rows")
  }

  test("parity on real token sets (documents sf0.001)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
      .withColumn("toks", array_distinct(
        split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")))
    assertParity(docs, "toks")
  }

  test("parity on word-bigram shingle sets (the x26 shape)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
      .withColumn("sh", array_distinct(queries.TextDedup.wordNgrams(
        queries.TextDedup.tokens(col("text")), 2)))
    assertParity(docs, "sh")
  }

  test("degenerate shapes: empty set, empty string, null element, unicode, singleton") {
    val rows = Seq(
      Seq.empty[String],
      Seq(""),
      Seq("a"),
      Seq("a", ""),
      Seq("héllo", "wörld", "日本語"),
      Seq("dup", "dup", "x")
    ).toDF("toks")
    assertParity(rows, "toks")
    // null element: array_min SKIPS nulls — build via expression
    val withNull = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b') AS toks " +
      "UNION ALL SELECT array(CAST(NULL AS STRING)) AS toks")
    assertParity(withNull, "toks")
    // empty set must band to null entries (md5(concat(null…)) chain)
    val e = Seq(Seq.empty[String]).toDF("toks")
      .select(MinHashBands.bands(col("toks"), 8, 4).as("k")).head()
    assert(e.getSeq[String](0) == Seq(null, null))
  }

  test("band values are the documented md5 composition") {
    // one token "t": h_j = md5("j:t"); band b = "b:" + md5(h_{4b}||…||h_{4b+3})
    val got = Seq(Seq("t")).toDF("toks")
      .select(MinHashBands.bands(col("toks"), 8, 4).as("k"))
      .head().getSeq[String](0)
    val hs = (0 until 8).map(j => md5hex(s"$j:t"))
    val want = (0 until 2).map(b => s"$b:" + md5hex(hs.slice(b * 4, b * 4 + 4).mkString))
    assert(got == want)
  }
}
