package graft

import org.apache.spark.sql.functions._

/** Differential pin for the native WordNgrams/GramHashes kernels against
  * the higher-order-function formulation they replaced (round 16: the HOF
  * lambda evaluated interpretively per element — ~19 µs/gram; the kernel
  * is the same semantics compiled). Any drift in guard behavior, null
  * handling, join separator, md5 form, or distinct order fails here
  * before it can move an oracle hash. */
class WordNgramsSpec extends SparkSpec {
  import org.apache.spark.sql.graft.WordNgrams

  /** The replaced formulation, verbatim. */
  private def hofNgrams(toks: org.apache.spark.sql.Column, n: Int) =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  private def hofGramHashes(toks: org.apache.spark.sql.Column, n: Int) =
    array_distinct(transform(hofNgrams(toks, n), g => md5(g)))

  private lazy val fixture = {
    import spark.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f a b c d e",           // repeated grams -> distinct bites
      "one two three four five",          // exactly n for n=5
      "one two three four",               // < n for n=5 -> empty
      "solo",                             // single token
      "",                                 // empty text -> [""] token
      "  padded   with   runs  ",
      null.asInstanceOf[String],          // null text -> null tokens array
      "dup dup dup dup dup dup dup dup"   // all-identical tokens
    ).toDF("text")
      .withColumn("toks", split(trim(col("text")), "\\s+"))
  }

  test("kernel == HOF formulation for n in 2..5 (values, guards, nulls)") {
    for (n <- 2 to 5) {
      val rows = fixture.select(
        WordNgrams.wordNgrams(col("toks"), n).as("k"),
        hofNgrams(col("toks"), n).as("h")).collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"row $i n=$n: kernel ${r.getSeq[String](0)} != hof ${r.getSeq[String](1)}")
      }
    }
  }

  test("hashed kernel == array_distinct(transform(md5)) incl. order") {
    for (n <- Seq(2, 5)) {
      val rows = fixture.select(
        WordNgrams.gramHashes(col("toks"), n).as("k"),
        hofGramHashes(col("toks"), n).as("h")).collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"row $i n=$n: kernel ${r.getSeq[String](0)} != hof ${r.getSeq[String](1)}")
      }
    }
  }

  test("null tokens inside the array are skipped like concat_ws") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", null, "b", "c"))).toDF("toks")
    val r = df.select(
      WordNgrams.wordNgrams(col("toks"), 2).as("k"),
      hofNgrams(col("toks"), 2).as("h")).head()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
    assert(r.getSeq[String](0) == Seq("a", "b", "b c"))
  }
}
