package graft

import graft.encode.{Embedders, HashingEmbedder}
import org.apache.spark.sql.functions._

/** Differential pin for the native HashEmbed expression: the in-plan
  * fused embedding must be BIT-IDENTICAL to the mapPartitions Row path
  * it replaced (same HashingEmbedder.embed per column, same weighted
  * accumulation order, same final L2) — across nulls, empties,
  * non-ASCII text, and sub-trigram strings. */
class HashEmbedSpec extends SparkSpec {

  private val weights = Map("a" -> 0.4, "b" -> 0.3, "c" -> 0.3)

  private val rows: Seq[(String, String, String)] = Seq(
    ("the quick brown fox", "jumps over", "the lazy dog"),
    (null, "only the middle column", null),
    ("", "", ""),
    ("ab", "x", "yz"), // all below trigram length -> zero vector
    ("Ünïcødé stripped tö ascii", "ÀÉÎÕÜ", "mixed ASCII tail"),
    ("CASE folding MATTERS", "MiXeD CaSe TeXt", "UPPER"),
    ("a longer sentence with enough trigrams to be dense " * 3,
      "another, with punctuation! and 123 numbers?", "short"),
    (null, null, null))

  test("native HashEmbed == mapPartitions Row path, bit-identical") {
    import spark.implicits._
    val df = rows.toDF("a", "b", "c")
    val e = HashingEmbedder(64)
    val native = Embedders.fuseInto(df, e, weights, "v")
      .select("v").collect().map(_.getSeq[Double](0))
    val rowPath = Embedders.fuseIntoRows(df, e, weights, "v")
      .select("v").collect().map(_.getSeq[Double](0))
    assert(native.length == rowPath.length)
    native.zip(rowPath).zipWithIndex.foreach { case ((n, r), i) =>
      assert(n == r, s"row $i vectors differ:\n  native=$n\n  rows=$r")
    }
    // and both match the driver-side embed + manual fusion
    val manual = rows.map { case (a, b, c) =>
      val acc = new Array[Double](64)
      Seq(a -> 0.4, b -> 0.3, c -> 0.3).foreach { case (t, w) =>
        val v = e.embed(if (t == null) "" else t)
        var i = 0; while (i < 64) { acc(i) += w * v(i); i += 1 }
      }
      // same operation order as the engine: multiply by the reciprocal
      // (a / n rounds differently from a * (1/n) by an ULP)
      var n = 0.0
      var i = 0
      while (i < 64) { n += acc(i) * acc(i); i += 1 }
      if (n > 0) {
        val s = 1.0 / math.sqrt(n)
        i = 0
        while (i < 64) { acc(i) *= s; i += 1 }
      }
      acc.toSeq
    }
    native.zip(manual).zipWithIndex.foreach { case ((sp, mn), i) =>
      assert(sp == mn, s"row $i: native differs from driver-side fusion")
    }
  }

  test("fast path dispatches only for HashingEmbedder over string columns") {
    import spark.implicits._
    val df = Seq(("text", 1)).toDF("a", "n")
    // non-string column -> Row path (no exception, same schema)
    val out = Embedders.fuseInto(df, HashingEmbedder(16),
      Map("a" -> 0.5, "n" -> 0.5), "v")
    assert(out.columns.contains("v"))
    assert(out.select("v").head().getSeq[Double](0).size == 16)
  }
}
