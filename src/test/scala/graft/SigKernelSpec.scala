package graft

import org.apache.spark.sql.functions._

/** Differential pins for the native MinHashSigs (d2) and SimHash (d6)
  * kernels against the higher-order-function formulations they replaced
  * (round 16) — seed prefixes, hex form, array_min null skipping, the
  * per-bit majority with null tokens in the denominator, and the
  * null-array chains are all asserted value-for-value. */
class SigKernelSpec extends SparkSpec {

  /** d2's replaced formulation, verbatim. */
  private def hofMinhash(dtoks: org.apache.spark.sql.Column, j: Int) =
    array_min(transform(dtoks, t => md5(concat(lit(s"$j:"), t))))

  /** d6's replaced formulation, verbatim. */
  private def hofSimhash(dtoks: org.apache.spark.sql.Column) = {
    val md5s = transform(dtoks, t => md5(t))
    val highs = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    (0 until 16).map { j =>
      val nHigh = size(filter(md5s, h => substring(h, j + 1, 1).isin(highs: _*)))
      when(nHigh * 2 > size(md5s), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  private lazy val fixture = {
    import spark.implicits._
    Seq(
      Tuple1(Seq("the", "quick", "brown", "fox")),
      Tuple1(Seq("a")),
      Tuple1(Seq.empty[String]),
      Tuple1(Seq("dup", "dup", "tokens")),
      Tuple1(Seq("a", null, "b")),
      Tuple1(null.asInstanceOf[Seq[String]])
    ).toDF("dtoks")
  }

  test("MinHashSigs == 8 array_min(transform(md5)) columns") {
    val sigs = org.apache.spark.sql.graft.MinHashBands.sigs(col("dtoks"), 8)
    val cols = (0 until 8).flatMap { j =>
      Seq(element_at(sigs, j + 1).as(s"k$j"), hofMinhash(col("dtoks"), j).as(s"h$j"))
    }
    fixture.select(cols: _*).collect().zipWithIndex.foreach { case (r, i) =>
      for (j <- 0 until 8)
        assert(r.getAs[String](s"k$j") == r.getAs[String](s"h$j"),
          s"row $i seed $j: kernel ${r.getAs[String](s"k$j")} != hof ${r.getAs[String](s"h$j")}")
    }
  }

  test("SimHash == the 16-bit HOF majority expression") {
    val rows = fixture.select(
      org.apache.spark.sql.graft.SimHash.simhash16(col("dtoks")).as("k"),
      hofSimhash(col("dtoks")).as("h")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == r.getLong(1), s"row $i: ${r.getLong(0)} != ${r.getLong(1)}")
    }
  }
}
