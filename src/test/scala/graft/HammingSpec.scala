package graft

import org.apache.spark.sql.functions._

/** Differential pin for the native HammingDistance kernel against the
  * aggregate(zip_with(bit_count(xor))) fold it replaced (round 16),
  * including the null chains (null word, null array, mismatched
  * lengths — all null). */
class HammingSpec extends SparkSpec {

  private def hofHamming(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (s, x) => s + x)

  test("kernel == HOF fold on values and null chains") {
    import spark.implicits._
    val df = Seq(
      (Seq(0L), Seq(0L)),
      (Seq(-1L), Seq(0L)),                       // 64 bits
      (Seq(0x5555555555555555L, 7L), Seq(0L, 1L)),
      (Seq(1L, 2L, 4L), Seq(1L, 2L, 4L)),
      (Seq(1L), Seq(1L, 2L)),                    // length mismatch -> null
      (null.asInstanceOf[Seq[Long]], Seq(1L))    // null array -> null
    ).toDF("a", "b")
    val rows = df.select(
      org.apache.spark.sql.graft.HammingDistance.hamming(col("a"), col("b")).as("k"),
      hofHamming(col("a"), col("b")).as("h")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val k = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
      val h = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
      assert(k == h, s"row $i: kernel $k != hof $h")
    }
  }

  test("null WORD inside the array -> null, like the fold") {
    val df = spark.sql("SELECT array(1L, cast(null as bigint)) AS a, array(1L, 2L) AS b")
    val r = df.select(
      org.apache.spark.sql.graft.HammingDistance.hamming(col("a"), col("b")).as("k"),
      hofHamming(col("a"), col("b")).as("h")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
