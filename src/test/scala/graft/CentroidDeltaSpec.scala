package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CentroidDelta

/** Differential pin: the native residual kernel must match the
  * zip_with/element_at HOF it replaced, bit for bit, nulls included. */
class CentroidDeltaSpec extends SparkSpec {

  test("CentroidDelta == zip_with(v, cents[cid], x - c)") {
    import spark.implicits._
    val cents = Array(
      Array(0.25, -1.5, 3.0, 0.0),
      Array(1.0, 2.0, -0.125, 4.5),
      Array(-3.25, 0.5, 0.75, -2.0))
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(4)(rnd.nextDouble() * 10 - 5), rnd.nextInt(3))
    }
    val df = rows.toDF("id", "v", "cid")
      .union(Seq((999L, null.asInstanceOf[Seq[Double]], 0)).toDF("id", "v", "cid"))
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val out = df.select(col("id"),
      CentroidDelta.delta(col("v"), col("cid"), cents).as("native"),
      zip_with(col("v"), element_at(centsLit, col("cid") + 1),
        (x, c) => x - c).as("hof")).collect()
    out.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2)) {
        assert(r.isNullAt(1) && r.isNullAt(2), s"null mismatch for id=${r.getLong(0)}")
      } else {
        assert(r.getSeq[Double](1) == r.getSeq[Double](2),
          s"delta differs for id=${r.getLong(0)}")
      }
    }
  }
}
