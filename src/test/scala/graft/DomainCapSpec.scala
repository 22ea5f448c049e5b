package graft

import graft.queries.TextDedup
import org.apache.spark.sql.functions._

/** x24 per-domain quota: the salted two-phase top-N must equal the direct
  * one-window top-N on ANY input — the oracle row proves it on the real
  * corpus; this spec proves it on an adversarially skewed one (one domain
  * holding ~95% of the rows, quality ties included) and pins the scale
  * contract: phase 2 only ever sees ≤ cap·salts rows per domain.
  */
class DomainCapSpec extends SparkSpec {

  test("salted two-phase == direct one-window on a skewed corpus with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // hot domain: 5000 rows; 10 cold domains: 5 rows each; qualities
    // drawn from 20 distinct values so ties cross the cap boundary
    val rows =
      (0 until 5000).map(i => (i.toLong, "hot", (rnd.nextInt(20) / 20.0))) ++
      (0 until 50).map(i => (5000L + i, s"cold${i % 10}", (rnd.nextInt(20) / 20.0)))
    val docs = rows.toDF("doc_id", "source", "quality").repartition(8)
    for (cap <- Seq(1, 8); salts <- Seq(1, 4, 7)) {
      val got = TextDedup.domainCap(docs, cap, salts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      // driver twin of the direct window
      val want = rows.groupBy(_._2).toSeq.flatMap { case (src, xs) =>
        xs.sortBy { case (id, _, q) => (-q, id) }.take(cap).zipWithIndex
          .map { case ((id, _, q), i) => (src, id, q, (i + 1).toLong) }
      }.sortBy { case (src, _, _, rk) => (src, rk) }
      assert(got.toSeq == want,
        s"cap=$cap salts=$salts: two-phase diverged from direct top-N")
    }
  }

  test("phase 2 input is bounded by cap·salts per domain (the skew contract)") {
    import spark.implicits._
    val rows = (0 until 10000).map(i => (i.toLong, "hot", i / 10000.0))
    val docs = rows.toDF("doc_id", "source", "quality")
    val cap = 8; val salts = 4
    // re-run phase 1 alone (same expressions as domainCap) and count
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col("source"), col("salt"))
      .orderBy(col("quality").desc, col("doc_id"))
    val phase1 = docs
      .withColumn("salt", pmod(hash(col("doc_id")), lit(salts)))
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= cap)
    val n = phase1.count()
    assert(n <= cap.toLong * salts,
      s"phase-1 survivors $n exceed cap*salts=${cap * salts} on one domain")
    // and the final result is still the exact top-cap
    val got = TextDedup.domainCap(docs, cap, salts)
      .collect().map(_.getLong(1)).toSeq
    assert(got == (9999L to 9992L by -1L).toSeq.sorted.reverse,
      s"hot-domain top-$cap wrong: $got")
  }
}
