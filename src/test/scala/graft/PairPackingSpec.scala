package graft

import graft.search.Search
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** 64-bit-safe candidate-pair packing (Search.packPair / unpackPair) —
  * the d3/d7 shuffle-width trick. Must be bijective for ids up to 2³²−1
  * (a billion-doc corpus exceeds the former 10⁹ decimal-packing ceiling)
  * and fail LOUDLY past 2³², never silently corrupt pairs.
  */
class PairPackingSpec extends SparkSpec {

  test("round-trips ids above 1e9, through 2^31 sign-bit flip, to 2^32-1") {
    import spark.implicits._
    val cases = Seq(
      (0L, 1L),
      (5L, 999999999L),
      (1500000000L, 3000000000L),       // both above the old 1e9 ceiling
      (2147483648L, 2147483649L),       // a_id = 2^31: packed long < 0
      (4294967294L, 4294967295L))       // max packable
    val out = cases.toDF("a", "b")
      .select(Search.packPair(col("a"), col("b")).as("pair"))
      .select(Search.unpackPair(col("pair")): _*)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == cases)
  }

  test("d3-shape pipeline with >1e9 ids: bucket pairs → pack → distinct → unpack") {
    import spark.implicits._
    // one bucket of four big ids (old packing would corrupt these); a second
    // bucket re-links two of them, so the packed distinct has real work
    val big = Seq(1000000123L, 3000000000L, 3000000001L, 4294967295L)
    val rows = (big.map((_, "bx")) ++
      Seq(3000000000L, 3000000001L, 7L, 8L).map((_, "by"))).toDF("id", "bucket")
    val pairs = Search.cappedBandPairs(rows, "id", "bucket")
      .select(Search.packPair(col("a_id"), col("b_id")).as("pair")).distinct()
      .select(Search.unpackPair(col("pair")): _*)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = ((for { a <- big; b <- big if a < b } yield (a, b)) ++
      Seq((7L, 8L), (7L, 3000000000L), (7L, 3000000001L), (8L, 3000000000L),
        (8L, 3000000001L))).distinct.sorted
    assert(pairs.toSeq == expected)
  }

  test("distinctLongs == hash distinct (the d7 spill-friendly dedup), incl. sign-bit longs") {
    import spark.implicits._
    // duplicates across partitions, negative packed values (a_id >= 2^31),
    // Long.MinValue-adjacent values, and a value equal to the dedup
    // iterator's prev-init (0L) first in its partition
    val vals = Seq(0L, 0L, 1L, -1L, Long.MinValue, Long.MinValue + 1,
      Long.MaxValue, 42L, 42L, 42L, -5000000000L, -5000000000L, 7L)
    val df = vals.toDF("pair").repartition(5)
    val sortBased = Search.distinctLongs(df, "pair")
      .collect().map(_.getLong(0)).sorted.toSeq
    val hashBased = df.distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(sortBased == hashBased)
    assert(sortBased == vals.distinct.sorted)
    // plan shape: no hash aggregate — the whole point is the external sort
    val p = Search.distinctLongs(df, "pair").queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate"), s"distinctLongs regressed to hash agg:\n$p")
  }

  test("packed order is NOT pair order past 2^31 — sort must use unpacked cols") {
    import spark.implicits._
    // (2^31, x) packs negative, (1, y) packs positive: packed asc would
    // invert them. unpackPair + orderBy(a_id, b_id) restores pair order.
    val df = Seq((2147483648L, 2147483649L), (1L, 2L)).toDF("a", "b")
      .select(Search.packPair(col("a"), col("b")).as("pair"))
    val byPacked = df.orderBy("pair")
      .select(Search.unpackPair(col("pair")): _*)
      .collect().map(_.getLong(0))
    assert(byPacked.head == 2147483648L, "sign-flip: packed order inverted")
    val byUnpacked = df.select(Search.unpackPair(col("pair")): _*)
      .orderBy("a_id", "b_id")
      .collect().map(_.getLong(0))
    assert(byUnpacked.toSeq == Seq(1L, 2147483648L))
  }

  test("ids at/above 2^32 fail loudly") {
    import spark.implicits._
    val bad = Seq((1L, 4294967296L)).toDF("a", "b")
      .select(Search.packPair(col("a"), col("b")).as("pair"))
    val e = intercept[Exception](bad.collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).map(t => Option(t.getMessage).getOrElse("")).mkString
        .contains("overflows the packed pair long"))
  }
}
