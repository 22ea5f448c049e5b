package graft

import org.apache.spark.sql.catalyst.plans.logical.LeafNode
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanLeaf
import org.apache.spark.storage.StorageLevel

/** PlanLeaf contract (evaluated at x26's persisted fan-out joints and
  * shipped UNWIRED — both the bare and the stats-carrying rebind lost
  * interleaved A/Bs there; BASELINE.md records the trail): the leaf
  * must carry the exact rows and schema of the wrapped frame, must
  * analyze to a single leaf node (that is the whole point — O(1)
  * downstream analysis instead of re-walking the full pipeline), must
  * compose with downstream joins/aggregations without changing values,
  * and must survive the persist being dropped (recompute through the
  * original plan, semantics unchanged). */
class PlanLeafSpec extends SparkSpec {
  import spark.implicits._

  /** A deliberately deep frame: several projection/filter/agg layers so
    * the wrapped plan is NOT already a leaf. */
  private def deepFrame() = {
    val base = spark.range(0, 1000).select(
      col("id"),
      (col("id") % 7).as("k"),
      concat(lit("doc-"), col("id")).as("text"))
    base
      .filter(col("id") % 3 =!= 0)
      .withColumn("len", length(col("text")))
      .groupBy("k").agg(count("*").as("n"), sum("len").as("tot"))
      .filter(col("n") > 10)
  }

  test("leaf preserves rows and schema exactly") {
    val df = deepFrame().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      df.count() // materialize the cache before rebinding
      val leaf = PlanLeaf.leaf(df)
      assert(leaf.schema == df.schema)
      val a = df.collect().map(_.toSeq).sortBy(_.toString)
      val b = leaf.collect().map(_.toSeq).sortBy(_.toString)
      assert(a.toSeq == b.toSeq)
    } finally df.unpersist()
  }

  test("leaf analyzes to a single LogicalRDD leaf node") {
    val df = deepFrame().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      df.count()
      val leaf = PlanLeaf.leaf(df)
      val analyzed = leaf.queryExecution.analyzed
      assert(analyzed.isInstanceOf[LogicalRDD],
        s"expected LogicalRDD leaf, got ${analyzed.getClass.getName}")
      assert(analyzed.isInstanceOf[LeafNode] && analyzed.children.isEmpty)
      // the wrapped frame, by contrast, is a real tree
      assert(df.queryExecution.analyzed.collectLeaves().size >= 1 &&
        !df.queryExecution.analyzed.isInstanceOf[LeafNode])
    } finally df.unpersist()
  }

  test("downstream agg + self-join over the leaf matches the original frame") {
    val df = deepFrame().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      df.count()
      val leaf = PlanLeaf.leaf(df)
      def downstream(d: org.apache.spark.sql.DataFrame) = {
        val tot = d.agg(sum("tot").as("grand")).as("t")
        d.as("l").crossJoin(tot)
          .select(col("k"), (col("tot") / col("grand")).as("share"))
      }
      val a = downstream(df).collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9))).sortBy(_._1)
      val b = downstream(leaf).collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9))).sortBy(_._1)
      assert(a.toSeq == b.toSeq)
    } finally df.unpersist()
  }

  test("leafWithStats: rows, schema, single-leaf analysis, and post-unpersist recompute") {
    val df = deepFrame().persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    val leaf = PlanLeaf.leafWithStats(df)
    assert(leaf.schema == df.schema)
    val analyzed = leaf.queryExecution.analyzed
    assert(analyzed.isInstanceOf[LogicalRDD] && analyzed.children.isEmpty)
    val a = df.collect().map(_.toSeq).sortBy(_.toString)
    val b = leaf.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
    df.unpersist(blocking = true)
    assert(leaf.count() == a.length) // lineage recompute, values unchanged
  }

  test("leafWithStats carries the wrapped plan's statistics; bare leaf does not") {
    val df = deepFrame().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      df.count() // materialize so the copied InMemoryRelation stats are the accurate cached size
      val wrapped = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val withStats = PlanLeaf.leafWithStats(df).queryExecution.optimizedPlan.stats.sizeInBytes
      val bare = PlanLeaf.leaf(df).queryExecution.optimizedPlan.stats.sizeInBytes
      assert(withStats == wrapped, s"stats leaf must report the wrapped size ($withStats vs $wrapped)")
      assert(bare > withStats * 1000L,
        s"bare leaf should fall back to the huge default ($bare vs $withStats)")
    } finally df.unpersist()
  }

  test("a small frame derived from leafWithStats keeps its STATIC broadcast; from the bare leaf it loses it") {
    val df = deepFrame().persist(StorageLevel.MEMORY_AND_DISK)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      df.count()
      spark.conf.set("spark.sql.adaptive.enabled", "false") // isolate STATIC planning from AQE runtime conversion
      // big must sit ABOVE the 10 MB broadcast threshold itself (range stats
      // are exact: rows × row width), or the planner broadcasts the BIG side
      // in both cases and the assertion tests nothing. Planning-only — this
      // frame is never executed.
      val big = spark.range(0, 3000000).select(col("id"), (col("id") % 7).as("k"))
      def joined(d: org.apache.spark.sql.DataFrame) = {
        val small = d.select("k", "n") // leaf-derived small side
        big.join(small, "k")
      }
      def usesBroadcast(d: org.apache.spark.sql.DataFrame) =
        d.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin")
      assert(usesBroadcast(joined(PlanLeaf.leafWithStats(df))),
        "stats-carrying leaf must keep the static broadcast of its derived small side")
      assert(!usesBroadcast(joined(PlanLeaf.leaf(df))),
        "bare leaf is expected to lose the static broadcast (the documented trade-off)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      df.unpersist()
    }
  }

  test("leafWithStats preserves the executed plan's output partitioning (no re-shuffle on the same key)") {
    val base = spark.range(0, 10000).select((col("id") % 64).as("k"), col("id").as("v"))
      .repartition(col("k"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      base.count()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def nShuffles(d: org.apache.spark.sql.DataFrame): Int = {
        val p = d.groupBy("k").agg(sum("v")).queryExecution.executedPlan
        p.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.size
      }
      assert(nShuffles(PlanLeaf.leafWithStats(base)) == 0,
        "groupBy over the leaf's existing hash partitioning must not re-shuffle")
      assert(nShuffles(PlanLeaf.leaf(base)) == 1,
        "bare leaf drops the partitioning, so the groupBy re-shuffles (the documented trade-off)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      base.unpersist()
    }
  }

  test("leaf still answers (recomputes) after the persist is dropped") {
    val df = deepFrame().persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    val leaf = PlanLeaf.leaf(df)
    val before = leaf.count()
    df.unpersist(blocking = true)
    // the leaf's RDD lineage recomputes through the original physical
    // plan — same values, no crash
    assert(leaf.count() == before)
    val expected = deepFrame().count()
    assert(before == expected)
  }
}
