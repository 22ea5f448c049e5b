package graft

import org.apache.spark.sql.catalyst.plans.logical.LeafNode
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanLeaf
import org.apache.spark.storage.StorageLevel

/** PlanLeaf contract (used at x26's persisted fan-out joints): the leaf
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
