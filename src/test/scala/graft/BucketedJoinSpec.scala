package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Executable witness for the 100-TB co-location story PLANS.md keeps
  * invoking: "the embeddings attach becomes a co-partitioned/bucketed
  * join on doc_id instead of a broadcast". This spec actually WRITES
  * both sides of the fr6-style attach as Spark bucketed tables and pins
  * the plan property that makes the claim true — the join runs with NO
  * Exchange on either side (bucketed scans are already hash-co-located
  * on the join key, so the cluster moves zero bytes at any scale).
  */
class BucketedJoinSpec extends SparkSpec {

  test("doc_id-bucketed documents⋈embeddings joins with zero Exchange") {
    val warehouse = Files.createTempDirectory("graft_bucketed").toString
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val embs = Tables.embeddings(spark, dir)

    // external bucketed tables (explicit path → no reliance on a global
    // warehouse); SAME bucket count on the SAME key on both sides
    docs.write.option("path", s"$warehouse/docs_b")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("docs_b")
    embs.write.option("path", s"$warehouse/embs_b")
      .bucketBy(8, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("embs_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path a 100-TB right side would take —
      // broadcast would hide exactly the Exchange we're pinning away
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("docs_b")
        .join(spark.table("embs_b"),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("embedding"))
      joined.collect() // materialize so AQE finalizes the executed plan
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"),
        "bucketed co-located join must not shuffle either side:\n" +
          plan.take(3000))
      assert(plan.contains("SortMergeJoin"),
        "expected the merge join over pre-bucketed scans:\n" + plan.take(3000))

      // identical result to the plain (shuffling) join
      val expect = docs.join(embs, col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("embedding"))
        .orderBy("doc_id").collect()
      assert(joined.orderBy("doc_id").collect() === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_b")
      spark.sql("DROP TABLE IF EXISTS embs_b")
    }
  }
}
