package graft

import graft.queries.Registry

/** Plan-regression pins (VERDICT r8 ask #6): PLANS.md documents today's
  * good physical plans; this spec asserts the load-bearing properties so
  * they cannot silently regress. Assertions run against the STATIC
  * executed plan (before any AQE runtime re-plan), so a lost broadcast
  * hint cannot be masked by AQE's runtime broadcast conversion, and no
  * data is read — sf0.001 paths only resolve schemas.
  *
  * Pinned properties:
  *  - narrow curation projections (x1/x2/x5/x16) shuffle ONLY for their
  *    final determinism ORDER BY (range partitioning) — never a
  *    hash-partitioning exchange;
  *  - small-side joins (k3 dim table, x11 probe grams, x19 per-term df)
  *    broadcast instead of sort-merge (flip1's gather cannot be pinned
  *    here: its fn materializes internally and returns a LocalTableScan);
  *  - top-k queries (k1/fr6/x19) plan TakeOrderedAndProject (per-partition
  *    heaps, no global sort);
  *  - filter pushdown reaches the parquet scan (p10).
  */
class PlanSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def plan(name: String): String = {
    val q = Registry.all.find(_.name == name)
      .getOrElse(fail(s"no query named $name"))
    q.fn(spark, dir).queryExecution.executedPlan.toString
  }

  private val narrow = Seq("x1_token_count", "x2_quality_score",
    "x5_bpe_token_count", "x16_pii_scrub")

  for (n <- narrow)
    test(s"$n: no hash-partitioning exchange — only the determinism sort") {
      val p = plan(n)
      assert(!p.contains("hashpartitioning"),
        s"narrow projection $n grew a hash shuffle:\n$p")
      // the one legitimate exchange is the final ORDER BY's range partition
      val exchanges = "Exchange ".r.findAllIn(p).size
      assert(exchanges <= 1, s"$n has $exchanges exchanges:\n$p")
      if (exchanges == 1)
        assert(p.contains("rangepartitioning"), s"$n's exchange is not the sort:\n$p")
    }

  private val broadcastJoins = Seq("k3_result_join", "x11_contamination",
    "x19_bm25_topk")

  for (n <- broadcastJoins)
    test(s"$n: small side broadcasts (no sort-merge join)") {
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$n lost its broadcast join:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$n degraded to sort-merge:\n$p")
    }

  private val topK = Seq("k1_fused_topk", "fr6_fused_topk", "x19_bm25_topk")

  for (n <- topK)
    test(s"$n: top-k is TakeOrderedAndProject, not a global sort") {
      val p = plan(n)
      assert(p.contains("TakeOrderedAndProject"),
        s"$n lost TakeOrderedAndProject:\n$p")
    }

  test("p10_filter_preds: predicates push down to the parquet scan") {
    val p = plan("p10_filter_preds")
    val pushed = "PushedFilters: \\[[^\\]]".r
    assert(pushed.findFirstIn(p).isDefined,
      s"p10 scan has no pushed filters:\n$p")
  }
}
