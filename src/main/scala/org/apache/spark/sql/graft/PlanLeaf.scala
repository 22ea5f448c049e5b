package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Rebind a PERSISTED frame as a LogicalRDD leaf: the same rows flow
  * through the same InMemoryRelation scan (no extra serialization, no
  * data copy — the leaf's RDD IS the cached plan's execution RDD), but
  * every downstream action analyzes a one-node leaf instead of re-walking
  * the whole upstream logical tree.
  *
  * Why it exists: Catalyst re-runs analysis + optimization over a frame's
  * FULL accumulated logical plan on every action, even when execution is
  * a cache hit. A deep multi-stage pipeline (x26: ingest → langid →
  * LM fit/score → dedup → banding → verify → contamination → cap → pack,
  * with wide row-local expression trees at several stages) pays that
  * re-walk 6–8 times — measured ~1.3 s of non-job driver time at sf0.1,
  * independent of data size but linear in plan depth × action count.
  * Cutting the plan at the persisted fan-out joints makes downstream
  * planning O(remaining pipeline), the same contract a materialized view
  * gives a SQL engine.
  *
  * Trade-offs, stated: (1) the leaf carries no catalyst stats, so a
  * downstream join never auto-broadcasts the leaf side — use it for
  * corpus-sized relations (which must not broadcast anyway), not small
  * dimension frames; (2) the leaf pins the wrapped plan's RDD, so the
  * persist lifecycle (harness clearCache / explicit unpersist) governs
  * both; (3) like any RDD-backed frame, re-execution after the cache is
  * dropped recomputes through the ORIGINAL plan — semantics unchanged.
  */
object PlanLeaf {
  def leaf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
