package graft.pack

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: assign each document a position
  * in a stream of fixed token-budget bins (GPT-style packed pretraining
  * batches concatenate documents in a deterministic order and cut every
  * `budget` tokens). The operator computes, per document, the EXCLUSIVE
  * running token total in ascending-id order and derives the bin id and
  * intra-bin offset — everything a downstream packer needs to materialize
  * examples, without ever materializing the concatenation.
  *
  * Scale shape — a distributed PREFIX SUM, not a window: the naive
  * `sum(n) OVER (ORDER BY id)` is a single-partition window at 100 TB
  * (the exact shape this library bans elsewhere). Instead:
  * range-partition by id + sort within partitions (a shuffle, but every
  * partition independent), ONE tiny aggregation collecting
  * #partitions per-partition totals to the driver (bounded by the
  * partition count, not the data), then one narrow pass adding each
  * partition's broadcast base offset to its local running sum. Total: one
  * range shuffle + one #partitions-row collect + one narrow map — the
  * classic two-pass parallel prefix sum.
  */
object Packing {

  /** A packing result plus the lifecycle of its pinned intermediate: the
    * range-partitioned relation backing [[df]] stays persisted (pass 1
    * scanned it for totals; pass 2 re-scans it per action on [[df]]) until
    * [[close]] releases it — the `FuseRankEngine.close()` precedent, so a
    * long-lived session doing repeated packs can release each one without
    * nuking the whole cache. Actions on [[df]] after close() recompute the
    * relation; that is correct for a DETERMINISTIC input (the range
    * sampler is seeded per partition index, so recomputation reproduces
    * identical boundaries and partition ids), but with a source that
    * changes between actions the recomputed layout can disagree with the
    * already-captured base offsets — treat close() as end-of-life for
    * [[df]] unless the input is immutable. */
  final class Packed private[pack] (
      val df: DataFrame,
      parted: org.apache.spark.sql.Dataset[_]) extends AutoCloseable {
    /** Blocking unpersist: on return, no blocks of the packing
      * intermediate remain pinned. Idempotent. */
    def close(): Unit = { parted.unpersist(blocking = true); () }
  }

  /** Per-row packing assignment: `(id, n_tok, tok_start, bin_id,
    * bin_offset)` where `tok_start` is the exclusive prefix sum of
    * `nTokCol` in ascending `idCol` order, `bin_id = tok_start / budget`
    * and `bin_offset = tok_start % budget`. `idCol` must be integral and
    * unique (ties would make within-partition order, and thus the prefix
    * sum, nondeterministic — documents carry unique ids).
    *
    * Convenience overload whose persisted intermediate lives until the
    * caller's clearCache (the d3/d7 bucket-relation precedent — what the
    * harness queries use, since they hand the DataFrame to a gate that
    * acts on it later). Library users composing packs inside a long-lived
    * session should call [[pack]] and `close()` the handle instead. */
  def packByBudget(df: DataFrame, idCol: String, nTokCol: String,
                   budget: Long, numParts: Int = 0): DataFrame =
    pack(df, idCol, nTokCol, budget, numParts).df

  /** As [[packByBudget]], returning the [[Packed]] handle that releases
    * the pinned range-partitioned blocks deterministically. */
  def pack(df: DataFrame, idCol: String, nTokCol: String,
           budget: Long, numParts: Int = 0): Packed = {
    require(budget > 0, s"token budget must be positive: $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    // null ids/counts would vanish into the long encoder with an opaque
    // error (or silently skew the sums) — fail naming the column instead
    // (assert_true throws per offending row; coalesce passes the value)
    def guarded(c: String, as: String) = coalesce(
      assert_true(col(c).cast("long").isNotNull,
        lit(s"null or non-numeric $c in packByBudget")),
      col(c).cast("long")).as(as)
    // __pid is a per-row COLUMN pinned at cache-build time, NOT
    // TaskContext.getPartitionId() read later: the task partition id is
    // plan-context-dependent — a downstream coalesce(1) (Verify's output
    // write) runs every cached partition inside task 0, which would hand
    // partition 0's base offset to every row. The stored column survives
    // any downstream re-partitioning; the oracle gate caught exactly this.
    val parted = df
      .select(guarded(idCol, "__id"), guarded(nTokCol, "__n"))
      .repartitionByRange(parts, col("__id"))
      .sortWithinPartitions("__id")
      .withColumn("__pid", spark_partition_id())
      .as[(Long, Long, Int)]
      .persist()
    // pass 1: per-partition token totals — #partitions rows to the driver,
    // independent of data volume
    val partTotals: Map[Int, Long] = parted
      .groupBy(col("__pid")).agg(sum(col("__n")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive base offset per partition (driver-side running sum over a
    // #partitions-sized map; empty partitions simply contribute 0)
    val bases: Map[Int, Long] = {
      var acc = 0L
      (0 until parts).map { p =>
        val b = p -> acc
        acc += partTotals.getOrElse(p, 0L)
        b
      }.toMap
    }
    val budgetB = budget
    // pass 2: narrow — rows arrive in stored (sorted) order per partition;
    // the base offset comes from each ROW's own __pid, so the arithmetic
    // is correct even when a downstream stage folds several cached
    // partitions into one task
    val out = parted.mapPartitions { it =>
      var cum = 0L
      var prevPid = -1
      var prevId = Long.MinValue
      it.map { case (id, n, pid) =>
        if (pid != prevPid) { cum = bases(pid); prevPid = pid; prevId = Long.MinValue }
        // the documented unique-id precondition, enforced: duplicate ids
        // tie-break nondeterministically in the sort and would silently
        // vary tok_start run to run (range partitioning co-locates equal
        // keys, so the per-partition check is complete)
        require(id > prevId, s"duplicate id $id in packByBudget input")
        require(n >= 0, s"negative token count $n for id $id")
        prevId = id
        val start = cum
        cum += n
        (id, n, start, start / budgetB, start % budgetB)
      }
    }.toDF(idCol, "n_tok", "tok_start", "bin_id", "bin_offset")
    new Packed(out, parted)
  }
}
