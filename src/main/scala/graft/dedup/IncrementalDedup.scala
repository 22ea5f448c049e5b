package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate screening: dedup a DELTA batch against an
  * already-curated BASE corpus — the production shape of dedup at 100 TB,
  * where yesterday's corpus is settled and only the new crawl must be
  * screened (re-pairing base↔base on every ingest would redo O(corpus)
  * work per batch; this operator's work is O(delta + touched buckets)).
  *
  * Scheme (the x26/d3 pipeline's measures, re-used so the decision
  * boundary is the same one the batch dedup family hash-checks):
  * word-bigram SHINGLE sets → MinHash banding (2 bands × 4 hashes, the
  * native MinHashBands kernel) on BOTH sides → candidates = delta docs
  * joining base docs on a shared band bucket → word-bigram shingle
  * Jaccard ≥ τ verification → per delta doc, the min-id matching base doc.
  *
  * Scale shape, stated:
  * - the base side's banding is a relation a deployment PERSISTS between
  *   batches (the bucket table on disk); only the delta's banding is
  *   computed per ingest, and the candidate join is an equi-join on
  *   bucket — never a cross product;
  * - base-side skew is capped like d3: a bucket with more than
  *   `bucketCap` base members contributes only its min-id REPRESENTATIVE
  *   as a candidate partner (a near-constant corpus cannot explode the
  *   join; the rep still gives every delta doc in that bucket a verified
  *   decision against the cluster's keeper);
  * - the delta side needs no cap: each delta doc probes exactly its own
  *   ≤ 2 band buckets;
  * - verification moves the corpus-sized shingle relation across the wire
  *   ONCE (the x26 shape: candidate pairs explode into member rows, join
  *   the unioned shingle relation on doc_id, regroup) — never a shingle
  *   shuffle per pair side.
  *
  * Output: one row per DELTA doc — (doc_id, novel, dup_of), where dup_of
  * is the smallest base doc_id whose shingle Jaccard ≥ τ, or −1 when
  * novel. Doc ids must be disjoint across base and delta. Intermediates
  * persist until the caller's clearCache (the d3/d7 lifecycle).
  */
object IncrementalDedup {

  private def tokensOf(text: Column): Column = split(trim(text), "\\s+")

  /** Word-bigram shingles over a bound token array (TextDedup.wordNgrams'
    * guard: < 2 tokens → empty array). */
  private def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  def screen(base: DataFrame, delta: DataFrame,
             idCol: String, textCol: String,
             tau: Double,
             bucketCap: Int = graft.search.Search.LshBucketCap): DataFrame = {
    def shingled(df: DataFrame): DataFrame = df
      .withColumn("__toks", tokensOf(col(textCol)))
      .select(col(idCol).cast("long").as("doc_id"),
        array_distinct(bigrams(col("__toks"))).as("sh"))
    // both shingle relations are scanned twice (banding + verification)
    val bsh = shingled(base).persist()
    val dsh = shingled(delta).persist()
    def buckets(sh: DataFrame): DataFrame = sh.filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        explode(org.apache.spark.sql.graft.MinHashBands.bands(
          col("sh"), 8, 4)).as("bucket"))
    val bb = buckets(bsh).persist() // scanned twice: stats + partner join
    // base-side skew cap (the d3 rep-star fallback, cross-relation form)
    val stats = bb.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bn"), min(col("doc_id")).as("rep"))
    val partners = bb.join(stats, "bucket")
      .select(col("bucket"),
        when(col("bn") <= bucketCap, col("doc_id"))
          .otherwise(col("rep")).as("base_id"))
    val cand = buckets(dsh).select(col("bucket"), col("doc_id").as("delta_id"))
      .join(partners, "bucket")
      .select(col("delta_id"), col("base_id"))
      .distinct()
    // one-shuffle verification: pair rows explode into their two member
    // ids, the UNIONED shingle relation joins once on doc_id, the regroup
    // moves only matched pairs' arrays (ids are disjoint across sides)
    val allSh = bsh.unionByName(dsh)
    val verified = cand
      .select(col("delta_id"), col("base_id"),
        explode(array(col("delta_id"), col("base_id"))).as("doc_id"))
      .join(allSh, "doc_id")
      .groupBy(col("delta_id"), col("base_id"))
      .agg(
        first(when(col("doc_id") === col("delta_id"), col("sh")),
          ignoreNulls = true).as("d_sh"),
        first(when(col("doc_id") === col("base_id"), col("sh")),
          ignoreNulls = true).as("b_sh"))
      .filter(size(array_intersect(col("d_sh"), col("b_sh"))).cast("double") /
        size(array_union(col("d_sh"), col("b_sh"))) >= tau)
    val matched = verified.groupBy(col("delta_id"))
      .agg(min(col("base_id")).as("__dup"))
    delta.select(col(idCol).cast("long").as("doc_id"))
      .join(matched, col("doc_id") === col("delta_id"), "left")
      .select(col("doc_id"), col("__dup").isNull.as("novel"),
        coalesce(col("__dup"), lit(-1L)).as("dup_of"))
  }
}
