package graft

import graft.queries.{Pipeline, Registry}
import org.apache.spark.sql.functions._

/** Curation-funnel observability contract (Pipeline.funnel): the
  * per-stage survivor counts of the x26 pipeline must be internally
  * consistent (a funnel only narrows), must agree with the hash-checked
  * manifest on the final stage, and must agree with an independent scan
  * of the source on the first — so an operator reading the funnel after
  * a 100-TB batch can trust every row of it. */
class FunnelSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private lazy val funnel: Seq[(Int, String, Long)] = {
    val f = Pipeline.funnel(spark, dir)
      .orderBy("stage_order")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq
    spark.catalog.clearCache() // the joints' lifecycle, the harness convention
    f
  }
  private def docs(stage: String): Long =
    funnel.find(_._2 == stage).map(_._3)
      .getOrElse(fail(s"stage $stage missing from funnel"))

  test("funnel reports the eight stages in pipeline order") {
    assert(funnel.map(_._2) == Seq(
      "ingested_en", "quality_gated", "lm_scored", "lm_rank_cut",
      "exact_deduped", "fuzzy_deduped", "decontaminated", "domain_capped"))
    assert(funnel.map(_._1) == (1 to 8))
  }

  test("a funnel only narrows: every stage's count ≤ the previous stage's") {
    funnel.sliding(2).foreach { case Seq((_, a, na), (_, b, nb)) =>
      assert(nb <= na, s"$b ($nb) exceeds $a ($na) — a curation stage added documents")
    }
    assert(docs("domain_capped") > 0, "empty manifest — every stage must bite, not obliterate")
  }

  test("first stage matches an independent count of the source relation") {
    val independent = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") >= 20 && col("lang") === "en").count()
    assert(docs("ingested_en") == independent)
  }

  test("rank-cut arithmetic: lm_rank_cut = lm_scored − ⌊lm_scored/20⌋") {
    val n = docs("lm_scored")
    assert(docs("lm_rank_cut") == n - n / 20)
  }

  test("last stage equals the hash-checked manifest's row count") {
    val x26 = Registry.all.find(_.name == "x26_training_manifest")
      .getOrElse(fail("x26 not registered"))
    val manifestRows = x26.fn(spark, dir).count()
    spark.catalog.clearCache()
    assert(docs("domain_capped") == manifestRows,
      "the funnel's final stage must account for exactly the manifest rows (capped ⋈ packed is 1:1)")
  }

  // ---- delta (x31) funnel — the ingest-time counterpart ----

  private lazy val deltaFunnel: Seq[(Int, String, Long)] = {
    val f = Pipeline.deltaFunnel(spark, dir)
      .orderBy("stage_order")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq
    spark.catalog.clearCache()
    f
  }
  private def deltaDocs(stage: String): Long =
    deltaFunnel.find(_._2 == stage).map(_._3)
      .getOrElse(fail(s"stage $stage missing from delta funnel"))

  test("delta funnel reports the eight ingest stages in pipeline order") {
    assert(deltaFunnel.map(_._2) == Seq(
      "ingested_delta_en", "quality_gated", "lm_scored", "frozen_rank_cut",
      "exact_deduped", "fuzzy_novel", "decontaminated", "domain_capped"))
    assert(deltaFunnel.map(_._1) == (1 to 8))
  }

  test("delta funnel only narrows and lands non-empty") {
    deltaFunnel.sliding(2).foreach { case Seq((_, a, na), (_, b, nb)) =>
      assert(nb <= na, s"$b ($nb) exceeds $a ($na) — an ingest stage added documents")
    }
    assert(deltaDocs("domain_capped") > 0, "empty delta manifest — every stage must bite, not obliterate")
  }

  test("delta funnel's first stage matches an independent count of the delta split") {
    val independent = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") >= 20 && col("lang") === "en" && col("doc_id") % 5 === 0)
      .count()
    assert(deltaDocs("ingested_delta_en") == independent)
  }

  test("delta funnel's last stage equals the hash-checked x31 manifest's row count") {
    val x31 = Registry.all.find(_.name == "x31_delta_manifest")
      .getOrElse(fail("x31 not registered"))
    val manifestRows = x31.fn(spark, dir).count()
    spark.catalog.clearCache()
    assert(deltaDocs("domain_capped") == manifestRows,
      "the delta funnel's final stage must account for exactly the delta-manifest rows")
  }
}
