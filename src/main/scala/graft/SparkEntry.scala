package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Registry, Vectors}
import graft.search.Search

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: multimodal fused search — text block (precomputed
    * embeddings) + sparse language + dense n_chars interval in ONE exact
    * inner-product top-k, gathered back to the documents table (reference
    * lifecycle §3.1: encode_query → IndexFlatIP.search → iloc gather).
    * Runs on /root/testdata/sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val top = queries("fr6_fused_topk")(spark, dir)
    top.join(Tables.documents(spark, dir), Seq("doc_id"))
      .select(col("doc_id"), col("score").as("relevance"), col("lang"),
        col("source"), col("n_chars"))
      .orderBy(col("relevance").desc, col("doc_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    require(Registry.duplicateNames.isEmpty,
      s"duplicate query names: ${Registry.duplicateNames.mkString(",")}")
    Registry.all.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
