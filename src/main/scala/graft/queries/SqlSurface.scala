package graft.queries

import org.apache.spark.sql.graft.GraftFunctions

import graft.Tables

/** The SQL surface, end-to-end under the oracle gate: these queries go
  * through `spark.sql` TEXT calling the registered `graft_*` functions
  * (GraftFunctions.register / spark.sql.extensions=graft.GraftExtensions)
  * — no Column API anywhere — and hash-match the same DuckDB twins the
  * library-API queries match. Proves a SQL-only user (spark-sql shell,
  * JDBC, a notebook with no graft imports) gets the identical kernels:
  * parser → FunctionRegistry → the same codegen expressions.
  */
object SqlSurface {

  // X27: text-family functions from pure SQL — the native byte-scan
  // token count plus the one-pass MinHash banding kernel (the d3/x26
  // building block), addressed only by their SQL names.
  private val x27 = Q(
    "x27_sql_text_surface",
    (s, d) => {
      GraftFunctions.register(s)
      Tables.spread(Tables.documents(s, d)).createOrReplaceTempView("x27_documents")
      s.sql("""
        SELECT doc_id,
               CAST(graft_token_count(text) AS BIGINT) AS n_tokens,
               element_at(graft_minhash_bands(
                 array_distinct(split(trim(text), '\\s+')), 8, 4), 1) AS band1,
               element_at(graft_minhash_bands(
                 array_distinct(split(trim(text), '\\s+')), 8, 4), 2) AS band2
        FROM x27_documents ORDER BY doc_id""")
    },
    Some("""WITH toks AS (
              SELECT DISTINCT doc_id,
                     unnest(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+')) AS tok
              FROM documents),
            sig AS (
              SELECT doc_id,
                     min(md5('0:' || tok)) AS h0, min(md5('1:' || tok)) AS h1,
                     min(md5('2:' || tok)) AS h2, min(md5('3:' || tok)) AS h3,
                     min(md5('4:' || tok)) AS h4, min(md5('5:' || tok)) AS h5,
                     min(md5('6:' || tok)) AS h6, min(md5('7:' || tok)) AS h7
              FROM toks GROUP BY doc_id)
            SELECT d.doc_id,
                   len(string_split_regex(trim(d.text), '[ \t\n\x0b\f\r]+')) AS n_tokens,
                   '0:' || md5(s.h0 || s.h1 || s.h2 || s.h3) AS band1,
                   '1:' || md5(s.h4 || s.h5 || s.h6 || s.h7) AS band2
            FROM documents d JOIN sig s USING (doc_id)
            ORDER BY d.doc_id"""))

  // X28: vector-family functions from pure SQL — float→double cast, the
  // packed little-endian binary layout round-tripped (pack → unpack),
  // and both dot kernels (array form and packed form) agreeing with
  // DuckDB's list_dot_product on every row.
  private val x28 = Q(
    "x28_sql_vector_surface",
    (s, d) => {
      GraftFunctions.register(s)
      Tables.embeddings(s, d).createOrReplaceTempView("x28_embeddings")
      s.sql("""
        SELECT vec_id,
               round(graft_dot(graft_unpack(graft_pack(CAST(embedding AS ARRAY<DOUBLE>))),
                               CAST(embedding AS ARRAY<DOUBLE>)), 5) + 0.0 AS norm_sq,
               round(graft_dot_packed(graft_pack(CAST(embedding AS ARRAY<DOUBLE>)),
                                      CAST(embedding AS ARRAY<DOUBLE>)), 5) + 0.0 AS norm_sq_packed
        FROM x28_embeddings ORDER BY vec_id""")
    },
    Some("""SELECT vec_id,
            round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 5) + 0.0 AS norm_sq,
            round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 5) + 0.0 AS norm_sq_packed
            FROM embeddings ORDER BY vec_id"""))

  val qs: Seq[Q] = Seq(x27, x28)
}
