package graft.queries

import graft.Tables
import graft.encode._
import graft.profile.Profiler
import graft.query._
import graft.search.Search
import org.apache.spark.sql.functions._

/** FuseRank-core differential queries: the REAL engine path (profile →
  * ProductEncoder block columns → QueryEncoder literal vector → dot) checked
  * against closed-form DuckDB SQL derived from the encoding semantics
  * (reference src/encode.py:47-189). Each modality's dot product has a
  * closed form; hash-matching them verifies the whole encode spine
  * differentially — stronger than the reference's own recall-only harness.
  *
  * K=4 harmonics keeps oracle SQL tractable; the math is identical at any K
  * (K=200 covered by ScalaTest + bench paths).
  */
object FuseRank {

  private val K = 4
  private val params = EncoderParams(numHarmonics = K)

  // fr1: sparse one-hot dot — +1 if value selected else −1; null row → 0.
  private val fr1 = Q(
    "fr1_sparse_score",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val prof = Profiler.profile(cust, Seq("c_mktsegment"))("c_mktsegment")
      val layout = VectorLayout(Seq(SparseBlock("c_mktsegment", prof.distinctSorted)))
      val q = QueryEncoder.encode(layout,
        Map("c_mktsegment" -> SparseFilter("c_mktsegment", Seq("AUTOMOBILE", "BUILDING"))))
      ProductEncoder.encode(cust, layout)
        .withColumn("score", round(Search.dot(col("fused_vec"), typedLit(q)), 6) + 0.0)
        .select(col("c_custkey"), col("score"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
            round((CASE WHEN c_mktsegment IS NULL THEN 0.0
                       WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING') THEN 1.0
                       ELSE -1.0 END)::DOUBLE, 6) + 0.0 AS score
            FROM customer ORDER BY c_custkey"""))

  // fr2: binary ±1 dot; value order = sorted ('F' → −1, 'O' → +1).
  private val fr2 = Q(
    "fr2_binary_score",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val prof = Profiler.profile(li, Seq("l_linestatus"))("l_linestatus")
      val (v0, v1) = prof.binaryValues
      val layout = VectorLayout(Seq(BinaryBlock("l_linestatus", v0, v1)))
      val q = QueryEncoder.encode(layout,
        Map("l_linestatus" -> BinaryFilter("l_linestatus", "O")))
      ProductEncoder.encode(li, layout)
        .withColumn("score", round(Search.dot(col("fused_vec"), typedLit(q)), 6) + 0.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("score"))
        .orderBy("l_orderkey", "l_linenumber", "score")
    },
    Some("""SELECT l_orderkey, l_linenumber,
            round((CASE WHEN l_linestatus IS NULL THEN 0.0
                       WHEN l_linestatus = 'O' THEN 1.0 ELSE -1.0 END)::DOUBLE, 6) + 0.0 AS score
            FROM lineitem ORDER BY l_orderkey, l_linenumber, score"""))

  // fr3: geolocation dot — scale-and-shift against the data-dependent
  // farthest point (one max_by aggregate), then pure trig per row.
  private val fr3 = Q(
    "fr3_geo_score",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double"))
        .withColumn("lat", (col("c_custkey") * 7 % 160 - 80).cast("double"))
      val layout = VectorLayout(Seq(GeoBlock("geo", "lon", "lat")))
      val q = QueryEncoder.encode(layout,
        Map("geo" -> GeoFilter("geo", 10.0, 50.0)),
        farthest = QueryEncoder.sparkFarthest(cust, Map("geo" -> ("lon", "lat"))))
      ProductEncoder.encode(cust, layout)
        .withColumn("score", round(Search.dot(col("fused_vec"), typedLit(q)), 6) + 0.0)
        .select(col("c_custkey"), col("score"))
        .orderBy("c_custkey")
    },
    Some("""WITH pts AS (
              SELECT c_custkey, ((c_custkey % 360) - 180)::DOUBLE AS lon,
                     (((c_custkey * 7) % 160) - 80)::DOUBLE AS lat FROM customer),
            far AS (
              SELECT lon AS flon, lat AS flat FROM pts
              ORDER BY 2.0 * 6371.0 * asin(sqrt(
                  pow(sin(radians(50.0 - lat) / 2), 2) +
                  cos(radians(lat)) * cos(radians(50.0)) *
                  pow(sin(radians(10.0 - lon) / 2), 2))) DESC,
                lon DESC, lat DESC
              LIMIT 1),
            enc AS (
              SELECT
                cos(radians(50.0)) * cos(radians(10.0)) AS qx,
                cos(radians(50.0)) * sin(radians(10.0)) AS qy,
                sin(radians(50.0)) AS qz,
                cos(radians(flat)) * cos(radians(flon)) AS fx,
                cos(radians(flat)) * sin(radians(flon)) AS fy,
                sin(radians(flat)) AS fz
              FROM far),
            prm AS (
              SELECT qx * 2 / (1 - (qx*fx + qy*fy + qz*fz)) AS ex,
                     qy * 2 / (1 - (qx*fx + qy*fy + qz*fz)) AS ey,
                     qz * 2 / (1 - (qx*fx + qy*fy + qz*fz)) AS ez,
                     1 - (qx*qx + qy*qy + qz*qz) * 2 / (1 - (qx*fx + qy*fy + qz*fz)) AS eshift
              FROM enc)
            SELECT c_custkey,
              round(cos(radians(lat)) * cos(radians(lon)) * ex +
                    cos(radians(lat)) * sin(radians(lon)) * ey +
                    sin(radians(lat)) * ez + eshift, 6) + 0.0 AS score
            FROM pts, prm ORDER BY c_custkey"""))

  // fr4: dense centroid dot — closed form s·cos(π/2(x̂−v̂)) + shift.
  // Product x̂ carries the (1−range_ε) factor; the query value does NOT
  // (reference src/encode.py:86 vs :171).
  private val fr4 = Q(
    "fr4_dense_centroid_score",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val prof = Profiler.profile(li, Seq("l_quantity"))("l_quantity")
      val layout = VectorLayout(Seq(DenseBlock("l_quantity", prof.min, prof.max, params)))
      val q = QueryEncoder.encode(layout,
        Map("l_quantity" -> DensePointFilter("l_quantity", 25.0)))
      ProductEncoder.encode(li, layout)
        .withColumn("score", round(Search.dot(col("fused_vec"), typedLit(q)), 6) + 0.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("score"))
        .orderBy("l_orderkey", "l_linenumber", "score")
    },
    Some("""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem),
            prm AS (
              SELECT 2 * ((25.0 - mn) / (mx - mn)) - 1 AS vhat, mn, mx FROM mm),
            enc AS (
              SELECT vhat, mn, mx,
                CASE WHEN vhat < 0 THEN 1.0 ELSE -1.0 END AS fv FROM prm),
            sc AS (
              SELECT vhat, mn, mx,
                2 / (1 - (sin(pi()/2*vhat)*sin(pi()/2*fv) + cos(pi()/2*vhat)*cos(pi()/2*fv))) AS s
              FROM enc),
            fin AS (
              SELECT vhat, mn, mx, s, 1 - s * (sin(pi()/2*vhat)*sin(pi()/2*vhat) +
                     cos(pi()/2*vhat)*cos(pi()/2*vhat)) AS shift FROM sc)
            SELECT l_orderkey, l_linenumber,
              round(CASE WHEN l_quantity IS NULL THEN shift - 1.0
                    ELSE s * cos(pi()/2 * (0.99 * (2*((l_quantity - mn)/(mx - mn)) - 1) - vhat))
                         + shift END, 6) + 0.0 AS score
            FROM lineitem, fin ORDER BY l_orderkey, l_linenumber, score"""))

  // fr5: dense interval dot — the σ-damped Fourier partial sum, computed by
  // the REAL encoded vectors in Spark and by the analytic series in DuckDB:
  //   c_sin(k) = σs(k)·(cos(aπk)−cos(bπk))/((b−a)²·πk)   (σs(1)=1 — the
  //   reference's scalar-sigma special case), fourier side σv(k);
  //   I(x) = Σ_k σv(k)·(c_sin(k)·sin(kπx̂) + c_cos(k)·cos(kπx̂));
  //   s = 2/(I(mid)−I(out)), shift = (I(mid)+I(out))/2;
  //   row dot = s·I(x̂) − s·shift   (null row → −s·shift − 1).
  private val fr5 = Q(
    "fr5_dense_interval_score",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val prof = Profiler.profile(li, Seq("l_quantity"))("l_quantity")
      val layout = VectorLayout(Seq(DenseBlock("l_quantity", prof.min, prof.max, params)))
      val q = QueryEncoder.encode(layout,
        Map("l_quantity" -> DenseIntervalFilter("l_quantity", 5.0, 35.0)))
      ProductEncoder.encode(li, layout)
        .withColumn("score", round(Search.dot(col("fused_vec"), typedLit(q)), 5) + 0.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("score"))
        .orderBy("l_orderkey", "l_linenumber", "score")
    },
    Some(s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem),
            ab AS (
              SELECT 0.99 * ((2*((5.0 - mn)/(mx - mn)) - 1) - 0.01) AS a,
                     0.99 * ((2*((35.0 - mn)/(mx - mn)) - 1) + 0.01) AS b, mn, mx
              FROM mm),
            iv0 AS (SELECT a, b, mn, mx,
                     (a + b)/2 AS pin,
                     CASE WHEN abs(a + 1) > abs(1 - b) THEN (a - 1)/2 ELSE (b + 1)/2 END AS pout
                   FROM ab),
            -- ii_in/ii_out are row-INVARIANT: series evaluated once here
            iv AS (SELECT a, b, mn, mx,
                ${Q.fourierSeriesSql(K, "a", "b", "pin")} AS ii_in,
                ${Q.fourierSeriesSql(K, "a", "b", "pout")} AS ii_out
              FROM iv0)
            SELECT l_orderkey, l_linenumber,
              round(CASE WHEN l_quantity IS NULL
                    THEN -(2/(ii_in - ii_out)) * ((ii_in + ii_out)/2) - 1.0
                    ELSE (2/(ii_in - ii_out)) * ii_x - (2/(ii_in - ii_out)) * ((ii_in + ii_out)/2)
                    END, 5) + 0.0 AS score
            FROM (
              SELECT l_orderkey, l_linenumber, l_quantity, ii_in, ii_out,
                ${Q.fourierSeriesSql(K, "a", "b",
                  "0.99 * (2*((l_quantity - mn)/(mx - mn)) - 1)")} AS ii_x
              FROM lineitem, iv)
            ORDER BY l_orderkey, l_linenumber, score"""))

  // fr8: fr5 at the PRODUCTION parameterization — num_harmonics = 200
  // (the reference default, src/encode.py:31) → a 405-dim dense block, so
  // the native codegen Fourier block builder is oracle-checked at full
  // serving width, not only at the SQL-tractable K=4.
  private val K200 = 200
  private val paramsK200 = EncoderParams(numHarmonics = K200)

  private def isr200(pos: String): String = Q.fourierSeriesSql(K200, "a", "b", pos)

  private val fr8 = Q(
    "fr8_dense_interval_k200",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val prof = Profiler.profile(li, Seq("l_quantity"))("l_quantity")
      val layout = VectorLayout(Seq(DenseBlock("l_quantity", prof.min, prof.max, paramsK200)))
      val q = QueryEncoder.encode(layout,
        Map("l_quantity" -> DenseIntervalFilter("l_quantity", 10.0, 30.0)))
      ProductEncoder.encode(li, layout)
        .withColumn("score", round(Search.dot(col("fused_vec"), typedLit(q)), 5) + 0.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("score"))
        .orderBy("l_orderkey", "l_linenumber", "score")
    },
    Some(s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem),
            ab AS (
              SELECT 0.99 * ((2*((10.0 - mn)/(mx - mn)) - 1) - 0.01) AS a,
                     0.99 * ((2*((30.0 - mn)/(mx - mn)) - 1) + 0.01) AS b, mn, mx
              FROM mm),
            iv0 AS (SELECT a, b, mn, mx,
                     (a + b)/2 AS pin,
                     CASE WHEN abs(a + 1) > abs(1 - b) THEN (a - 1)/2 ELSE (b + 1)/2 END AS pout
                   FROM ab),
            -- ii_in/ii_out are row-INVARIANT: evaluate the 200-term series
            -- once here, not once per row (same expressions → same doubles)
            iv AS (SELECT a, b, mn, mx,
                     ${isr200("pin")} AS ii_in,
                     ${isr200("pout")} AS ii_out
                   FROM iv0)
            SELECT l_orderkey, l_linenumber,
              round(CASE WHEN l_quantity IS NULL
                    THEN -(2/(ii_in - ii_out)) * ((ii_in + ii_out)/2) - 1.0
                    ELSE (2/(ii_in - ii_out)) * ii_x - (2/(ii_in - ii_out)) * ((ii_in + ii_out)/2)
                    END, 5) + 0.0 AS score
            FROM (
              SELECT l_orderkey, l_linenumber, l_quantity, ii_in, ii_out,
                ${isr200(s"0.99 * (2*((l_quantity - mn)/(mx - mn)) - 1)")} AS ii_x
              FROM lineitem, iv)
            ORDER BY l_orderkey, l_linenumber, score"""))

  // fr6: fused multimodal top-k — text block (precomputed embeddings) +
  // sparse lang + dense n_chars, one exact inner-product top-k.
  private val fr6 = Q(
    "fr6_fused_topk",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val items = Embedders.precomputed(docs, emb, "doc_id", "vec_id", "embedding")
      val profs = Profiler.profile(items, Seq("lang", "n_chars"))
      val layout = VectorLayout(Seq(
        TextBlock("embedding", 64),
        SparseBlock("lang", profs("lang").distinctSorted),
        DenseBlock("n_chars", profs("n_chars").min, profs("n_chars").max, params)))
      val q = QueryEncoder.encode(layout,
        Map(
          "lang" -> SparseFilter("lang", Seq("en", "de"), weight = 0.5),
          "n_chars" -> DenseIntervalFilter("n_chars", 100.0, 300.0, weight = 0.8)),
        textVec = Vectors.QVEC)
      Search.fusedTopK(ProductEncoder.encode(items, layout), "fused_vec", "doc_id", q, 20)
    },
    Some(s"""WITH mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents),
            ab AS (
              SELECT 0.99 * ((2*((100.0 - mn)/(mx - mn)) - 1) - 0.01) AS a,
                     0.99 * ((2*((300.0 - mn)/(mx - mn)) - 1) + 0.01) AS b, mn, mx
              FROM mm),
            iv AS (SELECT a, b, mn, mx, (a + b)/2 AS pin,
                     CASE WHEN abs(a + 1) > abs(1 - b) THEN (a - 1)/2 ELSE (b + 1)/2 END AS pout
                   FROM ab),
            scored AS (
              SELECT d.doc_id,
                list_dot_product(e.embedding::DOUBLE[], ${Vectors.qvecSql}) AS text_score,
                0.5 * (CASE WHEN d.lang IS NULL THEN 0.0
                            WHEN d.lang IN ('en','de') THEN 1.0 ELSE -1.0 END) AS lang_score,
                ${Q.fourierSeriesSql(K, "a", "b",
                  "0.99 * (2*((d.n_chars - mn)/(mx - mn)) - 1)")} AS ii_x,
                ${Q.fourierSeriesSql(K, "a", "b", "pin")} AS ii_in,
                ${Q.fourierSeriesSql(K, "a", "b", "pout")} AS ii_out
              FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id, iv)
            SELECT doc_id,
              round(text_score + lang_score +
                0.8 * (CASE WHEN ii_x IS NULL
                       THEN -(2/(ii_in - ii_out)) * ((ii_in + ii_out)/2) - 1.0
                       ELSE (2/(ii_in - ii_out)) * ii_x
                            - (2/(ii_in - ii_out)) * ((ii_in + ii_out)/2) END), 5) + 0.0 AS score
            FROM scored
            ORDER BY score DESC, doc_id LIMIT 20"""))

  // fr7: NEGATED sparse + negated centroid — the sign-flip paths
  // (reference src/encode.py:142-143,173-174).
  private val fr7 = Q(
    "fr7_negated_score",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val profs = Profiler.profile(cust, Seq("c_mktsegment", "c_acctbal"))
      val layout = VectorLayout(Seq(
        SparseBlock("c_mktsegment", profs("c_mktsegment").distinctSorted),
        DenseBlock("c_acctbal", profs("c_acctbal").min, profs("c_acctbal").max, params)))
      val q = QueryEncoder.encode(layout,
        Map(
          "c_mktsegment" -> SparseFilter("c_mktsegment", Seq("AUTOMOBILE"), negated = true),
          "c_acctbal" -> DensePointFilter("c_acctbal", 0.0, negated = true, weight = 0.7)))
      ProductEncoder.encode(cust, layout)
        .withColumn("score", round(Search.dot(col("fused_vec"), typedLit(q)), 5) + 0.0)
        .select(col("c_custkey"), col("score"))
        .orderBy("c_custkey")
    },
    Some("""WITH mm AS (SELECT min(c_acctbal) AS mn, max(c_acctbal) AS mx FROM customer),
            prm AS (SELECT 2 * ((0.0 - mn) / (mx - mn)) - 1 AS vhat, mn, mx FROM mm),
            enc AS (SELECT vhat, mn, mx,
                      CASE WHEN vhat < 0 THEN 1.0 ELSE -1.0 END AS fv FROM prm),
            sc AS (SELECT vhat, mn, mx,
                     2 / (1 - (sin(pi()/2*vhat)*sin(pi()/2*fv) + cos(pi()/2*vhat)*cos(pi()/2*fv))) AS s
                   FROM enc),
            fin AS (SELECT vhat, mn, mx, s,
                      1 - s * (sin(pi()/2*vhat)*sin(pi()/2*vhat) +
                               cos(pi()/2*vhat)*cos(pi()/2*vhat)) AS shift FROM sc)
            SELECT c_custkey,
              round(
                -- negated sparse: sign-flipped membership
                (CASE WHEN c_mktsegment IS NULL THEN 0.0
                      WHEN c_mktsegment = 'AUTOMOBILE' THEN -1.0 ELSE 1.0 END)
                -- negated centroid: the 3 encoded dims flip, the null-ind
                -- weight dim does NOT (appended after negation); product
                -- shift dims multiply flipped query dims
                + 0.7 * (CASE WHEN c_acctbal IS NULL THEN -shift - 1.0
                         ELSE -(s * cos(pi()/2 * (0.99 * (2*((c_acctbal - mn)/(mx - mn)) - 1) - vhat))
                                + shift) END), 5) + 0.0 AS score
            FROM customer, fin ORDER BY c_custkey"""))

  val qs: Seq[Q] = Seq(fr1, fr2, fr3, fr4, fr5, fr6, fr7, fr8)
}
