package graft.queries

import graft.{FuseRankConfig, FuseRankEngine, Tables}
import graft.encode.EncoderParams
import graft.prep.Prep
import graft.query._
import org.apache.spark.sql.functions._

/** Flagship end-to-end query on the reference's REAL dataset
  * (reference data/restaurants/restaurants.csv, 9,556 rows): the whole
  * SURVEY §7.2 spine — CSV scan (S1) → preprocessing chain (P9-P12) →
  * profile → encode (V1-V5) → fused top-k (K1) — executed by the
  * user-facing FuseRankEngine and hash-checked against a closed-form
  * DuckDB twin that re-derives every score from the raw CSV.
  *
  * The query text is EMPTY (zero text vector) so the fused score is exactly
  * the modality dot products — the one part of the spine that is not
  * SQL-expressible (the hashed-trigram embedder) contributes precisely 0 on
  * both sides, making the full engine path differentially checkable.
  */
object Restaurants {

  private val K = 4 // harmonics — keeps the oracle SQL tractable (fr5 note)

  /** σ-damped Fourier interval series at scaled position `p` (shared
    * template, Q.fourierSeriesSql). */
  private def seriesSql(p: String): String = Q.fourierSeriesSql(K, "a", "b", p)

  private val xhat = "0.99 * (2*((i.cost - mn)/(mx - mn)) - 1)"

  /** Shared raw→prepped→ids CTE prefix (CSV scan, reference prep chain,
    * deterministic row ids) used by both restaurants oracles. */
  private def prepCtes: String = s"""raw AS (
          SELECT * FROM read_csv('${Tables.restaurantsCsvPath}',
            header = true, quote = '"', escape = '"',
            columns = {'Restaurant ID': 'BIGINT', 'Restaurant Name': 'VARCHAR',
              'Country Code': 'INTEGER', 'City': 'VARCHAR', 'Address': 'VARCHAR',
              'Locality': 'VARCHAR', 'Locality Verbose': 'VARCHAR',
              'Longitude': 'DOUBLE', 'Latitude': 'DOUBLE', 'Cuisines': 'VARCHAR',
              'Average Cost for two': 'BIGINT', 'Currency': 'VARCHAR',
              'Has Table booking': 'VARCHAR', 'Has Online delivery': 'VARCHAR',
              'Is delivering now': 'VARCHAR', 'Switch to order menu': 'VARCHAR',
              'Price range': 'INTEGER', 'Aggregate rating': 'DOUBLE',
              'Rating color': 'VARCHAR', 'Rating text': 'VARCHAR',
              'Votes': 'BIGINT'})),
        prepped AS (
          SELECT "Restaurant Name" AS name, City, Cuisines,
                 "Average Cost for two" AS cost, "Has Table booking" AS booked,
                 Longitude AS lon, Latitude AS lat, Votes
          FROM raw
          WHERE Cuisines IS NOT NULL AND Latitude != 0 AND "Country Code" = 1
            AND "Restaurant ID" NOT IN (18489509, 18419884)),
        ids AS (
          SELECT *, row_number() OVER (ORDER BY
              name ASC NULLS FIRST, lon ASC NULLS FIRST, lat ASC NULLS FIRST,
              Votes ASC NULLS FIRST, cost ASC NULLS FIRST,
              City ASC NULLS FIRST, Cuisines ASC NULLS FIRST,
              booked ASC NULLS FIRST) - 1 AS row_id
          FROM prepped),"""

  private val rest1 = Q(
    "rest1_restaurants_fused_topk",
    (s, _) => {
      val items = Prep.withRowId(
        Prep.restaurants(Tables.spread(Tables.restaurants(s))),
        // enough keys that tied rows are indistinguishable in the output
        Seq(col("Restaurant Name"), col("Location.lon"), col("Location.lat"),
          col("Votes"), col("Average Cost for two"), col("City"),
          col("Cuisines"), col("Has Table booking")))
      val eng = FuseRankEngine.index(items, FuseRankConfig(
        idCol = "row_id",
        textCols = Map("Restaurant Name" -> 0.4, "Cuisines" -> 0.6),
        auxCols = Seq("City", "Has Table booking", "Average Cost for two"),
        params = EncoderParams(numHarmonics = K)))
      val out = eng.search("", Seq(
          SparseFilter("City", Seq("New Delhi", "Gurgaon")),
          BinaryFilter("Has Table booking", "Yes", weight = 0.5),
          DenseIntervalFilter("Average Cost for two", 300.0, 800.0, weight = 0.8)),
          k = 20)
        .select(col("row_id").cast("long").as("row_id"), col("relevance"))
        .orderBy(col("relevance").desc, col("row_id"))
      // materialize the 20-row result so the engine's persisted index can be
      // released before returning (a lazy result would re-encode on use)
      val rows = out.collect()
      eng.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    },
    Some(s"""WITH $prepCtes
        mm AS (SELECT min(cost) AS mn, max(cost) AS mx FROM prepped),
        ab AS (SELECT 0.99*((2*((300.0 - mn)/(mx - mn)) - 1) - 0.01) AS a,
                      0.99*((2*((800.0 - mn)/(mx - mn)) - 1) + 0.01) AS b,
                      mn, mx FROM mm),
        iv AS (SELECT a, b, mn, mx, (a + b)/2 AS pin,
                 CASE WHEN abs(a + 1) > abs(1 - b) THEN (a - 1)/2
                      ELSE (b + 1)/2 END AS pout FROM ab),
        scored AS (
          SELECT i.row_id,
            (CASE WHEN i.City IS NULL THEN 0.0
                  WHEN i.City IN ('New Delhi', 'Gurgaon') THEN 1.0
                  ELSE -1.0 END) AS city_score,
            0.5 * (CASE WHEN i.booked IS NULL THEN 0.0
                        WHEN i.booked = 'Yes' THEN 1.0 ELSE -1.0 END) AS booked_score,
            ${seriesSql(xhat)} AS ii_x,
            ${seriesSql("pin")} AS ii_in,
            ${seriesSql("pout")} AS ii_out
          FROM ids i, iv)
        SELECT row_id::BIGINT AS row_id,
          round(city_score + booked_score +
            0.8 * (CASE WHEN ii_x IS NULL
                   THEN -(2/(ii_in - ii_out)) * ((ii_in + ii_out)/2) - 1.0
                   ELSE (2/(ii_in - ii_out)) * ii_x
                        - (2/(ii_in - ii_out)) * ((ii_in + ii_out)/2) END), 5)
            + 0.0 AS relevance
        FROM scored
        ORDER BY relevance DESC, row_id LIMIT 20"""))

  // rest2: the full create_schemas path UNDER ORACLE — fit the best
  // normalizing transform on Votes (4 candidates incl. the MLE-fitted
  // Yeo-Johnson), profile the TRANSFORMED column, encode, transform the
  // raw-unit filter bounds, fused top-k (reference load→create_schemas→
  // transformed_df→encode, src/load.py:16-42 + src/app.py:274-276).
  // The DuckDB twin re-derives EVERYTHING: λ via the recursive-CTE golden
  // section, the 4-way KS argmin, and four candidate scorings of which the
  // argmin winner is selected per-query — so the data-dependent transform
  // CHOICE itself is part of the hash.
  private val rest2Cands: Seq[(String, String => String)] = Seq(
    "reciprocal" -> ((e: String) => s"1.0 / (($e) + 1e-10)"),
    "log2p1" -> ((e: String) => s"log2(($e) + 1)"),
    "sqrt" -> ((e: String) => s"sqrt($e)"),
    // λ referenced as a plain column (lam cross-joined 1-row CTE): DuckDB
    // forbids subqueries inside lambda expressions, where this lands via
    // the Fourier-series list_transform
    "yeojohnson" -> ((e: String) => TransformSql.yjOfSql(e, "lam.lambda")))

  private def rest2Sql: String = {
    val candCtes = rest2Cands.map { case (c, tc) =>
      s"""mm_$c AS (SELECT min(${tc("Votes")}) AS mn, max(${tc("Votes")}) AS mx
            FROM prepped, lam),
          ab_$c AS (SELECT
            0.99*((2*((${tc("100.0")} - mn)/(mx - mn)) - 1) - 0.01) AS a,
            0.99*((2*((${tc("2000.0")} - mn)/(mx - mn)) - 1) + 0.01) AS b,
            mn, mx FROM mm_$c, lam),
          iv0_$c AS (SELECT a, b, mn, mx, (a + b)/2 AS pin,
            CASE WHEN abs(a + 1) > abs(1 - b) THEN (a - 1)/2 ELSE (b + 1)/2 END AS pout
            FROM ab_$c),
          iv_$c AS (SELECT a AS a_$c, b AS b_$c, mn AS mn_$c, mx AS mx_$c,
            ${Q.fourierSeriesSql(K, "a", "b", "pin")} AS in_$c,
            ${Q.fourierSeriesSql(K, "a", "b", "pout")} AS out_$c
            FROM iv0_$c)"""
    }.mkString(",\n")
    def denseFor(c: String, tc: String => String): String = {
      val xhat = s"0.99 * (2*((${tc("i.Votes")} - mn_$c)/(mx_$c - mn_$c)) - 1)"
      s"""(CASE WHEN i.Votes IS NULL
          THEN -(2/(in_$c - out_$c)) * ((in_$c + out_$c)/2) - 1.0
          ELSE (2/(in_$c - out_$c)) *
               ${Q.fourierSeriesSql(K, s"a_$c", s"b_$c", xhat)}
               - (2/(in_$c - out_$c)) * ((in_$c + out_$c)/2) END)"""
    }
    val scoreCols = rest2Cands.map { case (c, tc) =>
      s"${denseFor(c, tc)} AS s_$c"
    }.mkString(",\n            ")
    s"""WITH RECURSIVE $prepCtes
        ${TransformSql.yjFitCtes(
          "SELECT Votes::DOUBLE AS x FROM prepped WHERE Votes IS NOT NULL")},
        ks AS (SELECT
          ${TransformSql.ksSqlFor("1.0 / (Votes + 1e-10)", "prepped", "Votes")} AS k_inv,
          ${TransformSql.ksSqlFor("log2(Votes + 1)", "prepped", "Votes")} AS k_log,
          ${TransformSql.ksSqlFor("sqrt(Votes)", "prepped", "Votes")} AS k_sqrt,
          ${TransformSql.ksSqlFor(
            TransformSql.yjOfSql("Votes", "(SELECT lambda FROM lam)"),
            "prepped", "Votes")} AS k_yj),
        best AS (SELECT CASE
            WHEN k_inv <= k_log AND k_inv <= k_sqrt AND k_inv <= k_yj THEN 'reciprocal'
            WHEN k_log <= k_sqrt AND k_log <= k_yj THEN 'log2p1'
            WHEN k_sqrt <= k_yj THEN 'sqrt'
            ELSE 'yeojohnson' END AS tname FROM ks),
        $candCtes,
        scored AS (
          SELECT i.row_id, best.tname,
            (CASE WHEN i.City IS NULL THEN 0.0
                  WHEN i.City IN ('New Delhi', 'Gurgaon') THEN 1.0
                  ELSE -1.0 END) AS city_score,
            $scoreCols
          FROM ids i, iv_reciprocal, iv_log2p1, iv_sqrt, iv_yeojohnson, best, lam)
        SELECT row_id::BIGINT AS row_id,
          round(city_score + 0.8 * (CASE tname
              WHEN 'reciprocal' THEN s_reciprocal
              WHEN 'log2p1' THEN s_log2p1
              WHEN 'sqrt' THEN s_sqrt
              ELSE s_yeojohnson END), 5) + 0.0 AS relevance
        FROM scored
        ORDER BY relevance DESC, row_id LIMIT 20"""
  }

  private val rest2 = Q(
    "rest2_restaurants_fit_transform_topk",
    (s, _) => {
      val items = Prep.withRowId(
        Prep.restaurants(Tables.spread(Tables.restaurants(s))),
        Seq(col("Restaurant Name"), col("Location.lon"), col("Location.lat"),
          col("Votes"), col("Average Cost for two"), col("City"),
          col("Cuisines"), col("Has Table booking")))
      val eng = FuseRankEngine.index(items, FuseRankConfig(
        idCol = "row_id",
        textCols = Map("Cuisines" -> 1.0),
        auxCols = Seq("City", "Votes"),
        params = EncoderParams(numHarmonics = K),
        fitTransforms = true))
      // the oracle assumes a transform was chosen — fail loudly if the
      // selection path ever degrades to None (KS >= 1 never happens here)
      require(eng.transforms.contains("Votes"),
        s"no transform fitted for Votes: ${eng.transforms}")
      val out = eng.search("", Seq(
          SparseFilter("City", Seq("New Delhi", "Gurgaon")),
          DenseIntervalFilter("Votes", 100.0, 2000.0, weight = 0.8)),
          k = 20)
        .select(col("row_id").cast("long").as("row_id"), col("relevance"))
        .orderBy(col("relevance").desc, col("row_id"))
      val rows = out.collect()
      eng.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    },
    Some(rest2Sql))

  val qs: Seq[Q] = Seq(rest1, rest2)
}
