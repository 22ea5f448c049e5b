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

  private val rest1 = Q(
    "rest1_restaurants_fused_topk",
    (s, _) => {
      val items = Prep.withRowId(
        Prep.restaurants(Tables.restaurants(s)),
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
    Some(s"""WITH raw AS (
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
          FROM prepped),
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

  val qs: Seq[Q] = Seq(rest1)
}
