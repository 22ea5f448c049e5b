package graft.queries

import graft.Tables
import graft.functions.Geo
import org.apache.spark.sql.functions._

/** Geolocation math (SURVEY.md §2.5 V3 / §2.6 Q3) pinned against a DuckDB
  * oracle. The testdata has no real lon/lat columns, so deterministic
  * synthetic coordinates are derived from integer keys (exact integer math,
  * identical on both engines).
  */
object GeoQueries {

  // Synthetic but deterministic coordinates from customer keys.
  private val lonExpr = "(c_custkey % 360) - 180"
  private val latExpr = "((c_custkey * 7) % 160) - 80"

  private val g1 = Q(
    "g1_haversine",
    (s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double"))
        .withColumn("lat", (col("c_custkey") * 7 % 160 - 80).cast("double"))
      c.select(col("c_custkey"),
        round(Geo.haversine(col("lon"), col("lat"), lit(0.0), lit(0.0)), 6)
          .as("dist_km"))
        .orderBy("c_custkey")
    },
    Some(s"""SELECT c_custkey,
             round(2.0 * 6371.0 * asin(sqrt(
               pow(sin(radians(0.0 - lat) / 2), 2) +
               cos(radians(lat)) * cos(radians(0.0)) *
               pow(sin(radians(0.0 - lon) / 2), 2))), 6) AS dist_km
             FROM (SELECT c_custkey, ($lonExpr)::DOUBLE AS lon,
                          ($latExpr)::DOUBLE AS lat FROM customer)
             ORDER BY c_custkey"""))

  private val g2 = Q(
    "g2_cartesian",
    (s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double"))
        .withColumn("lat", (col("c_custkey") * 7 % 160 - 80).cast("double"))
      // `+ 0.0` collapses IEEE −0.0 → +0.0 (engines disagree on the sign
      // of rounded ≈0 values; −0.0 vs 0.0 hash differently).
      c.select(col("c_custkey"),
        (round(Geo.cartesianX(col("lon"), col("lat")), 6) + 0.0).as("cx"),
        (round(Geo.cartesianY(col("lon"), col("lat")), 6) + 0.0).as("cy"),
        (round(Geo.cartesianZ(col("lon"), col("lat")), 6) + 0.0).as("cz"))
        .orderBy("c_custkey")
    },
    Some(s"""SELECT c_custkey,
             round(cos(radians(lat)) * cos(radians(lon)), 6) + 0.0 AS cx,
             round(cos(radians(lat)) * sin(radians(lon)), 6) + 0.0 AS cy,
             round(sin(radians(lat)), 6) + 0.0 AS cz
             FROM (SELECT c_custkey, ($lonExpr)::DOUBLE AS lon,
                          ($latExpr)::DOUBLE AS lat FROM customer)
             ORDER BY c_custkey"""))

  // Q3's farthest-point aggregate (argmax haversine) as an oracle query.
  private val g3 = Q(
    "g3_farthest_point",
    (s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double"))
        .withColumn("lat", (col("c_custkey") * 7 % 160 - 80).cast("double"))
        .withColumn("dist", round(Geo.haversine(col("lon"), col("lat"),
          lit(10.0), lit(50.0)), 6))
      c.orderBy(col("dist").desc, col("c_custkey")).limit(1)
        .select(col("c_custkey"), col("dist"))
    },
    Some(s"""SELECT c_custkey, dist FROM (
               SELECT c_custkey,
                 round(2.0 * 6371.0 * asin(sqrt(
                   pow(sin(radians(50.0 - lat) / 2), 2) +
                   cos(radians(lat)) * cos(radians(50.0)) *
                   pow(sin(radians(10.0 - lon) / 2), 2))), 6) AS dist
               FROM (SELECT c_custkey, ($lonExpr)::DOUBLE AS lon,
                            ($latExpr)::DOUBLE AS lat FROM customer))
             ORDER BY dist DESC, c_custkey LIMIT 1"""))

  val qs: Seq[Q] = Seq(g1, g2, g3)
}
