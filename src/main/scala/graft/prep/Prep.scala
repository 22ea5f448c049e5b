package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset preprocessing pipelines (reference loaders): pure
  * DataFrame → DataFrame functions with a stable `row_id` assigned at
  * ingest (SURVEY.md §7.1 step 3 — the reference leans on the pandas row
  * index for joins/sampling/drop-by-id; `monotonically_increasing_id` is
  * partition-dependent, so row identity comes from a deterministic sort).
  */
object Prep {

  /** Stable row id: row_number over a deterministic total order. One window
    * pass at ingest; every later join/sample keys on it.
    *
    * SCALE GUARD: the unpartitioned window funnels ALL rows through one
    * task — correct and cheap for the ≤10K-row CSV ingests it serves, but
    * this pattern must never migrate to a big-table path. Large ingests
    * should derive row identity from data itself (a hash/composite of the
    * ordering key, like the md5 identities the dedup/sample queries use)
    * or zipWithIndex-style per-partition offsets. */
  def withRowId(df: DataFrame, order: Seq[Column], col0: String = "row_id"): DataFrame =
    df.withColumn(col0, row_number().over(Window.orderBy(order: _*)) - 1)

  /** Restaurants pipeline (reference src/load_restaurants.py:10-29):
    * dropna(Cuisines) → Latitude != 0 → Country Code == 1 → drop two
    * mislabeled rows (pandas indices 8620, 3513 — resolved to stable
    * `Restaurant ID`s 18489509 "InnerChef" and 18419884 "Test Restaruants
    * for Medio" in the fixed CSV) → Location struct(lon, lat) → drop 11
    * columns.
    */
  val restaurantsDroppedIds: Seq[Long] = Seq(18489509L, 18419884L)

  def restaurants(raw: DataFrame): DataFrame =
    raw
      .filter(col("Cuisines").isNotNull)
      .filter(col("Latitude") =!= 0)
      .filter(col("Country Code") === 1)
      .filter(!col("Restaurant ID").isin(restaurantsDroppedIds: _*))
      .withColumn("Location",
        struct(col("Longitude").as("lon"), col("Latitude").as("lat")))
      .drop("Restaurant ID", "Country Code", "Address", "Locality",
        "Locality Verbose", "Longitude", "Latitude", "Currency",
        "Is delivering now", "Switch to order menu", "Rating color")

  /** Flipkart-shaped pipeline (reference src/load_flipkart.py:11-38):
    * fillna → category-tree split into 3 positional columns → regex scrub
    * of [" ] → trim → spec reformat (regex extract-all + alternate
    * key:/value; join). Column names parameterized — the flipkart CSV is a
    * stripped blob, so the pipeline is exercised on synthetic fixtures.
    */
  def flipkartShape(df: DataFrame, categoryCol: String, specsCol: String): DataFrame = {
    val scrub = (c: Column) => regexp_replace(c, "[\\[\"\\]]", "")
    // bind the scrubbed/split tree ONCE as a real attribute (the x11/
    // LangId aliasing lesson): inlining `tree` into the three category
    // withColumns re-ran the regexp_replace + split per column — 3× the
    // regex work per row. CollapseProject keeps non-cheap aliases in
    // their own projection, so the binding survives optimization.
    val tree = split(scrub(col(categoryCol)), ">>")
    val extracted = regexp_extract_all(col(specsCol), lit("=>\"(.*?)\""), lit(1))
    val specs = array_join(
      zip_with(extracted, sequence(lit(0), size(extracted) - 1),
        (v, i) => when(i % 2 === 0, concat(v, lit(":"))).otherwise(concat(v, lit(";")))),
      " ")
    df
      .withColumn("__cat_tree", tree)
      .withColumn("product_category_1", trim(get(col("__cat_tree"), lit(0))))
      .withColumn("product_category_2", trim(get(col("__cat_tree"), lit(1))))
      .withColumn("product_category_3", trim(get(col("__cat_tree"), lit(2))))
      .withColumn("product_specifications_clean", specs)
      .drop("__cat_tree")
  }
}
