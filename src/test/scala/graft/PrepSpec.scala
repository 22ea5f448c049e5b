package graft

import graft.prep.Prep
import org.apache.spark.sql.functions._

/** Preprocessing pipelines vs pandas-derived facts on the reference's real
  * restaurants CSV (readable at runtime; reference src/load_restaurants.py)
  * and synthetic flipkart-shaped fixtures (reference src/load_flipkart.py —
  * its CSV is a stripped blob).
  */
class PrepSpec extends SparkSpec {

  test("restaurants pipeline matches pandas row count and kept columns") {
    val raw = Tables.restaurants(spark)
    assert(raw.count() == 9551) // pandas-parsed row count (multiline quotes)
    val out = Prep.restaurants(raw)
    assert(out.count() == 8155) // golden from the pandas replication
    val cols = out.columns.toSet
    assert(cols == Set("Restaurant Name", "City", "Cuisines",
      "Average Cost for two", "Has Table booking", "Has Online delivery",
      "Price range", "Aggregate rating", "Rating text", "Votes", "Location"))
    // Location is a (lon, lat) struct with no zero-latitude rows
    assert(out.filter(col("Location.lat") === 0).count() == 0)
  }

  test("restaurants profile: binary/sparse/dense inference on real data") {
    val out = Prep.restaurants(Tables.restaurants(spark))
    val p = graft.profile.Profiler.profile(out,
      Seq("Has Table booking", "City", "Aggregate rating"))
    assert(p("Has Table booking").kind == graft.profile.ModalityKind.Binary)
    assert(p("Has Table booking").binaryValues == ("No", "Yes"))
    assert(p("City").kind == graft.profile.ModalityKind.Sparse)
    assert(p("Aggregate rating").kind == graft.profile.ModalityKind.Dense)
  }

  test("flipkart-shaped pipeline: category split + spec reformat") {
    import spark.implicits._
    val df = Seq(
      ("""["Apparel >> Tops >> Tees"]""",
        """{"spec"=>{"key"=>"Fit", "value"=>"Slim", "key"=>"Fabric", "value"=>"Cotton"}}"""))
      .toDF("cat", "specs")
    val out = Prep.flipkartShape(df, "cat", "specs").head()
    assert(out.getAs[String]("product_category_1") == "Apparel")
    assert(out.getAs[String]("product_category_2") == "Tops")
    assert(out.getAs[String]("product_category_3") == "Tees")
    assert(out.getAs[String]("product_specifications_clean") ==
      "Fit: Slim; Fabric: Cotton;")
  }

  test("withRowId is deterministic across partitionings") {
    import spark.implicits._
    val data = Seq(("b", 2), ("a", 1), ("c", 3), ("a", 0))
    val id1 = Prep.withRowId(data.toDF("k", "v").repartition(1),
      Seq(col("k"), col("v"))).collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val id4 = Prep.withRowId(data.toDF("k", "v").repartition(4),
      Seq(col("k"), col("v"))).collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(id1 == id4)
    assert(id1(("a", 0)) == 0 && id1(("c", 3)) == 3)
  }
}
