import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfX15 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    val docs = graft.Tables.spread(graft.Tables.documents(s, "/tmp/sf10"))
    docs.count()
    val sigs = docs.select(col("doc_id"),
      explode(org.apache.spark.sql.graft.SpanMinHash.spanMinHash(col("text"), 20)).as("sg"))
      .select(col("doc_id"), col("sg.span_idx").as("span_idx"),
        col("sg.h0").as("h0"), col("sg.h1").as("h1"), col("sg.h2").as("h2"), col("sg.h3").as("h3"),
        col("sg.h4").as("h4"), col("sg.h5").as("h5"), col("sg.h6").as("h6"), col("sg.h7").as("h7"))
    t("sigs only")(sigs.count())
    val buckets = sigs.select(col("doc_id"), col("span_idx"), explode(array(
        concat(lit("0:"), md5(concat(col("h0"), col("h1"), col("h2"), col("h3")))),
        concat(lit("1:"), md5(concat(col("h4"), col("h5"), col("h6"), col("h7"))))))
        .as("bucket"))
    t("buckets no persist")(buckets.count())
    val bp = buckets.persist()
    t("buckets persist materialize")(bp.count())
    val stats = bp.groupBy(col("bucket")).agg(min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
    t("stats agg")(stats.count())
    t("join+aggs")(bp.join(stats, "bucket")
      .groupBy(col("doc_id"), col("span_idx"))
      .agg(max(when(col("__mn") < col("doc_id") || col("__mx") > col("doc_id"), lit(1L)).otherwise(lit(0L))).as("__dup"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans")).count())
    s.catalog.clearCache()
  }
}
