package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc profiling main: time named queries (warm session, two passes)
  * and print the formatted physical plan. Usage: Profile <sfDir> <name>... */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    names.foreach { n =>
      val df = qs(n)(spark, sfDir)
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val c = qs(n)(spark, sfDir).count()
        println(f"[profile] $n pass$pass: $c rows, ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (sys.env.get("PROFILE_EXPLAIN").contains("1")) df.explain("formatted")
    }
    spark.stop()
  }
}
