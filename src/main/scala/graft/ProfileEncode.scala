package graft
import graft.encode._
import graft.search.Search
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Profiling main: full-K (200 harmonics, 405-dim dense block) encode +
  * fused top-k over sf0.1 lineitem (600k rows) — the production-shape path. */
object ProfileEncode {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    // testdata files are single-row-group → 1-task scans; spread the
    // write-path work as a real index build would
    val li = Tables.lineitem(spark, d).repartition(32)
    val params = EncoderParams(numHarmonics = 200)
    val layout = VectorLayout(Seq(
      SparseBlock("l_returnflag", Seq("A", "N", "R")),
      BinaryBlock("l_linestatus", "F", "O"),
      DenseBlock("l_quantity", 1.0, 50.0, params),
      DenseBlock("l_extendedprice", 900.0, 105000.0, params)))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[encode] $label: $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val encoded = ProductEncoder.encode(li, layout)
    time(s"encode 600k rows -> ${layout.dim}-dim fused vec (count)") {
      encoded.select("fused_vec").agg(count(lit(1))).head().getLong(0)
    }
    val q = Array.tabulate(layout.dim)(i => ((i * 31) % 17 - 8) / 10.0)
    time("fused top-10 over encoded (scan+dot+TakeOrdered)") {
      Search.fusedTopK(
        encoded.withColumn("id", monotonically_increasing_id()),
        "fused_vec", "id", q, 10).count()
    }
    time("write encoded index to parquet (array<double>)") {
      encoded.select(col("l_orderkey"), col("l_linenumber"), col("fused_vec"))
        .write.mode("overwrite").parquet("/tmp/graft_index")
      1L
    }
    time("top-10 from written index (array<double>)") {
      Search.fusedTopK(spark.read.parquet("/tmp/graft_index")
        .withColumn("id", col("l_orderkey") * 10 + col("l_linenumber")),
        "fused_vec", "id", q, 10).count()
    }
    import org.apache.spark.sql.graft.PackedVectors
    time("write PACKED index to parquet (binary)") {
      encoded.select(col("l_orderkey"), col("l_linenumber"),
          PackedVectors.pack(col("fused_vec")).as("vec"))
        .write.mode("overwrite").parquet("/tmp/graft_index_packed")
      1L
    }
    time("top-10 from PACKED index (dotPacked)") {
      val df = spark.read.parquet("/tmp/graft_index_packed")
        .withColumn("id", col("l_orderkey") * 10 + col("l_linenumber"))
      df.withColumn("score", PackedVectors.dotPacked(col("vec"), typedLit(q)))
        .orderBy(col("score").desc, col("id")).limit(10).count()
    }
    val cached = encoded.select(col("l_orderkey"), col("l_linenumber"),
        PackedVectors.pack(col("fused_vec")).as("vec"))
      .withColumn("id", col("l_orderkey") * 10 + col("l_linenumber"))
      .persist()
    cached.count()
    time("top-10 from CACHED packed index (serving path, warm)") {
      cached.withColumn("score", PackedVectors.dotPacked(col("vec"), typedLit(q)))
        .orderBy(col("score").desc, col("id")).limit(10).count()
    }
    spark.stop()
  }
}
