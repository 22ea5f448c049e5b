package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway: stage-by-stage timing of sim6's knnSq at a given sf dir. */
object DebugSim6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.search.Search
    import org.apache.spark.sql.graft.PqCodes

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg6] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }

    val dim = 64
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v"))
    time("warm scan count")(base.count())
    val (mins, maxs) = time("sqParams fit")(Search.sqParams(base, "v", dim))
    val encoded = base.select(col("id"),
      PqCodes.pack(Search.sqCodes(col("v"), mins, maxs)).as("sq"))
    time("encode count")(encoded.count())
    time("encode count again")(encoded.count())
    val qRows = base.filter(col("id").isin(0L, 1L, 2L)).collect()
    val qT = qRows.map { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      val t = new Array[Double](dim * 256)
      var i = 0
      while (i < dim) {
        val mn = mins(i); val d = maxs(i) - mn
        var c = 0
        while (c < 256) { t(i * 256 + c) = (mn + c * d / 255.0) * qv(i); c += 1 }
        i += 1
      }
      (qid, t.toSeq)
    }
    val qDf = spark.createDataFrame(qT.toIndexedSeq).toDF("q_id", "t")
    val crossed = encoded.crossJoin(broadcast(qDf))
      .filter(col("q_id") =!= col("id"))
      .withColumn("score",
        round(PqCodes.adcPacked(col("sq"), col("t"), 256), 5) + 0.0)
    time("cross+adc count")(crossed.select("q_id", "id", "score").count())
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("id"))
    val full = crossed.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("id").as("vec_id"), col("score"), col("rk"))
    time("full knnSq count")(full.count())
    // NON-VACUOUS probes: aggregates that consume the computed column
    time("encode real (sum crc32)")(
      encoded.select(sum(crc32(col("sq")))).head())
    time("adc real (sum score)")(
      crossed.select(sum(col("score"))).head())
    val noRound = encoded.crossJoin(broadcast(qDf))
      .filter(col("q_id") =!= col("id"))
      .select(sum(PqCodes.adcPacked(col("sq"), col("t"), 256)))
    time("adc real no-round")(noRound.head())
    spark.stop()
  }
}
