package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Throwaway profiling main for x26's job-level time budget (round 12). */
object DebugX26 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = if (args.length > 1) args(1) else "x26_training_manifest"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val site = p.map(props => Seq("spark.sql.execution.id")
          .map(k => s"${props.getProperty(k, "-")}").mkString(" | "))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          rows.add((je.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for (a <- si.submissionTime; b <- si.completionTime)
          yield (b - a) / 1e3).getOrElse(-1.0)
        stages.add(f"stage=${si.stageId}%3d ${dur}%7.3f s tasks=${si.numTasks}%3d ${si.name.take(90)}")
      }
    })

    val fn = SparkEntry.queries(qname)
    // warm pass on sf0.001
    try fn(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println(e) }
    spark.sharedState.cacheManager.clearCache()
    rows.clear()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val tot = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[debugx26] rows=$n total=$tot%.3f s, jobs=${rows.size()}")
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq.sortBy(_._1).foreach { case (id, s, site) =>
      println(f"[debugx26] job=$id%3d ${s}%7.3f s  exec=$site")
    }
    stages.asScala.toSeq.foreach(s => println(s"[debugx26] $s"))
    spark.stop()
  }
}
