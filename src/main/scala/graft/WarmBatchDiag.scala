package graft

import graft.queries.Pipeline
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-job decomposition of ONE warm screen, pruned vs unpruned — the
  * diagnostic companion of [[WarmBatchBench]]: a listener prints every
  * job's wall time and description so a constant overhead in one arm can
  * be attributed to the job that pays it.
  *
  * Usage: `runMain graft.WarmBatchDiag [sfDir] [pMod] [batchSize]`
  */
object WarmBatchDiag {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf_salted200")
    val pMod = args.lift(1).map(_.toInt).getOrElse(512)
    val n = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stateDir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_incr_state_v${graft.incremental.IncrementalState.CurrentVersion}_p${pMod}_" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_")).getPath
    require(graft.incremental.IncrementalState.exists(spark, stateDir),
      s"run WarmBatchBench first to build $stateDir")

    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          println(f"[diag-job] id=${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2f s  $desc")
        }
    })

    def batchOf(k: Int): DataFrame = {
      val b = Tables.spread(Tables.documents(spark, sfDir))
        .filter(col("doc_id") >= Pipeline.ProbeCap && col("lang") === "en" &&
          col("doc_id") % 5 === 0)
        .orderBy(col("doc_id")).limit(k)
        .select(col("doc_id"), col("source"), col("text"))
      b.localCheckpoint(true)
    }
    val batch = batchOf(n)
    Seq(true, false).foreach { p => // warm-up both arms (JIT + codegen)
      Pipeline.warmScreenAccepted(spark, stateDir, batch, prune = p,
        pruneBytesFloor = 0L).count()
      spark.catalog.clearCache()
    }
    Seq(true, false).foreach { p =>
      println(s"\n===== arm prune=$p =====")
      val t0 = System.nanoTime()
      val acc = Pipeline.warmScreenAccepted(spark, stateDir, batch, prune = p,
        pruneBytesFloor = 0L).count()
      println(f"[diag] prune=$p accepted=$acc total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
