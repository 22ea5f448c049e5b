package graft.serve

import graft.search.Search
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-partitioned serving index (VERDICT r8 ask #8): the 100-TB serving
  * story for ANN retrieval. [[Search.knnIvf]] proves the IVF math but
  * scans the whole vector relation per query batch; at cluster scale the
  * index must live on disk PARTITIONED BY the coarse cell so a probed
  * query only READS nProbe/nCentroids of the files — Spark's partition
  * pruning (directory-level, before any IO) is then the file-skipping an
  * IVF serving system does with its inverted lists.
  *
  * Layout: one parquet dataset partitioned by `cid` (id, v, vn per row —
  * norms precomputed at build time so serving never recomputes them),
  * with the fitted centroids in a `_centroids.json` sidecar (underscore
  * prefix: invisible to Spark's file listing) so a serving session opens
  * the index without refitting or rescanning.
  */
object IvfIndex {

  final case class Handle(path: String, centroids: Array[Array[Double]])

  /** Fit nCentroids on the vectors, assign every row, write partitioned by
    * cell. The write shuffles nothing: assignment is a narrow projection
    * and the parquet writer splits files by partition value. */
  def write(vectors: DataFrame, vecCol: String, idCol: String, path: String,
            nCentroids: Int, iters: Int): Handle = {
    val cents = Search.ivfCentroids(vectors, vecCol, idCol, nCentroids, iters)
    vectors.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        Search.asDouble(col(vecCol)).as("v"))
      .withColumn("vn", Search.l2Norm(col("v")))
      .withColumn("cid", Search.ivfAssign(col("v"), cents))
      .write.mode("overwrite").partitionBy("cid").parquet(path)
    val json = cents.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_centroids.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Handle(path, cents)
  }

  /** Reopen a written index from its sidecar — no scan, no refit. */
  def open(path: String): Handle = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_centroids.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    // strict parse of the [[...],[...]] doubles written above
    val cents = raw.trim.stripPrefix("[").stripSuffix("]")
      .split("\\],\\s*\\[").map(_.stripPrefix("[").stripSuffix("]")
        .split(",").map(_.trim.toDouble))
    Handle(path, cents)
  }

  /** The nProbe nearest cells to `q` — the same L2 ordering (ties on cell
    * id) the assignment and [[Search.knnIvf]]'s probe selection use. */
  def probeCells(h: Handle, q: Array[Double], nProbe: Int): Seq[Int] =
    h.centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0; var j = 0
      while (j < c.length) { val t = q(j) - c(j); d += t * t; j += 1 }
      (i, d)
    }.sortBy { case (cid, d) => (d, cid) }
      .take(nProbe).map(_._1).toSeq

  /** Probed cosine top-k: the `cid IN (probes)` predicate is a PARTITION
    * filter — Spark prunes the non-probed directories before reading a
    * byte, so the scan touches nProbe/nCentroids of the data (assert via
    * the scan's numFiles metric — IvfServeSpec). Scoring mirrors
    * [[Search.knnIvf]] (rounded cosine, ascending-id ties); top-k is
    * TakeOrderedAndProject over the pruned scan. */
  def probedTopK(spark: SparkSession, h: Handle, q: Array[Double],
                 nProbe: Int, k: Int): DataFrame = {
    val cells = probeCells(h, q, nProbe)
    var qn = 0.0; var j = 0
    while (j < q.length) { qn += q(j) * q(j); j += 1 }
    spark.read.parquet(h.path)
      .filter(col("cid").isin(cells: _*))
      .withColumn("score",
        round(Search.dot(typedLit(q.toSeq), col("v")) /
          (lit(math.sqrt(qn)) * col("vn")), 5) + 0.0)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
      .select(col("id").as("vec_id"), col("score"))
  }
}
