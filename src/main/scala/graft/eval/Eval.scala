package graft.eval

import graft.encode._
import graft.profile.{ColumnProfile, Profiler}
import graft.query._
import graft.search.Search
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential-evaluation harness (reference src/eval/): the fused-vector
  * top-k (subject) vs the hard-filter top-k (oracle), scored by recall /
  * R-precision. This is the reference's entire correctness methodology
  * (SURVEY.md §5) re-expressed on Spark, with the hard-filter query family
  * replacing Milvus.
  */
object Eval {

  /** recall = |L1 ∩ L2| / |L1| (reference src/eval/evaluate.py:92-101);
    * empty L1 → 0. */
  def recall(oracle: Seq[Long], subject: Seq[Long]): Double =
    if (oracle.isEmpty) 0.0
    else oracle.toSet.intersect(subject.toSet).size.toDouble / oracle.size

  /** R-precision = |L1 ∩ L2[:k]| / k with k = |L1| (reference
    * src/eval/evaluate.py:104-110). */
  def rPrecision(oracle: Seq[Long], subject: Seq[Long]): Double = {
    if (oracle.isEmpty) return 0.0
    val k = oracle.size
    oracle.toSet.intersect(subject.take(k).toSet).size.toDouble / k
  }

  /** Hard-filter oracle: boolean-filter the items then text-score top-k
    * (reference milvus filter strings, src/eval/milvus_experiment.py:72-89:
    * numeric → `col <= v`, categorical/binary → `col == value`).
    */
  def hardFilterTopK(items: DataFrame, idCol: String, textVecCol: String,
                     qText: Array[Double], filters: Seq[Filter], k: Int): Seq[Long] = {
    val preds = filterPreds(filters)
    val filtered0 = if (preds.isEmpty) items else items.filter(preds.reduce(_ && _))
    // only scoreable rows rank: a row with no text vector has no index
    // entry in the reference oracle (Milvus only returns embedded rows),
    // and the batched twin (multiTopK's null mask) skips them — without
    // this filter the two paths diverge when matches < k (the desc sort's
    // NULLS LAST would back-fill null-score rows here only)
    val filtered = filtered0.filter(col(textVecCol).isNotNull)
    filtered
      .withColumn("score", Search.dot(Search.asDouble(col(textVecCol)), typedLit(qText)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol).cast("long"))
      .collect().map(_.getLong(0)).toSeq
  }

  /** The hard-filter predicate family (reference milvus filter strings,
    * src/eval/milvus_experiment.py:72-89) — shared by the per-point and
    * batched oracle paths. */
  private def filterPreds(filters: Seq[Filter]): Seq[org.apache.spark.sql.Column] =
    filters.collect {
      case DenseIntervalFilter(c, _, hi, false, _) => col(c) <= hi
      case DensePointFilter(c, v, false, _) => col(c) <= v
      case SparseFilter(c, sel, false, _) => col(c).isin(sel: _*)
      case BinaryFilter(c, v, _) => col(c).cast("string") === v
    }

  /** Batched [[hardFilterTopK]]: every point's oracle list in ONE scan via
    * [[Search.multiTopK]] — the point's filter conjunction becomes its
    * eligibility predicate, the shared text query is deduplicated to a
    * single in-plan dot. Raw (un-rounded) scores, ascending-id tiebreak:
    * the same ordering as the per-point path. */
  def hardFilterTopKBatch(items: DataFrame, idCol: String, textVecCol: String,
                          qText: Array[Double], filtersPerPoint: Seq[Seq[Filter]],
                          k: Int): IndexedSeq[Seq[Long]] =
    hardFilterTopKBatchPerQuery(items, idCol, textVecCol,
      Seq.fill(filtersPerPoint.size)(qText), filtersPerPoint, k)

  /** [[hardFilterTopKBatch]] with a PER-POINT text query (the reference
    * embeds each repetition's sampled row name, src/eval/evaluate.py:176-181
    * — every point scores against ITS OWN text). multiTopK dedupes
    * identical vectors, so the fixed-text case costs the same one dot. */
  def hardFilterTopKBatchPerQuery(items: DataFrame, idCol: String,
                                  textVecCol: String,
                                  qTexts: Seq[Array[Double]],
                                  filtersPerPoint: Seq[Seq[Filter]],
                                  k: Int): IndexedSeq[Seq[Long]] = {
    require(qTexts.size == filtersPerPoint.size,
      s"${qTexts.size} queries vs ${filtersPerPoint.size} filter sets")
    val preds = filtersPerPoint.map { fs =>
      val ps = filterPreds(fs)
      if (ps.isEmpty) lit(true) else ps.reduce(_ && _)
    }
    Search.multiTopK(items, textVecCol, idCol, qTexts, k,
      eligible = preds, roundScores = false).map(_.map(_._1))
  }

  /** Every seeded row sample in ONE aggregation job: the per-seed sample
    * (orderBy md5(id:seed) LIMIT 1 — the distributed twin of pandas
    * df.sample(random_state=seed), reference evaluate.py:176) re-expressed
    * as min_by(struct(cols), md5(id:seed)). One full scan computes every
    * seed's argmin with map-side partial aggregation, instead of one
    * scan-and-topk job per seed; md5 keys are unique w.h.p. so the argmin
    * equals the per-seed sort-limit row. */
  def batchSamples(items: DataFrame, idCol: String, candidateCols: Seq[String],
                   seeds: Seq[Int]): Map[Int, Map[String, Any]] = {
    if (seeds.isEmpty) return Map.empty
    val aggs = seeds.zipWithIndex.map { case (s, j) =>
      min_by(struct(candidateCols.map(col): _*),
        md5(concat_ws(":", col(idCol), lit(s)))).as(s"__s$j")
    }
    val row = items.agg(aggs.head, aggs.tail: _*).head()
    seeds.zipWithIndex.map { case (s, j) =>
      val st = row.getStruct(j)
      s -> candidateCols.zipWithIndex.map { case (c, i) => c -> st.get(i) }.toMap
    }.toMap
  }

  /** Fused-vector subject: encode the query against the layout, exact
    * inner-product top-k over the fused vectors. */
  def fusedTopK(vectors: DataFrame, idCol: String, fusedCol: String,
                q: Array[Double], k: Int): Seq[Long] =
    Search.fusedTopK(vectors, fusedCol, idCol, q, k)
      .select(col(idCol).cast("long"))
      .collect().map(_.getLong(0)).toSeq

  /** One differential experiment point (reference run_experiment,
    * src/eval/faiss_experiment.py:36-74): filters synthesized from a sampled
    * row — dense → interval [col min, row value]; sparse → [value];
    * binary → value (reference filter synthesis, faiss_experiment.py:36-58).
    */
  def experimentFilters(row: Map[String, Any], profiles: Map[String, ColumnProfile]): Seq[Filter] =
    row.toSeq.flatMap { case (c, v) =>
      val p = profiles(c)
      (p.kind, Option(v)) match {
        case (_, None) => None
        case (graft.profile.ModalityKind.Dense, Some(x)) =>
          Some(DenseIntervalFilter(c, p.min, x.toString.toDouble))
        case (graft.profile.ModalityKind.Binary, Some(x)) =>
          Some(BinaryFilter(c, x.toString))
        case (graft.profile.ModalityKind.Sparse, Some(x)) =>
          Some(SparseFilter(c, Seq(x.toString)))
        case _ => None
      }
    }

  final case class SweepPoint(numModalities: Int, repetition: Int, seed: Int,
                              modalities: Seq[String], recall: Double)

  /** The reference's exact seeding discipline (src/eval/evaluate.py:174-181):
    * seed = int("<m><i>"), then a seeded shuffle picks the m modalities.
    * Shared by the sweep driver and the a11 oracle-SQL builder so both
    * sides choose identical subsets. */
  def modalitiesFor(candidateCols: Seq[String], m: Int, i: Int): (Int, Seq[String]) = {
    val seed = s"$m$i".toInt
    (seed, new scala.util.Random(seed).shuffle(candidateCols).take(m))
  }

  /** A11 experiment sweep (reference src/eval/evaluate.py:156-242):
    * modality-count m = 1..N × `repetitions`, seed = int("<m><i>") —
    * the reference's exact seeding discipline — sample one row, choose m
    * random modalities, synthesize filters, run oracle (hard filter) and
    * subject (fused) top-k, score recall. `encodeAndSearch` is injected so
    * the sweep drives any engine configuration; it receives ALL points'
    * filter sets at once so the engine can answer them in one batched scan
    * ([[Search.multiTopK]]). The sweep itself runs exactly THREE jobs
    * regardless of point count: one batched sample aggregation, one batched
    * oracle scan, one batched subject search — the reference shape (one
    * search per point) costs a full-scan job per point on Spark.
    */
  def sweep(items: DataFrame, idCol: String, textVecCol: String,
            qText: Array[Double],
            candidateCols: Seq[String], profiles: Map[String, ColumnProfile],
            encodeAndSearch: (Seq[Seq[Filter]], Int) => Seq[Seq[Long]],
            k: Int = 10, repetitions: Int = 3): Seq[SweepPoint] = {
    val (keys, filtersPer, _) = sweepPoints(items, idCol, candidateCols, profiles, repetitions)
    val oracles = hardFilterTopKBatch(items, idCol, textVecCol, qText, filtersPer, k)
    val subjects = encodeAndSearch(filtersPer, k)
    keys.zipWithIndex.map { case ((m, i, seed, mods), j) =>
      SweepPoint(m, i, seed, mods, recall(oracles(j), subjects(j)))
    }
  }

  /** Config-independent sweep-point prep, shared by [[sweep]] and
    * [[fullSweep]]: the (m, i, seed, modalities) grid plus each point's
    * synthesized filters from its batched seeded sample (ONE job for all
    * points). */
  private def sweepPoints(items: DataFrame, idCol: String,
                          candidateCols: Seq[String],
                          profiles: Map[String, ColumnProfile],
                          repetitions: Int,
                          extraSampleCols: Seq[String] = Nil)
      : (Seq[(Int, Int, Int, Seq[String])], Seq[Seq[Filter]],
         Seq[Map[String, Any]]) = {
    val n = candidateCols.size
    val keys = for {
      m <- 1 to n; i <- 0 until repetitions
      (seed, mods) = modalitiesFor(candidateCols, m, i)
    } yield (m, i, seed, mods)
    // extra columns (e.g. the text column the reference embeds per point)
    // ride the SAME seeded sample row; they never join the modality pool
    // (filters draw only from mods ⊆ candidateCols)
    val samples = batchSamples(items, idCol,
      candidateCols ++ extraSampleCols.filterNot(candidateCols.contains),
      keys.map(_._3))
    val filtersPer = keys.map { case (_, _, seed, mods) =>
      experimentFilters(samples(seed).filter(kv => mods.contains(kv._1)), profiles)
    }
    (keys, filtersPer, keys.map { case (_, _, seed, _) => samples(seed) })
  }

  final case class SweepResult(num_harmonics: Int, interval_epsilon: Double,
                               num_modalities: Int, repetition: Int, seed: Int,
                               recall: Double)

  /** One harmonic-count's subject engine: ONE encoded index shared by every
    * `interval_epsilon` in the grid (the product encode depends only on the
    * harmonic count and `rangeEpsilon` — interval ε enters at query time,
    * [[QueryEncoder.Params]]), with a BATCHED search closure: ε values ×
    * points' filter sets → per-ε per-point top-k lists, ALL answered in one
    * [[Search.multiTopK]] scan of the index. `close()` is the optional
    * release hook for engines that pin resources (e.g. a persisted index
    * scanned by more than one action — SweepSpec's); [[fullSweep]] calls
    * it as soon as the harmonic's points are evaluated. The production
    * a11 engine pipelines its encode into the single scan and needs no
    * close (EvalQueries). */
  final case class SweepEngine(
      search: (Seq[Double], Seq[Seq[Filter]], Int) => IndexedSeq[IndexedSeq[Seq[Long]]],
      close: () => Unit = () => (),
      /** Per-point-text variant (reference per-repetition sampled-name
        * embedding): receives one text vector PER POINT alongside its
        * filter set. Required when [[fullSweep]] runs with a
        * `sampleTextCol`; `search` is used otherwise. */
      searchPerText: (Seq[Double], Seq[Seq[Filter]], Seq[Array[Double]], Int)
        => IndexedSeq[IndexedSeq[Seq[Long]]] = null)

  /** Full A11 sweep (reference src/eval/evaluate.py:156-242): the modality
    * sweep of [[sweep]] repeated over the `num_harmonics` ×
    * `interval_epsilon` grid (reference config.yaml:7-8). The reference
    * re-encodes products per (harmonics, ε) config (evaluate.py:186-189),
    * but ε never reaches the product vectors — only the query encoding —
    * so `engineFor` builds ONE index per harmonic count and each index
    * answers its whole ε × point grid in one batched scan.
    *
    * The row samples and the hard-filter oracle lists depend on neither
    * grid axis and are computed in TWO batched jobs for the whole point
    * grid (one min_by sample aggregation + one multiTopK oracle scan).
    * Total jobs: 2 + |harmonicsSweep| scans (and as many encodes),
    * independent of the ε × modality-count × repetition grid size.
    *
    * At most `maxInFlightConfigs` harmonic engines are in flight at once:
    * engines are built, evaluated and closed in bounded batches, so an
    * engine that DOES pin resources (a persisted index) never has more
    * than that many pinned at a time (a full reference-sized sweep — 10
    * harmonics at K up to 500 — would otherwise pin 10 wide indexes at
    * once). Each batch runs on
    * a dedicated fixed-size pool (Spark actions block; on
    * ExecutionContext.global that either starves the pool or, with
    * blocking{}, spawns unbounded threads). Results are identical to the
    * reference's nested-loop order.
    */
  def fullSweep(items: DataFrame, idCol: String, textVecCol: String,
                qText: Array[Double],
                candidateCols: Seq[String], profiles: Map[String, ColumnProfile],
                engineFor: Int => SweepEngine,
                harmonicsSweep: Seq[Int], epsilonSweep: Seq[Double],
                k: Int = 10, repetitions: Int = 3,
                maxInFlightConfigs: Int = 2,
                sampleTextCol: Option[String] = None,
                embedText: String => Array[Double] = null): Seq[SweepResult] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    require(sampleTextCol.isEmpty || embedText != null,
      "sampleTextCol needs an embedText function")
    // config-independent work, batched: ONE sample job + ONE oracle job
    // for the whole point grid
    val (keys, filtersPer, samplesPer) = sweepPoints(items, idCol,
      candidateCols, profiles, repetitions, extraSampleCols = sampleTextCol.toSeq)
    // per-point query text (reference src/eval/evaluate.py:176-181: each
    // repetition embeds ITS sampled row's text); a null sampled text falls
    // back to the fixed query — both sides of the differential use the
    // same vector either way, so the metric stays an apples-to-apples
    // ranking comparison
    val qTexts: Seq[Array[Double]] = sampleTextCol match {
      case None => Seq.fill(keys.size)(qText)
      case Some(tc) => samplesPer.map(s =>
        Option(s.getOrElse(tc, null)).map(v => embedText(v.toString)).getOrElse(qText))
    }
    val oracles = hardFilterTopKBatchPerQuery(items, idCol, textVecCol,
      qTexts, filtersPer, k)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(maxInFlightConfigs, 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      harmonicsSweep.grouped(math.max(maxInFlightConfigs, 1)).flatMap { batch =>
        val futs = batch.map { kh =>
          Future {
            val eng = engineFor(kh)
            // one batched subject scan answers the harmonic's full ε × point grid
            try {
              val perEps =
                if (sampleTextCol.isDefined) {
                  require(eng.searchPerText != null,
                    "per-point text sweep needs SweepEngine.searchPerText")
                  eng.searchPerText(epsilonSweep, filtersPer, qTexts, k)
                } else eng.search(epsilonSweep, filtersPer, k)
              for {
                (eps, e) <- epsilonSweep.zipWithIndex
                ((m, i, seed, _), j) <- keys.zipWithIndex
              } yield SweepResult(kh, eps, m, i, seed, recall(oracles(j), perEps(e)(j)))
            } finally eng.close()
          }
        }
        Await.result(Future.sequence(futs), Duration.Inf).flatten
      }.toSeq
    } finally pool.shutdown()
  }

  /** A9-shaped aggregation of sweep results (reference groupby-mean,
    * src/eval/evaluate.py:119-129): mean recall per
    * (num_harmonics, interval_epsilon, num_modalities). */
  def aggregateResults(spark: SparkSession, rs: Seq[SweepResult]): DataFrame =
    spark.createDataFrame(rs)
      .groupBy(
        col("num_harmonics").cast("long").as("num_harmonics"),
        col("interval_epsilon"),
        col("num_modalities").cast("long").as("num_modalities"))
      .agg((round(avg(col("recall")), 6) + 0.0).as("avg_recall"))
      .orderBy("num_harmonics", "interval_epsilon", "num_modalities")
}
