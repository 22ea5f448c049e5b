package graft

import graft.encode._
import graft.profile.{ColumnProfile, ModalityKind, Profiler}
import graft.query._
import graft.rerank.Rerank
import graft.search.Search
import graft.transform.{FittedTransform, Transforms}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The user-facing engine — the reference's end-to-end lifecycle
  * (src/app.py + src/encode.py) as a library:
  *
  * {{{
  * val engine = FuseRankEngine.index(items, FuseRankConfig(
  *   idCol = "row_id",
  *   textCols = Map("name" -> 0.4, "description" -> 0.6),
  *   auxCols = Seq("city", "price"),
  *   geoCols = Map("location" -> ("lon", "lat"))))
  * val hits  = engine.search("cheap italian food",
  *   Seq(SparseFilter("city", Seq("Agra")),
  *       DenseIntervalFilter("price", 100, 400)), k = 10)
  * val hits2 = engine.search(..., method = SearchMethod.Reranking)
  * }}}
  *
  * Index build (reference §3.2): ONE profile aggregation + optional
  * transform fit + a narrow encode projection, persisted. Search
  * (reference §3.1): driver-built query vector → scan + top-k
  * (TakeOrderedAndProject — per-partition heaps, no shuffle) → broadcast
  * gather join.
  */
sealed trait SearchMethod
object SearchMethod {
  /** Fused-vector retrieval: aux blocks inside the index vector. */
  case object Retrieval extends SearchMethod
  /** Text-only retrieval + rank-based re-ranking of the top-k. */
  case object Reranking extends SearchMethod
}

final case class FuseRankConfig(
    idCol: String,
    textCols: Map[String, Double],
    auxCols: Seq[String],
    geoCols: Map[String, (String, String)] = Map.empty,
    embedder: Embedder = HashingEmbedder(64),
    params: EncoderParams = EncoderParams(),
    /** fit + apply best normalizing transforms to dense columns
      * (reference create_schemas, src/load.py:16-19) */
    fitTransforms: Boolean = false,
    /** explicitly pinned transforms per dense column — the reference's
      * transformation_schema convention, where a loader names the transform
      * instead of fitting one (flipkart pins LogTransform on both price
      * columns, src/load_flipkart.py:48-51). Preset columns are excluded
      * from fitting; others still fit when fitTransforms is set. */
    presetTransforms: Map[String, FittedTransform] = Map.empty,
    /** binary payload columns indexed as image modality blocks (luma
      * contrast signatures — see [[graft.encode.ImageBlock]]); disjoint
      * from auxCols (payloads are not profiled) */
    imageCols: Seq[String] = Nil,
    imageGrid: (Int, Int) = (4, 4),
    imageCodec: graft.multimodal.Multimodal.Codec = graft.multimodal.Multimodal.imageIo)

final class FuseRankEngine private (
    val items: DataFrame,
    val config: FuseRankConfig,
    val profiles: Map[String, ColumnProfile],
    val transforms: Map[String, FittedTransform],
    val layout: VectorLayout,
    val indexed: DataFrame) {

  import config._

  /** One search (reference do_search, src/app.py:73-89). Returns the top-k
    * item rows with a `relevance` column, sorted descending. */
  def search(queryText: String, filters: Seq[Filter], k: Int = 10,
             method: SearchMethod = SearchMethod.Retrieval): DataFrame = {
    val textVec = embedder.embed(queryText)
    val fmap = filters.map(f => f.column -> f).toMap
    method match {
      case SearchMethod.Retrieval =>
        val q = QueryEncoder.encode(layout, fmap, textVec = textVec,
          transforms = transforms,
          farthest = QueryEncoder.sparkFarthest(items, geoCols),
          params = QueryEncoder.Params(params.intervalEpsilon, params.rangeEpsilon))
        val top = Search.fusedTopK(indexed, "fused_vec", idCol, q, k)
          .withColumnRenamed("score", "relevance")
        gather(items, top).orderBy(col("relevance").desc, col(idCol))
      case SearchMethod.Reranking =>
        // text-only retrieval (aux blocks skipped: reference gates encode on
        // method, src/encode.py:68,132), then window re-rank of the k rows
        val top = Search.fusedTopK(indexed, "text_vec", idCol, textVec, k)
          .withColumnRenamed("score", "relevance")
        val gathered = gather(itemsTransformed, top)
        val minMax = profiles.map { case (c, p) => c -> (p.min, p.max) }
        // Dense filter values arrive in ORIGINAL units; the gathered columns
        // and profile min/max are in TRANSFORMED scale — map the bounds
        // through the fitted transform first, exactly as the reference
        // transforms bounds before encode_query AND encode_result
        // (src/app.py:274-290). Without this, abs(v−col)/between(lo,hi)
        // and the min/max "Lowest"/"Highest" detection compare raw vs
        // transformed values.
        val scaledFilters = filters.map {
          case f: DensePointFilter if transforms.contains(f.column) =>
            f.copy(value = transforms(f.column).applyScalar(f.value))
          case f: DenseIntervalFilter if transforms.contains(f.column) =>
            val t = transforms(f.column)
            // bounds transformed IN PLACE, no reorder — a decreasing
            // transform (Reciprocal) inverts the interval, exactly as the
            // reference does (src/app.py:273-276 transforms lower/upper
            // without swapping; QueryEncoder matches)
            f.copy(lo = t.applyScalar(f.lo), hi = t.applyScalar(f.hi))
          case f => f
        }
        val imageBlocks = layout.blocks.collect {
          case b: ImageBlock => b.name -> b
        }.toMap
        Rerank.rerank(gathered, scaledFilters, minMax, geoCols, imageBlocks)
          .orderBy(col("relevance").desc, col(idCol))
    }
  }

  /** Batched retrieval: P queries answered in ONE scan of the index
    * (Search.multiTopK — in-plan codegen dots, per-partition bounded
    * heaps), then ONE broadcast gather of all P·k hit rows. The serving
    * shape for query batches: per-query cost amortizes to 1/P of a scan
    * instead of a scan job each (the reference answers its batches one
    * FAISS search at a time, src/eval/experiment.py:27-28). Results are
    * bit-identical to P [[search]] calls in Retrieval mode — same encode,
    * same rounded scores, same (relevance desc, id) order — with a
    * `query_idx` column (position in `queries`) prepended. */
  def searchBatch(queries: Seq[(String, Seq[Filter])], k: Int = 10): DataFrame = {
    val far = QueryEncoder.sparkFarthest(items, geoCols)
    val qs = queries.map { case (text, filters) =>
      QueryEncoder.encode(layout, filters.map(f => f.column -> f).toMap,
        textVec = embedder.embed(text), transforms = transforms,
        farthest = far,
        params = QueryEncoder.Params(params.intervalEpsilon, params.rangeEpsilon))
    }
    val tops = Search.multiTopK(indexed, "fused_vec", idCol, qs, k)
    val spark = items.sparkSession
    import spark.implicits._
    val hits = tops.zipWithIndex.flatMap { case (rs, qi) =>
      rs.map { case (id, s) => (qi, id, s) }
    }.toDF("query_idx", "__hit_id", "relevance")
      .withColumn("__hit_id", col("__hit_id").cast(items.schema(idCol).dataType))
      .withColumnRenamed("__hit_id", idCol)
    val itemCols = items.columns.filterNot(_ == idCol).map(col)
    items.join(broadcast(hits), Seq(idCol))
      .select(col("query_idx") +: col(idCol) +: col("relevance") +: itemCols.toSeq: _*)
      .orderBy(col("query_idx"), col("relevance").desc, col(idCol))
  }

  /** Gather the full item rows for the k hits (reference iloc gather,
    * src/app.py:80). The k-row top-k is the SMALL side — broadcast IT and
    * stream the items table; at 100 TB broadcasting items would OOM every
    * executor, while a k≤200-row broadcast is constant-size at any scale.
    * Reselected to (id, relevance, item columns) so the output schema is
    * join-order independent. */
  private def gather(itemTable: DataFrame, top: DataFrame): DataFrame = {
    val itemCols = itemTable.columns.filterNot(_ == idCol).map(col)
    itemTable.join(broadcast(top), Seq(idCol))
      .select(col(idCol) +: col("relevance") +: itemCols.toSeq: _*)
  }

  /** Items with fitted transforms applied (reference transformed_df,
    * src/load.py:37-42) — what re-ranking ranks against. */
  lazy val itemsTransformed: DataFrame =
    transforms.foldLeft(items) { case (df, (c, t)) => df.withColumn(c, t(col(c))) }

  /** Release the persisted index and item cache (block-manager storage).
    * Searches issued after close() still work — they recompute the encode
    * projection (and re-scan the item source). */
  def close(): Unit = { indexed.unpersist(); items.unpersist(); () }

  /** Persist the vector table as the durable index (S3/S4 sink). `packed`
    * stores fused vectors as one binary value per row (PackedVectors) —
    * ~2× faster write and scan than parquet array<double> at high dims. */
  def writeIndex(path: String, packed: Boolean = true): Unit = {
    val out =
      if (packed) indexed.withColumn("fused_vec_packed",
          org.apache.spark.sql.graft.PackedVectors.pack(col("fused_vec")))
        .drop("fused_vec")
      else indexed
    out.write.mode("overwrite").parquet(path)
  }
}

object FuseRankEngine {

  /** Build the index: profile pass → (optional) transform fit → encode
    * projection → persist. */
  def index(rawItems: DataFrame, config0: FuseRankConfig): FuseRankEngine = {
    // The item table feeds FOUR independent consumers over the engine's
    // life — the profile aggregation, the (optional) transform fit, the
    // encode projection, and every search's gather join (plus the geo
    // farthest-point scan) — and the common callers hand us a multiLine
    // CSV scan under a global-sort row_id window, so each consumer
    // re-parsed the file single-task and re-ran the sort. Persist for the
    // engine lifetime; released in close() with the index.
    val items = rawItems.persist()
    // Geolocation inference from the schema (reference infers geolocation
    // from tuple-valued object columns, src/app.py:46-50): any aux column
    // typed struct(numeric, numeric, ...) is a geo modality with (lon, lat)
    // = its first two fields. Explicit geoCols entries are an OVERRIDE, not
    // a requirement.
    val inferredGeo = config0.auxCols
      .filterNot(config0.geoCols.contains)
      .filter(c => graft.profile.Profiler.isGeoStruct(items.schema(c).dataType))
      .map(c => c -> graft.profile.Profiler.geoFieldPaths(items, c))
      .toMap
    val config = config0.copy(geoCols = config0.geoCols ++ inferredGeo)
    import config._
    // 1. transforms (fit on raw data, applied before profiling/encoding —
    //    reference fits in create_schemas then encodes transformed_df)
    presetTransforms.keys.foreach { c =>
      require(auxCols.contains(c), s"presetTransforms column '$c' not in auxCols")
      require(items.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"presetTransforms column '$c' is not numeric: ${items.schema(c).dataType}")
    }
    val transforms: Map[String, FittedTransform] =
      presetTransforms ++ (
        if (!fitTransforms) Map.empty
        else auxCols.filterNot(presetTransforms.contains).flatMap { c =>
          items.schema(c).dataType match {
            case _: org.apache.spark.sql.types.NumericType =>
              Transforms.bestTransform(items, c).map(c -> _)
            case _ => None
          }
        }.toMap)
    val transformed = transforms.foldLeft(items) { case (df, (c, t)) =>
      df.withColumn(c, t(col(c)))
    }
    // 2. ONE profile aggregation over all aux columns
    val profiles = Profiler.profile(transformed, auxCols.filterNot(geoCols.contains))
    // 3. layout: text block + per-modality aux blocks (schema order)
    val textBlock = TextBlock("text_vec", embedder.dim)
    val auxBlocks: Seq[Block] = auxCols.map { c =>
      if (geoCols.contains(c)) {
        val (lon, lat) = geoCols(c)
        GeoBlock(c, lon, lat)
      } else {
        val p = profiles(c)
        p.kind match {
          case ModalityKind.Binary =>
            val (v0, v1) = p.binaryValues
            BinaryBlock(c, v0, v1)
          case ModalityKind.Sparse => SparseBlock(c, p.distinctSorted)
          case _ => DenseBlock(c, p.min, p.max, params)
        }
      }
    }
    require(imageCols.intersect(auxCols).isEmpty,
      s"imageCols and auxCols overlap: ${imageCols.intersect(auxCols).mkString(",")}")
    val imageBlocks: Seq[Block] = imageCols.map { c =>
      require(items.schema(c).dataType == org.apache.spark.sql.types.BinaryType,
        s"image column '$c' must be binary, got ${items.schema(c).dataType}")
      ImageBlock(c, imageGrid._1, imageGrid._2, imageCodec)
    }
    val layout = VectorLayout(textBlock +: (auxBlocks ++ imageBlocks))
    // 4. narrow encode projection: weighted text fusion (partition-local
    //    compiled embedder) + modality blocks. Single-row-group inputs give
    //    parquet scans ONE task — spread the one-time index build across
    //    the cluster before the per-row-heavy encode work.
    val spread = Tables.spread(transformed)
    val withText = Embedders.fuseInto(spread, embedder, textCols, "text_vec")
    val indexed = ProductEncoder.encode(withText, layout).persist()
    new FuseRankEngine(items, config, profiles, transforms, layout, indexed)
  }
}
