package graft

import graft.prep.Prep
import graft.query._
import org.apache.spark.sql.functions._

/** End-to-end engine lifecycle on the reference's real restaurants data
  * (reference §3.1/§3.2): index → fused search → re-ranked search, with the
  * soft-filter semantics sanity-checked against the hard-filtered subset.
  */
class EngineSpec extends SparkSpec {

  /** Prepped restaurants items with stable row ids — shared fixture. */
  private def restaurantItems = Prep.withRowId(
    Prep.restaurants(Tables.restaurants(spark)),
    Seq(col("Restaurant Name"), col("Location.lon"), col("Location.lat"),
      col("Votes")))

  private lazy val engine: FuseRankEngine = {
    val items = restaurantItems
    FuseRankEngine.index(items, FuseRankConfig(
      idCol = "row_id",
      textCols = Map("Restaurant Name" -> 0.4, "Cuisines" -> 0.6),
      auxCols = Seq("City", "Has Table booking", "Average Cost for two"),
      params = graft.encode.EncoderParams(numHarmonics = 16)))
  }

  test("index build: layout covers text + sparse + binary + dense") {
    val kinds = engine.layout.blocks.map(_.getClass.getSimpleName).toSet
    assert(kinds == Set("TextBlock", "SparseBlock", "BinaryBlock", "DenseBlock"))
    assert(engine.indexed.select("fused_vec").head().getSeq[Double](0).size ==
      engine.layout.dim)
  }

  test("fused retrieval: city filter pushes matching rows to the top") {
    val hits = engine.search("north indian mughlai",
      Seq(SparseFilter("City", Seq("Agra"), weight = 3.0),
        DenseIntervalFilter("Average Cost for two", 200, 800, weight = 1.5)),
      k = 10)
    val rows = hits.select("City", "relevance").collect()
    assert(rows.length == 10)
    val agraShare = rows.count(_.getString(0) == "Agra") / 10.0
    assert(agraShare >= 0.8, s"only ${agraShare * 10}/10 hits in Agra")
    // relevance sorted descending
    val rel = rows.map(_.getDouble(1))
    assert(rel.zip(rel.tail).forall { case (a, b) => a >= b })
  }

  test("re-ranking: text-only retrieval reordered by modality ranks") {
    val base = engine.search("pizza", Seq.empty, k = 20)
    val rr = engine.search("pizza",
      Seq(BinaryFilter("Has Table booking", "Yes", weight = 2.0)),
      k = 20, method = SearchMethod.Reranking)
    val baseIds = base.select("row_id").collect().map(_.getInt(0)).toSet
    val rrRows = rr.select("row_id", "Has Table booking", "relevance").collect()
    // re-ranking permutes the SAME result set (reference mode 2 semantics)
    assert(rrRows.map(_.getInt(0)).toSet == baseIds)
    // booked rows must outrank unbooked within the re-ranked list
    val (booked, unbooked) = rrRows.partition(_.getString(1) == "Yes")
    if (booked.nonEmpty && unbooked.nonEmpty) {
      assert(booked.map(_.getDouble(2)).min > unbooked.map(_.getDouble(2)).max)
    }
  }

  test("searchBatch: one scan answers every query identically to per-query search") {
    val batch = Seq(
      ("north indian mughlai",
        Seq[Filter](SparseFilter("City", Seq("Agra"), weight = 3.0),
          DenseIntervalFilter("Average Cost for two", 200, 800, weight = 1.5))),
      ("pizza", Seq.empty[Filter]),
      ("chinese", Seq[Filter](BinaryFilter("Has Table booking", "Yes", weight = 2.0))))
    val got = engine.searchBatch(batch, k = 8)
      .select("query_idx", "row_id", "relevance").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    batch.zipWithIndex.foreach { case ((text, filters), qi) =>
      val single = engine.search(text, filters, k = 8)
        .select("row_id", "relevance").collect()
        .map(r => (r.getInt(0), r.getDouble(1))).toSeq
      assert(got(qi) == single, s"query $qi ('$text') diverged from search()")
    }
  }

  test("fitTransforms: best transform fitted and applied to filter bounds") {
    val items = restaurantItems
    val eng = FuseRankEngine.index(items, FuseRankConfig(
      idCol = "row_id",
      textCols = Map("Cuisines" -> 1.0),
      auxCols = Seq("Votes"),
      params = graft.encode.EncoderParams(numHarmonics = 8),
      fitTransforms = true))
    // Votes is heavily right-skewed — a normalizing transform must win
    assert(eng.transforms.contains("Votes"), s"transforms: ${eng.transforms}")
    // profile is computed on TRANSFORMED data (reference transformed_df)
    val t = eng.transforms("Votes")
    assert(math.abs(eng.profiles("Votes").max - t.applyScalar(10934.0)) < 1e-6 ||
      eng.profiles("Votes").max <= t.applyScalar(10934.0) + 1e-6)
    // interval filter bounds pass through the SAME fitted transform; the
    // search must still return k rows with descending relevance
    val hits = eng.search("north indian",
      Seq(DenseIntervalFilter("Votes", 100.0, 2000.0, weight = 2.0)), k = 10)
    val rel = hits.select("relevance").collect().map(_.getDouble(0))
    assert(rel.length == 10 && rel.zip(rel.tail).forall { case (a, b) => a >= b })
  }

  test("presetTransforms: pinned transform applied, excluded from fitting, misconfig loud") {
    val items = restaurantItems
    val eng = FuseRankEngine.index(items, FuseRankConfig(
      idCol = "row_id",
      textCols = Map("Cuisines" -> 1.0),
      auxCols = Seq("Votes", "Average Cost for two"),
      params = graft.encode.EncoderParams(numHarmonics = 8),
      // the reference's transformation_schema convention: the loader PINS
      // the transform (flipkart pins LogTransform, load_flipkart.py:48-51)
      presetTransforms = Map("Votes" -> graft.transform.Log2p1),
      fitTransforms = true))
    // preset survives verbatim (not overridden by the fit), fit still
    // covers the non-preset numeric column
    assert(eng.transforms("Votes") == graft.transform.Log2p1)
    assert(eng.transforms.contains("Average Cost for two"))
    // profile is computed on the preset-transformed data
    assert(eng.profiles("Votes").max <=
      graft.transform.Log2p1.applyScalar(10934.0) + 1e-6)
    // preset column not in auxCols / not numeric → loud
    intercept[IllegalArgumentException] {
      FuseRankEngine.index(items, FuseRankConfig(
        idCol = "row_id", textCols = Map("Cuisines" -> 1.0),
        auxCols = Seq("Votes"),
        presetTransforms = Map("Average Cost for two" -> graft.transform.Log2p1)))
    }
    intercept[IllegalArgumentException] {
      FuseRankEngine.index(items, FuseRankConfig(
        idCol = "row_id", textCols = Map("Cuisines" -> 1.0),
        auxCols = Seq("City"),
        presetTransforms = Map("City" -> graft.transform.Log2p1)))
    }
  }

  test("re-ranking with fitTransforms: raw-unit interval bounds rank transformed columns") {
    val items = restaurantItems
    val eng = FuseRankEngine.index(items, FuseRankConfig(
      idCol = "row_id",
      textCols = Map("Cuisines" -> 1.0),
      auxCols = Seq("Votes"),
      params = graft.encode.EncoderParams(numHarmonics = 8),
      fitTransforms = true))
    val t = eng.transforms("Votes")
    // filter carries ORIGINAL units; gathered columns are transformed —
    // the engine must map the bounds through the fitted transform
    // (reference transforms bounds before encode_result, src/app.py:273-276)
    val hits = eng.search("north indian",
      Seq(DenseIntervalFilter("Votes", 100.0, 2000.0, weight = 5.0)),
      k = 30, method = SearchMethod.Reranking)
    val rows = hits.select("Votes", "relevance").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val (lo, hi) = (t.applyScalar(100.0), t.applyScalar(2000.0))
    val (inRange, rest) = rows.partition { case (v, _) => v >= lo && v <= hi }
    // reference quirk (replicated): the in-interval sentinel is the smallest
    // POSITIVE double (sys.float_info.min, src/encode.py:228), so rows whose
    // transformed value is ≤ 0 (Votes=0 → log2p1=0) sort BELOW the sentinel
    // and outrank in-interval rows — exclude them from the dominance check
    val outRange = rest.filter(_._1 > 0)
    assert(inRange.nonEmpty && outRange.nonEmpty,
      s"need both groups in top-30: in=${inRange.length} out=${outRange.length}")
    // weight 5 dominates text scores (≤1): every in-interval row must
    // outrank every positive out-of-interval row
    assert(inRange.map(_._2).min > outRange.map(_._2).max,
      s"in-range min ${inRange.map(_._2).min} vs out max ${outRange.map(_._2).max}")
  }

  test("geo kind inferred from an UNDECLARED struct(lon,lat) column") {
    val items = restaurantItems
    // Location is a struct(lon: double, lat: double) — NOT declared in
    // geoCols; the engine must infer the geolocation modality from the type
    // (reference duck-types tuple-valued columns, src/app.py:46-50)
    val eng = FuseRankEngine.index(items, FuseRankConfig(
      idCol = "row_id",
      textCols = Map("Cuisines" -> 1.0),
      auxCols = Seq("Location"),
      params = graft.encode.EncoderParams(numHarmonics = 8)))
    assert(eng.config.geoCols == Map("Location" -> ("Location.lon", "Location.lat")))
    assert(eng.layout.blocks.map(_.getClass.getSimpleName).contains("GeoBlock"))
    // and the inferred modality searches end-to-end
    val hits = eng.search("restaurant",
      Seq(GeoFilter("Location", 77.2090, 28.6139, weight = 5.0)), k = 15)
    val dists = hits.select(col("Location.lon"), col("Location.lat")).collect().map { r =>
      graft.encode.FourierMath.haversineKm(r.getDouble(0), r.getDouble(1), 77.2090, 28.6139)
    }
    assert(dists.count(_ < 100) >= 12, s"distances: ${dists.map(_.round).mkString(",")}")
  }

  test("Profiler.profile yields Geolocation for struct(lon,lat) columns") {
    val items = Prep.restaurants(Tables.restaurants(spark))
    val p = graft.profile.Profiler.profile(items, Seq("Location", "City"))
    assert(p("Location").kind == graft.profile.ModalityKind.Geolocation)
    assert(p("City").kind == graft.profile.ModalityKind.Sparse)
  }

  test("geo modality end-to-end: nearby restaurants outrank far ones") {
    val items = restaurantItems
      .withColumn("lon", col("Location.lon"))
      .withColumn("lat", col("Location.lat"))
    val eng = FuseRankEngine.index(items, FuseRankConfig(
      idCol = "row_id",
      textCols = Map("Cuisines" -> 1.0),
      auxCols = Seq("Location"),
      geoCols = Map("Location" -> ("lon", "lat")),
      params = graft.encode.EncoderParams(numHarmonics = 8)))
    // New Delhi center; heavy weight so geo dominates text
    val hits = eng.search("restaurant",
      Seq(GeoFilter("Location", 77.2090, 28.6139, weight = 5.0)), k = 15)
    val dists = hits.select("lon", "lat").collect().map { r =>
      graft.encode.FourierMath.haversineKm(r.getDouble(0), r.getDouble(1), 77.2090, 28.6139)
    }
    // top hits should be within metro distance, not across the country
    assert(dists.count(_ < 100) >= 12, s"distances: ${dists.map(_.round).mkString(",")}")
  }

  test("image modality end-to-end: an image filter reorders retrieval") {
    import spark.implicits._
    // three visually distinct logos; item 1's TEXT matches the query best
    val vertical = png(16, 16)((_, y) => y * 15)         // top-dark gradient
    val horizontal = png(16, 16)((x, _) => x * 15)       // left-dark gradient
    val diagonal = png(16, 16)((x, y) => (x + y) * 8)
    val items = Seq(
      (1, "red bistro pasta kitchen", vertical),
      (2, "blue diner", horizontal),
      (3, "green cafe", diagonal),
      (4, "yellow bar", null.asInstanceOf[Array[Byte]])) // no logo at all
      .toDF("row_id", "name", "logo")
    val eng = FuseRankEngine.index(items, FuseRankConfig(
      idCol = "row_id",
      textCols = Map("name" -> 1.0),
      auxCols = Seq.empty,
      imageCols = Seq("logo"),
      params = graft.encode.EncoderParams(numHarmonics = 8)))
    assert(eng.layout.blocks.map(_.getClass.getSimpleName).contains("ImageBlock"))
    // text-only: item 1 wins on its name
    val base = eng.search("red bistro pasta", Seq.empty, k = 4)
      .select("row_id").as[Int].collect()
    assert(base.head == 1, s"text-only order: ${base.mkString(",")}")
    // same text + a query logo rendered at a DIFFERENT size but the same
    // horizontal-gradient structure as item 2's: the image filter must
    // lift item 2 over the text-best item
    val queryLogo = png(24, 24)((x, _) => x * 10)
    val filtered = eng.search("red bistro pasta",
      Seq(ImageFilter("logo", queryLogo, weight = 4.0)), k = 4)
      .select("row_id").as[Int].collect()
    assert(filtered.head == 2, s"image-filtered order: ${filtered.mkString(",")}")
    assert(base.toSeq != filtered.toSeq)
    // the no-logo item is penalized by the indicator dim: last place
    assert(filtered.last == 4)
    // re-ranking mode: the image rank adjustment lifts the matching logo
    // too, and the missing-logo row ranks below every decodable one
    val rr = eng.search("red bistro pasta",
      Seq(ImageFilter("logo", queryLogo, weight = 4.0)), k = 4,
      method = SearchMethod.Reranking)
      .select("row_id").as[Int].collect()
    assert(rr.head == 2, s"re-ranked order: ${rr.mkString(",")}")
    assert(rr.last == 4)
    // NEGATED re-rank: "visually unlike this" demotes the matching logo
    // but must still rank the missing-logo row LAST (negation flips the
    // cosine only, never the indicator — the retrieval-path convention)
    val rrNeg = eng.search("red bistro pasta",
      Seq(ImageFilter("logo", queryLogo, negated = true, weight = 4.0)),
      k = 4, method = SearchMethod.Reranking)
      .select("row_id").as[Int].collect()
    assert(rrNeg.last == 4, s"negated re-ranked order: ${rrNeg.mkString(",")}")
    assert(rrNeg.indexOf(2) > rrNeg.indexOf(1), "negation must demote the match")
    // a filter on a non-image column is a loud misconfiguration
    intercept[RuntimeException] {
      eng.search("x", Seq(ImageFilter("name", queryLogo)), k = 2,
        method = SearchMethod.Reranking).collect()
    }
  }
}
