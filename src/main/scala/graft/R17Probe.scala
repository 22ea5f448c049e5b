package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 measurement scratchpad (guide §1.4): time candidate hot
  * expressions with the noop sink so the numbers reflect the real
  * materialized work, not what count() lets Catalyst prune. Ad-hoc tool,
  * not part of the driver contract. Usage: R17Probe <sfDir> [probe...] */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false") // mirror Bench harness
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def probe(name: String)(mk: => DataFrame): Unit =
      if (which.isEmpty || which.contains(name)) {
        spark.sparkContext.setJobDescription(s"r17probe: $name")
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          noop(mk)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[r17probe] $name%-28s ${times.map(t => f"$t%.3f").mkString(" ")} s")
        spark.catalog.clearCache()
      }

    // ---- job timeline per query: jobId, seconds, callsite ----
    if (which.exists(_.startsWith("jobs:"))) {
      val names = which.collect { case s if s.startsWith("jobs:") => s.stripPrefix("jobs:") }
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = j.stageInfos.map(si => si.name.takeWhile(_ != ' ') + ":" + si.numTasks)
            .mkString(" | ") + "  <" + j.stageInfos.lastOption.map(_.name.take(70)).getOrElse("?") + ">"
          jobs.put(j.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobs.remove(j.jobId)
          if (st != null) done.add((j.jobId, (System.nanoTime() - st._1) / 1e9, st._2))
        }
      })
      names.foreach { n =>
        SparkEntry.queries(n)(spark, sfDir).count() // warm
        spark.catalog.clearCache(); done.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val total = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[r17jobs] $n total=$total%.3f s")
        done.forEach { case (id, sec, site) =>
          println(f"[r17jobs]   job $id%3d $sec%7.3f s  $site")
        }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    val docs = Tables.spread(Tables.documents(spark, sfDir))

    probe("parse_only") { docs.select(col("doc_id")) }
    probe("text_only") { docs.select(col("text")) }
    probe("tokens_split") { docs.select(split(trim(col("text")), "\\s+").as("t")) }
    probe("alpha_regex") {
      docs.select((length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
        length(col("text"))).as("a"))
    }
    probe("lm_scrub_regex") {
      docs.select(regexp_replace(lower(col("text")), "[^a-z ]", "").as("t"))
    }
    probe("shingles_stage") {
      docs.select(array_distinct(org.apache.spark.sql.graft.WordNgrams.wordNgrams(
        split(trim(col("text")), "\\s+"), 2)).as("sh"))
    }
    probe("gramhash_stage") {
      docs.select(org.apache.spark.sql.graft.WordNgrams.gramHashes(
        split(trim(col("text")), "\\s+"), 5).as("g"))
    }
    probe("minhashbands_stage") {
      docs.select(org.apache.spark.sql.graft.MinHashBands.bands(
        array_distinct(org.apache.spark.sql.graft.WordNgrams.wordNgrams(
          split(trim(col("text")), "\\s+"), 2)), 8, 4).as("b"))
    }
    probe("md5_text") { docs.select(md5(col("text")).as("h")) }
    probe("tokens_native") {
      docs.select(org.apache.spark.sql.graft.WsTokens.wsTokens(col("text")).as("t"))
    }
    probe("alpha_native") {
      docs.select((org.apache.spark.sql.graft.TextScrub.alphaCountCol(col("text")).cast("double") /
        length(col("text"))).as("a"))
    }
    probe("lm_scrub_native") {
      docs.select(org.apache.spark.sql.graft.TextScrub.lmNormalizeCol(col("text")).as("t"))
    }
    probe("charlm_score") {
      val n3 = Array.fill(27 * 27 * 27)(7L)
      val n2 = Array.fill(27 * 27)(7L * 27)
      docs.select(graft.queries.TextDedup.charLmScoreCol(col("text"), n3, n2).as("s"))
    }
    probe("charlm_fit") {
      val norm = org.apache.spark.sql.graft.TextScrub.lmNormalizeCol(col("text"))
      docs.select(norm.as("t"))
        .select(org.apache.spark.sql.graft.TriCounts.triCounts(col("t")).as("c"),
          count(when(length(col("t")) >= 3, 1)).as("n"))
    }
    probe("langid_annotate") {
      graft.queries.LangId.annotate(docs, "text", "lang_pred")
        .select(col("doc_id"), col("lang_pred"))
    }
    if (which.contains("langid_micro")) {
      // driver-side interleaved microbench: old HashSet-of-substring vs
      // new packed-long-table pick over the SAME padded strings
      import org.apache.spark.unsafe.types.UTF8String
      val texts = graft.queries.LangId.annotate(docs.limit(20000), "text", "lp")
        .select(concat(lit(" "),
          trim(regexp_replace(lower(col("text")), "[^a-zàáâäãéèêëíìîïóòôöõúùûüçñß]+", " ")),
          lit(" ")).as("p"))
        .select("p").collect().map(_.getString(0))
      val profiles = graft.queries.LangId.profiles.map { case (l, p) => (l, p.toSet) }
      val sets = profiles.map { case (_, p) =>
        val s = new java.util.HashSet[String](p.size * 2); p.foreach(s.add); s
      }.toArray
      def oldPick(t: String): Int = {
        val counts = new Array[Int](sets.length)
        var i = 0
        val last = t.length - 3
        while (i <= last) {
          val g = t.substring(i, i + 3)
          var l = 0
          while (l < sets.length) { if (sets(l).contains(g)) counts(l) += 1; l += 1 }
          i += 1
        }
        var best = 0; var bi = -1; var l = sets.length - 1
        while (l >= 0) { if (counts(l) >= best && counts(l) > 0) { best = counts(l); bi = l }; l -= 1 }
        bi
      }
      val expr = org.apache.spark.sql.graft.LangIdPick(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), profiles)
      val u8 = texts.map(UTF8String.fromString)
      var sinkO = 0L; var sinkN = 0L
      for (round <- 1 to 4) {
        val t0 = System.nanoTime()
        texts.foreach(t => sinkO += oldPick(t))
        val t1 = System.nanoTime()
        u8.foreach(t => sinkN += expr.pickPublic(t).numBytes())
        val t2 = System.nanoTime()
        println(f"[r17micro] langid round$round old=${(t1 - t0) / 1e9}%.3f new=${(t2 - t1) / 1e9}%.3f s (sinks $sinkO $sinkN)")
      }
      spark.stop(); return
    }
    probe("persist_text_roundtrip") {
      val c = docs.select(col("doc_id"), col("text")).persist()
      c.count()
      c
    }

    // IncrementalDedup.shingled's HOF bigram builder vs the native kernel
    probe("incdedup_shingled_hof") {
      val toks = split(trim(col("text")), "\\s+")
      docs.select(col("doc_id"),
        array_distinct(when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
          .otherwise(array().cast("array<string>"))).as("sh"))
    }
    probe("incdedup_shingled_native") {
      docs.select(col("doc_id"),
        array_distinct(org.apache.spark.sql.graft.WordNgrams.wordNgrams(
          split(trim(col("text")), "\\s+"), 2)).as("sh"))
    }
    // flip1 stage decomposition
    probe("flip_prep") {
      val raw = Tables.spread(Tables.flipkartSynth(spark))
      val filled = raw
        .withColumn("brand", coalesce(col("brand"), lit("n/a")))
        .withColumn("description", coalesce(col("description"), lit("n/a")))
      graft.prep.Prep.flipkartShape(filled,
        "product_category_tree", "product_specifications")
    }
    probe("flip_items_rowid") {
      val raw = Tables.spread(Tables.flipkartSynth(spark))
      val filled = raw
        .withColumn("brand", coalesce(col("brand"), lit("n/a")))
        .withColumn("description", coalesce(col("description"), lit("n/a")))
      val shaped = graft.prep.Prep.flipkartShape(filled,
          "product_category_tree", "product_specifications")
        .withColumn("product_specifications_clean",
          coalesce(col("product_specifications_clean"), lit("")))
        .drop("pid", "uniq_id", "image", "product_rating", "overall_rating",
          "product_category_tree", "product_url", "crawl_timestamp",
          "product_specifications")
      graft.prep.Prep.withRowId(shaped, Seq(
        col("product_name"), col("brand"), col("description"),
        col("product_category_1"), col("product_category_2"),
        col("product_category_3"), col("product_specifications_clean"),
        col("is_FK_Advantage_product"), col("retail_price"),
        col("discounted_price")))
    }

    // engine-family embed stage: the flip1-shaped fuseInto over the
    // flipkart synth CSV's three text columns
    probe("flip_fuse_into") {
      val raw = Tables.spread(Tables.flipkartSynth(spark))
        .select(col("product_name"), col("description"),
          col("product_specifications"))
      graft.encode.Embedders.fuseInto(raw, graft.encode.HashingEmbedder(64),
        Map("product_name" -> 0.4, "description" -> 0.3,
          "product_specifications" -> 0.3), "text_vec")
    }
    probe("flip_parse_only") {
      Tables.spread(Tables.flipkartSynth(spark))
        .select(col("product_name"), col("description"),
          col("product_specifications"))
    }
    spark.stop()
  }
}
