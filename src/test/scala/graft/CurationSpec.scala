package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.graft.KMinValues

/** Semantic goldens for the x13/x14 curation operators on a hand-computed
  * fixture (the oracle gate proves cross-engine parity on the real tables;
  * these prove the MATH is the intended one, not just self-consistent).
  */
class CurationSpec extends SparkSpec {

  /** Writes a documents.parquet with the testdata schema; returns the dir. */
  private def fixtureDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_curation").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def q(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  test("x13 tf-idf: hand-computed ranks and scores on a 3-doc corpus") {
    // df: apple 1, banana 3, cherry 1, date 1; N=3 → idf ratio (N+1)/(df+1):
    // apple/cherry/date = 2.0, banana = 1.0
    val dir = fixtureDir(Seq(
      (1L, "apple banana apple", "en", "s"),
      (2L, "banana cherry", "en", "s"),
      (3L, "banana date", "en", "s")))
    val got = q("x13_tfidf_topterms", dir).collect().toSeq
    assert(got === Seq(
      Row(1L, 1L, "apple", 4.0),  // tf 2 × idf 2
      Row(1L, 2L, "banana", 1.0),
      Row(2L, 1L, "cherry", 2.0),
      Row(2L, 2L, "banana", 1.0),
      Row(3L, 1L, "date", 2.0),
      Row(3L, 2L, "banana", 1.0)))
  }

  test("x13 caps at 3 terms per doc, rank consecutive, scores non-increasing") {
    val dir = fixtureDir(Seq(
      (1L, "a b c d e f g", "en", "s"),
      (2L, "a b", "en", "s")))
    val rows = q("x13_tfidf_topterms", dir)
      .collect().groupBy(_.getLong(0))
    rows.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(1)).toSeq === (1L to rs.length).toSeq)
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("x14 subsampling: p_keep from language shares; kept set = hash rule") {
    // 8 en + 2 fr, t = 0.05: p_en = sqrt(0.05·10/8) = 0.25,
    // p_fr = sqrt(0.05·10/2) = 0.5 — the overrepresented language is
    // thinned 2× harder.
    val docs = (1L to 8L).map(i => (i, s"en doc $i", "en", "s")) ++
      Seq((9L, "fr doc", "fr", "s"), (10L, "fr doc deux", "fr", "s"))
    val dir = fixtureDir(docs)
    val got = q("x14_freq_subsample", dir).collect().toSeq
    val pByLang = got.map(r => r.getString(1) -> r.getDouble(2)).toMap
    // direct lookups — both languages MUST have survivors here (proven
    // below); a .get(...).foreach would silently skip a vanished golden
    assert(pByLang("en") === 0.25)
    assert(pByLang("fr") === 0.5)

    // independent driver-side recomputation of the survival rule
    def u52(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:mix".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(KMinValues.HexDigits)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = docs.collect {
      case (id, _, lang, _)
        if u52(id) < (if (lang == "en") 0.25 else 0.5) * KMinValues.HashSpace => id
    }.toSet
    assert(got.map(_.getLong(0)).toSet === expect)
    assert(expect.nonEmpty && expect.size < docs.size) // non-vacuous both ways
  }

  test("x14 is deterministic across runs and repartitionings") {
    val dir = fixtureDir((1L to 40L).map(i =>
      (i, s"doc $i", if (i % 3 == 0) "fr" else "en", "s")))
    val a = q("x14_freq_subsample", dir).collect().toSeq
    val b = q("x14_freq_subsample", dir).collect().toSeq
    assert(a === b)
    // genuinely DIFFERENT partitioning (the x12 lesson: partition-keyed
    // state only breaks when the layout changes): rewrite the fixture as
    // 7 shuffled parquet parts and re-run
    val dir2 = Files.createTempDirectory("graft_curation2").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(7).write.mode("overwrite")
      .parquet(s"$dir2/documents.parquet")
    val c = q("x14_freq_subsample", dir2).collect().toSeq
    assert(c === a)
  }

  test("x16 PII scrub: injected + pre-existing entities counted, redaction hash exact") {
    // id 15: %3 and %5 → email AND phone injected; id 3: email only;
    // id 5: phone only; id 1: no injection but the TEXT carries an email —
    // detection must catch organic PII, not just the injected ground truth
    val dir = fixtureDir(Seq(
      (1L, "reach alice@corp.io today", "en", "s"),
      (3L, "plain words only", "en", "s"),
      (5L, "more plain words", "en", "s"),
      (7L, "nothing here", "en", "s"),
      (15L, "both kinds", "en", "s")))
    val got = q("x16_pii_scrub", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L)._1 == 1 && got(1L)._2 == 0)   // organic email, no phone
    assert(got(3L)._1 == 1 && got(3L)._2 == 0)   // injected email
    assert(got(5L)._1 == 0 && got(5L)._2 == 1)   // injected phone
    assert(got(7L)._1 == 0 && got(7L)._2 == 0)   // clean
    assert(got(15L)._1 == 1 && got(15L)._2 == 1) // both injected
    // redacted text pinned byte-for-byte, not just counted
    assert(got(1L)._3 == md5hex("reach <EMAIL> today"))
    assert(got(15L)._3 == md5hex("both kinds contact <EMAIL> call <PHONE>"))
    assert(got(7L)._3 == md5hex("nothing here"))
  }

  test("x19 BM25: distributed scores equal an independent driver recomputation") {
    val docs = Seq(
      (1L, "spark spark spark", "en", "s"),            // high tf, short
      (2L, ("spark " + Seq.fill(20)("filler").mkString(" ")).trim, "en", "s"), // tf 1, long
      (3L, "filler only here", "en", "s"),             // no query terms
      (4L, "spark window mix", "en", "s"))             // two matching terms
    val dir = fixtureDir(docs)
    val got =
      try q("x19_bm25_topk", dir).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      finally spark.catalog.clearCache() // the persisted tfdl relation
    // independent recomputation with the pinned (k1, b, ratio-idf) math,
    // per-term scores summed through DECIMAL(28,6) like the query
    val toks = docs.map { case (id, t, _, _) => id -> t.trim.split("\\s+").toSeq }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val terms = Seq("spark", "window", "vector")
    val df = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
    def score(id: Long): Option[Double] = {
      val ts = terms.flatMap { t =>
        val tf = toks(id).count(_ == t)
        if (tf == 0 || df(t) == 0) None
        else {
          val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
          val dl = toks(id).size
          Some(idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))))
        }
      }
      if (ts.isEmpty) None
      else Some(ts.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble)
    }
    val expect = docs.map(_._1).flatMap(id => score(id).map(id -> _))
      .sortBy { case (id, sc) => (-sc, id) }
    assert(got == expect)
    assert(!got.map(_._1).contains(3L)) // term-free docs are not scored
    // the rare term dominates: "window" (df 1, idf 2.33) outweighs three
    // saturated "spark" hits (df 3, idf 0.43) — idf doing its job
    assert(got.head._1 == 4L)
    assert(got.map(_._1).take(2).contains(1L)) // tf saturation still ranks doc 1 next
  }

  test("x17 OOV rate: hand-computed fractions against a 20-term vocabulary") {
    val vocab = (1 to 20).map(i => f"w$i%02d")
    val fillers = (10L to 12L).map(id => (id, vocab.mkString(" "), "en", "s"))
    val dir = fixtureDir(fillers ++ Seq(
      (1L, "w01 w02 w03 w04", "en", "s"),   // all in vocab → 0.0
      (2L, "r1 r2 w01 w02", "en", "s"),     // half rare → 0.5
      (3L, "r3 r4 r5 r3", "en", "s")))      // all rare → 1.0
    val got = q("x17_oov_rate", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // every w* appears ≥3 times corpus-wide, every r* ≤2 — the top-20
    // vocabulary is exactly the w's, no tie across the boundary
    assert(got(1L) == ((4L, 0.0)))
    assert(got(2L) == ((4L, 0.5)))
    assert(got(3L) == ((4L, 1.0)))
    fillers.foreach { case (id, _, _, _) => assert(got(id) == ((20L, 0.0))) }
  }
}
