package graft.queries

import graft.Tables
import graft.sources.Jsonl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Ingest-format queries: the corpus interchange formats a training-data
  * pipeline reads BEFORE any curation operator runs. The oracle cannot
  * read JSONL (the harness pins DuckDB to the parquet fixtures), so the
  * round trip itself is what goes under the hash: the Spark side writes
  * the documents table out as sharded JSONL (plus a deliberately corrupt
  * shard), reads it back through [[graft.sources.Jsonl]], and aggregates
  * the GOOD stream — any parse loss, type drift, or text mangling in
  * either direction moves `n_docs`/`id_sum` or the md5 extremes and
  * fails the hash against the oracle's direct-parquet answer. The
  * corrupt shard's two lines must land in quarantine, and ONLY those
  * two: the count rides the result as a column the oracle states as a
  * constant, so a quarantine that over- or under-catches also fails the
  * gate.
  */
object Ingest {

  private[graft] val DocSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  /** Two malformed lines every fixture carries: truncated JSON, and a
    * type mismatch that IS valid JSON (the case a naive "does it parse"
    * quarantine misses). */
  private val CorruptLines = Seq(
    """{"doc_id": 1000000001, "source": "crawl", "text": "truncat""",
    """{"doc_id": "not-a-number", "source": "crawl", "lang": "en", "text": "x"}""")

  /** The JSONL mirror of a fixture's documents table, built ONCE per
    * scale factor under the JVM tmpdir (the fixtures are immutable —
    * the x32 state-dir convention) via a staged rename: shards from one
    * `write.json` pass plus the corrupt shard, so concurrent first
    * touches race to an atomic rename, never to a half-written dir. */
  /** Shard count of both ingest mirrors. The sf-sized documents table is
    * one parquet split, so an unrepartitioned mirror lands as ONE shard —
    * and both readers' parallelism IS shard count (gzip/WARC are
    * non-splittable; JSONL splits but small shards don't), which made the
    * timed parse single-task on a 32-core harness. 32 shards is the
    * deployment shape these sources document (a dump is tens of
    * thousands of shards, each a task); the hashed aggregates are
    * shard-count independent. Fixed (not derived from the session's core
    * count) so every harness core-count shares one fixture. */
  private val MirrorShards = 32

  private[graft] def jsonlDirFor(s: SparkSession, d: String): String = {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_jsonl_v2_" + d.replaceAll("[^A-Za-z0-9.]", "_"))
    if (!dir.isDirectory) {
      val stage = new java.io.File(dir.getParentFile,
        s".tmp-${dir.getName}-${java.util.UUID.randomUUID()}")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"), col("text"))
        .repartition(MirrorShards, col("doc_id"))
        .write.mode("overwrite").json(stage.getPath)
      java.nio.file.Files.write(
        stage.toPath.resolve("zz-corrupt-shard.jsonl"),
        CorruptLines.mkString("", "\n", "\n").getBytes("UTF-8"))
      if (!stage.renameTo(dir)) { // lost the build race: a sibling published
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(stage.toPath).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
        require(dir.isDirectory, s"jsonl fixture publish failed for $dir")
      }
    }
    dir.getPath
  }

  private val x33 = Q(
    "x33_jsonl_ingest",
    (s, d) => {
      val dir = jsonlDirFor(s, d)
      val nQuar = Jsonl.quarantine(s, dir, DocSchema).count()
      Jsonl.good(Jsonl.read(s, dir, DocSchema))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          min(md5(col("text"))).as("min_h"),
          max(md5(col("text"))).as("max_h"))
        .withColumn("n_quarantined", lit(nQuar))
        .orderBy("source")
    },
    Some("""
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(doc_id)::BIGINT AS id_sum,
             min(md5(text)) AS min_h, max(md5(text)) AS max_h,
             2::BIGINT AS n_quarantined
      FROM documents GROUP BY source ORDER BY source"""))

  /** The WARC mirror of a fixture's documents table — the crawl layout
    * (per-record gzip members), URIs carrying source as the host and
    * doc_id as the path the way a real dump's `WARC-Target-URI` carries
    * the registered domain x24-style capping keys on. Shards via a
    * deterministic hash repartition; built once per scale factor (x33's
    * staged-rename convention). */
  private[graft] def warcDirFor(s: SparkSession, d: String): String = {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_warc_v2_" + d.replaceAll("[^A-Za-z0-9.]", "_"))
    if (!dir.isDirectory) {
      val stage = new java.io.File(dir.getParentFile,
        s".tmp-${dir.getName}-${java.util.UUID.randomUUID()}")
      graft.sources.Warc.write(
        Tables.documents(s, d)
          .select(
            concat(lit("https://"), col("source"), lit(".example/"),
              col("doc_id")).as("uri"),
            encode(col("text"), "UTF-8").as("payload"))
          .repartition(MirrorShards, col("uri")),
        "uri", "payload", stage.getPath)
      if (!stage.renameTo(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(stage.toPath).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
        require(dir.isDirectory, s"warc fixture publish failed for $dir")
      }
    }
    dir.getPath
  }

  private val x34 = Q(
    "x34_warc_ingest",
    (s, d) => {
      val dir = warcDirFor(s, d)
      graft.sources.Warc.records(s, dir)
        .select(
          regexp_extract(col("target_uri"),
            "^https://([^.]+)\\.example/", 1).as("source"),
          regexp_extract(col("target_uri"), "/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          md5(col("payload")).as("h")) // md5 of the UTF-8 payload == md5(text)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          min(col("h")).as("min_h"),
          max(col("h")).as("max_h"))
        .orderBy("source")
    },
    Some("""
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(doc_id)::BIGINT AS id_sum,
             min(md5(text)) AS min_h, max(md5(text)) AS max_h
      FROM documents GROUP BY source ORDER BY source"""))

  // X35 — HTML → text extraction (the WET step between WARC ingest and
  // every text operator): each document is wrapped in deterministic
  // markup IN-QUERY (the x16 injection convention — provable ground
  // truth on a corpus that ships as plain text), with script/style
  // elements whose CONTENT contains a bare '<', a comment, escaped
  // reserved characters in the body, and a run of named entities. The
  // md5 of the EXTRACTED text is under the hash, so tag stripping,
  // entity decoding, decode order (&amp; last), and whitespace
  // collapse are all pinned byte-for-byte against the twin.
  private val HtmlPre =
    """<html><head><title>T</title><script type="text/javascript">var x = 1 < 2;</script><style>p { color: red; }</style></head><body><h1>"""
  private val HtmlMid = """</h1><!-- boilerplate --><p>"""
  private val HtmlPost = """</p><div>&amp;&lt;&gt;&nbsp;&#39;</div></body></html>"""

  private val x35 = Q(
    "x35_html_extract",
    (s, d) => {
      val html = concat(lit(HtmlPre), graft.prep.Html.escape(col("source")),
        lit(HtmlMid), graft.prep.Html.escape(col("text")), lit(HtmlPost))
      Tables.documents(s, d)
        .select(col("doc_id"), md5(graft.prep.Html.textOf(html)).as("h"))
        .orderBy("doc_id")
    },
    Some {
      val htmlSql = s"concat('$HtmlPre', ${graft.prep.Html.escapeSql("source")}, " +
        s"'$HtmlMid', ${graft.prep.Html.escapeSql("text")}, '$HtmlPost')"
      s"""SELECT doc_id, md5(${graft.prep.Html.textOfSql(htmlSql)}) AS h
          FROM documents ORDER BY doc_id"""
    })

  val qs: Seq[Q] = Seq(x33, x34, x35)
}
