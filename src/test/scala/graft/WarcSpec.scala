package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val rowSchema = StructType(Seq(
    StructField("uri", StringType),
    StructField("payload", BinaryType)))

  private def df(rows: Seq[(String, Array[Byte])], parts: Int = 2) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (u, p) => Row(u, p) }, parts), rowSchema)

  private val docs = Seq(
    ("https://a.example/1", "hello warc".getBytes("UTF-8")),
    ("https://a.example/2", "unicode é中\nline2".getBytes("UTF-8")),
    ("https://b.example/3", Array[Byte](0, 1, 2, -1, 127)), // binary payload
    ("https://b.example/4", Array.emptyByteArray)) // zero-length record

  private def freshDir(tag: String) = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-warc-$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  private def readBack(dir: String): Map[String, (String, Seq[Byte])] =
    Warc.records(spark, dir).collect()
      .map(r => r.getString(2) ->
        ((r.getString(0), r.getAs[Array[Byte]](6).toSeq)))
      .toMap

  test("write → read round trip: plain, whole-shard gz, per-record-member gz are byte-identical") {
    val plain = freshDir("plain"); val whole = freshDir("whole"); val member = freshDir("member")
    Warc.write(df(docs), "uri", "payload", plain, gzip = false)
    Warc.write(df(docs), "uri", "payload", whole, gzip = true, perRecordGzip = false)
    Warc.write(df(docs), "uri", "payload", member, gzip = true, perRecordGzip = true)
    val a = readBack(plain); val b = readBack(whole); val c = readBack(member)
    assert(a.keySet == docs.map(_._1).toSet)
    assert(a == b, "whole-shard gzip must decode identically to plain")
    assert(a == c, "per-record gzip members (the crawl layout) must decode identically")
    for ((u, p) <- docs)
      assert(a(u) == (("response", p.toSeq)), s"payload drift for $u")
    // one shard per non-empty partition, never a whole-file materialization path
    assert(new java.io.File(member).listFiles().count(_.getName.endsWith(".warc.gz")) == 2)
  }

  test("standard headers parse; record ids are URI-deterministic") {
    val dir = freshDir("hdrs")
    Warc.write(df(docs), "uri", "payload", dir)
    val rows = Warc.records(spark, dir)
      .select("warc_type", "record_id", "target_uri", "warc_date", "content_type")
      .collect().map(r => r.getString(2) -> r).toMap
    val r = rows("https://a.example/1")
    assert(r.getString(0) == "response")
    assert(r.getString(1) == "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(
      "https://a.example/1".getBytes("UTF-8")) + ">")
    assert(r.getString(3) == "2026-01-01T00:00:00Z")
    assert(r.getString(4).startsWith("application/http"))
  }

  test("truncated tail: strict throws naming the shard; lenient keeps the complete records") {
    val dir = freshDir("trunc")
    Warc.write(df(docs, parts = 1), "uri", "payload", dir, gzip = false)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc")).head
    // chop mid-payload of the LAST record (leave the first records whole)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, bytes.dropRight(7))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.records(spark, dir).count()
    }
    assert(e.getCause != null &&
      e.getCause.getMessage.contains("malformed WARC shard"), s"got: ${e.getCause}")
    val kept = Warc.records(spark, dir, strict = false)
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(kept == docs.map(_._1).init.toSet,
      "lenient mode must keep every complete record and only drop the tail")
  }

  test("garbage between records: strict is loud, lenient stops cleanly") {
    val dir = freshDir("garbage")
    Warc.write(df(docs.take(2), parts = 1), "uri", "payload", dir, gzip = false)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc")).head
    val out = new java.io.FileOutputStream(f, true)
    out.write("NOT A WARC LINE\r\nmore garbage\r\n".getBytes("ISO-8859-1"))
    out.close()
    intercept[org.apache.spark.SparkException] {
      Warc.records(spark, dir).count()
    }
    assert(Warc.records(spark, dir, strict = false).count() == 2)
  }
}
