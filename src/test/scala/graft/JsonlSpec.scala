package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** Writes `lines` as one file under a fresh dir; returns the dir. */
  private def fixture(name: String, lines: Seq[String],
                      gzip: Boolean = false): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-jsonl-$name")
    val fn = if (gzip) "part-0.jsonl.gz" else "part-0.jsonl"
    val f = dir.resolve(fn)
    val out: java.io.OutputStream = {
      val fos = java.nio.file.Files.newOutputStream(f)
      if (gzip) new java.util.zip.GZIPOutputStream(fos) else fos
    }
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private val goodLines = Seq(
    """{"doc_id": 1, "source": "web", "text": "plain ascii"}""",
    // escaped newline + unicode survive the round trip byte-for-byte
    """{"doc_id": 2, "source": "books", "text": "line\nbreak é中"}""",
    // missing key → null field, still a GOOD row (schema is a superset)
    """{"doc_id": 3, "source": "web"}""",
    // extra key not in the schema is ignored, not corrupt
    """{"doc_id": 4, "source": "cc", "text": "x", "extra": true}""")

  private val badLines = Seq(
    """{"doc_id": 5, "source": "web", "text": "truncat""", // malformed JSON
    """{"doc_id": "NaN", "source": "web", "text": "y"}""", // valid JSON, type mismatch
    """[1, 2, 3]""") // valid JSON, not an object

  test("good rows parse exactly; malformed lines carry the raw line, nothing throws") {
    val dir = fixture("mixed", goodLines ++ Seq("", "   ") ++ badLines)
    val ann = Jsonl.read(spark, dir, schema)

    val good = Jsonl.good(ann).orderBy("doc_id").collect()
    assert(good.length == 4)
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(good(1).getString(2) == "line\nbreak é中")
    assert(good(2).isNullAt(2), "missing key must read as null, not corrupt")

    // the corrupt-only projection Spark refuses is documented on
    // Jsonl.quarantine; referencing any declared column alongside it is
    // allowed, so the assertion rides (corrupt, doc_id)
    val corrupt = ann.filter(col(Jsonl.CorruptCol).isNotNull)
      .select(col(Jsonl.CorruptCol), col("doc_id"))
      .collect().map(_.getString(0)).toSet
    assert(corrupt == badLines.toSet,
      "every malformed line — truncated, type-mismatched, non-object — " +
        s"must surface verbatim; got $corrupt")
    // blank lines are framing: skipped, in neither stream
    assert(ann.count() == goodLines.size + badLines.size)
  }

  test("quarantine (text-mode second scan) marks exactly what read marked") {
    val dir = fixture("quar", goodLines ++ badLines)
    val q = Jsonl.quarantine(spark, dir, schema)
      .collect().map(_.getString(0)).toSet
    assert(q == badLines.toSet,
      "the from_json re-parse must agree with the reader's corrupt " +
        s"marking line-for-line; got $q")
  }

  test("gz shards read transparently with identical content") {
    val plain = fixture("plain", goodLines)
    val gz = fixture("gz", goodLines, gzip = true)
    val a = Jsonl.good(Jsonl.read(spark, plain, schema))
      .orderBy("doc_id").collect().toSeq
    val b = Jsonl.good(Jsonl.read(spark, gz, schema))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("a schema declaring the corrupt column is refused loudly") {
    val bad = schema.add(Jsonl.CorruptCol, StringType)
    val e = intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/nonexistent", bad)
    }
    assert(e.getMessage.contains(Jsonl.CorruptCol))
    val e2 = intercept[IllegalArgumentException] {
      Jsonl.quarantine(spark, "/nonexistent", bad)
    }
    assert(e2.getMessage.contains(Jsonl.CorruptCol))
  }
}
