package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schemas, partition-local batching, determinism
  * across partitionings, null payloads, and the frame generator. */
class MultimodalSpec extends SparkSpec {

  private def mediaDf(parts: Int) = {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.fakePayload(4, 3, seed = 11)),
      (2L, Multimodal.fakePayload(8, 2, seed = 22)),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, Multimodal.fakePayload(2, 2, seed = 44)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts).map(t => org.apache.spark.sql.Row(t._1, t._2)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
  }

  test("decode: header parsed, null payload → null struct, schema typed") {
    val out = Multimodal.decode(mediaDf(2), "payload")
    assert(out.schema("decoded").dataType == Multimodal.decodedSchema)
    val rows = out.select("id", "decoded.width", "decoded.height").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2))))).toMap
    assert(rows(1L).contains((4, 3)))
    assert(rows(2L).contains((8, 2)))
    assert(rows(3L).isEmpty)
  }

  test("embed: deterministic across partitionings, L2-normalized floats") {
    val a = Multimodal.embed(mediaDf(1), "payload").select("id", "media_vec")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    val b = Multimodal.embed(mediaDf(4), "payload").select("id", "media_vec")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, v) =>
      if (v == null) assert(b(id) == null)
      else {
        assert(v == b(id), s"id=$id differs across partitionings")
        assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
      }
    }
  }

  test("resize re-encodes header and pixel count") {
    val out = Multimodal.resize(mediaDf(2), "payload", newW = 3, newH = 3)
    val r = out.filter(col("id") === 1L).select("resized").head().getAs[Array[Byte]](0)
    val (w, h, px) = Multimodal.default.decode(r)
    assert(w == 3 && h == 3 && px.length == 9)
  }

  test("sampleFrames: generator emits every stride-th frame with ids") {
    // payload body 12 bytes = 6 frames of 2 bytes; stride 2 → frames 0,2,4
    val payload = Multimodal.fakePayload(4, 3, seed = 7) // body = 12 bytes
    import spark.implicits._
    val df = Seq((9L, payload)).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "payload", frameBytes = 2,
      stride = 2, idCols = Seq("id")).collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.getAs[Array[Byte]](2).length == 2))
    assert(frames.forall(_.getLong(0) == 9L))
  }
}
