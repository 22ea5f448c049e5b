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

  /** Deterministic real PNG/JPEG fixtures: a 6×4 RGB gradient rendered to
    * actual image bytes via ImageIO — real decode, no binary files in-repo. */
  private def imageBytes(format: String, w: Int = 6, h: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 60) << 8) | (x * y * 10))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("imageIo codec: real PNG decodes through the Spark path") {
    import spark.implicits._
    val df = Seq(
      (1L, imageBytes("png")),
      (2L, imageBytes("jpg", w = 5, h = 7)),
      (3L, Array[Byte](1, 2, 3)), // corrupt: not an image, header too short
      (4L, Multimodal.fakePayload(4, 3, seed = 5))) // stub fallback format
      .toDF("id", "payload")
    val out = Multimodal.decode(df, "payload", codec = Multimodal.imageIo)
      .select("id", "decoded.width", "decoded.height", "decoded.pixels")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3))))).toMap
    assert(out(1L).exists { case (w, h, px) => w == 6 && h == 4 && px.length == 24 })
    assert(out(2L).exists { case (w, h, px) => w == 5 && h == 7 && px.length == 35 })
    assert(out(3L).isEmpty) // undecodable → null, not a task failure
    assert(out(4L).exists { case (w, h, _) => w == 4 && h == 3 }) // stub fallback
    // luma golden: integer BT.601 of the known gradient, pinned exactly
    val px = out(1L).get._3
    def luma(x: Int, y: Int) =
      ((x * 40 * 299 + y * 60 * 587 + (x * y * 10 % 256) * 114 + 500) / 1000).toByte
    assert(px(0) == luma(0, 0) && px(5) == luma(5, 0) && px(23) == luma(5, 3))
  }

  test("imageIo codec: 2-D nearest-neighbor resize + stable embed") {
    import spark.implicits._
    val df = Seq((1L, imageBytes("png", w = 8, h = 8))).toDF("id", "payload")
    val resized = Multimodal.resize(df, "payload", newW = 4, newH = 2,
      codec = Multimodal.imageIo)
      .select("resized").head().getAs[Array[Byte]](0)
    val (w, h, px) = Multimodal.default.decode(resized) // header format shared
    assert(w == 4 && h == 2 && px.length == 8)
    // nearest-neighbor golden: out(y,x) = src(y*8/2 row, x*8/4 col)
    val (_, _, src) = Multimodal.imageIo.decode(imageBytes("png", w = 8, h = 8))
    for (y <- 0 until 2; x <- 0 until 4)
      assert(px(y * 4 + x) == src((y * 8 / 2) * 8 + (x * 8 / 4)), s"($x,$y)")
    // embed through the engine path: L2-normalized, identical across runs
    val v1 = Multimodal.embed(df, "payload", codec = Multimodal.imageIo)
      .select("media_vec").head().getSeq[Float](0)
    val v2 = Multimodal.embed(df.repartition(3), "payload", codec = Multimodal.imageIo)
      .select("media_vec").head().getSeq[Float](0)
    assert(v1 == v2)
    assert(math.abs(v1.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
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
