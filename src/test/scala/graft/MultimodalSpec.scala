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

  /** Real WAV fixture encoded by the JDK's OWN RIFF writer
    * (javax.sound.sampled), so the parser under test is checked against an
    * independent encoder, not a round-trip of itself. */
  private def wavBytes(samples: Array[Array[Short]], bits: Int): Array[Byte] = {
    import javax.sound.sampled._
    val channels = samples.length
    val frames = samples(0).length
    val fmt = new AudioFormat(8000f, bits, channels, bits == 16, false) // 8-bit unsigned, LE
    val raw = new Array[Byte](frames * channels * (bits / 8))
    for (i <- 0 until frames; c <- 0 until channels) {
      val s = samples(c)(i)
      val off = (i * channels + c) * (bits / 8)
      if (bits == 16) { raw(off) = (s & 0xff).toByte; raw(off + 1) = (s >> 8).toByte }
      else raw(off) = ((s & 0xff) ^ 0x80).toByte // spec fixture: signed → unsigned
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, frames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("wavPcm codec: 16-bit stereo WAV decodes channel-major with high-byte samples") {
    val left = Array.tabulate(40)(i => (i * 256).toShort)        // high byte = i
    val right = Array.tabulate(40)(i => (-i * 256).toShort)      // high byte = -i
    val (frames, channels, px) = Multimodal.wavPcm.decode(wavBytes(Array(left, right), 16))
    assert(frames == 40 && channels == 2 && px.length == 80)
    for (i <- 0 until 40) {
      assert(px(i) == i.toByte, s"left[$i]")
      assert(px(40 + i) == (-i).toByte, s"right[$i]")
    }
  }

  test("wavPcm codec: 8-bit mono WAV re-centers unsigned samples to signed") {
    val mono = Array.tabulate(16)(i => (i * 8 - 64).toShort)
    val (frames, channels, px) = Multimodal.wavPcm.decode(wavBytes(Array(mono), 8))
    assert(frames == 16 && channels == 1)
    for (i <- 0 until 16) assert(px(i) == (i * 8 - 64).toByte, s"mono[$i]")
  }

  test("wavPcm through the Spark path: decode, resample, embed; corrupt RIFF → null") {
    import spark.implicits._
    val stereo = wavBytes(Array(
      Array.tabulate(32)(i => (i * 100).toShort),
      Array.tabulate(32)(i => (i * -100).toShort)), 16)
    val corrupt = "RIFFxxxxWAVEjunk".getBytes ++ Array.fill[Byte](40)(0)
    val df = Seq(
      (1L, stereo),
      (2L, corrupt),                                // RIFF magic but no fmt/data
      (3L, Multimodal.fakePayload(4, 3, seed = 9))) // non-RIFF → stub fallback
      .toDF("id", "payload")
    val out = Multimodal.decode(df, "payload", codec = Multimodal.wavPcm)
      .select("id", "decoded.width", "decoded.height").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2))))).toMap
    assert(out(1L).contains((32, 2)))
    assert(out(2L).isEmpty) // unparseable PCM → null row, not task failure
    assert(out(3L).contains((4, 3)))
    // resample 32 frames → 8 per channel through the engine resize path
    val res = Multimodal.resize(df.filter($"id" === 1L), "payload", newW = 8, newH = 2,
      codec = Multimodal.wavPcm).select("resized").head().getAs[Array[Byte]](0)
    val (w, h, px) = Multimodal.default.decode(res)
    assert(w == 8 && h == 2 && px.length == 16)
    for (i <- 0 until 8) assert(px(i) == ((i * 4 * 100) >> 8).toByte, s"resampled[$i]")
    // embed: L2-normalized and partition-invariant, same contract as images
    val v1 = Multimodal.embed(df, "payload", codec = Multimodal.wavPcm)
      .filter($"id" === 1L).select("media_vec").head().getSeq[Float](0)
    val v2 = Multimodal.embed(df.repartition(3), "payload", codec = Multimodal.wavPcm)
      .filter($"id" === 1L).select("media_vec").head().getSeq[Float](0)
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

  /** Real MJPEG/AVI fixture assembled from JPEG frames the JDK's own
    * encoder produced: RIFF('AVI ' LIST(hdrl avih) LIST(movi 00dc…) idx1)
    * — header and index chunks present so the parser proves it skips
    * non-frame content, not just that it finds frames. */
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")); bb.putInt(body.length); bb.put(body)
      bb.array() // word-aligned: odd body → one zero pad byte
    }
    def list(typ: String, bodies: Seq[Array[Byte]]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ bodies.flatten)
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", Seq(chunk("avih", new Array[Byte](56)))) ++
      list("movi", frames.map(f => chunk("00dc", f))) ++
      chunk("idx1", new Array[Byte](16 * frames.size))
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(body.length); bb.put(body)
    bb.array()
  }

  test("mjpegAvi codec: frame extraction, film-strip decode, odd-chunk padding") {
    val f0 = imageBytes("jpg", w = 6, h = 4)
    // force an odd-length frame (trailing byte after EOI, which JPEG decoders
    // ignore) so the word-alignment pad path is actually exercised
    val f1base = imageBytes("jpg", w = 6, h = 4)
    val f1 = if (f1base.length % 2 == 0) f1base :+ 0.toByte else f1base
    val f2 = imageBytes("jpg", w = 6, h = 4)
    val avi = aviBytes(Seq(f0, f1, f2))
    val got = Multimodal.aviFrames(avi)
    assert(got.size == 3)
    assert(got(0).toSeq == f0.toSeq && got(1).toSeq == f1.toSeq && got(2).toSeq == f2.toSeq)
    // film strip: (w, h·n) with each slice equal to the frame's own decode
    val (w, h, strip) = Multimodal.mjpegAvi.decode(avi)
    assert(w == 6 && h == 4 * 3 && strip.length == 6 * 4 * 3)
    Seq(f0, f1, f2).zipWithIndex.foreach { case (f, i) =>
      val (fw, fh, px) = Multimodal.imageIo.decode(f)
      assert(fw == 6 && fh == 4)
      assert(strip.slice(i * 24, (i + 1) * 24).toSeq == px.toSeq, s"frame $i slice")
    }
    // non-AVI falls back to the stub's fake-header format
    val (sw, sh, _) = Multimodal.mjpegAvi.decode(Multimodal.fakePayload(4, 3, seed = 5))
    assert(sw == 4 && sh == 3)
    // but INSIDE an AVI, a non-JPEG frame chunk is corrupt media — strict
    // decode throws (→ null row through the Spark wrappers), never a
    // fake-header misparse passing garbage off as pixels
    val badAvi = aviBytes(Seq(Array.fill[Byte](32)(7)))
    intercept[IllegalArgumentException] { Multimodal.mjpegAvi.decode(badAvi) }
    import spark.implicits._
    val viaSpark = Multimodal.decode(Seq((9L, badAvi)).toDF("id", "payload"),
      "payload", codec = Multimodal.mjpegAvi).select("decoded").head()
    assert(viaSpark.isNullAt(0))
  }

  test("aviFrames: corrupt sizes fail loudly — child overruns parent LIST, int-overflow size") {
    val f0 = imageBytes("jpg", w = 6, h = 4)
    val avi = aviBytes(Seq(f0))
    // find the movi LIST and corrupt its FIRST CHILD's size to reach past
    // the list's end (but still inside the payload) — the round-7 bound:
    // a child escaping its parent must throw, not be walked as a sibling
    def indexOf(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.indexWhere(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j)))
    val moviAt = indexOf(avi, "movi".getBytes("US-ASCII"))
    assert(moviAt > 0)
    val childSizeAt = moviAt + 4 + 4 // movi fourcc, child id, then its size
    def withIntAt(at: Int, v: Int): Array[Byte] = {
      val c = avi.clone()
      java.nio.ByteBuffer.wrap(c, at, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v)
      c
    }
    val escaping = withIntAt(childSizeAt, avi.length - (childSizeAt + 4) - 2)
    val e1 = intercept[IllegalArgumentException](Multimodal.aviFrames(escaping))
    assert(e1.getMessage.contains("bad RIFF chunk size"))
    // hostile size near Int.MaxValue: an int sum would wrap negative and
    // slip past the bound — must still be the loud size error, never a
    // StringIndexOutOfBounds from a wrapped cursor
    val hostile = withIntAt(childSizeAt, 0x7FFFFFF0)
    val e2 = intercept[IllegalArgumentException](Multimodal.aviFrames(hostile))
    assert(e2.getMessage.contains("bad RIFF chunk size"))
  }

  test("deeply nested LIST chunks fail loudly, never StackOverflowError") {
    // a crafted payload of thousands of nested LISTs would recurse once
    // per level — StackOverflowError is FATAL (uncaught by Try) and would
    // kill the task; the depth cap must turn it into the loud parse error
    val depth = 5000
    val innerSize = 4 // just the type FourCC
    val bb = java.nio.ByteBuffer.allocate(12 + depth * 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + depth * 12)
      .put("AVI ".getBytes("US-ASCII"))
    for (level <- depth to 1 by -1) {
      bb.put("LIST".getBytes("US-ASCII")).putInt(innerSize + (level - 1) * 12)
        .put("movi".getBytes("US-ASCII"))
    }
    val e = intercept[IllegalArgumentException](Multimodal.aviFrames(bb.array()))
    assert(e.getMessage.contains("nesting"))
  }

  test("hostile image header dims are capped BEFORE pixel allocation") {
    // valid PNG, width/height patched to 60000×60000 (IHDR big-endian at
    // offsets 16/20): the old ImageIO.read path would try to allocate the
    // full raster before any check — the guarded reader must refuse from
    // the header alone
    val png = imageBytes("png", w = 6, h = 4)
    val hostile = png.clone()
    val big = java.nio.ByteBuffer.allocate(4).putInt(60000).array()
    System.arraycopy(big, 0, hostile, 16, 4)
    System.arraycopy(big, 0, hostile, 20, 4)
    val e = intercept[IllegalArgumentException](Multimodal.imageIo.decode(hostile))
    assert(e.getMessage.contains("decode cap"))
  }

  test("fuzz: mutated media payloads never throw fatal errors or hang") {
    // the 100-TB contract: a corrupt blob must null the row (any
    // Exception is caught by the Spark wrappers), NEVER kill the task
    // with an Error (StackOverflow/OOM) or spin. 150 seeded mutations per
    // codec family: random byte flips and random 4-byte little-endian
    // patches (sizes/offsets are where parsers break).
    val rnd = new scala.util.Random(31)
    val wav = {
      // reuse the valid fixtures other tests build: a tiny 16-bit WAV via
      // the JDK encoder
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
      val samples = new Array[Byte](8000)
      rnd.nextBytes(samples)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(samples), fmt, 2000),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val avi = aviBytes(Seq.fill(3)(imageBytes("jpg", w = 6, h = 4)))
    val png = imageBytes("png", w = 8, h = 8)
    def mutate(base: Array[Byte]): Array[Byte] = {
      val c = base.clone()
      if (rnd.nextBoolean()) {
        // flip 1-4 random bytes
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        }
      } else {
        // patch a random aligned int (hits size fields)
        val at = rnd.nextInt(math.max(1, c.length - 4))
        java.nio.ByteBuffer.wrap(c, at, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(rnd.nextInt())
      }
      c
    }
    val codecs: Seq[(String, Array[Byte] => Any)] = Seq(
      ("wavPcm", p => Multimodal.wavPcm.decode(p)),
      ("mjpegAvi", p => Multimodal.mjpegAvi.decode(p)),
      ("aviFrames", p => Multimodal.aviFrames(p)),
      ("imageIo", p => Multimodal.imageIo.decode(p)))
    for ((name, base) <- Seq(("wav", wav), ("avi", avi), ("png", png));
         i <- 1 to 150) {
      val m = mutate(base)
      codecs.foreach { case (cname, f) =>
        try f(m)
        catch { case _: Exception => () } // Exceptions → null row: fine
        // Errors (SOE/OOM) propagate and fail the test loudly
        val _ = (name, i, cname)
      }
    }
  }

  test("sampleAviFrames: per-frame JPEG rows compose with the image pipeline") {
    import spark.implicits._
    val frames = Seq.fill(5)(imageBytes("jpg", w = 6, h = 4))
    val df = Seq(
      (1L, aviBytes(frames)),
      (2L, Multimodal.fakePayload(4, 3, seed = 3)), // non-AVI → no rows
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val out = Multimodal.sampleAviFrames(df, "payload", stride = 2, idCols = Seq("id"))
    assert(out.schema.fieldNames.toSeq == Seq("id", "frame_idx", "frame"))
    val rows = out.collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 0), (1L, 2), (1L, 4)))
    // extracted frames are plain JPEGs: the image decode operator runs on them
    val dec = Multimodal.decode(out, "frame", codec = Multimodal.imageIo)
      .select("frame_idx", "decoded.width", "decoded.height").collect()
    assert(dec.forall(r => r.getInt(1) == 6 && r.getInt(2) == 4))
    // full video-to-feature path: strip decode → embed, partition-invariant
    val v1 = Multimodal.embed(df, "payload", codec = Multimodal.mjpegAvi)
      .filter($"id" === 1L).select("media_vec").head().getSeq[Float](0)
    val v2 = Multimodal.embed(df.repartition(3), "payload", codec = Multimodal.mjpegAvi)
      .filter($"id" === 1L).select("media_vec").head().getSeq[Float](0)
    assert(v1 == v2)
    assert(math.abs(v1.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
  }
}
