package graft

import graft.encode.{ImageBlock, TextBlock, VectorLayout}
import graft.multimodal.Multimodal
import graft.query.{ImageFilter, NoFilter, QueryEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ImageGridMath

/** Pins the image modality block contract (VERDICT r7 ask #8): layout
  * dims/offsets, the zero-centered L2-normalized mean-luma signature, the
  * Geo-convention null indicator, product/query parity through the shared
  * signature function, and partitioning-independence of the expression.
  */
class ImageBlockSpec extends SparkSpec {
  import spark.implicits._

  private val block = ImageBlock("img", gridW = 2, gridH = 2)

  test("layout: dim is gridW*gridH + 1 and offsets line up after a text block") {
    val layout = VectorLayout(Seq(TextBlock("text_vec", 8), block))
    assert(block.dim == 5)
    assert(layout.dim == 13)
    assert(layout.offsets("img") == 8)
  }

  test("signature: pinned value for a half-bright PNG (center + normalize)") {
    // left half luma 0, right half luma 200 → 2x2 grid [0,200,0,200],
    // centered [-100,100,-100,100], norm 200 → exactly [-.5,.5,-.5,.5]
    val p = png(8, 8)((x, _) => if (x < 4) 0 else 200)
    val sig = ImageGridMath.signature(Multimodal.imageIo, p, 2, 2)
    assert(sig.length == 4)
    val expect = Array(-0.5, 0.5, -0.5, 0.5)
    sig.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("signature: luma grid is grayscale-exact and resolution-pooled") {
    // 16x16 quadrant image pooled to 2x2: each cell is one quadrant's mean
    val p = png(16, 16)((x, y) => (if (y < 8) 0 else 2) * 40 + (if (x < 8) 0 else 1) * 40)
    val sig = ImageGridMath.signature(Multimodal.imageIo, p, 2, 2)
    // grid [0,40,80,120] → centered [-60,-20,20,60], norm sqrt(2*3600+2*400)
    val n = math.sqrt(2 * 3600.0 + 2 * 400.0)
    val expect = Array(-60 / n, -20 / n, 20 / n, 60 / n)
    sig.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("product block: decoded → indicator 0; null → zeros + -1; garbage → zeros + -1; flat → zero sig") {
    val rows = Seq(
      (1, png(8, 8)((x, _) => x * 30)),           // decodable, non-flat
      (2, null.asInstanceOf[Array[Byte]]),        // missing payload
      (3, Array[Byte](1, 2, 3)),                  // undecodable by every codec path
      (4, png(8, 8)((_, _) => 77)))               // flat: zero signature, decoded
    val out = rows.toDF("id", "img")
      .withColumn("vec", block.encode)
      .orderBy("id").select("vec").as[Seq[Double]].collect()
    assert(out.forall(_.length == 5))
    val Seq(ok, miss, garbage, flat) = out.toSeq
    assert(ok.last == 0.0 && math.abs(ok.dropRight(1).map(x => x * x).sum - 1.0) < 1e-12)
    assert(math.abs(ok.dropRight(1).sum) < 1e-9) // zero-centered
    assert(miss == Seq(0.0, 0.0, 0.0, 0.0, -1.0))
    assert(garbage == Seq(0.0, 0.0, 0.0, 0.0, -1.0))
    assert(flat == Seq(0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("expression is partitioning-independent and matches the driver-side math") {
    val payloads = (0 until 12).map(i => (i, png(9, 7)((x, y) => x * i + y * 3)))
    def run(parts: Int) = payloads.toDF("id", "img").repartition(parts)
      .withColumn("vec", block.encode)
      .orderBy("id").select("vec").as[Seq[Double]].collect().toSeq
    val one = run(1)
    assert(one == run(5))
    payloads.zip(one).foreach { case ((_, p), vec) =>
      val sig = ImageGridMath.signature(Multimodal.imageIo, p, 2, 2)
      sig.zip(vec).foreach { case (s, v) => assert(s == v) }
      assert(vec.last == 0.0)
    }
  }

  test("query encode: parity, weight, negation, NoFilter, undecodable is loud") {
    val p = png(10, 10)((x, y) => x * 20 + y)
    val sig = ImageGridMath.signature(Multimodal.imageIo, p, 2, 2)
    val q = QueryEncoder.encodeImage(block, Some(ImageFilter("img", p, weight = 2.0)))
    assert(q.length == 5)
    sig.zipWithIndex.foreach { case (s, i) => assert(q(i) == 2.0 * s) }
    assert(q.last == 2.0) // indicator always +1·w
    val neg = QueryEncoder.encodeImage(block, Some(ImageFilter("img", p, negated = true)))
    sig.zipWithIndex.foreach { case (s, i) => assert(neg(i) == -s) }
    assert(neg.last == 1.0) // indicator not flipped
    assert(QueryEncoder.encodeImage(block, None).forall(_ == 0.0))
    assert(QueryEncoder.encodeImage(block, Some(NoFilter("img"))).toSeq ==
      Seq(0.0, 0.0, 0.0, 0.0, 1.0))
    intercept[IllegalArgumentException] {
      QueryEncoder.encodeImage(block, Some(ImageFilter("img", Array[Byte](9))))
    }
  }

  test("retrieval encode: ImageFilter aimed at a non-image block is loud (rerank parity)") {
    val layout = VectorLayout(Seq(TextBlock("text_vec", 2), block))
    // well-aimed: encodes fine
    QueryEncoder.encode(layout, Map("img" -> ImageFilter("img", png(2, 2)((_, _) => 128))),
      textVec = Array(1.0, 0.0))
    // aimed at the text block (a non-image block) — same sys.error class the
    // rerank path's strict imageBlocks lookup throws, not silent zeros
    val e = intercept[RuntimeException] {
      QueryEncoder.encode(layout,
        Map("text_vec" -> ImageFilter("text_vec", png(2, 2)((_, _) => 128))),
        textVec = Array(1.0, 0.0))
    }
    assert(e.getMessage.contains("does not name an image block"))
  }

  /** Minimal RIFF/WAVE writer: 8-bit unsigned mono PCM — the format
    * [[Multimodal.wavPcm]] decodes. Samples kept in 128–255 so the
    * re-centered signed bytes stay non-negative (monotone under the
    * unsigned luma read — see wavPcm's channel-major plane contract). */
  private def wav(samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + n); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)          // PCM, mono
    bb.putInt(8000); bb.putInt(8000)        // sample rate, byte rate
    bb.putShort(1); bb.putShort(8)          // block align, 8-bit
    bb.put("data".getBytes); bb.putInt(n)
    samples.foreach(s => bb.put(s.toByte))
    bb.array()
  }

  test("audio modality: the SAME block over the wavPcm codec makes audio searchable") {
    import spark.implicits._
    // the codec maps audio onto the (w=frames, h=channels) plane, so an
    // 8x1 grid is an 8-point temporal amplitude envelope per clip
    val audioBlock = ImageBlock("audio", gridW = 8, gridH = 1,
      codec = Multimodal.wavPcm)
    val rampUp = wav((0 until 400).map(i => 128 + (i * 127) / 399).toArray)
    val rampDown = wav((0 until 400).map(i => 255 - (i * 127) / 399).toArray)
    val flat = wav(Array.fill(400)(180))
    val su = org.apache.spark.sql.graft.ImageGridMath
      .signature(Multimodal.wavPcm, rampUp, 8, 1)
    val sd = org.apache.spark.sql.graft.ImageGridMath
      .signature(Multimodal.wavPcm, rampDown, 8, 1)
    // mirrored envelopes → opposite contrast signatures
    val dot = su.zip(sd).map { case (a, b) => a * b }.sum
    assert(dot < -0.95, s"ramp-up vs ramp-down cosine $dot")
    // retrieval end-to-end with the audio codec plugged into the engine
    val items = Seq((1, "clip one", rampUp), (2, "clip two", rampDown),
      (3, "clip three", flat)).toDF("row_id", "name", "audio")
    val eng = FuseRankEngine.index(items, FuseRankConfig(
      idCol = "row_id", textCols = Map("name" -> 1.0), auxCols = Seq.empty,
      imageCols = Seq("audio"), imageGrid = (8, 1),
      imageCodec = Multimodal.wavPcm,
      params = graft.encode.EncoderParams(numHarmonics = 8)))
    // query by a SHORTER ramp-down clip (resampled by the pooling grid)
    val probe = wav((0 until 100).map(i => 255 - (i * 127) / 99).toArray)
    val hits = eng.search("clip", Seq(graft.query.ImageFilter("audio", probe,
      weight = 4.0)), k = 3).select("row_id").as[Int].collect()
    assert(hits.head == 2, s"audio retrieval order: ${hits.mkString(",")}")
  }

  test("cosine semantics: identical image scores +w, inverted image scores -w") {
    val a = png(12, 12)((x, _) => if (x < 6) 20 else 220)
    val inv = png(12, 12)((x, _) => if (x < 6) 220 else 20)
    val sa = ImageGridMath.signature(Multimodal.imageIo, a, 2, 2)
    val sInv = ImageGridMath.signature(Multimodal.imageIo, inv, 2, 2)
    val dotSelf = sa.zip(sa).map { case (x, y) => x * y }.sum
    val dotInv = sa.zip(sInv).map { case (x, y) => x * y }.sum
    assert(math.abs(dotSelf - 1.0) < 1e-12)
    assert(math.abs(dotInv + 1.0) < 1e-12)
  }
}
