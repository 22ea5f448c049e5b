package graft

import graft.multimodal.{MediaFixture, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The x20/x21 differential rests on the fixture writers being exact
  * encode twins of the engine's decode paths: the BMP bytes bmp24 lays
  * out must decode through javax.imageio to the formula's BT.601 luma,
  * and the WAV bytes wavPcmPayload lays out must decode through the RIFF
  * parser to the expected channel-major plane. Pin the round-trips here
  * so a writer/decoder drift fails fast, not as an oracle hash mismatch.
  */
class MediaFixtureSpec extends AnyFunSuite {

  test("bmp24 round-trips through imageIo to the formula's BT.601 luma") {
    val id = 5L
    val (w, h, px) = Multimodal.imageIo.decode(MediaFixture.imagePayload(id))
    assert(w == 16 && h == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val r = ((id * 37 + y * 11 + x * 7) % 256).toInt
      val g = ((id * 23 + y * 5 + x * 13) % 256).toInt
      val b = ((id * 41 + y * 3 + x * 17) % 256).toInt
      val expect = (r * 299 + g * 587 + b * 114 + 500) / 1000
      assert((px(y * 16 + x) & 0xff) == expect, s"pixel ($x,$y)")
    }
  }

  test("wavPcmPayload 16-bit mono decodes to the samples' high bytes") {
    val payload = Multimodal.wavPcmPayload(1, 16, 4,
      (_, i) => Seq(0x7fee, -32768, 0x0102, -1)(i))
    val (frames, channels, px) = Multimodal.wavPcm.decode(payload)
    assert(frames == 4 && channels == 1)
    assert(px.toSeq == Seq[Byte](0x7f, -128, 0x01, -1))
  }

  test("wavPcmPayload stereo decodes channel-major; 8-bit recenters") {
    val stereo = Multimodal.wavPcmPayload(2, 16, 3,
      (c, i) => ((c * 10 + i) << 8))
    val (f2, c2, px2) = Multimodal.wavPcm.decode(stereo)
    assert(f2 == 3 && c2 == 2)
    // channel 0's frames first, then channel 1's
    assert(px2.toSeq == Seq[Byte](0, 1, 2, 10, 11, 12))
    val mono8 = Multimodal.wavPcmPayload(1, 8, 3, (_, i) => Seq(0, 128, 255)(i))
    val (f8, _, px8) = Multimodal.wavPcm.decode(mono8)
    assert(f8 == 3 && px8.toSeq == Seq[Byte](-128, 0, 127))
  }

  test("aviPayload round-trips through mjpegAvi to the per-frame film strip") {
    val id = 7L
    val (w, h, px) = Multimodal.mjpegAvi.decode(MediaFixture.videoPayload(id))
    assert(w == 16 && h == 16 * MediaFixture.VidFrames)
    for (f <- 0 until MediaFixture.VidFrames; y <- 0 until 16; x <- 0 until 16) {
      val r = ((id * 37 + f * 53 + y * 11 + x * 7) % 256).toInt
      val g = ((id * 23 + f * 29 + y * 5 + x * 13) % 256).toInt
      val b = ((id * 41 + f * 61 + y * 3 + x * 17) % 256).toInt
      val expect = (r * 299 + g * 587 + b * 114 + 500) / 1000
      assert((px((f * 16 + y) * 16 + x) & 0xff) == expect, s"frame $f pixel ($x,$y)")
    }
    // the chunk walk sees exactly VidFrames frames, each a complete BMP
    val frames = Multimodal.aviFrames(MediaFixture.videoPayload(id))
    assert(frames.size == MediaFixture.VidFrames)
    assert(frames.forall(f => f.length == 822 && f(0) == 'B' && f(1) == 'M'))
    // fixed-offset contract the x22 oracle slices by: frame f at 24 + f·830
    val payload = MediaFixture.videoPayload(id)
    for (f <- 0 until MediaFixture.VidFrames)
      assert(payload(24 + f * 830 + 8) == 'B' && payload(24 + f * 830 + 9) == 'M',
        s"frame $f not at its pinned offset")
  }

  test("video edge rows: flat decodes, mixed-dims refused, null/corrupt undecodable") {
    val (_, h, _) = Multimodal.mjpegAvi.decode(MediaFixture.videoPayload(MediaFixture.NVideos))
    assert(h == 16 * MediaFixture.VidFrames)
    assert(MediaFixture.videoPayload(MediaFixture.NVideos + 1L) == null)
    // corrupt short payload: not an AVI, below even the fake-header minimum
    intercept[Exception](Multimodal.mjpegAvi.decode(
      MediaFixture.videoPayload(MediaFixture.NVideos + 2L)))
    // frames disagreeing on dimensions must be refused, not silently padded
    val ex = intercept[IllegalArgumentException](Multimodal.mjpegAvi.decode(
      MediaFixture.videoPayload(MediaFixture.NVideos + 3L)))
    assert(ex.getMessage.contains("disagree"))
  }

  test("fixture edge rows: flat decodes, null is null, corrupt defeats every codec") {
    // flat image/audio decode fine (the zero-signature path is downstream)
    assert(Multimodal.imageIo.decode(MediaFixture.imagePayload(MediaFixture.NImages))._1 == 16)
    assert(Multimodal.wavPcm.decode(MediaFixture.audioPayload(MediaFixture.NAudio))._1 == 64)
    assert(MediaFixture.imagePayload(MediaFixture.NImages + 1L) == null)
    assert(MediaFixture.audioPayload(MediaFixture.NAudio + 1L) == null)
    // corrupt rows are shorter than even the fake-header minimum
    intercept[Exception](Multimodal.imageIo.decode(
      MediaFixture.imagePayload(MediaFixture.NImages + 2L)))
    intercept[Exception](Multimodal.wavPcm.decode(
      MediaFixture.audioPayload(MediaFixture.NAudio + 2L)))
  }
}
