package graft.queries

import graft.encode.{ImageBlock, ProductEncoder, VectorLayout}
import graft.multimodal.{MediaFixture, Multimodal}
import graft.query.{ImageFilter, QueryEncoder}
import graft.search.Search
import org.apache.spark.sql.functions._

/** x20/x21 (VERDICT r9 ask #1): the media modality block under the DuckDB
  * hash. The image/audio encode ([[ImageBlock]] over
  * [[org.apache.spark.sql.graft.ImageLumaGrid]]) was the one first-class
  * block graded ScalaTest-only; these rows run the REAL decode paths —
  * javax.imageio BMP decode for x20, the RIFF/WAVE PCM parser for x21 —
  * through product encode, query encode, and fused top-k, against an
  * oracle that recomputes every score FROM THE RAW BLOB BYTES by slicing
  * the committed fixture parquet in SQL (hex → byte → luma → grid pool →
  * zero-center → L2 → dot), per the uncompressed layouts the containers
  * pin (BMP: 54-byte header, bottom-up rows, BGR; WAV: 44-byte canonical
  * header, interleaved PCM, 16-bit high byte / 8-bit recentered).
  *
  * Exactness: fixture dims are chosen so every pooled cell holds a
  * power-of-2 pixel count — cell means, the grid mean, and the centered
  * residuals are dyadic rationals, EXACT in IEEE double on both engines;
  * sqrt/÷/× are single-rounded identical; the final dot accumulates in
  * dim order on both sides (list_sum over ORDER BY cell = the codegen
  * dot's left-to-right loop). The scores hash-match bit-for-bit, not
  * just to 5 dp. Edge rows ride the same hash: flat payload → zero
  * signature (norm guard), null/short-corrupt payload → undecodable
  * block (indicator −1 → score −1).
  *
  * Both are fixed-input engine-lifecycle queries (the committed fixture
  * at any sf — rest1/flip1 class; BASELINE.md fixed-input ruling).
  * Reference anchor: the encode-block convention of src/encode.py:68-104
  * extended to media payloads (SURVEY §2.5 beyond-survey block).
  */
object Media {

  private def fused(s: org.apache.spark.sql.SparkSession, path: String,
                    gridW: Int, gridH: Int, codec: Multimodal.Codec,
                    k: Int): org.apache.spark.sql.DataFrame = {
    val media = s.read.parquet(path)
    val layout = VectorLayout(Seq(ImageBlock("payload", gridW, gridH, codec)))
    val indexed = ProductEncoder.encode(media, layout)
    val qp = media.filter(col("media_id") === 1L)
      .head().getAs[Array[Byte]]("payload")
    val qv = QueryEncoder.encode(layout,
      Map("payload" -> ImageFilter("payload", qp)))
    Search.fusedTopK(indexed, "fused_vec", "media_id", qv, k)
      .select(col("media_id").cast("long").as("media_id"), col("score"))
  }

  /** Shared oracle tail: cell sums → exact means → center → normalize →
    * query-dot → undecodable union → ordered top-k. `vals` must yield
    * (media_id, cell, v) with an integer luma/sample v per pooled element
    * (COUNT(*) per cell = the pool size, a power of 2 → exact means);
    * `nCells` cells per decoded payload. */
  private def oracleTail(valsCte: String, decodedLens: Seq[Int],
                         nCells: Int, k: Int): String = s"""
    $valsCte,
    cmean AS (SELECT media_id, cell, SUM(v) / COUNT(*) AS m FROM vals GROUP BY 1, 2),
    gmean AS (SELECT media_id, SUM(m) / $nCells AS gm FROM cmean GROUP BY 1),
    cent AS (SELECT c.media_id, cell, m - gm AS d
             FROM cmean c JOIN gmean USING (media_id)),
    nrm AS (SELECT media_id, SUM(d*d) AS n2 FROM cent GROUP BY 1),
    sig AS (SELECT c.media_id, cell,
              CASE WHEN n2 < 1e-12 THEN 0.0 ELSE d * (1.0/sqrt(n2)) END AS v
            FROM cent c JOIN nrm USING (media_id)),
    qsig AS (SELECT cell, v AS qv FROM sig WHERE media_id = 1),
    dots AS (SELECT s.media_id,
               list_sum(list(s.v * q.qv ORDER BY s.cell)) AS dp
             FROM sig s JOIN qsig q USING (cell) GROUP BY 1),
    allrows AS (
      SELECT media_id, round(dp, 5) + 0.0 AS score FROM dots
      UNION ALL
      SELECT media_id, -1.0 AS score FROM src
      WHERE len IS NULL OR len NOT IN (${decodedLens.mkString(", ")}))
    SELECT media_id::BIGINT AS media_id, score FROM allrows
    ORDER BY score DESC, media_id LIMIT $k"""

  /** Byte at 0-based blob offset `off`, as 0–255. */
  private def byteAt(off: String): String =
    s"CAST('0x' || substr(hx, 2*($off) + 1, 2) AS INT)"

  // ---- x20: image block over real 16×16 24-bit BMPs --------------------

  private val ImgLen = 54 + MediaFixture.ImgW * 3 * MediaFixture.ImgH // 822
  private val imgK = MediaFixture.NImages + 3

  /** BMP pixel (x, y) channel byte (bottom-up rows, BGR order, 48-byte
    * rows): offset 54 + (15−y)·48 + x·3 + ch with ch 0=B, 1=G, 2=R. */
  private def bmpByte(ch: Int): String =
    byteAt(s"54 + (15 - p.i // 16) * 48 + (p.i % 16) * 3 + $ch")

  private val x20 = Q(
    "x20_image_block_topk",
    (s, _) => fused(s, MediaFixture.imagesPath, 4, 4, Multimodal.imageIo, imgK),
    Some(s"""WITH src AS (
        SELECT media_id, hex(payload) AS hx, octet_length(payload) AS len
        FROM read_parquet('${MediaFixture.imagesPath}/*.parquet')),
      ${oracleTail(
        s"""vals AS (
          SELECT media_id,
            ((p.i // 16) // 4) * 4 + ((p.i % 16) // 4) AS cell,
            (${bmpByte(2)} * 299 + ${bmpByte(1)} * 587 + ${bmpByte(0)} * 114
             + 500) // 1000 AS v
          FROM src, (SELECT unnest(range(0, 256)) AS i) p
          WHERE len = $ImgLen)""",
        Seq(ImgLen), nCells = 16, k = imgK)}"""))

  // ---- x21: audio block over real RIFF/WAVE PCM (16/8-bit, mono/stereo) -

  private val MonoLen = 44 + MediaFixture.Frames * 2   // 172
  private val StereoLen = 44 + MediaFixture.Frames * 4 // 300
  private val Mono8Len = 44 + MediaFixture.Frames      // 108
  private val audK = MediaFixture.NAudio + 3

  private val x21 = Q(
    "x21_audio_block_topk",
    (s, _) => fused(s, MediaFixture.audioPath, 4, 1, Multimodal.wavPcm, audK),
    Some(s"""WITH src AS (
        SELECT media_id, hex(payload) AS hx, octet_length(payload) AS len
        FROM read_parquet('${MediaFixture.audioPath}/*.parquet')),
      ${oracleTail(
        s"""vals AS (
          -- mono 16-bit: the engine keeps the LE sample's high byte
          SELECT media_id, p.i // 16 AS cell,
            ${byteAt("44 + p.i * 2 + 1")} AS v
          FROM src, (SELECT unnest(range(0, ${MediaFixture.Frames})) AS i) p
          WHERE len = $MonoLen
          UNION ALL
          -- stereo 16-bit: frame-major interleave, channel-major plane —
          -- a 4×1 grid pools both channels of each 16-frame window
          SELECT media_id, p.i // 16 AS cell,
            ${byteAt("44 + (p.i * 2 + c.c) * 2 + 1")} AS v
          FROM src, (SELECT unnest(range(0, ${MediaFixture.Frames})) AS i) p,
               (SELECT unnest(range(0, 2)) AS c) c
          WHERE len = $StereoLen
          UNION ALL
          -- mono 8-bit: unsigned PCM recentered to signed, read back
          -- through the unsigned luma lens → (b + 128) mod 256
          SELECT media_id, p.i // 16 AS cell,
            (${byteAt("44 + p.i")} + 128) % 256 AS v
          FROM src, (SELECT unnest(range(0, ${MediaFixture.Frames})) AS i) p
          WHERE len = $Mono8Len)""",
        Seq(MonoLen, StereoLen, Mono8Len), nCells = 4, k = audK)}"""))

  // ---- x22: VIDEO block over real RIFF/AVI containers ------------------
  // The mjpegAvi codec walks the RIFF chunk tree ('00db'/'00dc' frames
  // inside LIST('movi')), decodes every frame via javax.imageio, and
  // concatenates lumas into the (w, h·nFrames) FILM STRIP, so the 4×16
  // grid is a joint spatio-temporal contrast signature (each frame = 4
  // cell rows). The fixture stores complete 16×16 BMPs in the '00db'
  // chunks (Multimodal.aviPayload), putting every frame byte at a fixed
  // offset: frame f's BMP starts at 24 (RIFF + LIST headers) + f·830
  // (chunk header + 822-byte BMP) + 8. The oracle slices the SAME x20
  // pixel math per frame and maps pixel (f, x, y) onto strip cell
  // ((f·16 + y)//4)·4 + x//4. The fourth edge row — an AVI whose frames
  // disagree on dimensions — exercises the strict decode's refusal
  // (undecodable −1), alongside flat/null/corrupt.

  private val VidFrameChunk = 8 + ImgLen                             // 830
  private val VidLen = 24 + MediaFixture.VidFrames * VidFrameChunk   // 3344
  private val vidK = MediaFixture.NVideos + 4

  /** Frame f.f's BMP pixel byte: AVI offset 32 + f·830 + x20's
    * bottom-up BGR math. */
  private def vidByte(ch: Int): String =
    byteAt(s"32 + f.f * $VidFrameChunk + 54 + (15 - p.i // 16) * 48" +
      s" + (p.i % 16) * 3 + $ch")

  private val x22 = Q(
    "x22_video_block_topk",
    (s, _) => fused(s, MediaFixture.videosPath, 4, 16, Multimodal.mjpegAvi, vidK),
    Some(s"""WITH src AS (
        SELECT media_id, hex(payload) AS hx, octet_length(payload) AS len
        FROM read_parquet('${MediaFixture.videosPath}/*.parquet')),
      ${oracleTail(
        s"""vals AS (
          SELECT media_id,
            ((f.f * 16 + p.i // 16) // 4) * 4 + ((p.i % 16) // 4) AS cell,
            (${vidByte(2)} * 299 + ${vidByte(1)} * 587 + ${vidByte(0)} * 114
             + 500) // 1000 AS v
          FROM src, (SELECT unnest(range(0, ${MediaFixture.VidFrames})) AS f) f,
               (SELECT unnest(range(0, 256)) AS i) p
          WHERE len = $VidLen)""",
        Seq(VidLen), nCells = 64, k = vidK)}"""))

  val qs: Seq[Q] = Seq(x20, x21, x22)
}
