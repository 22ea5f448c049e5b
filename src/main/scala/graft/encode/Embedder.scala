package graft.encode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-embedding boundary (reference TextEmbedder, src/embed.py:25-41).
  * Torch inference is out of engine scope; the boundary is pluggable:
  * [[HashingEmbedder]] is the deterministic in-repo default (hashed
  * character-n-gram projection — platform-stable, no model weights), and
  * [[Embedders.precomputed]] slots in an embeddings table, matching the
  * reference's cache-first behavior (src/encode.py:63-66, 269-284).
  * Production model inference implements the same trait: [[OnnxEmbedder]]
  * (reflective optional-dependency ONNX session) is the wiring example,
  * [[TinyNnEmbedder]] the jar-free model-style proof of swappability.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Embed one string (driver side, for queries). L2-normalized. */
  def embed(text: String): Array[Double]
  /** Column expression embedding a string column per row (executor side).
    * Must agree exactly with `embed`. */
  def embedColumn(c: Column): Column
}

/** Deterministic hashed char-trigram embedder. Per-row computation only —
  * no cross-row state, so executor parallelism cannot change results
  * (SURVEY.md §7.4 gotcha 9). Trigram → bucket via a fixed 31-based rolling
  * hash; signed hashing (sign from the hash's next bit) keeps E[dot] ≈ 0
  * for unrelated texts; final L2 normalization.
  *
  * Both paths normalize input to ASCII FIRST (strip non-ASCII code units),
  * THEN lowercase: on pure-ASCII text, Spark's `lower()` (UTF8String ASCII
  * fast path), `ascii()` and driver `toLowerCase(Locale.ROOT)`/`charAt`
  * agree exactly — so `embed` and `embedColumn` produce identical vectors
  * for ANY input, non-ASCII included (it contributes nothing on either
  * side). Without the strip, `ascii()` (first UTF-8 byte) and `charAt`
  * (UTF-16 unit) diverge on non-ASCII text.
  *
  * Weighted multi-column fusion (reference Σ wᵢ·embᵢ then normalize,
  * src/encode.py:286-304) = embedColumns with a weight map.
  */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {

  def embed(text: String): Array[Double] = {
    val v = new Array[Double](dim)
    val sb = new java.lang.StringBuilder(text.length)
    var p = 0
    while (p < text.length) {
      val ch = text.charAt(p); if (ch < 128) sb.append(ch); p += 1
    }
    val t = sb.toString.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i + 3 <= t.length) {
      var h = 17
      var j = i
      while (j < i + 3) { h = h * 31 + t.charAt(j); j += 1 }
      val b = math.floorMod(h, dim)
      val sign = if (math.floorMod(h / dim, 2) == 0) 1.0 else -1.0
      v(b) += sign
      i += 1
    }
    l2(v)
  }

  private def l2(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    if (n == 0) v else { val s = 1.0 / math.sqrt(n); v.map(_ * s) }
  }

  /** Same trigram hashing as SQL expressions: per character position, the
    * 31-based hash of the 3-char window via ascii codes. Stays inside
    * whole-stage codegen (no UDF).
    */
  def embedColumn(c: Column): Column = {
    val t = lower(regexp_replace(c, "[^\\x00-\\x7F]", ""))
    // positions 1..len-2; per position compute bucket + sign and build the
    // dim-vector by aggregating one-hot contributions.
    // sequence(1, n) counts DOWN when n < 1 — guard short strings explicitly
    val positions = when(length(t) >= 3, sequence(lit(1), length(t) - 2))
      .otherwise(array().cast("array<int>"))
    val tri = transform(
      positions,
      i => {
        val h = ((lit(17) * 31 + ascii(substring(t, i.cast("int"), lit(1)))) * 31 +
          ascii(substring(t, (i + 1).cast("int"), lit(1)))) * 31 +
          ascii(substring(t, (i + 2).cast("int"), lit(1)))
        struct(
          pmod(h, lit(dim)).as("b"),
          (lit(1.0) - lit(2.0) * pmod((h / dim).cast("int"), lit(2))).as("s"))
      })
    val raw = transform(sequence(lit(0), lit(dim - 1)), d =>
      aggregate(filter(tri, x => x.getField("b") === d), lit(0.0),
        (acc, x) => acc + x.getField("s")))
    val nrm = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
    when(nrm === 0.0, raw).otherwise(transform(raw, x => x / nrm))
  }
}

object Embedders {

  /** S2 precomputed-embedding scan: attach embeddings by id join
    * (reference tensor-cache load, src/encode.py:269-284). Broadcast when
    * small; at scale both sides are bucketed/co-partitioned by id.
    */
  def precomputed(items: DataFrame, emb: DataFrame, itemId: String,
                  embId: String, embCol: String): DataFrame =
    items.join(emb.select(col(embId).as(itemId), col(embCol)), Seq(itemId), "left")

  /** E2 weighted multi-column embedding fusion + L2 norm (reference
    * src/encode.py:286-304): Σ wᵢ·emb(colᵢ), then normalize.
    * Column-expression form — O(text·dim) interpreted per row; use only on
    * small data / for cross-checking [[fuseInto]].
    */
  def fuseColumns(e: Embedder, weights: Map[String, Double]): Column = {
    val parts = weights.toSeq.map { case (c, w) =>
      transform(e.embedColumn(col(c)), x => x * w)
    }
    val summed = parts.reduce((a, b) => zip_with(a, b, (x, y) => x + y))
    val nrm = sqrt(aggregate(summed, lit(0.0), (a, x) => a + x * x))
    when(nrm === 0.0, summed).otherwise(transform(summed, x => x / nrm))
  }

  /** E2 at scale: the same weighted fusion as a partition-local
    * mapPartitions over the compiled embedder (reference batches rows
    * through the model the same way, src/encode.py:289-305). O(text)
    * per row, no interpreted lambdas; null text treated as "".
    *
    * FAST PATH: a [[HashingEmbedder]] over string columns embeds through
    * the native [[org.apache.spark.sql.graft.HashEmbed]] expression —
    * same per-row call chain (bit-identical vectors, HashEmbedSpec), but
    * in-plan: no external-Row round trip of every column, column pruning
    * preserved, whole-stage codegen kept. Model-backed embedders (ONNX)
    * and non-string columns keep the Row path.
    */
  def fuseInto(df: DataFrame, e: Embedder, weights: Map[String, Double],
               outCol: String): DataFrame = e match {
    case he: HashingEmbedder if weights.keys.forall(c =>
        df.schema(c).dataType == org.apache.spark.sql.types.StringType) =>
      df.withColumn(outCol, org.apache.spark.sql.graft.HashEmbed.embed(
        weights.toSeq.map { case (c, w) => (col(c), w) }, he.dim))
    case _ => fuseIntoRows(df, e, weights, outCol)
  }

  /** The general Row-path fusion — any [[Embedder]], any column type. */
  private[graft] def fuseIntoRows(df: DataFrame, e: Embedder,
                                  weights: Map[String, Double],
                                  outCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType))
    val enc = RowEncoder.encoderFor(outSchema)
    val cols = weights.toSeq.map { case (c, w) => (df.schema.fieldIndex(c), w) }
    df.mapPartitions { rows =>
      rows.map { r =>
        val dim = e.dim
        val acc = new Array[Double](dim)
        cols.foreach { case (idx, w) =>
          val t = if (r.isNullAt(idx)) "" else r.get(idx).toString
          val v = e.embed(t)
          var i = 0
          while (i < dim) { acc(i) += w * v(i); i += 1 }
        }
        var n = 0.0; var i = 0
        while (i < dim) { n += acc(i) * acc(i); i += 1 }
        if (n > 0) { val s = 1.0 / math.sqrt(n); i = 0
          while (i < dim) { acc(i) *= s; i += 1 } }
        Row.fromSeq(r.toSeq :+ (acc.toSeq: Seq[Double]))
      }
    }(enc)
  }
}
