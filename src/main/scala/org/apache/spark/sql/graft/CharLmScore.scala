package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local char-trigram LM scoring against a FITTED bounded model —
  * the scoring half of the x23/x26 "perplexity filter" as one narrow
  * expression instead of an explode → two broadcast joins → per-doc
  * decimal re-aggregation (which shuffled ~600 trigram rows per document
  * back to doc grain: 17 s of x26's sf1 chain for 26K docs; this
  * expression scores the same cohort in under a second).
  *
  * Inputs: the [a-z ]-NORMALIZED document string (normalization stays in
  * SQL as a bound column — same regex both engines); the model rides the
  * expression as two int-indexed count arrays (trigram cell c₁·729 +
  * c₂·27 + c₃, bigram cell c₁·27 + c₂; ' ' = 26), at most 27³ + 27²
  * longs — the corpus-size-independent state that makes the same model
  * broadcastable at 100 TB.
  *
  * Arithmetic is BIT-IDENTICAL to the joined form (and therefore to the
  * DuckDB twin that hash-matches it): per position p = (n3+1)/(n2+27) in
  * IEEE double, p is converted to decimal exactly as Spark's
  * double→DECIMAL(28,12) cast does (same `Decimal.changePrecision`
  * call), the per-document sum is the exact decimal sum, and the mean is
  * sum.toDouble / count — every operation is the one the aggregate
  * pipeline performed, just fused per row.
  *
  * Returns struct(n_trigrams BIGINT, mean DOUBLE); mean is null when the
  * normalized text has no trigram (length < 3) — the joined form's
  * docs-without-rows LEFT-join null.
  */
case class CharLmScore(child: Expression, n3: Array[Long], n2: Array[Long])
  extends UnaryExpression with ExpectsInputTypes {

  require(n3.length == 27 * 27 * 27 && n2.length == 27 * 27,
    s"model arrays must be 27^3/27^2 cells: ${n3.length}/${n2.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mean", DoubleType, nullable = true)))
  override def prettyName: String = "graft_char_lm_score"

  // [a-z ] only by the normalization contract; anything else would come
  // from a caller skipping the bound normalization column — fail loudly
  // rather than scoring garbage cells
  private def cellOf(c: Char): Int =
    if (c == ' ') 26
    else if (c >= 'a' && c <= 'z') c - 'a'
    else throw new IllegalArgumentException(
      s"CharLmScore input not [a-z ]-normalized: '$c'")

  def scorePublic(s: UTF8String): InternalRow = {
    val t = s.toString // [a-z ] normalized => ASCII, one char per byte
    val len = t.length
    if (len < 3) return new GenericInternalRow(Array[Any](0L, null))
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    val last = len - 3
    while (i <= last) {
      val c1 = cellOf(t.charAt(i))
      val c2c = cellOf(t.charAt(i + 1))
      val c3c = cellOf(t.charAt(i + 2))
      val i2 = c1 * 27 + c2c
      val p = (n3(i2 * 27 + c3c) + 1).toDouble / (n2(i2) + 27).toDouble
      // EXACTLY Spark's cast(p AS DECIMAL(28,12)): Decimal(double) then
      // changePrecision with the cast's rounding
      val d = org.apache.spark.sql.types.Decimal(p)
      if (!d.changePrecision(28, 12))
        throw new ArithmeticException(s"p=$p overflows DECIMAL(28,12)")
      acc = acc.add(d.toJavaBigDecimal)
      i += 1
    }
    val n = (last + 1).toLong
    new GenericInternalRow(Array[Any](n, acc.doubleValue() / n))
  }

  override protected def nullSafeEval(a: Any): Any =
    scorePublic(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charLm", this, classOf[CharLmScore].getName)
    defineCodeGen(ctx, ev, a => s"$self.scorePublic($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharLmScore =
    copy(child = newChild)

  // value equality over the model arrays (the BqSignature canonicalization fix)
  override def equals(other: Any): Boolean = other match {
    case c: CharLmScore =>
      child == c.child && java.util.Arrays.equals(n3, c.n3) &&
        java.util.Arrays.equals(n2, c.n2)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(n3)) +
      java.util.Arrays.hashCode(n2)
}

object CharLmScore {
  /** struct(n, mean) column; input must be the [a-z ]-normalized text. */
  def score(normText: Column, n3: Array[Long], n2: Array[Long]): Column =
    ExpressionUtils.column(
      CharLmScore(ExpressionUtils.expression(normText), n3, n2))

  /** Trigram cell index for a 3-char [a-z ] string — the fit side's
    * mapping from the aggregated trigram STRINGS to the model array. */
  def cellIndex(g: String): Int = {
    require(g.length == 3, s"not a trigram: '$g'")
    def c(ch: Char): Int =
      if (ch == ' ') 26
      else if (ch >= 'a' && ch <= 'z') ch - 'a'
      else throw new IllegalArgumentException(s"non-[a-z ] trigram char: '$ch'")
    (c(g.charAt(0)) * 27 + c(g.charAt(1))) * 27 + c(g.charAt(2))
  }
}
