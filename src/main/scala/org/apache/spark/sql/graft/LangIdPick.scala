package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native trigram language-ID scoring — the argmax half of
  * graft.queries.LangId as ONE pass over the padded string with hash-set
  * profile membership, replacing four `filter(tris, isin(45 literals))`
  * higher-order passes (each trigram paid up to 180 literal string
  * comparisons; the bound-HOF form still cost ~10 s of x26's sf1 gate
  * projection — this expression is ~2 s for the same cohort, and no
  * trigram array is ever materialized).
  *
  * Input is the PADDED normalized text (' ' + normalized + ' ' — the
  * normalization regex stays in SQL as a bound column so both engines
  * share it). Semantics are identical to the HOF form, spec-asserted:
  * per language, count trigram POSITIONS whose 3-char substring is in
  * the profile (multiplicity included); best = max count; pick the
  * FIRST language in profile order achieving best when best > 0, else
  * 'und'. Inputs shorter than 3 chars score zero everywhere → 'und'.
  *
  * Profiles ride as `Seq[(String, Set[String])]` — value-equal by
  * construction, so Catalyst canonicalization dedups equal picks.
  */
case class LangIdPick(child: Expression, profiles: Seq[(String, Set[String])])
  extends UnaryExpression with ExpectsInputTypes {

  require(profiles.nonEmpty, "need at least one language profile")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid_pick"

  @transient private lazy val langBytes: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    profiles.map { case (_, prof) =>
      val s = new java.util.HashSet[String](prof.size * 2)
      prof.foreach(s.add)
      s
    }.toArray
  @transient private lazy val und = UTF8String.fromString("und")

  def pickPublic(s: UTF8String): UTF8String = {
    val t = s.toString
    val nLang = sets.length
    val counts = new Array[Int](nLang)
    val last = t.length - 3
    var i = 0
    while (i <= last) {
      val g = t.substring(i, i + 3)
      var l = 0
      while (l < nLang) {
        if (sets(l).contains(g)) counts(l) += 1
        l += 1
      }
      i += 1
    }
    var best = 0
    var l = 0
    while (l < nLang) { if (counts(l) > best) best = counts(l); l += 1 }
    if (best == 0) return und
    l = 0
    while (l < nLang) {
      if (counts(l) == best) return langBytes(l)
      l += 1
    }
    und // unreachable
  }

  override protected def nullSafeEval(a: Any): Any =
    pickPublic(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("langIdPick", this, classOf[LangIdPick].getName)
    defineCodeGen(ctx, ev, a => s"$self.pickPublic($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdPick =
    copy(child = newChild)
}

object LangIdPick {
  /** Predicted-language column over the PADDED normalized text. */
  def pick(paddedText: Column, profiles: Seq[(String, Set[String])]): Column =
    ExpressionUtils.column(
      LangIdPick(ExpressionUtils.expression(paddedText), profiles))
}
