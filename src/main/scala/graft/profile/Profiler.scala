package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Modality kind, inferred from data (reference src/app.py:40-55 /
  * src/eval/experiment.py:43-58): exactly-2-distinct → binary; string →
  * sparse; lon/lat struct → geolocation; numeric → dense.
  */
sealed trait ModalityKind
object ModalityKind {
  case object Sparse extends ModalityKind
  case object Binary extends ModalityKind
  case object Dense extends ModalityKind
  case object Geolocation extends ModalityKind
}

/** Per-column statistics backing encoding + query building: the rebuild's
  * explicit version of the reference's scattered data-dependent lookups
  * (min/max src/encode.py:358-359, sorted distinct :136, nunique
  * src/app.py:44). All gathered in ONE aggregation pass per table — at
  * 100 TB this is a single scan, not one job per column.
  *
  * Value-order convention: `distinctSorted` is ascending-sorted (matches
  * `pd.get_dummies` column order). Binary value order is ALSO sorted —
  * the reference uses pandas first-appearance order (src/encode.py:73),
  * which is partition-order-dependent in a distributed engine; sorted
  * order is our pinned, deterministic spec (SURVEY.md §7.4 gotcha 3).
  */
final case class ColumnProfile(
    name: String,
    kind: ModalityKind,
    nRows: Long,
    nNulls: Long,
    nDistinct: Long,
    min: Double,
    max: Double,
    distinctSorted: Seq[String]) {
  /** Binary mapping: first sorted value → −1, second → +1 (reference
    * src/encode.py:74 with pinned order). */
  def binaryValues: (String, String) = {
    require(nDistinct == 2, s"$name is not binary (nDistinct=$nDistinct)")
    (distinctSorted.head, distinctSorted(1))
  }
}

object Profiler {

  /** Max vocabulary collected for sparse columns; columns above this are not
    * one-hot encodable (the reference would build a 20k-wide dummy matrix;
    * at scale that is a modeling error, so we cap and fail loudly). */
  val MaxVocab = 10000

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Geolocation detection from the TYPE: a struct whose first two fields
    * are numeric — the typed analogue of the reference's duck-typed
    * "object column whose values are tuples" check (src/app.py:46-50).
    * Field order follows the reference's (lon, lat) tuple convention
    * (src/load_restaurants.py:15). */
  def isGeoStruct(dt: DataType): Boolean = dt match {
    case st: StructType => st.fields.length >= 2 &&
      st.fields.take(2).forall(f => isNumeric(f.dataType))
    case _ => false
  }

  /** (lon, lat) accessor paths for a detected geo struct column. */
  def geoFieldPaths(df: DataFrame, c: String): (String, String) = {
    val st = df.schema(c).dataType.asInstanceOf[StructType]
    (s"$c.${st.fields(0).name}", s"$c.${st.fields(1).name}")
  }

  /** Two-phase profile of the given columns (geolocation STRUCT columns
    * are detected from the type — [[isGeoStruct]] — and carry no
    * vocabulary; split lon/lat pairs are the engine's `geoCols` concern,
    * not the profiler's).
    *
    * Phase 1 gathers counts/nulls/nunique/min/max for every column in one
    * aggregation pass; vocabularies are collected in a SECOND pass that
    * runs only for columns whose exact phase-1 `countDistinct` is within
    * [[MaxVocab]]. Collecting the set first and checking the cap after
    * (the old shape) would build and ship multi-GB `collect_set` buffers
    * for a pathological high-cardinality column (URLs / free text
    * mislabeled as a modality) and OOM executors before the loud `require`
    * could fire. Common case stays ≤2 jobs; tables with no vocabulary
    * columns stay at 1.
    */
  def profile(df: DataFrame, cols: Seq[String]): Map[String, ColumnProfile] = {
    if (cols.isEmpty) return Map.empty
    val schema = df.schema
    def vocabEligible(c: String): Boolean =
      !isNumeric(schema(c).dataType) && !isGeoStruct(schema(c).dataType)
    val aggs: Seq[Column] = cols.flatMap { c =>
      val numeric = isNumeric(schema(c).dataType)
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        (if (numeric) min(col(c)).cast("double") else lit(null).cast("double")).as(s"${c}__min"),
        (if (numeric) max(col(c)).cast("double") else lit(null).cast("double")).as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val vocabCols = cols.filter(vocabEligible)
    // loud cap check from the EXACT distinct counts, before any
    // vocabulary bytes move
    vocabCols.foreach { c =>
      val nd = row.getAs[Long](s"${c}__nd")
      require(nd <= MaxVocab,
        s"column $c has $nd distinct values — above MaxVocab=$MaxVocab")
    }
    // phase 2: sorted vocabulary for the (now proven small) non-numeric
    // scalar columns; geo structs and numeric columns carry no vocabulary
    val vocab: Map[String, Seq[String]] =
      if (vocabCols.isEmpty) Map.empty
      else {
        val vAggs = vocabCols.map(c =>
          sort_array(collect_set(col(c).cast("string"))).as(s"${c}__vals"))
        val vRow = df.agg(vAggs.head, vAggs.tail: _*).head()
        vocabCols.map { c =>
          val vals = vRow.getSeq[String](vRow.fieldIndex(s"${c}__vals")).toList
          // phases run as two jobs: a non-deterministic or live-updating
          // source can grow OR shrink between them. The profile's kind
          // classification (e.g. nunique==2 → Binary) is decided from the
          // phase-1 count, so the collected vocabulary must agree with it
          // exactly — a profile whose nDistinct disagrees with its own
          // distinctSorted would be internally inconsistent. Fail loudly
          // instead.
          require(vals.size <= MaxVocab,
            s"column $c collected ${vals.size} distinct values — above " +
              s"MaxVocab=$MaxVocab (input changed between profile phases?)")
          require(vals.size == row.getAs[Long](s"${c}__nd"),
            s"column $c collected ${vals.size} distinct values but phase-1 " +
              s"counted ${row.getAs[Long](s"${c}__nd")} — input changed " +
              "between profile phases (profile requires a stable source)")
          c -> vals
        }.toMap
      }
    cols.map { c =>
      val nd = row.getAs[Long](s"${c}__nd")
      val numeric = isNumeric(schema(c).dataType)
      val vals: Seq[String] = vocab.getOrElse(c, Nil)
      // Precedence matches the reference EXACTLY (src/app.py:46-50):
      // nunique()==2 is checked FIRST, so even a tuple/geo-typed column
      // with two distinct values classifies Binary, then tuple-valued →
      // geolocation, then object → sparse, numeric → dense.
      val geoTyped = isGeoStruct(schema(c).dataType)
      val kind =
        if (nd == 2) ModalityKind.Binary
        else if (geoTyped) ModalityKind.Geolocation
        else if (!numeric) ModalityKind.Sparse
        else ModalityKind.Dense
      c -> ColumnProfile(
        name = c,
        kind = kind,
        nRows = row.getAs[Long](s"${c}__n"),
        nNulls = row.getAs[Long](s"${c}__nulls"),
        nDistinct = nd,
        min = Option(row.get(row.fieldIndex(s"${c}__min"))).map(_.asInstanceOf[Double]).getOrElse(Double.NaN),
        max = Option(row.get(row.fieldIndex(s"${c}__max"))).map(_.asInstanceOf[Double]).getOrElse(Double.NaN),
        // numeric and geo-typed columns don't collect a vocabulary in the
        // profile aggregation — fetch the two binary values on demand
        distinctSorted =
          if (nd == 2 && (numeric || geoTyped)) binaryNumericVals(df, c) else vals)
    }.toMap
  }

  /** Sorted distinct values of a 2-valued numeric column (binary modality
    * over numbers, e.g. 0/1 flags). */
  private def binaryNumericVals(df: DataFrame, c: String): Seq[String] =
    df.select(col(c).cast("string")).filter(col(c).isNotNull)
      .distinct().orderBy(col(c)).collect().map(_.getString(0)).toSeq

  /** Farthest point from (qLon, qLat) by haversine — the one per-query
    * full-scan aggregate (reference nanargmax, src/encode.py:155-157).
    * `max_by` gives a single-pass, shuffle-free (partial+final) aggregate.
    */
  def farthestPoint(df: DataFrame, lonCol: String, latCol: String,
                    qLon: Double, qLat: Double): (Double, Double) = {
    val d = graft.functions.Geo.haversine(col(lonCol), col(latCol), lit(qLon), lit(qLat))
    // lexicographic (dist, lon, lat) max → deterministic under distance ties
    val row = df.filter(col(lonCol).isNotNull && col(latCol).isNotNull)
      .agg(max_by(struct(col(lonCol).cast("double"), col(latCol).cast("double")),
        struct(d, col(lonCol).cast("double"), col(latCol).cast("double"))).as("p"))
      .head()
    val p = row.getStruct(0)
    (p.getDouble(0), p.getDouble(1))
  }
}
