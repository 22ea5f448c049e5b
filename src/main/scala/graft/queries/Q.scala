package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-checkable query: a Spark plan builder plus (when the operator
  * is ANSI-SQL-expressible) a DuckDB oracle twin over the same parquet
  * tables. Column names/types must match exactly (driver sorts columns by
  * name before hashing).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact-sum of a double column: cast per-row to decimal (exact, order-
    * independent sum) and back. Avoids cross-engine/cross-partition float
    * summation nondeterminism; the final `round` in callers absorbs the
    * sub-1e-6 cast jitter. Oracle twin: `sum(x::DECIMAL(28,6))::DOUBLE`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  /** Exact mean built on dsum; oracle: `(sum(x::DECIMAL(28,6))::DOUBLE / count(x))`. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB SQL for the σ-damped interval-encoding Fourier partial sum
    * I(pos) at `k` harmonics (reference _integrate/_sigma,
    * src/encode.py:429-448; the scalar-sigma σs(1)=1 special case):
    *   I(p) = Σ_k σv(k)·(c_sin(k)·sin(kπp) + c_cos(k)·cos(kπp))
    * `aRef`/`bRef` are SQL expressions for the scaled interval bounds in
    * the enclosing scope (e.g. "a" from a CTE join, or "v.a"). Single
    * source of truth for every oracle that scores dense intervals
    * (fr5/fr8/rest1/a11).
    */
  def fourierSeriesSql(kh: Int, aRef: String, bRef: String, pos: String): String =
    s"""list_sum(list_transform(range(1, ${kh + 1}), k ->
       (sin(pi()*k/$kh)/(pi()*k/$kh)) * (
         (CASE WHEN k = 1 THEN 1.0 ELSE sin(pi()*k/$kh)/(pi()*k/$kh) END) *
           (cos(($aRef)*pi()*k) - cos(($bRef)*pi()*k)) / ((($bRef) - ($aRef)) * (($bRef) - ($aRef)) * pi() * k) *
           sin(k * pi() * ($pos)) +
         (CASE WHEN k = 1 THEN 1.0 ELSE sin(pi()*k/$kh)/(pi()*k/$kh) END) *
           (sin(($bRef)*pi()*k) - sin(($aRef)*pi()*k)) / ((($bRef) - ($aRef)) * (($bRef) - ($aRef)) * pi() * k) *
           cos(k * pi() * ($pos)))))"""
}
