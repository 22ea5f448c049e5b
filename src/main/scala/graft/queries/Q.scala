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
}
