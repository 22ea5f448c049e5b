package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** Session-extensions injector for the graft SQL functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * makes every `graft_*` function (see
  * [[org.apache.spark.sql.graft.GraftFunctions.names]]) available to
  * plain `spark.sql` in ALL sessions of the application — the standard
  * way a Spark library ships SQL functions without asking users to call
  * a register method. Programmatic alternative on a live session:
  * `GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
