package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Q.dsum

/** Capability-growth operators the reference lacks but Spark provides for
  * free (SURVEY.md §2.10 "Spark gives all of them free if capabilities
  * grow"): rollup aggregation, analytic window functions, relational set
  * ops. Oracle-checked like everything else.
  */
object Extended {

  // e1: ROLLUP aggregation (grouping-sets family).
  private val e1 = Q(
    "e1_rollup_agg",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(dsum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
        coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, '<all>') AS rf,
            coalesce(l_linestatus, '<all>') AS ls,
            round(sum(l_quantity::DECIMAL(28,6))::DOUBLE, 4) AS sum_qty,
            count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY rf, ls"""))

  // e2: analytic window suite — lag / lead / ntile / running sum over a
  // per-customer event-ordered frame.
  private val e2 = Q(
    "e2_window_analytics",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)).as("prev_price"),
          coalesce(lead(col("o_totalprice"), 1).over(w), lit(0.0)).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(sum(col("o_totalprice")).over(wRun), 4).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
            coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS prev_price,
            coalesce(lead(o_totalprice, 1) OVER w, 0.0) AS next_price,
            ntile(4) OVER w AS quartile,
            round(sum(o_totalprice) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
            FROM orders WHERE o_custkey < 100
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  // e3: INTERSECT / EXCEPT on relations (the reference only intersects id
  // lists driver-side, A7/A8).
  private val e3 = Q(
    "e3_set_ops",
    // INTERSECT/EXCEPT semantics in their SCALE shape: Dataset.intersect/
    // .except would run two scans per operand and a shuffle-distinct per
    // set op (4 scans + 4 shuffles; 2.2 s at sf1 vs DuckDB 0.13 s). The
    // same pair of set ops over a shared left side is ONE scan + ONE
    // keyed aggregation — per-key membership flags, then both outputs fall
    // out of a projection: in_a ∧ in_b = INTERSECT, in_a ∧ ¬in_b = EXCEPT.
    // The oracle keeps the genuine INTERSECT/EXCEPT operators, so the
    // rewrite's equivalence is itself under the hash.
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") <= 10 || col("l_returnflag") === "R")
        .groupBy(col("l_partkey"))
        .agg(max(when(col("l_quantity") <= 10, 1).otherwise(0)).as("in_a"),
          max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("in_b"))
        .filter(col("in_a") === 1)
        .select(col("l_partkey"),
          when(col("in_b") === 1, lit("both")).otherwise(lit("only_lowqty")).as("op"))
        .orderBy("op", "l_partkey")
    },
    Some("""SELECT l_partkey, 'both' AS op FROM
              (SELECT l_partkey FROM lineitem WHERE l_quantity <= 10
               INTERSECT
               SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
            UNION ALL
            SELECT l_partkey, 'only_lowqty' AS op FROM
              (SELECT l_partkey FROM lineitem WHERE l_quantity <= 10
               EXCEPT
               SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
            ORDER BY op, l_partkey"""))

  // e4: P12 zip-to-struct (reference src/load_restaurants.py:15) surfaced
  // as an oracle query. The struct is built and then field-accessed (the
  // P12 semantics under test); the ORACLE-FACING projection is scalar
  // lon/lat because the driver's pandas comparator cannot sort struct/dict
  // cells (round-1 `unhashable type: 'dict'` failure).
  private val e4 = Q(
    "e4_zip_struct",
    (s, d) => Tables.customer(s, d)
      .select(col("c_custkey"),
        struct((col("c_custkey") % 360 - 180).cast("double").as("lon"),
          (col("c_custkey") * 7 % 160 - 80).cast("double").as("lat")).as("location"))
      .select(col("c_custkey"),
        col("location.lon").as("loc_lon"),
        col("location.lat").as("loc_lat"))
      .orderBy("c_custkey"),
    Some("""WITH zipped AS (
              SELECT c_custkey,
                {'lon': ((c_custkey % 360) - 180)::DOUBLE,
                 'lat': (((c_custkey * 7) % 160) - 80)::DOUBLE} AS location
              FROM customer)
            SELECT c_custkey,
              location.lon AS loc_lon,
              location.lat AS loc_lat
            FROM zipped ORDER BY c_custkey"""))

  // e5: CUBE — all grouping-set combinations (completes the grouping-sets
  // family next to e1's ROLLUP).
  private val e5 = Q(
    "e5_cube_agg",
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(dsum(col("l_extendedprice")), 4).as("sum_price"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
        coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
        col("sum_price"), col("n"))
      .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, '<all>') AS rf,
            coalesce(l_linestatus, '<all>') AS ls,
            round(sum(l_extendedprice::DECIMAL(28,6))::DOUBLE, 4) AS sum_price,
            count(*) AS n
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY rf, ls"""))

  // e6: exact interpolated percentiles — Spark's exact `percentile` and
  // DuckDB's `quantile_cont` share the same linear-interpolation
  // definition, so medians/p90 hash-match (percentile_approx would not).
  private val e6 = Q(
    "e6_percentiles",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        (round(expr("percentile(l_extendedprice, 0.5)"), 4) + 0.0).as("median_price"),
        (round(expr("percentile(l_extendedprice, 0.9)"), 4) + 0.0).as("p90_price"),
        (round(expr("percentile(l_quantity, 0.5)"), 4) + 0.0).as("median_qty"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            round(quantile_cont(l_extendedprice, 0.5), 4) + 0.0 AS median_price,
            round(quantile_cont(l_extendedprice, 0.9), 4) + 0.0 AS p90_price,
            round(quantile_cont(l_quantity, 0.5), 4) + 0.0 AS median_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val qs: Seq[Q] = Seq(e1, e2, e3, e4, e5, e6)
}
