package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Q.{dsum, davg}

/** SQL-expressible operators from SURVEY.md §2.2/§2.3/§2.7/§2.9: projections,
  * filters, transforms, profile aggregations, hard-filter top-k, joins,
  * rank windows, metrics. Each query has a DuckDB oracle twin.
  *
  * Determinism rules (see Q.scala): every query ends in a total-order
  * ORDER BY; double aggregates go through decimal casts; per-row doubles are
  * rounded.
  */
object Relational {

  // P1 fillna + P5 trim (reference src/load_flipkart.py:19-20,24)
  private val p1 = Q(
    "p1_fillna_trim",
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        coalesce(col("p_brand"), lit("n/a")).as("brand"),
        trim(col("p_name")).as("name"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, coalesce(p_brand, 'n/a') AS brand,
            trim(p_name) AS name FROM part ORDER BY p_partkey"""))

  // P2/P4 split-to-columns (reference src/load_flipkart.py:21-25)
  private val p2 = Q(
    "p2_split_columns",
    (s, d) => {
      val t = split(col("p_type"), " ")
      Tables.part(s, d).select(
        col("p_partkey"),
        coalesce(get(t, lit(0)), lit("")).as("type_1"),
        coalesce(get(t, lit(1)), lit("")).as("type_2"),
        coalesce(get(t, lit(2)), lit("")).as("type_3"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey,
            split_part(p_type, ' ', 1) AS type_1,
            split_part(p_type, ' ', 2) AS type_2,
            split_part(p_type, ' ', 3) AS type_3
            FROM part ORDER BY p_partkey"""))

  // P3 regex scrub (reference src/load_flipkart.py:22)
  private val p3 = Q(
    "p3_regex_scrub",
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("scrubbed"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, regexp_replace(p_name, '[aeiou]', '', 'g')
            AS scrubbed FROM part ORDER BY p_partkey"""))

  // P7 regex extract-all + positional reformat (reference src/load_flipkart.py:12-17,26)
  private val p7 = Q(
    "p7_regex_extract_reformat",
    (s, d) => Tables.events(s, d)
      .select(
        col("event_id"),
        array_join(regexp_extract_all(col("props"), lit("(\\d+)"), lit(1)), ":")
          .as("numbers"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
            array_to_string(regexp_extract_all(props, '(\d+)', 1), ':') AS numbers
            FROM events ORDER BY event_id"""))

  // P9/P10/P11 predicate filters (reference src/load_restaurants.py:11-14)
  private val p10 = Q(
    "p10_filter_preds",
    (s, d) => Tables.lineitem(s, d)
      .filter(
        col("l_returnflag").isin("R", "A") &&
        col("l_linestatus") =!= "F" &&
        col("l_quantity") <= 30 &&
        col("l_shipdate").isNotNull &&
        !col("l_orderkey").isin(100L, 200L))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_linestatus"),
    Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
            FROM lineitem
            WHERE l_returnflag IN ('R','A') AND l_linestatus != 'F'
              AND l_quantity <= 30 AND l_shipdate IS NOT NULL
              AND l_orderkey NOT IN (100, 200)
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag,
              l_linestatus"""))

  // T1 LogTransform log2(x+1) (reference src/transform.py:57-63)
  private val t1 = Q(
    "t1_log2p1",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(log(2.0, col("l_quantity") + 1), 6).as("v"))
      .orderBy("l_orderkey", "l_linenumber", "v"),
    Some("""SELECT l_orderkey, l_linenumber, round(log2(l_quantity + 1), 6) AS v
            FROM lineitem ORDER BY l_orderkey, l_linenumber, v"""))

  // T2 SqrtTransform (reference src/transform.py:66-72)
  private val t2 = Q(
    "t2_sqrt",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("v"))
      .orderBy("l_orderkey", "l_linenumber", "v"),
    Some("""SELECT l_orderkey, l_linenumber, round(sqrt(l_extendedprice), 6) AS v
            FROM lineitem ORDER BY l_orderkey, l_linenumber, v"""))

  // T3 InverseTransform 1/(x+1e-10) (reference src/transform.py:48-54)
  private val t3 = Q(
    "t3_reciprocal",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(lit(1.0) / (col("l_quantity") + 1e-10), 6).as("v"))
      .orderBy("l_orderkey", "l_linenumber", "v"),
    Some("""SELECT l_orderkey, l_linenumber,
            round(1.0 / (l_quantity + 1e-10), 6) AS v
            FROM lineitem ORDER BY l_orderkey, l_linenumber, v"""))

  // A1 min/max profile pass (reference src/encode.py:358-359, src/app.py:230-231)
  private val a1 = Q(
    "a1_profile_minmax",
    (s, d) => Tables.lineitem(s, d).agg(
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"),
      count(lit(1)).as("n_rows"),
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty")),
    Some("""SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
            min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
            count(*) AS n_rows,
            sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_qty
            FROM lineitem"""))

  // A2 mean/std (population, matching np.std ddof=0; reference src/transform.py:97)
  private val a2 = Q(
    "a2_mean_std",
    (s, d) => Tables.lineitem(s, d)
      .agg(
        dsum(col("l_quantity")).as("s1"),
        dsum(col("l_quantity") * col("l_quantity")).as("s2"),
        count(col("l_quantity")).as("n"))
      .select(
        round(col("s1") / col("n"), 6).as("mean_qty"),
        round(sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))), 6)
          .as("std_qty")),
    Some("""SELECT round(s1 / n, 6) AS mean_qty,
            round(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS std_qty
            FROM (SELECT sum(l_quantity::DECIMAL(28,6))::DOUBLE AS s1,
                         sum((l_quantity * l_quantity)::DECIMAL(28,6))::DOUBLE AS s2,
                         count(l_quantity) AS n
                  FROM lineitem)"""))

  // A3 nunique (reference src/app.py:44,148)
  private val a3 = Q(
    "a3_nunique",
    (s, d) => Tables.lineitem(s, d).agg(
      countDistinct(col("l_returnflag")).as("n_returnflag"),
      countDistinct(col("l_linestatus")).as("n_linestatus"),
      countDistinct(col("l_partkey")).as("n_partkey"),
      countDistinct(col("l_suppkey")).as("n_suppkey")),
    Some("""SELECT count(DISTINCT l_returnflag) AS n_returnflag,
            count(DISTINCT l_linestatus) AS n_linestatus,
            count(DISTINCT l_partkey) AS n_partkey,
            count(DISTINCT l_suppkey) AS n_suppkey
            FROM lineitem"""))

  // A4/K5 sorted distinct (reference src/encode.py:136)
  private val a4 = Q(
    "a4_sorted_distinct",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_returnflag")).distinct().orderBy("l_returnflag"),
    Some("SELECT DISTINCT l_returnflag FROM lineitem ORDER BY l_returnflag"))

  // K2 hard-filter top-k (reference src/eval/milvus_experiment.py:72-89)
  private val k2 = Q(
    "k2_hardfilter_topk",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "A" && col("l_quantity") <= 25)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            WHERE l_returnflag = 'A' AND l_quantity <= 25
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10"""))

  // K3/P13 result gather join (reference src/encode.py:208, src/app.py:80)
  private val k3 = Q(
    "k3_result_join",
    (s, d) => {
      val top = Tables.customer(s, d)
        .orderBy(col("c_acctbal").desc, col("c_custkey")).limit(10)
      top.join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
        .orderBy("c_custkey")
    },
    Some("""WITH top AS (SELECT * FROM customer
                         ORDER BY c_acctbal DESC, c_custkey LIMIT 10)
            SELECT c_custkey, c_name, n_name, c_acctbal
            FROM top JOIN nation ON c_nationkey = n_nationkey
            ORDER BY c_custkey"""))

  // K6 seeded deterministic row sample — hash-ordered pick, the distributed
  // equivalent of the reference's seeded df.sample (src/eval/evaluate.py:176)
  private val k6 = Q(
    "k6_seeded_sample",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        md5(concat(col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))).as("h"))
      .orderBy("h")
      .limit(1),
    Some("""SELECT l_orderkey, l_linenumber,
            md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR) AS h
            FROM lineitem ORDER BY h LIMIT 1"""))

  // A9 group-by aggregate (TPC-H Q1 shape; reference src/eval/evaluate.py:119-129)
  private val a9 = Q(
    "a9_groupby_agg",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(dsum(col("l_quantity")), 4).as("sum_qty"),
        round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"),
        round(davg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity::DECIMAL(28,6))::DOUBLE, 4) AS sum_qty,
            round(sum((l_extendedprice * (1.0 - l_discount))::DECIMAL(28,6))::DOUBLE, 4) AS revenue,
            round(sum(l_quantity::DECIMAL(28,6))::DOUBLE / count(l_quantity), 6) AS avg_qty,
            count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  // A9b group-by over a join (revenue per nation) — broadcast dim joins
  private val a9b = Q(
    "a9b_join_groupby",
    (s, d) => Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(dsum(col("o_totalprice")), 4).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name"),
    Some("""SELECT n_name,
            round(sum(o_totalprice::DECIMAL(28,6))::DOUBLE, 4) AS revenue,
            count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  // A10 union-all concat (reference src/eval/evaluate.py:133)
  private val a10 = Q(
    "a10_union_all",
    (s, d) => Tables.region(s, d)
      .select(lit("region").as("src"), col("r_name").as("name"))
      .unionByName(Tables.nation(s, d)
        .select(lit("nation").as("src"), col("n_name").as("name")))
      .orderBy("src", "name"),
    Some("""SELECT 'region' AS src, r_name AS name FROM region
            UNION ALL
            SELECT 'nation' AS src, n_name AS name FROM nation
            ORDER BY src, name"""))

  // A7 recall over two top-k id lists (reference src/eval/evaluate.py:92-101)
  private def topIds(s: SparkSession, d: String, maxQty: Double, k: Int) =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "A" && col("l_quantity") <= maxQty)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(k)
      .select(col("l_orderkey"), col("l_linenumber"))

  private val a7 = Q(
    "a7_recall",
    (s, d) => {
      val l1 = topIds(s, d, 30, 20)
      val l2 = topIds(s, d, 45, 20)
      val inter = l1.join(l2, Seq("l_orderkey", "l_linenumber"), "left_semi")
      inter.agg(count(lit(1)).as("ni"))
        .crossJoin(l1.agg(count(lit(1)).as("n1")))
        .select(round(col("ni").cast("double") / col("n1"), 6).as("recall"))
    },
    Some("""WITH l1 AS (SELECT l_orderkey, l_linenumber FROM lineitem
                        WHERE l_returnflag = 'A' AND l_quantity <= 30
                        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20),
                 l2 AS (SELECT l_orderkey, l_linenumber FROM lineitem
                        WHERE l_returnflag = 'A' AND l_quantity <= 45
                        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20),
                 i AS (SELECT count(*) AS ni FROM l1 SEMI JOIN l2 USING (l_orderkey, l_linenumber)),
                 c AS (SELECT count(*) AS n1 FROM l1)
            SELECT round(ni::DOUBLE / n1, 6) AS recall FROM i, c"""))

  // A8 R-precision (reference src/eval/evaluate.py:104-110): |L1 ∩ L2[:k]| / k, k=|L1|
  private val a8 = Q(
    "a8_rprecision",
    (s, d) => {
      val l1 = topIds(s, d, 30, 15)
      val l2head = topIds(s, d, 45, 15) // L2[:k] with k = |L1| = 15
      val inter = l1.join(l2head, Seq("l_orderkey", "l_linenumber"), "left_semi")
      inter.agg(count(lit(1)).as("ni"))
        .select(round(col("ni").cast("double") / 15, 6).as("r_precision"))
    },
    Some("""WITH l1 AS (SELECT l_orderkey, l_linenumber FROM lineitem
                        WHERE l_returnflag = 'A' AND l_quantity <= 30
                        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 15),
                 l2 AS (SELECT l_orderkey, l_linenumber FROM lineitem
                        WHERE l_returnflag = 'A' AND l_quantity <= 45
                        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 15)
            SELECT round((SELECT count(*) FROM l1
                          SEMI JOIN l2 USING (l_orderkey, l_linenumber))::DOUBLE / 15, 6)
                   AS r_precision"""))

  // R6 rank normalize with pandas average-tie emulation (reference src/encode.py:231,267):
  // col_rank = 2*(rank-1)/(n-1) - 1 where rank uses the average tie method.
  private val r6 = Q(
    "r6_rank_norm",
    (s, d) => {
      val top = Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))
        .limit(50)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val wRn = Window.orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val wTie = Window.partitionBy(col("l_quantity"))
      top
        .withColumn("rn", row_number().over(wRn).cast("double"))
        .withColumn("avg_rank", avg(col("rn")).over(wTie))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(lit(2.0) * (col("avg_rank") - 1) / (col("n") - 1) - 1, 6).as("col_rank"))
        .orderBy("l_orderkey", "l_linenumber", "col_rank")
    },
    Some("""WITH top AS (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
                         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
                           l_quantity LIMIT 50),
                 r AS (SELECT *,
                       row_number() OVER (ORDER BY l_quantity, l_orderkey, l_linenumber)::DOUBLE AS rn
                       FROM top),
                 ar AS (SELECT *, avg(rn) OVER (PARTITION BY l_quantity) AS avg_rank,
                        count(*) OVER () AS n FROM r)
            SELECT l_orderkey, l_linenumber,
                   round(2.0 * (avg_rank - 1) / (n - 1) - 1, 6) AS col_rank
            FROM ar ORDER BY l_orderkey, l_linenumber, col_rank"""))

  val qs: Seq[Q] = Seq(p1, p2, p3, p7, p10, t1, t2, t3,
    a1, a2, a3, a4, k2, k3, k6, a9, a9b, a10, a7, a8, r6)
}
