package graft.queries

/** Shared DuckDB SQL builders for the transform-fit oracle machinery
  * (KS statistic, Yeo-Johnson piecewise formula, golden-section λ fit) —
  * used by t5/t6/t7 on lineitem and by the rest2 engine-integration
  * oracle on the restaurants CSV. All templates mirror the Scala
  * implementations expression-for-expression so both engines produce
  * identical doubles (verified: bit-identical λ, hash-equal KS).
  */
object TransformSql {

  /** Abramowitz-Stegun 7.1.26 erf polynomial over a column named `z` —
    * the SAME polynomial Transforms.erfApprox uses (DuckDB lacks erf). */
  val erfSql: String =
    """sign(z) * (1 - (((((1.061405429 * (1/(1+0.3275911*abs(z))) - 1.453152027) *
      | (1/(1+0.3275911*abs(z)))) + 1.421413741) * (1/(1+0.3275911*abs(z))) -
      | 0.284496736) * (1/(1+0.3275911*abs(z))) + 0.254829592) *
      | (1/(1+0.3275911*abs(z))) * exp(-z*z))""".stripMargin.replace("\n", " ")

  /** One-sample KS statistic of `xExpr` against Normal(mean, std_pop) of
    * the same data, as a scalar subquery (reference
    * stats.kstest(data, 'norm'), src/transform.py:94-98). */
  def ksSqlFor(xExpr: String, from: String = "lineitem",
               notNullCol: String = "l_quantity"): String =
    s"""(WITH t AS (SELECT $xExpr AS x FROM $from WHERE "$notNullCol" IS NOT NULL),
        st AS (SELECT avg(x) AS m, sqrt(avg(x*x) - avg(x)*avg(x)) AS sd,
                      count(*) AS n FROM t),
        r AS (SELECT x, row_number() OVER (ORDER BY x) AS i FROM t),
        f AS (SELECT i, n, (1 + ($erfSql)) / 2 AS cdf
              FROM (SELECT i, n, (x - m) / (sd * sqrt(2)) AS z FROM r, st))
        SELECT max(greatest(i / n::DOUBLE - cdf, cdf - (i - 1) / n::DOUBLE)) FROM f)"""

  /** Row-level Yeo-Johnson of expression `v` with λ expression `l`
    * (reference piecewise formula, src/transform.py:36-44). */
  def yjOfSql(v: String, l: String): String =
    s"""(CASE WHEN $v >= 0 THEN
          CASE WHEN abs($l) < 1e-12 THEN ln($v + 1)
               ELSE (pow($v + 1, $l) - 1) / ($l) END
        ELSE
          CASE WHEN abs(($l) - 2) < 1e-12 THEN -ln(-($v) + 1)
               ELSE -(pow(-($v) + 1, 2 - ($l)) - 1) / (2 - ($l)) END END)"""

  /** YJ log-likelihood at λ expression `l`, over CTEs `vals(x, w)`/`base`.
    *
    * Parity by construction with YeoJohnson.fit's histogram fast path
    * (Transforms.scala): both engines fold the SAME weighted terms over the
    * SAME sorted distinct values in the SAME ascending order —
    * `sum(expr ORDER BY x)` makes DuckDB accumulate sequentially in x order,
    * exactly like the Scala `xs.foreach` loop over the sorted histogram, so
    * near-convergence llf comparisons take identical branches on any data
    * (a raw-row avg in engine scan order could differ by a summation ulp
    * and flip a golden-section branch). */
  private def llfSql(l: String): String =
    s"""(SELECT -any_value(cnt)/2.0 * ln(greatest(
            sum(t*t*w ORDER BY x)/any_value(cnt)
            - (sum(t*w ORDER BY x)/any_value(cnt))
              * (sum(t*w ORDER BY x)/any_value(cnt)), 1e-300))
          + (($l) - 1.0) * any_value(slog)
        FROM (SELECT x, w, ${yjOfSql("x", l)} AS t FROM vals), base)"""

  val phiSql = "((sqrt(5) - 1)/2)"

  /** CTE fragment re-running YeoJohnson.fit's golden-section λ search as a
    * recursive CTE: `vals` (from `valsSelect`, one double column `x`),
    * `base` (n, Σsign·log), `gs` (the search trajectory — identical branch
    * decisions and doubles to the Scala loop), `lam` (the fitted λ).
    * The consuming query must start with WITH RECURSIVE. */
  def yjFitCtes(valsSelect: String): String =
    s"""vals AS (SELECT x, count(*)::DOUBLE AS w
                 FROM ($valsSelect) GROUP BY x),
        base AS (SELECT sum(w ORDER BY x) AS cnt,
                        sum(sign(x) * ln(abs(x) + 1) * w ORDER BY x) AS slog
                 FROM vals),
        gs(iter, a, b, c1, c2, f1, f2) AS (
          SELECT 0, -2.0::DOUBLE, 2.0::DOUBLE,
            2.0 - $phiSql * 4.0, -2.0 + $phiSql * 4.0,
            ${llfSql(s"2.0 - $phiSql * 4.0")},
            ${llfSql(s"-2.0 + $phiSql * 4.0")}
          UNION ALL
          SELECT iter + 1,
            CASE WHEN f1 > f2 THEN a  ELSE c1 END,
            CASE WHEN f1 > f2 THEN c2 ELSE b  END,
            CASE WHEN f1 > f2 THEN c2 - $phiSql * (c2 - a) ELSE c2 END,
            CASE WHEN f1 > f2 THEN c1 ELSE c1 + $phiSql * (b - c1) END,
            CASE WHEN f1 > f2 THEN ${llfSql(s"c2 - $phiSql * (c2 - a)")} ELSE f2 END,
            CASE WHEN f1 > f2 THEN f1 ELSE ${llfSql(s"c1 + $phiSql * (b - c1)")} END
          FROM gs WHERE b - a > 1e-4),
        lam AS (SELECT (a + b)/2 AS lambda FROM gs ORDER BY iter DESC LIMIT 1)"""
}
