package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Normalizing transforms (reference src/transform.py): a fitted transform
  * applies both to a whole column (executor-side Column expression) and to
  * query-time scalar bounds (driver-side Double) — the reference applies the
  * same fitted transform to filter bounds (src/app.py:274-276).
  */
sealed trait FittedTransform {
  def name: String
  def apply(c: Column): Column
  def applyScalar(x: Double): Double
}

/** log2(x+1); input must be non-negative (reference LogTransform,
  * src/transform.py:57-63). */
case object Log2p1 extends FittedTransform {
  val name = "log2p1"
  def apply(c: Column): Column = log(2.0, c + 1)
  def applyScalar(x: Double): Double = {
    require(x >= 0, "Input data must be non-negative.")
    math.log(x + 1) / math.log(2)
  }
}

/** sqrt(x); non-negative input (reference SqrtTransform, src/transform.py:66-72). */
case object SqrtT extends FittedTransform {
  val name = "sqrt"
  def apply(c: Column): Column = sqrt(c)
  def applyScalar(x: Double): Double = {
    require(x >= 0, "Input data must be non-negative.")
    math.sqrt(x)
  }
}

/** 1/(x+ε) (reference InverseTransform, src/transform.py:48-54). */
final case class Reciprocal(epsilon: Double = 1e-10) extends FittedTransform {
  val name = "reciprocal"
  def apply(c: Column): Column = lit(1.0) / (c + epsilon)
  def applyScalar(x: Double): Double = 1.0 / (x + epsilon)
}

/** Yeo-Johnson with a fitted λ (reference YeoJohnsonTransform,
  * src/transform.py:32-45; scipy MLE fit). The piecewise formula:
  *   x ≥ 0, λ≠0: ((x+1)^λ − 1)/λ        x ≥ 0, λ=0: log(x+1)
  *   x < 0, λ≠2: −((−x+1)^(2−λ) − 1)/(2−λ)   x < 0, λ=2: −log(−x+1)
  */
final case class YeoJohnson(lambda: Double) extends FittedTransform {
  val name = s"yeojohnson"
  def apply(c: Column): Column = YeoJohnson.expr(c, lambda)
  def applyScalar(x: Double): Double = YeoJohnson.scalar(x, lambda)
}

object YeoJohnson {
  private val Eps = 1e-12

  def expr(c: Column, l: Double): Column = {
    val pos =
      if (math.abs(l) < Eps) log(c + 1)
      else (pow(c + 1, l) - 1) / l
    val neg =
      if (math.abs(l - 2) < Eps) -log(-c + 1)
      else -(pow(-c + 1, 2 - l) - 1) / (2 - l)
    when(c.isNull, lit(null)).when(c >= 0, pos).otherwise(neg)
  }

  def scalar(x: Double, l: Double): Double =
    if (x >= 0) {
      if (math.abs(l) < Eps) math.log(x + 1)
      else (math.pow(x + 1, l) - 1) / l
    } else {
      if (math.abs(l - 2) < Eps) -math.log(-x + 1)
      else -(math.pow(-x + 1, 2 - l) - 1) / (2 - l)
    }

  /** MLE λ fit by golden-section search over the Yeo-Johnson log-likelihood
    * (scipy's approach, Brent over [-2, 2]):
    *   llf(λ) = −n/2·log(var(ψ(x,λ))) + (λ−1)·Σ sign(x)·log(|x|+1)
    * Each candidate λ costs ONE aggregation job over the column; the search
    * runs ~25 iterations — bounded, cluster-friendly driver loop (no
    * collect of the data). The Σ sign·log term is λ-free and computed once.
    */
  def fit(df: DataFrame, colName: String, lo: Double = -2.0, hi: Double = 2.0,
          tol: Double = 1e-4): Double = {
    val c = col(colName).cast("double")
    val base = df.filter(c.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(signum(c) * log(abs(c) + 1)).as("slog"))
      .head()
    val n = base.getAs[Long]("n").toDouble
    val slog = base.getAs[Double]("slog")

    def llf(l: Double): Double = {
      val t = YeoJohnson.expr(c, l)
      val r = df.filter(c.isNotNull)
        .agg(avg(t).as("m"), avg(t * t).as("m2")).head()
      val v = r.getAs[Double]("m2") - math.pow(r.getAs[Double]("m"), 2)
      -n / 2 * math.log(math.max(v, 1e-300)) + (l - 1) * slog
    }

    val phi = (math.sqrt(5) - 1) / 2
    var (a, b) = (lo, hi)
    var c1 = b - phi * (b - a); var c2 = a + phi * (b - a)
    var f1 = llf(c1); var f2 = llf(c2)
    while (b - a > tol) {
      if (f1 > f2) { b = c2; c2 = c1; f2 = f1; c1 = b - phi * (b - a); f1 = llf(c1) }
      else { a = c1; c1 = c2; f1 = f2; c2 = a + phi * (b - a); f2 = llf(c2) }
    }
    (a + b) / 2
  }
}

object Transforms {

  /** Abramowitz-Stegun 7.1.26 erf approximation (|err| ≤ 1.5e-7). Used for
    * the normal CDF in the KS statistic; DuckDB lacks erf, so the oracle SQL
    * uses the SAME polynomial — identical doubles on both engines.
    */
  def erfApprox(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(x))
    val y = lit(1.0) - (((((lit(1.061405429) * t - lit(1.453152027)) * t) +
      lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t *
      exp(-x * x)
    signum(x) * y
  }

  def normCdf(x: Column, mean: Column, std: Column): Column =
    (lit(1.0) + erfApprox((x - mean) / (std * math.sqrt(2.0)))) / 2.0

  /** One-sample Kolmogorov-Smirnov statistic of `valueCol` against
    * Normal(mean, std_pop) of the same data (reference
    * stats.kstest(data, "norm", args=(mean, np.std)), src/transform.py:94-98;
    * np.std is population std, ddof=0).
    *
    * D = max over sorted x_i of max(i/n − F(x_i), F(x_i) − (i−1)/n).
    * One shuffle (global sort window) — fit-time only, never query-time.
    */
  def ksStatistic(df: DataFrame, valueCol: Column): DataFrame = {
    val v = valueCol.cast("double")
    val stats = df.filter(v.isNotNull).agg(
      avg(v).as("m"),
      sqrt(avg(v * v) - avg(v) * avg(v)).as("s"),
      count(lit(1)).as("n"))
    val w = Window.orderBy(v)
    df.filter(v.isNotNull)
      .select(v.as("x"))
      .withColumn("i", row_number().over(Window.orderBy(col("x"))).cast("double"))
      .crossJoin(broadcast(stats))
      .select(greatest(
        col("i") / col("n") - normCdf(col("x"), col("m"), col("s")),
        normCdf(col("x"), col("m"), col("s")) - (col("i") - 1) / col("n")).as("dev"))
      .agg(max(col("dev")).as("ks"))
  }

  /** Best-transform selection (reference get_best_transform,
    * src/transform.py:86-102): fit every candidate, score by KS statistic,
    * pick the minimum if it beats 1.0; candidates that reject the data
    * (negative input) are skipped. Candidate order matches the reference's
    * reflection order (alphabetical by class name).
    */
  def bestTransform(df: DataFrame, colName: String,
                    fitYj: Boolean = true): Option[FittedTransform] = {
    val c = col(colName).cast("double")
    val hasNegative = df.filter(c < 0).limit(1).count() > 0
    val candidates: Seq[FittedTransform] =
      Seq(Reciprocal()) ++
        (if (hasNegative) Seq.empty else Seq(Log2p1, SqrtT)) ++
        (if (fitYj) Seq(YeoJohnson(YeoJohnson.fit(df, colName))) else Seq.empty)
    var best: Option[FittedTransform] = None
    var bestStat = 1.0
    candidates.foreach { t =>
      val stat = ksStatistic(df, t(c)).head().getDouble(0)
      if (stat < bestStat) { bestStat = stat; best = Some(t) }
    }
    best
  }
}
