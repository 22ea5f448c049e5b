package graft

import graft.encode.FourierMath._
import org.scalatest.funsuite.AnyFunSuite

/** Golden values NumPy-derived from the reference formulas
  * (reference src/encode.py:320-448); property tests encode the
  * normalization contracts the math is designed to satisfy (SURVEY.md §5),
  * sampled over a seeded grid (scalatestplus bridge unavailable offline).
  */
class FourierMathSpec extends AnyFunSuite {

  private val eps = 1e-12
  private def samples(n: Int, lo: Double, hi: Double, seed: Long): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(lo + (hi - lo) * r.nextDouble())
  }

  test("sigma golden (K=4)") {
    assert(math.abs(sigmaVec(2, 4) - 0.6366197723675814) < eps)
    assert(math.abs(sigmaVec(1, 4) - 0.9003163161571061) < eps)
    assert(sigmaScalar(1, 4) == 1.0) // reference k==1 special case
    assert(math.abs(sigmaScalar(2, 4) - sigmaVec(2, 4)) < eps)
  }

  test("fourier golden (x=0.3, K=4)") {
    val f = fourier(0.3, 4, 4)
    val expected = Array(
      7.283712000841469e-01, 5.291926530354346e-01,
      6.054613829125257e-01, -1.967263286166931e-01,
      9.273768066853132e-02, -2.854172330693545e-01,
      -2.291287914056813e-17, -3.153687259501907e-17)
    f.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < eps) }
  }

  test("fourier of NaN is the zero vector (reference NaN handling)") {
    assert(fourier(Double.NaN, 4, 4).forall(_ == 0.0))
    assert(halfCircle(Double.NaN).forall(_ == 0.0))
  }

  test("centroid golden") {
    val c1 = centroidEncoding(0.4)
    Seq(0.7403838163175, 1.019050898988858, -0.2596161836825)
      .zip(c1).foreach { case (e, a) => assert(math.abs(a - e) < 1e-12) }
    val c2 = centroidEncoding(-0.7)
    Seq(-0.942362189438551, 0.480157518160232, -0.057637810561448)
      .zip(c2).foreach { case (e, a) => assert(math.abs(a - e) < 1e-12) }
  }

  test("interval golden (a=-0.3, b=0.5, K=4)") {
    val iv = intervalEncoding(-0.3, 0.5, 4)
    val expected = Array(
      3.730418720255289e-01, 1.148104828210008e+00,
      1.395906694737341e-01, 1.921300737301150e-01,
      -6.038065689086027e-02, -4.386911510010995e-02,
      -1.118877475526938e-17, -3.635453294700537e-18,
      -2.156417518134024e-01)
    iv.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("centroid contract: dot=+1 at the value, −1 at the opposite end") {
    samples(200, -0.99, 0.99, 1L).foreach { v =>
      val c = centroidEncoding(v)
      val atV = dot(halfCircle(v) :+ 1.0, c)
      val far = if (v < 0) 1.0 else -1.0
      val atFar = dot(halfCircle(far) :+ 1.0, c)
      assert(math.abs(atV - 1.0) < 1e-9)
      assert(math.abs(atFar + 1.0) < 1e-9)
    }
  }

  test("interval contract: dot=+1 at midpoint, −1 at the chosen out-point") {
    samples(200, -0.9, 0.4, 2L).zip(samples(200, 0.01, 0.5, 3L)).foreach { case (a, w) =>
      val b = a + w
      val iv = intervalEncoding(a, b, 8)
      val mid = (a + b) / 2
      val out = if (math.abs(a + 1) > math.abs(1 - b)) (a - 1) / 2 else (b + 1) / 2
      assert(math.abs(dot(fourier(mid, 8, 8) :+ 1.0, iv) - 1.0) < 1e-9)
      assert(math.abs(dot(fourier(out, 8, 8) :+ 1.0, iv) + 1.0) < 1e-9)
    }
  }

  test("interval dot is higher inside than far outside (soft filter semantics)") {
    val iv = intervalEncoding(-0.2, 0.3, 64)
    def score(x: Double) = dot(fourier(x, 64, 64) :+ 1.0, iv)
    assert(score(0.05) > score(0.8))
    assert(score(0.0) > score(-0.9))
  }

  test("geo scale-and-shift contract: dot=+1 at query point, −1 at farthest") {
    val qs = samples(100, -179, 179, 4L).zip(samples(100, -89, 89, 5L))
    val fs = samples(100, -179, 179, 6L).zip(samples(100, -89, 89, 7L))
    qs.zip(fs).foreach { case ((qLon, qLat), (fLon, fLat)) =>
      if (math.abs(qLon - fLon) > 1 || math.abs(qLat - fLat) > 1) {
        val enc = geoEncoding(qLon, qLat, fLon, fLat)
        val atQ = dot(cartesian(qLon, qLat) :+ 1.0, enc)
        val atF = dot(cartesian(fLon, fLat) :+ 1.0, enc)
        assert(math.abs(atQ - 1.0) < 1e-9)
        assert(math.abs(atF + 1.0) < 1e-9)
      }
    }
  }

  test("haversine golden: Paris-London ≈ 344 km") {
    val d = haversineKm(2.3522, 48.8566, -0.1276, 51.5072)
    assert(math.abs(d - 343.9) < 1.0)
  }

  test("scaleTo maps [min,max] to [-1,1]") {
    assert(scaleTo(5.0, 5.0, 10.0) == -1.0)
    assert(scaleTo(10.0, 5.0, 10.0) == 1.0)
    assert(scaleTo(7.5, 5.0, 10.0) == 0.0)
  }
}
