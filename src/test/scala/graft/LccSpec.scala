package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Lcc

/** Property + golden-point tests for the LCC kernel (SURVEY.md §5.3).
  * Golden expectations derive from the closed-form EPSG:9802 spherical
  * equations with the reference's WKT constants
  * (reference dmi_ingestor/ingestor.py:28-64). */
class LccSpec extends AnyFunSuite {

  test("projection origin maps to (0, 0)") {
    val (x, y) = Lcc.forward(55.5, -8.0)
    assert(math.abs(x) < 1e-6 && math.abs(y) < 1e-6)
  }

  test("points east of lambda0 have positive x; north of phi0 positive y") {
    val (xe, _) = Lcc.forward(55.5, -4.0)
    assert(xe > 0)
    val (_, yn) = Lcc.forward(57.0, -8.0)
    assert(yn > 0)
  }

  test("known point: Copenhagen (55.676N, 12.568E)") {
    val (x, y) = Lcc.forward(55.676, 12.568)
    // ~20.5 deg east of lambda0 at n=sin(55.5 deg): theta ~ 0.295 rad,
    // rho ~ rho0 → x ≈ rho*sin(theta) ≈ 1.27e6 m. Sanity-band assertion.
    assert(x > 1.0e6 && x < 1.5e6, s"x=$x")
    assert(math.abs(y) < 3.0e5, s"y=$y")
  }

  test("forward→inverse round-trips to < 1e-9 degrees over the domain") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val lat = 45.0 + rnd.nextDouble() * 20.0
      val lon = -20.0 + rnd.nextDouble() * 30.0
      val (x, y) = Lcc.forward(lat, lon)
      val (lon2, lat2) = Lcc.inverse(x, y)
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat -> $lat2")
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon -> $lon2")
    }
  }

  test("conformal scale: x is monotonic in lon on a parallel") {
    val xs = (-15 to 5).map(l => Lcc.forward(55.5, l.toDouble)._1)
    assert(xs.sliding(2).forall { case Seq(a, b) => a < b })
  }
}
