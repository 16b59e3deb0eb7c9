package graft.functions

/** Spherical Lambert Conformal Conic (EPSG:9802, 1SP degenerate case) —
  * the reference's one genuinely custom kernel (SURVEY.md §7.5).
  *
  * Parameters fixed by the reference WKT (reference
  * dmi_ingestor/ingestor.py:28-64): phi0 = phi1 = phi2 = 55.5 deg,
  * lambda0 = -8 deg, sphere R = 6371229 m, false easting/northing 0.
  * With phi1 == phi2 the cone constant is n = sin(phi1) and the closed
  * forms need no iteration.
  *
  * The same arithmetic is expressed three ways, kept in exact step-for-step
  * sync so results agree to << 1e-6 degrees:
  *  - [[forward]]/[[inverse]] plain-Scala (library surface, property tests)
  *  - [[graft.operators.Geo]] as Spark Column expressions (codegen'd —
  *    no UDF; whole-stage codegen keeps the kernel in the hot loop)
  *  - generated DuckDB SQL in [[graft.Oracles]]
  */
object Lcc {
  val R: Double = 6371229.0
  val phi1: Double = math.toRadians(55.5)
  val lambda0: Double = math.toRadians(-8.0)

  /** cone constant */
  val n: Double = math.sin(phi1)
  val F: Double = math.cos(phi1) * math.pow(math.tan(math.Pi / 4 + phi1 / 2), n) / n
  /** radius of the origin parallel (phi0 == phi1) */
  val rho0: Double = R * F / math.pow(math.tan(math.Pi / 4 + phi1 / 2), n)

  /** (latDeg, lonDeg) -> (x meters, y meters) */
  def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
    val lat = math.toRadians(latDeg)
    val lon = math.toRadians(lonDeg)
    val rho = R * F / math.pow(math.tan(math.Pi / 4 + lat / 2), n)
    val theta = n * (lon - lambda0)
    (rho * math.sin(theta), rho0 - rho * math.cos(theta))
  }

  /** (x meters, y meters) -> (lonDeg, latDeg) */
  def inverse(x: Double, y: Double): (Double, Double) = {
    val rho = math.sqrt(x * x + (rho0 - y) * (rho0 - y))
    val theta = math.atan2(x, rho0 - y)
    val lon = lambda0 + theta / n
    val lat = 2.0 * math.atan(math.pow(R * F / rho, 1.0 / n)) - math.Pi / 2
    (math.toDegrees(lon), math.toDegrees(lat))
  }
}
