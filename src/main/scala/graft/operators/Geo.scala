package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Lcc
import graft.sources.Tables

/** Reference-parity geospatial operators (SURVEY.md §2 R6, §3.3, §7.5).
  *
  * The reproject kernel is composed from builtin math Columns — NOT a UDF —
  * so it stays inside whole-stage codegen and vectorizes at 100 TB. The
  * cone constants (n, F, rho0) are precomputed Scala doubles embedded as
  * literals; the generated DuckDB oracle embeds the identical literals, so
  * the two engines run the same arithmetic step for step.
  *
  * The synthetic grid is derived deterministically from `part` keys (the
  * offline stand-in for a decoded EDR cube — SURVEY.md §7.3).
  */
object Geo {

  /** Deterministic test grid: one (lat, lon) cell per part row. */
  private def grid(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      (col("p_partkey") % 40).cast("double") * 0.05 + 54.0).toDF("p_partkey", "lat")
      .withColumn("lon",
        (floor(col("p_partkey") / 40) % 40).cast("double") * 0.1 - 10.0)
      .withColumn("value", (col("p_partkey") % 100).cast("double") * 0.5)

  /** Forward LCC: (lat, lon) degrees -> projected meters, as Columns. */
  def forwardCols(lat: Column, lon: Column): (Column, Column) = {
    val latR = radians(lat)
    val lonR = radians(lon)
    val rho = lit(Lcc.R * Lcc.F) / pow(tan(lit(math.Pi / 4) + latR / 2), lit(Lcc.n))
    val theta = lit(Lcc.n) * (lonR - lit(Lcc.lambda0))
    (rho * sin(theta), lit(Lcc.rho0) - rho * cos(theta))
  }

  /** Inverse LCC: projected meters -> (lon, lat) degrees, as Columns. */
  def inverseCols(x: Column, y: Column): (Column, Column) = {
    val rho = sqrt(x * x + (lit(Lcc.rho0) - y) * (lit(Lcc.rho0) - y))
    val theta = atan2(x, lit(Lcc.rho0) - y)
    val lon = degrees(lit(Lcc.lambda0) + theta / lit(Lcc.n))
    val lat = degrees(lit(2.0) * atan(pow(lit(Lcc.R * Lcc.F) / rho, lit(1.0 / Lcc.n))) - lit(math.Pi / 2))
    (lon, lat)
  }

  /** Forward projection over the synthetic grid (R6 part a). */
  def lccForward(spark: SparkSession, dir: String): DataFrame = {
    val g = grid(spark, dir)
    val (x, y) = forwardCols(col("lat"), col("lon"))
    g.select(
      col("p_partkey"),
      round(col("lat"), 6).as("lat"),
      round(col("lon"), 6).as("lon"),
      round(x, 4).as("x_m"),
      round(y, 4).as("y_m"))
      .orderBy(col("p_partkey"))
  }

  /** Forward→inverse round trip: recovered coordinates match the input to
    * within rounding — the engine-side proof of the closed-form pair. */
  def lccRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val g = grid(spark, dir)
    val (x, y) = forwardCols(col("lat"), col("lon"))
    val projected = g.select(col("p_partkey"), col("lat"), col("lon"),
      x.as("x_m"), y.as("y_m"))
    val (lonBack, latBack) = inverseCols(col("x_m"), col("y_m"))
    // abs() so a -1e-15 residual can't round to "-0.0" in one engine and
    // "0.0" in the other
    projected.select(
      col("p_partkey"),
      round(abs(lonBack - col("lon")), 6).as("lon_err"),
      round(abs(latBack - col("lat")), 6).as("lat_err"))
      .orderBy(col("p_partkey"))
  }

  /** R6 part b: resample to a regular 0.25-degree lat/lon grid by
    * bin-and-aggregate (nearest/average resampling as a plain groupBy —
    * one shuffle on the bin key at any scale). */
  def regrid(spark: SparkSession, dir: String): DataFrame =
    grid(spark, dir)
      .withColumn("lat_bin", (floor(col("lat") * 4) / 4).cast("double"))
      .withColumn("lon_bin", (floor(col("lon") * 4) / 4).cast("double"))
      .groupBy(col("lat_bin"), col("lon_bin"))
      .agg(
        count(lit(1)).as("n_cells"),
        (floor(avg(col("value")) * 1e6) / 1e6).as("avg_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
      .orderBy(col("lat_bin"), col("lon_bin"))
}
