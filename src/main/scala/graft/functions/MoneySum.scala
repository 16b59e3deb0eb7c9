package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scaled-integer replacements for the repo's "decimal-exact sum" idiom
  * (r21 optimization sweep).
  *
  * The cross-engine arithmetic convention sums `cast(c as decimal(18,s))`
  * so Spark and the DuckDB oracle round the IDENTICAL value, immune to
  * float accumulation order. Correct — but the per-row double→decimal
  * cast goes through `Double.toString` + a `BigDecimal` parse + setScale
  * (one allocation-heavy path per row), and the r21 profile showed it
  * DOMINATING the hottest scans: q64's unpivot aggregation dropped
  * 1.38 → 0.52 s and q01's pricing summary 0.90 → 0.37 s at sf0.1 when
  * the decimal sum was replaced by a scaled primitive-long sum
  * (guide §1.2 "per-task work", §2.3 "narrower types").
  *
  * [[term]] computes round(c·scale) as a LONG with pure codegen arithmetic
  * (multiply, +0.5, floor, cast). It equals the decimal cast's HALF_UP
  * rounding — hence bit-identical downstream doubles — whenever c·scale
  * sits within (0, 0.5) of an integer, i.e. whenever the source column
  * genuinely carries at most the grid's decimal places (double noise
  * ~1e-9 included; `floor(x+0.5)` lands on the same integer for positive
  * AND negative x then, matching HALF_UP away-from-zero ties because ties
  * cannot occur off a ±0.5 boundary). That property is VERIFIED for every
  * column this helper touches — TPC-H money columns and `events.value`
  * are 2-dp generated (max |round(100c)−100c| ≤ 4e-9 over every test SF,
  * measured r21), l_quantity is integral, and the q01/q04 discount
  * product of two 2-dp values is exactly 4-dp. A column without that
  * guarantee (free-precision doubles) must keep the decimal cast: for
  * those the two roundings can genuinely disagree (e.g. the double
  * nearest 1.005 has shortest-repr "1.005" → decimal 1.01, but ×100
  * computes 100.49999999999999 → 1.00).
  *
  * Overflow headroom: the long accumulator wraps past 2^63 ≈ 9.2e18 where
  * decimal(18+10,s) would widen. At scale 100 that is 9.2e16 currency
  * units — above decimal(18,2)'s own 1e16 cap, so the long formulation
  * overflows LATER than the decimal one it replaces. Scale-1e6 sites keep
  * ~1e12-unit headroom per GROUP; every converted site's groups are
  * structurally bounded (per-key aggregates over bounded frames/doc
  * tokens/probe terms), never corpus-global. Corpus-global decimal sums
  * (q42/q77/q140 centroid and dimension statistics) are deliberately NOT
  * converted — decimal's sum-widening is real headroom there.
  */
object MoneySum {

  /** round(c·scale) as a long — the decimal(18,s) per-row value on a
    * grid-exact column, without the per-row BigDecimal. */
  def term(c: Column, scale: Double): Column =
    floor(c * scale + lit(0.5)).cast("long")

  /** Σ round(c·scale), exactly `sum(cast(c as decimal(18,s)))·scale` on a
    * grid-exact column. Divide by `scale` (double division, correctly
    * rounded — identical to decimal→double cast of the exact quotient)
    * to land on the decimal formulation's double. */
  def sumScaled(c: Column, scale: Double): Column = sum(term(c, scale))

  /** The drop-in replacement for `sum(cast(c as decimal(18,s))).cast("double")`. */
  def sumAsDouble(c: Column, scale: Double): Column =
    sumScaled(c, scale).cast("double") / scale
}
