package graft

import org.apache.spark.sql.functions._
import graft.operators.Geo

/** Operator-level geo tests (the LCC kernel itself is covered in LccSpec;
  * the declared queries q26-q28/q111 are oracle-gated). */
class GeoSpec extends SparkSpec {

  test("spatial neighbors: bucketed join equals the naive all-pairs reference") {
    val got = Geo.spatialNeighbors(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.nonEmpty)

    // naive reference: driver-side all-pairs over the projected points
    // (correct but unscalable — exactly what the cell bucketing replaces).
    // lccForward's 4-dp coordinate rounding shifts distances ≤ ~2e-4 m,
    // far inside the radius's ~500 m spectrum gap.
    val pts = Geo.lccForward(spark, sfDir)
      .select(col("p_partkey"), col("x_m"), col("y_m")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val r = Geo.SpatialRadiusM
    val naive = (for {
      a <- pts
      b <- pts if a._1 != b._1
      d = math.hypot(a._2 - b._2, a._3 - b._3) if d <= r
    } yield (a._1, b._1, math.rint(d * 1e4) / 1e4))
      .groupBy(_._1)
      .map { case (p, g) =>
        val nn = g.map(x => (x._3, x._2)).min
        p -> ((g.size.toLong, nn._2, nn._1))
      }

    assert(got.keySet == naive.keySet,
      s"point sets diverged: ${got.keySet.size} vs ${naive.keySet.size}")
    got.foreach { case (p, (n, nnId, nnD)) =>
      val (en, eId, eD) = naive(p)
      assert(n == en, s"point $p: $n neighbors vs naive $en")
      assert(nnId == eId, s"point $p: nn $nnId vs naive $eId")
      assert(math.abs(nnD - eD) < 1e-3, s"point $p: nn dist $nnD vs $eD")
    }
  }

  test("spatial salting on an all-points-in-one-cell corpus is output-identical") {
    // density skew at its worst: every point inside ONE radius-sized cell
    // (a 600-point city block), so the unsalted join concentrates all
    // ~600² candidate pairs in a single task — the q55 collapsed-axis
    // failure in 2D. The salt guard must engage (600 >> saltCap=16 →
    // ceil(600/16)=38 sub-salts) WITHOUT changing a single output row.
    import spark.implicits._
    val r = Geo.SpatialRadiusM
    val pts = (0 until 600)
      .map(i => (i.toLong, (i % 25) * 400.0, (i / 25) * 400.0))
      .toDF("pid", "x", "y") // 25×24 lattice, 400 m pitch: extent < r ⇒ ONE cell
    val salted = Geo.spatialNeighborsOn(pts, r, saltCap = 16).collect()
    val unsalted = Geo.spatialNeighborsOn(pts, r, saltCap = Int.MaxValue).collect()
    assert(salted.length == 600 && salted.sameElements(unsalted),
      s"salted output diverged: ${salted.length} rows vs ${unsalted.length}")

    // cap invariance across intermediate salt widths (the rangeJoinOn
    // property test's contract, applied to the 2D guard)
    val cap40 = Geo.spatialNeighborsOn(pts, r, saltCap = 40).collect()
    assert(cap40.sameElements(unsalted), "cap=40 output diverged")
  }
}
