package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Tolerance checks for the approximate-aggregate family (no hash oracle
  * by construction; bounded-error contracts instead). */
class ApproxSpec extends SparkSpec {

  test("approx_percentile within 10% of exact interpolated percentile") {
    val exact = Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment")
      .agg(expr("percentile(c_acctbal, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment")
      .agg(expr("approx_percentile(c_acctbal, 0.5, 1000)").as("p50a"))
      .collect().foreach { r =>
        val e = exact(r.getString(0))
        assert(math.abs(r.getDouble(1) - e) <= math.abs(e) * 0.1 + 100.0,
          s"${r.getString(0)}: ${r.getDouble(1)} vs $e")
      }
  }

  test("HLL distinct error bounded at 1% rsd setting") {
    val exact = Tables.orders(spark, sfDir)
      .agg(countDistinct("o_custkey")).collect()(0).getLong(0).toDouble
    val approx = Tables.orders(spark, sfDir)
      .agg(approx_count_distinct(col("o_custkey"), 0.01)).collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
