package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytic
import graft.sources.Tables

class AnalyticSpec extends SparkSpec {

  test("window family: quartiles in 1..4, pct_rank/cume in [0,1], frame endpoints consistent") {
    val rows = Analytic.windowFamily(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getLong(3)
      assert(q >= 1L && q <= 4L)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // pct_rank
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)  // cume_dist
    }
    // per customer, cheapest/priciest frame endpoints are constant
    val df = Analytic.windowFamily(spark, sfDir)
    val perCust = df.groupBy("o_custkey")
      .agg(countDistinct("cheapest_order").as("nc"), countDistinct("priciest_order").as("np"))
      .filter(col("nc") =!= 1 || col("np") =!= 1)
    assert(perCust.count() == 0L)
  }

  test("grouping sets row count = |flag x status| + |flag| + |status|") {
    val li = Tables.lineitem(spark, sfDir)
    val both = li.select("l_returnflag", "l_linestatus").distinct().count()
    val f = li.select("l_returnflag").distinct().count()
    val s = li.select("l_linestatus").distinct().count()
    assert(Analytic.groupingSetsAgg(spark, sfDir).count() == both + f + s)
  }

  test("grouping sets marginals agree with the full-detail set") {
    val out = Analytic.groupingSetsAgg(spark, sfDir).collect()
    val detail = out.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    val flagMarginal = out.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    flagMarginal.foreach { m =>
      val n = detail.filter(_.getString(0) == m.getString(0)).map(_.getLong(2)).sum
      assert(n == m.getLong(2))
    }
  }

  test("unpivot yields 4 measures, each with the full row count") {
    val li = Tables.lineitem(spark, sfDir).count()
    val rows = Analytic.unpivotMeasures(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getLong(1) == li))
    val names = rows.map(_.getString(0)).toSet
    assert(names == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
  }
}
