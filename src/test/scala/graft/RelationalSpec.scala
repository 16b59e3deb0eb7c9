package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("pricing summary has the 4 flag/status groups and positive sums") {
    val rows = Relational.pricingSummary(spark, sfDir).collect()
    assert(rows.length >= 4)
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(flags.contains(("A", "F")) && flags.contains(("N", "O")))
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0)                    // sum_qty
      assert(r.getLong(7) > 0L)                       // count_order
    }
  }

  test("filter pushdown reaches the parquet scan") {
    val df = Relational.filterPushdown(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters"), "expected pushed filters in scan")
    assert(physical.contains("LessThan(l_quantity,5.0)") ||
           physical.contains("l_quantity"), physical.take(500))
  }

  test("broadcast join plans a BroadcastHashJoin, not a shuffle join") {
    val df = Relational.broadcastJoin(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical.take(800))
  }

  test("semi + anti partition the customer set") {
    val total = sources.Tables.customer(spark, sfDir).count()
    val semi = Relational.semiJoin(spark, sfDir)
      .agg(sum("n_active_customers")).collect()(0).getLong(0)
    assert(semi <= total && semi > 0)
  }

  test("rollup emits the grand-total row") {
    val rows = Relational.rollupAgg(spark, sfDir).collect()
    val allRow = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(allRow.length == 1)
    val totalRows = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
      .map(_.getLong(3)).sum
    assert(allRow(0).getLong(3) == totalRows)
  }

  test("window rank returns at most 3 per priority, correctly ordered") {
    val rows = Relational.windowRank(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(g.length <= 3)
      val prices = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(prices.sameElements(prices.sortBy(-(_: Double))))
    }
  }

  test("topk per group bounded at 2") {
    val rows = Relational.topKPerGroup(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) => assert(g.length <= 2) }
  }

  test("set ops relations are consistent") {
    val rows = Relational.setOps(spark, sfDir).collect()
    val byRel = rows.groupBy(_.getString(1)).map { case (k, v) => k -> v.map(_.getInt(0)).toSet }
    assert(byRel("both").subsetOf(byRel("any")))
    assert(byRel.getOrElse("customers_only", Set.empty[Int]).intersect(byRel("both")).isEmpty)
  }

  test("approx distinct: exact column matches distinctAgg, tolerance flag true") {
    val exact = Relational.distinctAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.approxDistinct(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)))
      assert(r.getBoolean(2), s"${r.getString(0)}: HLL estimate outside 15%")
    }
  }

  test("json extract sums are non-negative and counts match raw") {
    val n = Relational.jsonExtract(spark, sfDir)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(n == sources.Tables.events(spark, sfDir).count())
  }
}
