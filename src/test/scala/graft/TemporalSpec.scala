package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal
import graft.sources.Tables

class TemporalSpec extends SparkSpec {

  test("as-of join matches the naive per-event maximum-prior-order") {
    val asof = Temporal.asofJoin(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap

    // naive: join + filter + rank (correct but unscalable reference impl)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts").cast("double").as("t"))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("double").as("ot"),
        col("o_orderkey"), col("o_totalprice"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id")).orderBy(col("ot").desc, col("o_orderkey").desc)
    val naive = ev.join(ord, col("user_id") === col("o_custkey") && col("ot") <= col("t"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(5), r.getDouble(6))).toMap

    assert(asof.keySet == naive.keySet)
    asof.foreach { case (k, v) => assert(naive(k) == v, s"event $k: $v vs ${naive(k)}") }
  }

  test("range join pair counts are symmetric-free and type-distinct") {
    val rows = Temporal.rangeJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != r.getString(1) || r.getLong(2) == 0)
      assert(r.getLong(2) > 0)
    }
  }
}
