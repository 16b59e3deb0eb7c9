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

  test("tolerance as-of matches the naive band-join-then-rank reference") {
    val got = Temporal.asofJoinTolerance(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)

    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("ck"), col("ts").cast("double").as("ct"),
        col("event_id").as("cid"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("double").as("pt"),
        col("event_id").as("pid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("ct").desc, col("cid").desc)
    val naive = purch
      .join(clicks, col("user_id") === col("ck") &&
        col("ct") <= col("pt") && col("pt") - col("ct") <= 3600.0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect()
      .map(r => r.getLong(2) -> (r.getLong(5),
        math.floor(r.getDouble(1) - r.getDouble(4)).toLong)).toMap
    assert(got == naive, s"tolerance as-of diverged: ${got.size} vs ${naive.size}")
  }

  test("range join pair counts are symmetric-free and type-distinct") {
    val rows = Temporal.rangeJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != r.getString(1) || r.getLong(2) == 0)
      assert(r.getLong(2) > 0)
    }
  }

  test("range join salting on a collapsed time axis is output-identical and bounded") {
    // the r11 failure shape: thousands of events crammed into two 60 s
    // buckets — the unguarded bucket join runs each bucket's cartesian in
    // one task; the salt guard must split it WITHOUT changing the output
    import spark.implicits._
    val n = 4000
    val ev = (0 until n).map { i =>
      (i.toLong, if (i % 3 == 0) "click" else if (i % 3 == 1) "view" else "buy",
        (i % 120).toDouble + i / 10000.0)
    }.toDF("event_id", "event_type", "t")

    val saltCap = 64
    // nsalt engages: both buckets hold ~2000 rows >> saltCap
    val salted = Temporal.rangeJoinOn(ev, saltCap)
    // reference: the plain unsalted formulation (bucket ± 1, band filter)
    val b = ev.withColumn("bucket", floor(col("t") / 60).cast("long"))
    val l = b.select(col("event_id").as("e1"), col("event_type").as("type1"),
      col("t").as("t1"), col("bucket"))
    val r = b.withColumn("bucket",
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)))
      .select(col("event_id").as("e2"), col("event_type").as("type2"),
        col("t").as("t2"), col("bucket"))
    val unsalted = l.join(r, Seq("bucket"))
      .filter(col("e1") < col("e2") && col("type1") =!= col("type2") &&
        abs(col("t2") - col("t1")) <= 60.0)
      .groupBy(col("type1"), col("type2")).agg(count(lit(1)).as("n_pairs"))

    val t0 = System.nanoTime()
    val got = salted.collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val want = unsalted.collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(got == want, s"salted output diverged: $got vs $want")
    // ~millions of genuine pairs; the budget guards against a pathological
    // plan, not ambient load (generous bound)
    assert(elapsedSec < 120.0, s"salted range join took ${elapsedSec}s")
  }
}
