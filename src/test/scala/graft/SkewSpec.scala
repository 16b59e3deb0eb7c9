package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkSpec {

  test("salted join is row-identical to the plain join") {
    val fact = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val dim = Tables.part(spark, sfDir).select("p_partkey", "p_brand")

    val plain = fact.join(dim, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
    val salted = Skew.saltedJoin(fact, dim, "l_partkey", "p_partkey",
        discriminator = "l_orderkey", nSalts = 8)
      .select("l_orderkey", "l_linenumber", "p_brand")

    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0L)
    assert(salted.exceptAll(plain).count() == 0L)
  }

  test("q92 plan fans the dim side out nSalts× via explode") {
    val q = SparkEntry.queries("q92_salted_join")(spark, sfDir)
    // the dim side must carry a Generate(explode) of the 8 salt literals
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"), s"no explode in plan:\n$plan")
    assert(plan.contains("explode([0,1,2,3,4,5,6,7])"),
      s"expected the 8-salt literal array in plan:\n$plan")
    // and the fan-out is exactly nSalts× the dim row count
    val dim = Tables.supplier(spark, sfDir)
    val salted = dim.withColumn("__salt",
      explode(array((0 until 8).map(i => lit(i.toLong)): _*)))
    assert(salted.count() == 8L * dim.count())
  }

  test("AQE splits a skewed join partition at runtime (the mitigation the manual salts complement)") {
    // q92's explicit salt and q55's overfull-bucket salt are the
    // DECLARED, oracle-stable guards; AQE's skew-join is the runtime
    // backstop for skew nobody predicted. This pins that the backstop
    // actually engages in this engine's config lineage: a 90%-hot-key
    // join under low skew thresholds must execute with a skew-split
    // sort-merge join and still produce exact results.
    val c = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.adaptive.enabled", "true")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      import spark.implicits._
      val n = 100000
      // key 7 holds 90% of fact rows; payload pads partition bytes so the
      // hot partition clears the lowered skew threshold
      val fact = (1 to n)
        .map(i => (if (i % 10 == 0) i.toLong % 97 else 7L, s"payload_padding_$i"))
        .toDF("k", "payload")
      val dim = (0L to 96L).map(k => (k, s"dim_$k")).toDF("k", "dv")
      val joined = fact.join(dim, "k")
      val rows = joined.collect()
      assert(rows.length == n, s"skew join changed the row count: ${rows.length}")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE skew join did not engage:\n$plan")
    } finally saved.foreach { case (k, v) => v.fold(c.unset(k))(c.set(k, _)) }
  }

  test("salt values spread rows across buckets") {
    val fact = Tables.lineitem(spark, sfDir)
    val buckets = fact
      .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(8L)))
      .groupBy("salt").count().collect()
    assert(buckets.length == 8)
    val counts = buckets.map(_.getLong(1))
    // roughly uniform: no bucket more than 2x the mean
    assert(counts.max < 2L * (counts.sum / 8))
  }
}
