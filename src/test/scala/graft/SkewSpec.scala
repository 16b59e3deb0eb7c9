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
