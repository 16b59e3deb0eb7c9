package graft

import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.sources.Tables

/** Equivalence + behavior tests for the native Sha256Prefix32 expression. */
class ExpressionSpec extends SparkSpec {

  test("native sha256_prefix32 is bit-identical to the builtin composition") {
    val df = Tables.documents(spark, sfDir)
      .select(col("text"))
      .withColumn("fast", Hashing.h32(col("text")))
      .withColumn("slow", Hashing.h32Composed(col("text")))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0L)
    // also over short tokens (exercise multi-row codegen path)
    val tok = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .withColumn("fast", Hashing.h32(col("t")))
      .withColumn("slow", Hashing.h32Composed(col("t")))
    assert(tok.filter(col("fast") =!= col("slow")).count() == 0L)
  }

  test("native expression participates in whole-stage codegen") {
    val plan = Tables.documents(spark, sfDir)
      .select(Hashing.h32(col("text")).as("h"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a whole-stage-codegen stage in the plan string
    assert(plan.contains("*(1) Project"), plan.take(500))
  }

  test("values stay in [0, 2^32)") {
    val r = Tables.documents(spark, sfDir)
      .select(Hashing.h32(col("text")).as("h"))
      .agg(min("h"), max("h")).collect()(0)
    assert(r.getLong(0) >= 0L && r.getLong(1) < (1L << 32))
  }

  test("null input yields null") {
    import spark.implicits._
    val r = Seq(Some("a"), None).toDF("s")
      .select(Hashing.h32(col("s")).as("h")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }
}
